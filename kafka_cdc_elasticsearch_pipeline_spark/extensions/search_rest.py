"""Search REST endpoint over the maintained indexes — the
ELASTICSEARCH-role twin of ``ksql/rest.py``'s ksqlDB-role shim.

In the reference pipeline the whole point of the Kafka→CDC plumbing is
that consumers query ELASTICSEARCH over REST (readme.md's dashboards
curl ``/_search``). This engine replaces ES with the maintained
BM25/IVF-PQ lake indexes (``extensions/search_index.py``); this module
is the REST face of that replacement, so the reference's consumer
shape — "POST a search, get ranked hits" — keeps working against the
Spark-served stack. Response bodies borrow ES's ``hits.total`` /
``hits.hits[]._id/_score`` envelope (the subset a dashboard consumes),
and ES 8.x's ``rrf`` retriever maps to ``mode: "rrf"``.

Endpoints:

- ``GET /info``   liveness + which roots are mounted.
- ``GET /status`` the maintenance picture, metadata-only: per-table
  segment counts (``index_read_amplification``) and the policy's last
  persisted report (``read_maintenance_status`` — includes the sticky
  ``retrain_due`` drift flag).
- ``POST /search`` body::

      {"mode": "bm25" | "ann" | "rerank" | "rrf",
       "query_ids": [0, 1, 2],          # resolved against the mounted
                                         # query source, or:
       "queries": [{"query_id": 0, "embedding": [... floats ...]}],
       "k": 10, "pool": 20, "nprobe": 2,
       "allowed_ids": [3, 6, 9]}         # optional: filtered ANN

  → ``{"hits": {"total": N, "hits": [{"_id", "_score", "rank",
  "query_id"}]}}``, ranked per query.

Scale note: a CONTROL-plane shim exactly like the ksql REST twin —
results are k × |queries| rows by construction (every serve path is
top-k), so the driver-side collect is bounded; the heavy lifting
(probe, decode, rank) runs as the same distributed plans the gate rows
hash. The data plane (CDC sinks folding the indexes forward) never
touches this server.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_cdc_elasticsearch_pipeline_spark.extensions import (
    search_index as si,
)


class SearchRestServer:
    """Serve the maintained search stack over HTTP.

    ``bm25_root`` / ``ivfpq_root`` mount the two index families
    (either may be absent — modes needing a missing root return 400).
    ``ivfpq_pointer`` mounts the vector side THROUGH a serving pointer
    instead of a static root: every request resolves the pointer's
    current target (one JSON read — ``serving_pointer_get``), so a
    blue/green retrain swap (:func:`search_index.ivfpq_index_swap`)
    is invisible to REST consumers — exactly the application-side
    contract the pointer exists for. ``query_source`` is an optional
    (vec_id, embedding) DataFrame used to resolve ``query_ids`` into
    query vectors (the demo shape where queries are corpus members);
    applications that bring their own vectors pass ``queries`` in the
    request body instead, keeping the serve path free of any
    raw-corpus dependency."""

    def __init__(
        self,
        spark: SparkSession,
        bm25_root: str | None = None,
        ivfpq_root: str | None = None,
        ivfpq_pointer: str | None = None,
        query_source: DataFrame | None = None,
        host: str = "127.0.0.1",
        port: int = 0,
    ):
        if ivfpq_root is not None and ivfpq_pointer is not None:
            raise ValueError("mount ivfpq_root OR ivfpq_pointer, not both")
        self.spark = spark
        self.bm25_root = bm25_root
        self._ivfpq_static = ivfpq_root
        self.ivfpq_pointer = ivfpq_pointer
        self.query_source = query_source
        outer = self

        class Handler(BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"

            def log_message(self, fmt, *args):  # quiet test output
                pass

            def _json(self, code: int, payload) -> None:
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):  # noqa: N802 - http.server API
                path = self.path.rstrip("/")
                if path in ("", "/info"):
                    self._json(
                        200,
                        {
                            "engine": "spark-search",
                            "bm25_root": outer.bm25_root,
                            "ivfpq_root": outer.ivfpq_root,
                        },
                    )
                elif path == "/status":
                    self._json(200, outer.status())
                else:
                    self._json(404, {"message": f"no such resource {self.path}"})

            def do_POST(self):  # noqa: N802 - http.server API
                if self.path.rstrip("/") != "/search":
                    self._json(404, {"message": f"no such resource {self.path}"})
                    return
                try:
                    length = int(self.headers.get("Content-Length", "0"))
                    req = json.loads(self.rfile.read(length) or b"{}")
                    self._json(200, outer.search(req))
                except Exception as exc:  # noqa: BLE001 - surface as a search error
                    self._json(400, {"error": {"reason": str(exc)}})

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self.port = self._httpd.server_address[1]
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )

    # --- request handlers (plain methods so tests can call them directly) ---

    @property
    def ivfpq_root(self) -> str | None:
        """The vector index actually served RIGHT NOW: the static
        mount, or the pointer's current target re-resolved on every
        access (requests capture it once on entry, so one response
        never straddles a swap)."""
        if self.ivfpq_pointer is not None:
            return si.serving_pointer_get(self.ivfpq_pointer)
        return self._ivfpq_static

    def status(self) -> dict:
        out: dict = {}
        for name, root in (("bm25", self.bm25_root), ("ivfpq", self.ivfpq_root)):
            if root is None:
                continue
            out[name] = {
                "read_amplification": si.index_read_amplification(root),
                "maintenance": si.read_maintenance_status(root),
            }
        return out

    def _queries_df(self, req: dict) -> tuple[DataFrame, tuple[int, ...]]:
        if req.get("queries"):
            rows = [
                (int(q["query_id"]), [float(x) for x in q["embedding"]])
                for q in req["queries"]
            ]
            qdf = self.spark.createDataFrame(
                rows, "query_id bigint, q_embedding array<double>"
            )
            return qdf, tuple(r[0] for r in rows)
        qids = tuple(int(i) for i in req.get("query_ids", ()))
        if not qids:
            raise ValueError("provide either 'queries' or 'query_ids'")
        if self.query_source is None:
            raise ValueError(
                "'query_ids' needs a mounted query_source; this server "
                "has none — send 'queries' with embeddings instead"
            )
        qdf = self.query_source.filter(
            F.col("vec_id").isin(list(qids))
        ).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_embedding"),
        )
        return qdf, qids

    def search(self, req: dict) -> dict:
        mode = req.get("mode", "rrf")
        k = int(req.get("k", 10))
        pool = int(req.get("pool", 20))
        nprobe = int(req.get("nprobe", 2))
        # resolve the pointer ONCE per request: a swap landing
        # mid-request cannot mix two roots in one response
        ivfpq_root = self.ivfpq_root
        if mode == "bm25":
            if self.bm25_root is None:
                raise ValueError("no bm25 index mounted")
            qids = tuple(int(i) for i in req.get("query_ids", ()))
            if not qids:
                raise ValueError("bm25 mode needs 'query_ids'")
            from pyspark.sql import Window as W

            scored = si.bm25_score_from_index(self.spark, self.bm25_root, qids)
            w = W.partitionBy("query_id").orderBy(
                F.col("bm25").desc(), F.col("doc_id").asc()
            )
            df = (
                scored.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= k)
                .select(
                    "query_id",
                    F.col("doc_id").alias("_id"),
                    F.col("bm25").alias("_score"),
                    "rank",
                )
            )
        elif mode == "ann":
            if ivfpq_root is None:
                raise ValueError("no ivfpq index mounted")
            qdf, _ = self._queries_df(req)
            allowed = None
            if req.get("allowed_ids") is not None:
                allowed = self.spark.createDataFrame(
                    [(int(v),) for v in req["allowed_ids"]], "vec_id bigint"
                )
            df = si.ivfpq_search_from_index(
                self.spark, ivfpq_root, qdf, k=k, nprobe=nprobe,
                allowed_ids=allowed,
            ).select(
                "query_id",
                F.col("neighbor_id").alias("_id"),
                F.col("cosine").alias("_score"),
                "rank",
            )
        elif mode in ("rerank", "rrf"):
            if self.bm25_root is None or ivfpq_root is None:
                raise ValueError(f"{mode} mode needs both indexes mounted")
            qdf, qids = self._queries_df(req)
            if mode == "rerank":
                df = si.hybrid_search_from_cdc_indexes(
                    self.spark, self.bm25_root, ivfpq_root, qdf,
                    query_ids=qids, pool=pool, k=k,
                ).select(
                    "query_id",
                    F.col("doc_id").alias("_id"),
                    F.col("cosine").alias("_score"),
                    "rank",
                )
            else:
                df = si.hybrid_search_rrf_from_cdc_indexes(
                    self.spark, self.bm25_root, ivfpq_root, qdf,
                    query_ids=qids, pool=pool, k=k, nprobe=nprobe,
                ).select(
                    "query_id",
                    F.col("doc_id").alias("_id"),
                    F.col("rrf").alias("_score"),
                    "rank",
                )
        else:
            raise ValueError(f"unknown mode {mode!r}")
        hits = [
            {
                "query_id": r.query_id,
                "_id": r._id,
                "_score": r._score,
                "rank": r.rank,
            }
            for r in df.collect()  # bounded: ≤ k × |queries| rows
        ]
        hits.sort(key=lambda h: (h["query_id"], h["rank"]))
        return {"hits": {"total": len(hits), "hits": hits}}

    @property
    def url(self) -> str:
        return f"http://127.0.0.1:{self.port}"

    def start(self) -> "SearchRestServer":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
