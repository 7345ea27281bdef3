"""Elasticsearch sink (SURVEY §2.1 S6/S7/S12) via ``foreachBatch`` +
bulk REST — no es-hadoop jar needed, and the error-tolerance semantics
of the reference's connector are implemented explicitly.

Reference configs reproduced:
- sink #1 (ksqldb-statements.sql:1-11): doc id from the message key
  (``key.ignore=false``) -> pass ``id_col``.
- sink #2 (ksqldb-statements.sql:70-85): auto-generated ids
  (``key.ignore=true``) -> ``id_col=None``; malformed-doc tolerance
  ``behavior.on.malformed.documents=warn`` / ``errors.tolerance=all``
  (T8) -> failed docs are routed to a dead-letter parquet path instead
  of failing the query.
- index template (docker-compose.yml:295-300): ``*_TS`` fields typed
  ``date`` -> ``put_index_template``.

Scale notes: each executor partition posts its own bulk batches
(``mapInPandas``-free, pure iterator) — the driver never sees the
data; at 1000 executors this is 1000 concurrent bulk writers, which
is how es-hadoop scales too.
"""

from __future__ import annotations

import json
from collections.abc import Callable

from pyspark.sql import DataFrame

DEFAULT_BULK_SIZE = 1000

Transport = Callable[[str, str], tuple[int, str]]
"""(url, body) -> (status_code, response_body). Injectable for tests."""


def _http_transport(url: str, body: str) -> tuple[int, str]:
    import urllib.request

    req = urllib.request.Request(
        url, data=body.encode(), headers={"Content-Type": "application/x-ndjson"}
    )
    with urllib.request.urlopen(req, timeout=30) as resp:  # noqa: S310
        return resp.status, resp.read().decode()


def bulk_payload(rows: list[dict], index: str, id_col: str | None) -> str:
    """Render one _bulk request body (action+source NDJSON pairs)."""
    lines = []
    for row in rows:
        action: dict = {"index": {"_index": index}}
        if id_col is not None:
            action["index"]["_id"] = str(row[id_col])
        lines.append(json.dumps(action, default=str))
        lines.append(json.dumps(row, default=str))
    return "\n".join(lines) + "\n"


def index_exists_errors(response_body: str) -> list[int]:
    """Positions of failed items in a bulk response (errors.tolerance)."""
    try:
        resp = json.loads(response_body)
    except json.JSONDecodeError:
        return []
    if not resp.get("errors"):
        return []
    return [
        i
        for i, item in enumerate(resp.get("items", []))
        if item.get("index", {}).get("status", 200) >= 300
    ]


def es_sink_foreach_batch(
    es_url: str,
    index: str,
    id_col: str | None = None,
    errors_tolerance: str = "none",
    dead_letter_path: str | None = None,
    bulk_size: int = DEFAULT_BULK_SIZE,
    transport: Transport = _http_transport,
):
    """Build a ``foreachBatch`` function bulk-indexing into ES.

    Usage::

        df.writeStream.foreachBatch(
            es_sink_foreach_batch("http://es:9200", "ratings-enriched",
                                  errors_tolerance="all",
                                  dead_letter_path="/dlq/ratings")
        ).start()
    """

    def _foreach_batch(batch_df: DataFrame, batch_id: int) -> int:
        # at-least-once success metric: counts docs the ES bulk API
        # acknowledged, accumulated inside the one side-effecting job
        # (a separate count() would re-execute the plan and disagree
        # with what was actually indexed, e.g. under an SMT
        # current_timestamp or when errors.tolerance=all drops docs)
        ok_acc = batch_df.sparkSession.sparkContext.accumulator(0)

        def _send_partition(iterator):
            buf: list[dict] = []
            failed: list[dict] = []

            def flush():
                if not buf:
                    return
                body = bulk_payload(buf, index, id_col)
                try:
                    status, resp = transport(f"{es_url}/_bulk", body)
                    bad = index_exists_errors(resp) if status < 300 else range(len(buf))
                except Exception:  # noqa: BLE001 — connector-level failure
                    bad = range(len(buf))
                bad = list(bad)
                for i in bad:
                    failed.append(buf[i])
                ok_acc.add(len(buf) - len(bad))
                buf.clear()

            for row in iterator:
                buf.append(row.asDict(recursive=True))
                if len(buf) >= bulk_size:
                    flush()
            flush()
            for f in failed:
                yield f

        failed_rdd = batch_df.rdd.mapPartitions(_send_partition)
        if errors_tolerance == "all":
            # T8 — warn + dead-letter, never fail the query
            if dead_letter_path is not None:
                # Exactly ONE action on the side-effecting RDD: the bulk
                # POSTs run inside this write job. An isEmpty() pre-check
                # would be a second job that re-runs every partition and
                # re-sends already-indexed docs — duplicate documents
                # under id_col=None (the reference's key.ignore=true
                # sink #2). An all-success batch writes an empty parquet
                # append (a _SUCCESS marker), which is the cheap side of
                # that trade.
                spark = batch_df.sparkSession
                failed = failed_rdd.map(json.dumps)
                spark.createDataFrame(failed, "string").toDF("doc").write.mode(
                    "append"
                ).parquet(dead_letter_path)
            else:
                failed_rdd.count()  # drain; connector logs-and-drops
        else:
            n_failed = failed_rdd.count()
            if n_failed:
                raise RuntimeError(f"{n_failed} documents failed to index into {index}")
        return ok_acc.value

    return _foreach_batch


def put_index_template(
    es_url: str, name: str = "kafkaconnect", transport: Transport = _http_transport
) -> tuple[int, str]:
    """S12 — the reference's dynamic template: ``*_TS`` -> ``date``,
    1 shard / 0 replicas (docker-compose.yml:295-300)."""
    template = {
        "index_patterns": ["*"],
        "settings": {"number_of_shards": 1, "number_of_replicas": 0},
        "mappings": {
            "dynamic_templates": [
                {
                    "dates": {
                        "match": "*_TS",
                        "mapping": {"type": "date"},
                    }
                }
            ]
        },
    }
    return transport(f"{es_url}/_template/{name}", json.dumps(template))
