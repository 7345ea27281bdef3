"""The Elasticsearch-role REST shim (extensions/search_rest.py): real
HTTP round-trips against the maintained indexes — every mode's hits
must equal the direct serve call, errors surface as 400s with a
reason, and /status exposes the maintenance picture."""

from __future__ import annotations

import json
import os
import urllib.request

import pytest
from pyspark.sql import functions as F

from kafka_cdc_elasticsearch_pipeline_spark.extensions import search_index as si
from kafka_cdc_elasticsearch_pipeline_spark.extensions.search_rest import (
    SearchRestServer,
)
from kafka_cdc_elasticsearch_pipeline_spark.sources import lakelog
from kafka_cdc_elasticsearch_pipeline_spark.sources.tables import load_table


def _post(url: str, path: str, payload: dict) -> tuple[int, dict]:
    req = urllib.request.Request(
        url + path,
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as err:
        return err.code, json.loads(err.read())


def _get(url: str, path: str) -> tuple[int, dict]:
    with urllib.request.urlopen(url + path) as resp:
        return resp.status, json.loads(resp.read())


@pytest.fixture(scope="module")
def stack(spark, sf_dir, tmp_path_factory):
    """One maintained dual-index stack + a running server."""
    root = tmp_path_factory.mktemp("search_rest")
    src = str(root / "src")
    bm25_root = str(root / "bm25")
    ivfpq_root = str(root / "ivfpq")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    embs = load_table(spark, sf_dir, "embeddings")
    corpus = docs.join(
        embs.select(F.col("vec_id").alias("doc_id"), "embedding", "label"),
        "doc_id",
    )
    lakelog.append_commit(
        spark, src,
        corpus.drop("label").select(
            "doc_id", "text", "embedding", F.lit(1).alias("_ts_ms")
        ),
    )
    si.ivfpq_index_build(
        spark,
        corpus.select(F.col("doc_id").alias("vec_id"), "embedding", "label"),
        ivfpq_root,
        source_watermark=1,
    )
    si.bm25_index_maintain(spark, src, bm25_root)
    si.ivfpq_index_maintain(spark, src, ivfpq_root, id_col="doc_id")
    server = SearchRestServer(
        spark,
        bm25_root=bm25_root,
        ivfpq_root=ivfpq_root,
        query_source=embs,
    ).start()
    yield server, bm25_root, ivfpq_root, embs
    server.stop()


def test_info_and_status(stack):
    server, bm25_root, ivfpq_root, _ = stack
    code, info = _get(server.url, "/info")
    assert code == 200 and info["bm25_root"] == bm25_root
    code, status = _get(server.url, "/status")
    assert code == 200
    assert status["bm25"]["read_amplification"]["bm25_tf"]["n_segments"] >= 1
    assert status["ivfpq"]["read_amplification"]["pq_codes"]["n_segments"] >= 1


def test_search_modes_match_direct_calls(spark, stack):
    server, bm25_root, ivfpq_root, embs = stack
    queries = embs.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_embedding"),
    )

    code, rrf = _post(
        server.url, "/search",
        {"mode": "rrf", "query_ids": [0, 1, 2], "k": 5, "pool": 20},
    )
    assert code == 200 and rrf["hits"]["total"] == 15
    want = {
        (r.query_id, r.rank): (r.doc_id, r.rrf)
        for r in si.hybrid_search_rrf_from_cdc_indexes(
            spark, bm25_root, ivfpq_root, queries,
            query_ids=(0, 1, 2), pool=20, k=5,
        ).collect()
    }
    got = {
        (h["query_id"], h["rank"]): (h["_id"], h["_score"])
        for h in rrf["hits"]["hits"]
    }
    assert got == want

    code, ann = _post(
        server.url, "/search",
        {"mode": "ann", "query_ids": [0, 1], "k": 4, "nprobe": 2},
    )
    assert code == 200 and ann["hits"]["total"] == 8
    code, bm = _post(
        server.url, "/search", {"mode": "bm25", "query_ids": [0, 1, 2], "k": 3}
    )
    assert code == 200 and bm["hits"]["total"] == 9
    code, rr = _post(
        server.url, "/search",
        {"mode": "rerank", "query_ids": [0], "k": 5},
    )
    assert code == 200 and rr["hits"]["total"] == 5
    # ranked within each query, rank starts at 1
    ranks = [h["rank"] for h in rr["hits"]["hits"]]
    assert ranks == [1, 2, 3, 4, 5]


def test_search_inline_vectors_and_filtered_ann(spark, stack):
    server, _, _, embs = stack
    vec = embs.filter(F.col("vec_id") == 0).collect()[0].embedding
    code, out = _post(
        server.url, "/search",
        {
            "mode": "ann",
            "queries": [{"query_id": 0, "embedding": list(vec)}],
            "k": 5,
            "allowed_ids": [int(v) for v in range(0, 400, 3)],
        },
    )
    assert code == 200
    hits = out["hits"]["hits"]
    assert len(hits) == 5
    assert all(h["_id"] % 3 == 0 for h in hits)


def test_search_errors_are_400_with_reason(stack):
    server, _, _, _ = stack
    code, out = _post(server.url, "/search", {"mode": "nope"})
    assert code == 400 and "unknown mode" in out["error"]["reason"]
    code, out = _post(server.url, "/search", {"mode": "ann"})
    assert code == 400 and "query" in out["error"]["reason"]
    code, out = _post(server.url, "/nope", {})
    assert code == 404


def test_search_rejects_modes_for_unmounted_roots(spark, stack):
    _, bm25_root, _, embs = stack
    solo = SearchRestServer(spark, bm25_root=bm25_root).start()
    try:
        code, out = _post(
            solo.url, "/search", {"mode": "rrf", "query_ids": [0]}
        )
        assert code == 400 and "both indexes" in out["error"]["reason"]
        code, out = _post(
            solo.url, "/search", {"mode": "bm25", "query_ids": [0], "k": 3}
        )
        assert code == 200 and out["hits"]["total"] == 3
        # ann needs the (unmounted) vector index — explicit 400
        code, out = _post(
            solo.url, "/search", {"mode": "ann", "query_ids": [0]}
        )
        assert code == 400 and "no ivfpq index" in out["error"]["reason"]
    finally:
        solo.stop()


def test_query_ids_without_query_source_is_explicit(spark, stack):
    _, _, ivfpq_root, _ = stack
    noq = SearchRestServer(spark, ivfpq_root=ivfpq_root).start()
    try:
        code, out = _post(
            noq.url, "/search", {"mode": "ann", "query_ids": [0]}
        )
        assert code == 400 and "query_source" in out["error"]["reason"]
    finally:
        noq.stop()


def test_pointer_mounted_server_survives_blue_green_swap(
    spark, sf_dir, tmp_path
):
    """THE application-side contract, end to end over HTTP: a server
    mounted through the serving pointer answers before, during-ish,
    and after a blue/green retrain swap with no restart and no config
    change — the swap shows up only as fresher answers (a doc deleted
    mid-retrain stops being served; /info's resolved root flips)."""
    src = str(tmp_path / "src")
    blue = str(tmp_path / "blue")
    green = str(tmp_path / "green")
    ptr = str(tmp_path / "ptr")
    embs = load_table(spark, sf_dir, "embeddings")
    corpus = embs.filter(F.col("vec_id") < 240)
    lakelog.append_commit(
        spark, src,
        corpus.select("vec_id", "embedding", F.lit(1).alias("_ts_ms")),
    )
    si.ivfpq_index_build(spark, corpus, blue, source_watermark=1)
    si.serving_pointer_set(ptr, blue)
    server = SearchRestServer(spark, ivfpq_pointer=ptr, query_source=embs).start()
    try:
        code, before = _post(
            server.url, "/search", {"mode": "ann", "query_ids": [0], "k": 10}
        )
        assert code == 200 and before["hits"]["total"] == 10
        victim = before["hits"]["hits"][0]["_id"]
        code, info = _get(server.url, "/info")
        assert info["ivfpq_root"] == os.path.abspath(blue)
        # retrain, then the victim is CDC-deleted DURING the window
        si.ivfpq_index_retrain(spark, src, green, old_root=blue, iterations=1)
        lakelog.merge_apply_cdc(
            spark, src,
            embs.filter(F.col("vec_id") == victim).select(
                "vec_id", "embedding",
                F.lit(2).alias("_ts_ms"), F.lit("d").alias("_op"),
            ),
            ["vec_id"], "_ts_ms",
        )
        si.ivfpq_index_swap(spark, src, green, ptr, expect_root=blue)
        # same server, same request: now the green index answers
        code, after = _post(
            server.url, "/search", {"mode": "ann", "query_ids": [0], "k": 10}
        )
        assert code == 200 and after["hits"]["total"] == 10
        assert all(h["_id"] != victim for h in after["hits"]["hits"])
        code, info = _get(server.url, "/info")
        assert info["ivfpq_root"] == os.path.abspath(green)
    finally:
        server.stop()
