"""End-to-end STREAMING run of the complete reference topology
(SURVEY top-of-file DAG) — the "switch from the reference" demo:

    datagen ratings ──▶ live/test split ──▶ ⟕ CUSTOMERS (latest per key)
        ──▶ enriched ─┬▶ unhappy platinum (rekeyed)
                      ├▶ 15-min windowed counts (streaming state)
                      └▶ ES bulk sink (captured) + DLQ for malformed

Every stage is the real operator wired through a real StreamingQuery;
results are cross-checked against the batch pipeline on the same data.
"""

from __future__ import annotations

import datetime
import glob
import os
import tempfile

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from kafka_cdc_elasticsearch_pipeline_spark.plans.pipeline import ratings_pipeline
from kafka_cdc_elasticsearch_pipeline_spark.sources.datagen import ratings_batch
from kafka_cdc_elasticsearch_pipeline_spark.sources.elasticsearch import (
    es_sink_foreach_batch,
)


def _customers(spark):
    rows = [
        Row(
            id=i,
            first_name=f"First{i}",
            last_name=f"Last{i}",
            email=f"u{i}@example.com",
            gender="F" if i % 2 else "M",
            club_status=["bronze", "silver", "gold", "platinum"][i % 4],
            comments="seed",
            create_ts=datetime.datetime(2020, 1, 1),
            update_ts=datetime.datetime(2020, 1, 1),
            op_seq=i,
        )
        for i in range(1, 21)
    ]
    return spark.createDataFrame(rows)


@pytest.fixture(scope="module")
def replayed(spark, tmp_path_factory):
    """The datagen ratings written as 4 mtime-ordered chunks and read
    back as a file stream (the broker stand-in)."""
    import time

    data_dir = str(tmp_path_factory.mktemp("ratings_stream"))
    batch = ratings_batch(spark, n=400)
    batch.repartitionByRange(4, "rating_id").write.mode("overwrite").parquet(data_dir)
    parts = sorted(
        f for f in os.listdir(data_dir) if f.startswith("part-") and f.endswith(".parquet")
    )
    base = time.time() - 120
    for i, f in enumerate(parts):
        os.utime(os.path.join(data_dir, f), (base + i, base + i))
    stream = (
        spark.readStream.schema(batch.schema).option("maxFilesPerTrigger", 1).parquet(data_dir)
    )
    return batch, stream


def test_full_reference_dag_streaming(spark, replayed, tmp_path):
    batch, stream = replayed
    customers = _customers(spark)
    # batch truth: the same DAG through the batch operators
    truth = ratings_pipeline(batch, customers)

    # streaming DAG: same operator calls on the streaming frame
    live_stream = ratings_pipeline(stream, customers)

    captured = tempfile.mkdtemp(prefix="e2e_es_")
    dlq = str(tmp_path / "dlq")

    def transport(url: str, body: str):  # capture + reject rating_id % 97 == 0
        import json as _json
        import os as _os

        docs = [_json.loads(line) for line in body.strip().splitlines()][1::2]
        with open(_os.path.join(captured, f"b_{abs(hash(body))}.ndjson"), "w") as f:
            f.write(body)
        items = [
            {"index": {"status": 400 if doc.get("rating_id", 0) % 97 == 0 else 201}}
            for doc in docs
        ]
        return 200, _json.dumps({"errors": True, "items": items})

    sink = es_sink_foreach_batch(
        "http://fake:9200",
        "ratings-enriched",
        errors_tolerance="all",
        dead_letter_path=dlq,
        transport=transport,
    )
    q = (
        live_stream["ratings_with_customer_data"]
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt_es"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    want_enriched = truth["ratings_with_customer_data"].count()
    indexed = 0
    for p in glob.glob(f"{captured}/*.ndjson"):
        with open(p) as f:
            indexed += sum(1 for _ in f) // 2
    assert indexed == want_enriched  # every enriched rating reached the sink

    # DLQ holds exactly the rejected ids (T8)
    want_dlq = (
        truth["ratings_with_customer_data"].filter(F.col("rating_id") % 97 == 0).count()
    )
    got_dlq = spark.read.parquet(dlq).count() if want_dlq else 0
    assert got_dlq == want_dlq

    # windowed counts: streaming state result == batch result
    from kafka_cdc_elasticsearch_pipeline_spark.streaming.replay import run_to_memory

    run_to_memory(
        live_stream["ratings_per_customer_per_15minute"],
        "e2e_per15",
        output_mode="complete",
        checkpoint_dir=str(tmp_path / "ckpt_agg"),
    )
    got = {
        (r.window_start, r.full_name): (r.ratings_count, r.ratings)
        for r in spark.table("e2e_per15").collect()
    }
    want = {
        (r.window_start, r.full_name): (r.ratings_count, r.ratings)
        for r in truth["ratings_per_customer_per_15minute"].collect()
    }
    assert got == want

    # unhappy platinum: streaming filter+rekey == batch
    run_to_memory(
        live_stream["unhappy_platinum_customers"],
        "e2e_unhappy",
        output_mode="append",
        checkpoint_dir=str(tmp_path / "ckpt_unhappy"),
    )
    assert (
        spark.table("e2e_unhappy").count()
        == truth["unhappy_platinum_customers"].count()
    )
