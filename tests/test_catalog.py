"""Catalog ops (§2.11) + processing log (T9)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_cdc_elasticsearch_pipeline_spark import catalog


def test_show_tables_after_register(spark, sf_dir):
    catalog.register_views(spark, sf_dir)
    names = {t.name for t in catalog.show_tables(spark)}
    assert set(catalog.TABLE_NAMES) <= names


def test_describe_and_print_topic(spark, sf_dir):
    from kafka_cdc_elasticsearch_pipeline_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    d = catalog.describe(ev)
    assert not d["is_streaming"] and "user_id" in d["columns"]
    head = catalog.print_topic(spark, sf_dir, "events", n=3)
    assert len(head) == 3
    assert [r.event_id for r in head] == sorted(r.event_id for r in head)
    tail = catalog.print_topic(spark, sf_dir, "events", n=3, from_beginning=False)
    assert tail[0].event_id > head[-1].event_id


def test_processing_log_captures_progress(spark, sf_dir):
    from kafka_cdc_elasticsearch_pipeline_spark.streaming.processing_log import (
        ProcessingLog,
    )
    from kafka_cdc_elasticsearch_pipeline_spark.streaming.replay import (
        cleanup,
        replay_stream,
        run_to_memory,
    )

    log = ProcessingLog.attach(spark)
    stream, tmp = replay_stream(spark, sf_dir, "events", chunks=3)
    try:
        agg = stream.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
        run_to_memory(agg, "plog_agg", output_mode="complete")
        spark.streams.resetTerminated()
        types = [e["type"] for e in log.entries]
        assert "started" in types and "progress" in types
        progress = [e for e in log.entries if e["type"] == "progress"]
        assert sum(e["num_input_rows"] for e in progress) > 0
    finally:
        log.detach(spark)
        cleanup(tmp)
