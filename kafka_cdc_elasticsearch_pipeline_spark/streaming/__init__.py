"""Structured Streaming layer (SURVEY §2.9).

The reference's runtime is a streaming engine (ksqlDB push queries on
Kafka Streams); this package provides the Spark twins:

- ``replay``   : deterministic replay of the harness tables as a
                 multi-micro-batch stream (no broker needed) — the CI
                 stand-in for the Kafka source.
- ``duality``  : stream/table duality — streaming latest-per-key and
                 windowed aggregation whose final state must equal the
                 batch operators bit-for-bit.
- ``push_pull``: push query (EMIT CHANGES ≙ StreamingQuery) vs pull
                 query (point-in-time read of the materialization).
- ``queries_streaming``: correctness-gate entries that run a real
                 StreamingQuery and return its result table.
"""

from kafka_cdc_elasticsearch_pipeline_spark.streaming.replay import (  # noqa: F401
    replay_stream,
    run_to_memory,
)
