"""Source / sink surface (SURVEY §2.1).

- ``tables``        : harness parquet tables (the batch scan path).
- ``cdc``           : Debezium-envelope decode + SMT equivalents
                      (ExtractNewRecordState / ExtractField$Key /
                      InsertField$Value) and a JDBC snapshot reader.
- ``kafka``         : Kafka source/sink builders for Structured
                      Streaming (config-gated; no broker in CI).
- ``datagen``       : deterministic ratings-shaped generator (the
                      reference's datagen connector) + rate-source.
- ``elasticsearch`` : foreachBatch bulk-REST ES sink with
                      errors.tolerance semantics (service-gated).
"""

from kafka_cdc_elasticsearch_pipeline_spark.sources.tables import (  # noqa: F401
    TABLE_NAMES,
    load_table,
    load_tables,
    register_views,
)
