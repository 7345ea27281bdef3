"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference CDC pipeline
(mohammedzihan/kafka-cdc-elasticsearch-pipeline).

The reference is a declarative Kafka/ksqlDB/Debezium/Elasticsearch
streaming-ETL demo; its "program" is the statement set in
`ksqldb-statements.sql` plus Kafka-Connect connector configs. This
package re-expresses every one of those statements — stream scans,
changelog TABLE (latest-per-key) semantics, stream-table enrichment
joins, filter splits, tumbling-window aggregation, re-keying, and the
source/sink surface — as idiomatic PySpark (DataFrame / SQL / Catalyst
/ Structured Streaming), designed for 100 TB scale rather than a
single-broker demo.

Layout
------
- ``session``    : tuned SparkSession builder (AQE, Arrow, UTC).
- ``sources``    : parquet/table registry, Kafka & CDC (Debezium
                   envelope) decode, datagen, Elasticsearch sink.
- ``functions``  : scalar function surface (LCASE, string ``+``,
                   casts, TIMESTAMPTOSTRING, ...).
- ``operators``  : relational core (project/filter/join/agg/limit/
                   set-ops), TABLE latest-per-key, tumbling windows.
- ``plans``      : the reference's end-to-end dataflow DAG.
- ``streaming``  : Structured Streaming twins (push/pull queries,
                   stream/table duality, windowed aggs, replay).
- ``extensions`` : large-scale training-data ops (dedup, similarity
                   search, text analysis, multimodal columns).
- ``queries``    : the named query registry consumed by
                   ``__spark_entry__`` (Spark impl + DuckDB oracle).
"""

__version__ = "0.1.0"


def sql(spark, sf_dir: str, statement: str):
    """ksql-style entry point: register the harness tables as views and
    run one SQL statement against them (SURVEY §3 EP1/EP2 twin).

    >>> sql(spark, "/root/testdata/sf0.001",
    ...     "SELECT count(*) FROM events WHERE lower(event_type) NOT LIKE '%err%'")
    """
    from kafka_cdc_elasticsearch_pipeline_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(statement)
