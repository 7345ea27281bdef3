"""Catalog / metadata operations (SURVEY §2.11).

ksqlDB surface → Spark twin:
- ``SHOW TOPICS``        → ``show_tables`` (registered sources)
- ``SHOW STREAMS/TABLES``→ ``show_tables`` filtered by kind
- ``DESCRIBE x EXTENDED``→ ``describe`` (schema + row count + streaming)
- ``PRINT topic``        → ``print_topic`` (sample records)
- ``SHOW QUERIES``       → ``show_queries`` (active StreamingQueries)
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from kafka_cdc_elasticsearch_pipeline_spark.sources.tables import (
    TABLE_NAMES,
    load_table,
    register_views,
)


@dataclass(frozen=True)
class TableInfo:
    name: str
    is_temporary: bool


def show_tables(spark: SparkSession) -> list[TableInfo]:
    """SHOW TOPICS / SHOW TABLES: every registered relation."""
    return [
        TableInfo(t.name, t.isTemporary) for t in spark.catalog.listTables()
    ]


def describe(df: DataFrame) -> dict:
    """DESCRIBE EXTENDED: schema, streaming-ness, column count."""
    return {
        "schema": df.schema.simpleString(),
        "columns": df.columns,
        "is_streaming": df.isStreaming,
    }


def print_topic(
    spark: SparkSession, sf_dir: str, name: str, n: int = 5, from_beginning: bool = True
) -> list:
    """PRINT <topic> [FROM BEGINNING]: sample records in offset order
    (event_id ≙ offset; tail sample when ``from_beginning`` is False)."""
    df = load_table(spark, sf_dir, name)
    order = df["event_id"].asc() if from_beginning else df["event_id"].desc()
    if "event_id" not in df.columns:
        return df.limit(n).collect()
    return df.orderBy(order).limit(n).collect()


def show_queries(spark: SparkSession) -> list[dict]:
    """SHOW QUERIES: active continuous (streaming) queries."""
    return [
        {"id": str(q.id), "name": q.name, "is_active": q.isActive}
        for q in spark.streams.active
    ]


__all__ = [
    "TableInfo",
    "describe",
    "print_topic",
    "register_views",
    "show_queries",
    "show_tables",
    "TABLE_NAMES",
]
