"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``kafka_cdc_elasticsearch_pipeline_spark``;
this module only adapts the registry to the driver's entry-point shape.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

from kafka_cdc_elasticsearch_pipeline_spark.queries import QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The reference's headline derived stream — RATINGS_WITH_CUSTOMER_DATA
    (ksqldb-statements.sql:50-60): filter split → latest-per-key dim →
    broadcast LEFT equi-join on a cast key → concat projection →
    IS NOT NULL."""
    return QUERIES["j1_enrich_stream_table_join"].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.spark for name, spec in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query. Queries
    without an oracle (custom stateful streaming etc.) are omitted and
    get the driver's weaker rows-only check."""
    return {name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None}
