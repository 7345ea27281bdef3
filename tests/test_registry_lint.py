"""Registry-wide lint: no gated query may emit a complex-typed column.

The driver's canonicalizer pandas-sorts every output column before
value-hashing; a list/dict cell raises ``TypeError: unhashable type``
and the row merges RED regardless of semantics — the round-8 failure
of ``stateful_recent_events_tws_v2`` (raw ``array<bigint>``) and the
second representation-class driver red in the project's history
(round 2: HUGEINT→float64). This test makes the registry.py
"sorted, then string-joined" rule mechanical: every oracle's DECLARED
schema is checked via DuckDB ``DESCRIBE`` (plans, never executes), so
the full 200-query registry lints in well under a second and a new
registration with a raw array column fails CI before it can reach the
driver. The Spark side is covered by the schema_match gate (a
string-joined oracle forces the Spark projection to match) plus the
runtime twin in ``tools/check_oracle.py`` (``complex_spark_cols``).
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from check_oracle import complex_oracle_cols, complex_spark_cols  # noqa: E402

from kafka_cdc_elasticsearch_pipeline_spark.queries import QUERIES
from kafka_cdc_elasticsearch_pipeline_spark.sources.tables import TABLE_NAMES


@pytest.fixture(scope="module")
def con(sf_dir):
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def test_no_oracle_declares_complex_columns(con):
    offenders = {}
    for name, spec in QUERIES.items():
        if spec.oracle is None:
            continue
        bad = complex_oracle_cols(con, spec.oracle)
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "gated queries with complex-typed oracle columns (driver "
        f"canonicalizer will TypeError on these): {offenders} — "
        "string-join (array_to_string) in the final projection, "
        "registry.py determinism rules"
    )


def test_lint_catches_raw_array_projection(con):
    """The lint must reject exactly the shape that went red in r08."""
    sql = """
    SELECT user_id,
           (list(event_id ORDER BY ts DESC))[1:3] AS recent_event_ids
    FROM events GROUP BY user_id
    """
    bad = complex_oracle_cols(con, sql)
    assert bad == [("recent_event_ids", "BIGINT[]")]
    # struct + map shapes too
    assert complex_oracle_cols(con, "SELECT {'a': 1} AS s")
    assert complex_oracle_cols(con, "SELECT map([1], ['x']) AS m")
    # and the string-joined fix passes
    fixed = """
    SELECT user_id,
           array_to_string((list(event_id ORDER BY ts DESC))[1:3], ',')
             AS recent_event_ids
    FROM events GROUP BY user_id
    """
    assert complex_oracle_cols(con, fixed) == []


def test_spark_side_lint_catches_array_schema(spark):
    from pyspark.sql import functions as F

    df = spark.range(3).groupBy().agg(F.collect_list("id").alias("ids"))
    assert complex_spark_cols(df.schema) == [("ids", "array<bigint>")]
    ok = df.select(F.array_join(F.col("ids").cast("array<string>"), ",").alias("ids"))
    assert complex_spark_cols(ok.schema) == []
