"""Golden-scenario tests: the observable semantics pinned down by the
reference readme's pasted outputs (SURVEY §5 checks 1-5), reproduced on
the FIXTURES.md §A schemas.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import Row

from kafka_cdc_elasticsearch_pipeline_spark.plans.pipeline import ratings_pipeline
from kafka_cdc_elasticsearch_pipeline_spark.sources.datagen import ratings_batch


def _ts(s: str) -> datetime.datetime:
    return datetime.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def customers_changelog(spark):
    """20-row seed (customers.sql:26-45) + the readme's key-42 change
    sequence: INSERT Rick/Astley then 3 UPDATEs (readme.md:302-314)."""
    seed = [
        Row(
            id=i,
            first_name=f"First{i}",
            last_name=f"Last{i}",
            email=f"u{i}@example.com",
            gender="F" if i % 2 else "M",
            club_status=["bronze", "silver", "gold", "platinum"][i % 4],
            comments="seed",
            create_ts=_ts("2020-01-01T00:00:00"),
            update_ts=_ts("2020-01-01T00:00:00"),
            op_seq=i,
        )
        for i in range(1, 21)
    ]
    changes_42 = [
        ("Rick", "Astley", None, None, 100),
        ("Rick", "Astley", "rick@example.com", None, 101),
        ("Rick", "Astley", "rick@example.com", "bronze", 102),
        ("Rick", "Astley", "rick@example.com", "platinum", 103),
    ]
    seq = [
        Row(
            id=42,
            first_name=fn,
            last_name=ln,
            email=em,
            gender="M",
            club_status=cs,
            comments="readme.md:302-314",
            create_ts=_ts("2020-07-06T00:00:00"),
            update_ts=_ts("2020-07-06T00:00:00") + datetime.timedelta(minutes=i),
            op_seq=op,
        )
        for i, (fn, ln, em, cs, op) in enumerate(changes_42)
    ]
    return spark.createDataFrame(seed + seq)


@pytest.fixture(scope="module")
def ratings(spark):
    # route some ratings to user 42 so the join hits the CDC key
    df = ratings_batch(spark, 600)
    from pyspark.sql import functions as F

    return df.withColumn(
        "user_id", F.when(F.col("rating_id") % 7 == 0, 42).otherwise(F.col("user_id"))
    )


@pytest.fixture(scope="module")
def dag(ratings, customers_changelog):
    return ratings_pipeline(ratings, customers_changelog)


def test_split_partitions_input(dag, ratings):
    """Check 1 — live/test is a disjoint partition (readme.md:143-144)."""
    live, test = dag["ratings_live"], dag["ratings_test"]
    assert live.count() + test.count() == ratings.count()
    assert live.intersect(test).count() == 0
    assert live.filter(live["channel"].contains("test")).count() == 0


def test_table_vs_stream_duality(dag, customers_changelog):
    """Check 2 — TABLE shows 1 row for key 42, the changelog stream
    shows all 4 (readme.md:336-374); the surviving row is the last."""
    table = dag["customers"]
    assert customers_changelog.filter("id = 42").count() == 4
    rows42 = table.filter("id = 42").collect()
    assert len(rows42) == 1
    assert rows42[0].club_status == "platinum"
    assert rows42[0].email == "rick@example.com"
    assert table.count() == 21  # 20 seed keys + key 42


def test_enrichment_join_output(dag):
    """Check 3 — join columns/values incl. FULL_NAME concat
    (readme.md:396-409)."""
    enriched = dag["ratings_with_customer_data"]
    assert {"rating_id", "full_name", "club_status", "email"} <= set(enriched.columns)
    assert enriched.filter("full_name IS NULL").count() == 0
    sample = enriched.filter("user_id = 42").first()
    assert sample.full_name == "Rick Astley"
    # F2 null-propagating concat: no 'First42 None' style artifacts
    assert enriched.filter("full_name LIKE '%None%'").count() == 0


def test_join_sees_latest_dimension_row(ratings, customers_changelog):
    """Check 4 — the join reflects dimension updates (readme.md:432-455):
    enrich against the changelog truncated before the platinum update
    and the same key comes back bronze."""
    before = customers_changelog.filter("op_seq <= 102")
    dag_before = ratings_pipeline(ratings, before)
    row = dag_before["ratings_with_customer_data"].filter("user_id = 42").first()
    assert row.club_status == "bronze"


def test_windowed_counts_with_collected_arrays(dag):
    """Check 5 — per-15-min COUNT + COLLECT_LIST (readme.md:553-576):
    counts sum to the enriched row count; array length == count."""
    per15 = dag["ratings_per_customer_per_15minute"]
    enriched_n = dag["ratings_with_customer_data"].count()
    rows = per15.collect()
    assert sum(r.ratings_count for r in rows) == enriched_n
    assert all(len(r.ratings) == r.ratings_count for r in rows)
    assert all(r.ratings == sorted(r.ratings) for r in rows)


def test_unhappy_platinum_subset(dag):
    unhappy = dag["unhappy_platinum_customers"]
    assert unhappy.filter("stars >= 3 OR club_status <> 'platinum'").count() == 0
    assert unhappy.count() > 0
