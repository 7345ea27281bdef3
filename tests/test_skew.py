"""Skew-resilient join machinery (operators/skew.py): the salted join
and the heavy-hitters-driven chooser must be row-identical to the
plain join — salting is a physical rewrite, never a semantic one."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from kafka_cdc_elasticsearch_pipeline_spark.operators.skew import (
    hot_keys,
    salted_join,
    skew_aware_join,
)


@pytest.fixture(scope="module")
def skewed(spark):
    # one celebrity key (0) holding 60% of the fact; a missing key (99)
    # to exercise the left-join null path
    fact = spark.createDataFrame(
        [Row(k=0 if i % 5 < 3 else (i % 7) + 1, v=i) for i in range(200)]
        + [Row(k=99, v=1000)]
    )
    dim = spark.createDataFrame([Row(dk=i, name=f"dim-{i}") for i in range(8)])
    return fact, dim


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_join_inner_matches_plain(skewed):
    fact, dim = skewed
    plain = fact.join(dim, fact.k == dim.dk, "inner").select("k", "v", "name")
    salted = salted_join(fact, dim, "k", "dk", salt_buckets=4).select(
        "k", "v", "name"
    )
    assert _sorted_rows(salted) == _sorted_rows(plain)


def test_salted_join_left_keeps_unmatched(skewed):
    fact, dim = skewed
    plain = fact.join(dim, fact.k == dim.dk, "left").select("k", "v", "name")
    salted = salted_join(fact, dim, "k", "dk", salt_buckets=4, how="left").select(
        "k", "v", "name"
    )
    assert _sorted_rows(salted) == _sorted_rows(plain)
    assert any(r.name is None for r in salted.collect())  # key 99 survived


def test_hot_keys_finds_the_celebrity(skewed):
    fact, _ = skewed
    hot = hot_keys(fact, "k", top_n=3, min_share=0.2)
    assert hot[0] == 0  # the 60% key leads
    assert all(isinstance(k, int) for k in hot)


def test_skew_aware_join_union_matches_plain(skewed):
    fact, dim = skewed
    hot = hot_keys(fact, "k", top_n=2, min_share=0.1)
    assert hot  # the fixture is skewed by construction
    routed = skew_aware_join(fact, dim, "k", "dk", hot, salt_buckets=4).select(
        "k", "v", "name"
    )
    plain = fact.join(dim, fact.k == dim.dk, "inner").select("k", "v", "name")
    assert _sorted_rows(routed) == _sorted_rows(plain)


def test_skew_aware_join_no_hot_keys_degrades_to_plain(skewed):
    fact, dim = skewed
    routed = skew_aware_join(fact, dim, "k", "dk", hot=[], salt_buckets=4)
    plain = fact.join(dim, fact.k == dim.dk, "inner")
    assert routed.count() == plain.count()


def test_salted_join_spreads_hot_key_over_buckets(skewed):
    """The point of the exercise: the celebrity key's rows occupy
    multiple salt buckets, so no single reducer owns it."""
    fact, _ = skewed
    non_keys = [c for c in fact.columns if c != "k"]
    n_buckets = (
        fact.filter(F.col("k") == 0)
        .withColumn(
            "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in non_keys]), F.lit(4))
        )
        .select("_salt")
        .distinct()
        .count()
    )
    assert n_buckets > 1
