"""The reference's OWN Kibana dashboard, executed against the engine.

The reference provisions its dashboard by POSTing saved objects to
Kibana (docker-compose.yml's setup container): four visualizations —
a count metric, median(STARS) by date_histogram × CLUB_STATUS terms,
count by date_histogram × CHANNEL terms, count by FULL_NAME terms —
and a saved search sorted EXTRACT_TS desc. Those visState blobs are
the panels' QUERY DEFINITIONS: Kibana compiles each into an ES
``/_search`` aggs request at render time. This test reads the blobs
from the read-only reference checkout at test time (the same pattern
as ``test_ksql_reference_script.py``), translates them with
``search_serve.kibana_vis_aggs`` — the same compilation Kibana does —
and serves every panel through :class:`SearchRestServer` over the
engine's ratings-enriched output, validating each against a directly
computed Spark answer. A user of the reference keeps their dashboard.
"""

from __future__ import annotations

import datetime
import json
import os
import re

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from kafka_cdc_elasticsearch_pipeline_spark.extensions import (
    search_serve as serve,
)
from kafka_cdc_elasticsearch_pipeline_spark.extensions.search_rest import (
    SearchRestServer,
)
from kafka_cdc_elasticsearch_pipeline_spark.plans.pipeline import (
    ratings_pipeline,
)
from kafka_cdc_elasticsearch_pipeline_spark.sources.datagen import (
    ratings_batch,
)

_REF = "/root/reference/docker-compose.yml"

#: ES-face field → the engine pipeline's column names
_FIELD_MAP = {
    "EXTRACT_TS": "EXTRACT_TS",
    "STARS": "STARS",
    "CLUB_STATUS": "CLUB_STATUS",
    "CHANNEL": "CHANNEL",
    "FULL_NAME": "FULL_NAME",
}


@pytest.fixture(scope="module")
def saved_objects():
    """Parse the reference's Kibana saved-object curl payloads out of
    docker-compose.yml: title → decoded visState (visualizations) or
    attributes (saved searches)."""
    if not os.path.exists(_REF):
        pytest.skip("reference checkout not present")
    text = open(_REF, encoding="utf-8").read()
    vis: dict[str, dict] = {}
    searches: dict[str, dict] = {}
    for m in re.finditer(r"--data-binary '(\{.*?\})' --compressed", text):
        try:
            obj = json.loads(m.group(1))
        except json.JSONDecodeError:
            continue
        attrs = obj.get("attributes", {})
        if "visState" in attrs:
            vis[attrs["title"]] = json.loads(attrs["visState"])
        elif "sort" in attrs and "columns" in attrs:
            searches[attrs["title"]] = attrs
    assert len(vis) == 4, f"expected the 4 reference panels, got {list(vis)}"
    return vis, searches


@pytest.fixture(scope="module")
def es_face(spark):
    """The engine's ratings-enriched relations re-shaped as the ES
    documents the reference's dashboard reads: upper-case mapped
    fields + EXTRACT_TS (the ingest-ts SMT's field; rating_time is the
    deterministic stand-in) + doc_id. Returns (enriched server,
    unhappy server, enriched df, unhappy df)."""
    seed = [
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
    changelog = spark.createDataFrame(seed)
    ratings = ratings_batch(spark, 600).withColumn(
        "user_id", (F.col("rating_id") % 20) + 1
    )
    dag = ratings_pipeline(ratings, changelog)

    def face(df):
        return df.select(
            F.col("rating_id").alias("doc_id"),
            F.timestamp_millis(F.col("rating_time")).alias("EXTRACT_TS"),
            F.col("stars").alias("STARS"),
            F.col("club_status").alias("CLUB_STATUS"),
            F.col("channel").alias("CHANNEL"),
            F.col("full_name").alias("FULL_NAME"),
        )
    enriched = face(dag["ratings_with_customer_data"]).cache()
    unhappy = face(dag["unhappy_platinum_customers"]).cache()
    s_enriched = SearchRestServer(spark, doc_source=enriched)
    s_unhappy = SearchRestServer(spark, doc_source=unhappy)
    yield s_enriched, s_unhappy, enriched, unhappy
    enriched.unpersist()
    unhappy.unpersist()


def _minute(col):
    return F.timestamp_micros(
        (F.floor(F.unix_micros(col) / F.lit(60_000_000))
         * F.lit(60_000_000)).cast("bigint")
    )


def test_count_metric_panel(saved_objects, es_face):
    """'Unhappy Platinum Customers' — a bare count metric over the
    unhappy index: no aggregations at all (the consumer reads
    hits.total); served as a value_count fallback AND cross-checked
    against the relation's true count."""
    vis, _ = saved_objects
    spec = serve.kibana_vis_aggs(
        vis["Unhappy Platinum Customers"], _FIELD_MAP
    )
    assert spec is None  # bare count → hits.total, no aggs needed
    _, s_unhappy, _, unhappy = es_face
    out = s_unhappy.search(
        {"aggs": {"n": {"value_count": {"field": "doc_id"}}}}
    )
    assert out["hits"]["total"] == unhappy.count()
    assert out["aggregations"]["n"]["value"] == unhappy.count()


def test_median_by_status_panel(saved_objects, es_face):
    """'Median Rating, by Club Status' — median(STARS) by
    date_histogram(EXTRACT_TS) × terms(CLUB_STATUS.keyword, size 5),
    validated bucket-for-bucket against a direct groupBy+percentile."""
    vis, _ = saved_objects
    spec = serve.kibana_vis_aggs(
        vis["Median Rating, by Club Status"], _FIELD_MAP,
        fixed_interval="1m",
    )
    s_enriched, _, enriched, _ = es_face
    out = s_enriched.search({"aggs": spec})["aggregations"]
    (day_name,) = spec.keys()
    (status_name,) = spec[day_name]["aggs"].keys()
    (med_name,) = spec[day_name]["aggs"][status_name]["aggs"].keys()
    got = {
        (d["key_as_string"], b["key"]):
            (b["doc_count"], b[med_name]["values"]["50.0"])
        for d in out[day_name]["buckets"]
        for b in d[status_name]["buckets"]
    }
    want = {
        (r["m"].isoformat(timespec="milliseconds") + "Z", r["CLUB_STATUS"]): (r["n"], r["med"])
        for r in enriched.groupBy(
            _minute(F.col("EXTRACT_TS")).alias("m"), "CLUB_STATUS"
        ).agg(
            F.count(F.lit(1)).alias("n"),
            F.percentile("STARS", F.lit(0.5)).alias("med"),
        ).collect()
    }
    assert got == want  # 4 statuses < size 5: nothing truncated
    # the panel's visState orders terms by "_term" desc (key order,
    # docker-compose.yml:347) — honored since round 13, not ignored
    assert spec[day_name]["aggs"][status_name]["terms"]["order"] == {
        "_key": "desc"
    }
    for d in out[day_name]["buckets"]:
        keys = [b["key"] for b in d[status_name]["buckets"]]
        assert keys == sorted(keys, reverse=True)


def test_count_by_channel_panel(saved_objects, es_face):
    """'Ratings by Channel' — count by date_histogram × terms(CHANNEL,
    size 5): per-bucket doc_counts match a direct groupBy, top-5
    channels per minute by ES's doc_count-desc/key-asc order."""
    vis, _ = saved_objects
    spec = serve.kibana_vis_aggs(
        vis["Ratings by Channel"], _FIELD_MAP, fixed_interval="1m"
    )
    s_enriched, _, enriched, _ = es_face
    out = s_enriched.search({"aggs": spec})["aggregations"]
    (day_name,) = spec.keys()
    (ch_name,) = spec[day_name]["aggs"].keys()
    want_rows = enriched.groupBy(
        _minute(F.col("EXTRACT_TS")).alias("m"), "CHANNEL"
    ).count().collect()
    by_minute: dict = {}
    for r in want_rows:
        by_minute.setdefault(r["m"].isoformat(timespec="milliseconds") + "Z", []).append(
            (r["CHANNEL"], r["count"])
        )
    for d in out[day_name]["buckets"]:
        want = sorted(
            by_minute[d["key_as_string"]], key=lambda kv: (-kv[1], kv[0])
        )[:5]
        got = [
            (b["key"], b["doc_count"]) for b in d[ch_name]["buckets"]
        ]
        assert got == want


def test_count_by_person_panel(saved_objects, es_face):
    """'Ratings per Person' — count by terms(FULL_NAME, size 5): the
    top-5 raters by rating count."""
    vis, _ = saved_objects
    spec = serve.kibana_vis_aggs(vis["Ratings per Person"], _FIELD_MAP)
    s_enriched, _, enriched, _ = es_face
    out = s_enriched.search({"aggs": spec})["aggregations"]
    (name,) = spec.keys()
    got = [
        (b["key"], b["doc_count"]) for b in out[name]["buckets"]
    ]
    want = sorted(
        ((r["FULL_NAME"], r["count"])
         for r in enriched.groupBy("FULL_NAME").count().collect()),
        key=lambda kv: (-kv[1], kv[0]),
    )[:5]
    assert got == want
    # sum_other accounts for every rating outside the top 5
    assert (
        sum(c for _, c in got) + out[name]["sum_other_doc_count"]
        == enriched.count()
    )


def test_saved_search_sorted_listing(saved_objects, es_face):
    """The 'Unhappy Platinum Customers' SAVED SEARCH: an empty-query
    search over the unhappy index sorted EXTRACT_TS desc — served as
    the match_all sorted listing, page ids equal to a direct
    orderBy."""
    _, searches = saved_objects
    attrs = searches["Unhappy Platinum Customers"]
    field, order = attrs["sort"]
    _, s_unhappy, _, unhappy = es_face
    out = s_unhappy.search({
        "sort": [{"field": _FIELD_MAP[field], "order": order}],
        "k": 10,
    })
    got = [h["_id"] for h in out["hits"]["hits"]]
    want = [
        r["doc_id"]
        for r in unhappy.orderBy(
            F.col(_FIELD_MAP[field]).desc(), F.col("doc_id").asc()
        ).limit(10).collect()
    ]
    assert got == want


def test_median_panel_with_time_range_pick(saved_objects, es_face):
    """What Kibana ACTUALLY posts when the user narrows the time
    picker: the panel's aggs wrapped in a bool.filter range on the
    time field. The buckets equal the unfiltered serve restricted to
    the picked window."""
    vis, _ = saved_objects
    spec = serve.kibana_vis_aggs(
        vis["Median Rating, by Club Status"], _FIELD_MAP,
        fixed_interval="1m",
    )
    s_enriched, _, enriched, _ = es_face
    lo_ms = int(
        enriched.agg(F.min(F.unix_millis("EXTRACT_TS"))).collect()[0][0]
    ) + 120_000  # skip the first two minutes
    picked = s_enriched.search({
        "aggs": spec,
        "query": {"bool": {"filter": [
            {"range": {"EXTRACT_TS": {"gte": lo_ms}}},
        ]}},
    })["aggregations"]
    (day_name,) = spec.keys()
    # ES semantics: the filter restricts DOCS, so a pick landing
    # mid-bucket leaves a PARTIAL first bucket — compare against a
    # direct computation over the filtered frame, not a slice of the
    # unfiltered envelope
    want = {
        (r["m"].isoformat(timespec="milliseconds") + "Z", r["CLUB_STATUS"]): r["n"]
        for r in enriched.filter(
            F.unix_millis("EXTRACT_TS") >= lo_ms
        ).groupBy(
            _minute(F.col("EXTRACT_TS")).alias("m"), "CLUB_STATUS"
        ).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    (status_name,) = spec[day_name]["aggs"].keys()
    got = {
        (d["key_as_string"], b["key"]): b["doc_count"]
        for d in picked[day_name]["buckets"]
        for b in d[status_name]["buckets"]
    }
    assert got == want
    assert min(d["key_as_string"] for d in picked[day_name]["buckets"]) \
        >= "2023-11-14T22:15:00"
