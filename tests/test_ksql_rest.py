"""REST entry point (ksql/rest.py): the reference's rest_example.sh
flow — DDL via POST /ksql, pull query via POST /query, liveness via
GET /info — against a live in-process server."""

from __future__ import annotations

import datetime
import json
import urllib.error
import urllib.request

import pytest
from pyspark.sql import Row

from kafka_cdc_elasticsearch_pipeline_spark.ksql import KsqlEngine
from kafka_cdc_elasticsearch_pipeline_spark.ksql.rest import KsqlRestServer


def _post(url: str, payload: dict) -> tuple[int, bytes]:
    req = urllib.request.Request(
        url,
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    try:
        with urllib.request.urlopen(req, timeout=30) as resp:
            return resp.status, resp.read()
    except urllib.error.HTTPError as e:
        return e.code, e.read()


@pytest.fixture(scope="module")
def server(spark):
    reviews = spark.createDataFrame(
        [
            Row(
                review_id=i,
                member_id=i % 3,
                score=i % 5 + 1,
                rowtime=datetime.datetime(2021, 3, 1, 9, 0)
                + datetime.timedelta(minutes=7 * i),
            )
            for i in range(30)
        ]
    )
    srv = KsqlRestServer(KsqlEngine(spark, {"reviews": reviews})).start()
    yield srv
    srv.stop()


def test_info_liveness(server):
    with urllib.request.urlopen(server.url + "/info", timeout=10) as resp:
        assert resp.status == 200
        assert "KsqlServerInfo" in json.loads(resp.read())


def test_ddl_then_pull_query_roundtrip(server):
    status, body = _post(
        server.url + "/ksql",
        {
            "ksql": (
                "CREATE STREAM REVIEWS WITH (KAFKA_TOPIC='reviews',"
                " VALUE_FORMAT='JSON');"
                "CREATE TABLE SCORES_15M AS SELECT MEMBER_ID,"
                " COUNT(*) AS N FROM REVIEWS WINDOW TUMBLING (SIZE 15 MINUTE)"
                " GROUP BY MEMBER_ID EMIT CHANGES;"
            )
        },
    )
    assert status == 200
    statuses = json.loads(body)
    assert len(statuses) == 2
    assert all(s["commandStatus"]["status"] == "SUCCESS" for s in statuses)

    # the reference's epoch-ms pull-query form through REST
    epoch_ms = 1614589200000  # 2021-03-01 09:00:00 UTC
    status, body = _post(
        server.url + "/query",
        {
            "ksql": (
                "SELECT WINDOWSTART, MEMBER_ID, N FROM SCORES_15M"
                f" WHERE MEMBER_ID = 1 AND WINDOWSTART >= {epoch_ms};"
            )
        },
    )
    assert status == 200
    lines = [json.loads(x) for x in body.decode().strip().splitlines()]
    assert "schema" in lines[0]["header"]
    rows = [x["row"]["columns"] for x in lines[1:]]
    assert len(rows) > 0
    assert all(r[1] == 1 for r in rows)


def test_statement_error_shape(server):
    status, body = _post(server.url + "/ksql", {"ksql": "FROB THE TOPIC;"})
    assert status == 400
    err = json.loads(body)
    assert err["@type"] == "statement_error"
    assert "unsupported" in err["message"]


def test_select_on_ksql_endpoint_rejected(server):
    """Real ksqlDB rejects SELECT on /ksql and directs clients to
    /query (ADVICE r03) — a ported curl script must get a loud
    statement_error, not a result-less SUCCESS."""
    status, body = _post(
        server.url + "/ksql", {"ksql": "SELECT MEMBER_ID FROM SCORES_15M;"}
    )
    assert status == 400
    err = json.loads(body)
    assert err["@type"] == "statement_error"
    assert "/query" in err["message"]


def test_pull_query_streams_chunked(server):
    """The /query response is chunked (toLocalIterator-fed), not a
    single Content-Length body materialized from collect()."""
    req = urllib.request.Request(
        server.url + "/query",
        data=json.dumps({"ksql": "SELECT MEMBER_ID, N FROM SCORES_15M;"}).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=30) as resp:
        assert resp.status == 200
        assert resp.headers.get("Transfer-Encoding") == "chunked"
        assert resp.headers.get("Content-Length") is None
        lines = [json.loads(x) for x in resp.read().decode().strip().splitlines()]
    assert "schema" in lines[0]["header"]
    assert len(lines) > 1


def test_unknown_resource_404(server):
    status, _ = _post(server.url + "/nope", {"ksql": "SELECT 1"})
    assert status == 404
