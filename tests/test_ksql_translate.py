"""ksqlDB-dialect translator: run an original script written in the
reference's statement grammar (SURVEY §2 / ksqldb-statements.sql
SHAPES — same clauses, our own identifiers and data) and check every
derived relation against plain-DataFrame expectations."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from kafka_cdc_elasticsearch_pipeline_spark.ksql import KsqlEngine


def _ts(minutes: int) -> datetime.datetime:
    return datetime.datetime(2021, 3, 1, 9, 0) + datetime.timedelta(minutes=minutes)


@pytest.fixture(scope="module")
def engine(spark):
    reviews = spark.createDataFrame(
        [
            Row(
                review_id=i,
                member_id=i % 6,
                score=(i * 7) % 5 + 1,
                channel=["mobile", "kiosk", "qa-test-rig", "web"][i % 4],
                note=f"note {i}",
                rowtime=_ts(i * 4),
            )
            for i in range(48)
        ]
    )
    members_changes = spark.createDataFrame(
        [
            Row(
                first_name=fn,
                last_name=ln,
                tier=tier,
                kafka_key=str(mid),
                kafka_offset=off,
                rowtime=_ts(off),
            )
            for mid, fn, ln, tier, off in [
                (0, "Ada", "Lovelace", "standard", 0),
                (1, "Grace", "Hopper", "standard", 1),
                (2, "Edsger", "Dijkstra", "premier", 2),
                (3, "Barbara", "Liskov", "premier", 3),
                (4, "Alan", "Turing", "standard", 4),
                (0, "Ada", "Lovelace", "premier", 10),  # upgrade: last write wins
            ]
        ]
    )
    return KsqlEngine(
        spark, {"reviews": reviews, "crm.public.MEMBERS": members_changes}
    )


SCRIPT = """
SET 'auto.offset.reset' = 'earliest';

CREATE STREAM REVIEWS WITH (KAFKA_TOPIC='reviews', VALUE_FORMAT='JSON');

CREATE STREAM REVIEWS_CLEAN AS
  SELECT * FROM REVIEWS
  WHERE LCASE(CHANNEL) NOT LIKE '%test%'
  EMIT CHANGES;

CREATE STREAM REVIEWS_QA AS
  SELECT * FROM REVIEWS
  WHERE LCASE(CHANNEL) LIKE '%test%'
  EMIT CHANGES;

CREATE TABLE MEMBERS (MEMBER_ID INT PRIMARY KEY)
  WITH (KAFKA_TOPIC='crm.public.MEMBERS', VALUE_FORMAT='JSON');

CREATE STREAM REVIEWS_ENRICHED WITH (KAFKA_TOPIC='reviews-enriched') AS
  SELECT R.REVIEW_ID, R.SCORE, R.CHANNEL,
         M.TIER,
         M.FIRST_NAME + ' ' + M.LAST_NAME AS FULL_NAME
  FROM REVIEWS_CLEAN R
  LEFT JOIN MEMBERS M ON CAST(R.MEMBER_ID AS STRING) = CAST(M.MEMBER_ID AS STRING)
  WHERE M.FIRST_NAME IS NOT NULL
  EMIT CHANGES;

CREATE STREAM GRUMPY_PREMIER AS
  SELECT FULL_NAME, SCORE, CHANNEL
  FROM REVIEWS_ENRICHED
  WHERE SCORE < 3 AND TIER = 'premier'
  PARTITION BY FULL_NAME
  EMIT CHANGES;

CREATE TABLE REVIEWS_PER_MEMBER_PER_30MINUTE AS
  SELECT FULL_NAME, COUNT(*) AS REVIEW_COUNT, COLLECT_LIST(SCORE) AS SCORES
  FROM REVIEWS_ENRICHED
  WINDOW TUMBLING (SIZE 30 MINUTE)
  GROUP BY FULL_NAME
  EMIT CHANGES;
"""


@pytest.fixture(scope="module")
def ran(engine):
    engine.execute_script(SCRIPT)
    return engine


def test_set_property_recorded(ran):
    assert ran.properties["auto.offset.reset"] == "earliest"


def test_split_partitions_input(ran):
    total = ran.df("REVIEWS").count()
    clean, qa = ran.df("REVIEWS_CLEAN"), ran.df("REVIEWS_QA")
    assert clean.count() + qa.count() == total
    assert qa.count() == 12  # every 4th review is 'qa-test-rig'
    # star expansion hid nothing from the data columns
    assert "review_id" in [c.lower() for c in clean.columns]


def test_table_is_latest_per_key(ran):
    members = ran.df("MEMBERS")
    assert members.count() == 5
    ada = members.filter("MEMBER_ID = 0").collect()[0]
    assert ada.tier == "premier"  # offset-10 upgrade beat the seed row


def test_enrichment_join_and_concat(ran):
    enriched = ran.df("REVIEWS_ENRICHED")
    rows = enriched.collect()
    assert len(rows) == ran.df("REVIEWS_CLEAN").filter("member_id <= 4").count()
    names = {r.FULL_NAME for r in rows}
    assert "Ada Lovelace" in names and "Grace Hopper" in names


def test_filter_and_rekey(ran):
    grumpy = ran.df("GRUMPY_PREMIER").collect()
    assert len(grumpy) > 0
    assert all(r.SCORE < 3 for r in grumpy)
    assert {r.FULL_NAME for r in grumpy} <= {"Edsger Dijkstra", "Barbara Liskov", "Ada Lovelace"}


def test_windowed_aggregate_with_windowstart(ran, spark):
    agg = ran.df("REVIEWS_PER_MEMBER_PER_30MINUTE")
    cols = [c.upper() for c in agg.columns]
    assert cols[:1] == ["WINDOWSTART"]
    # totals across windows == enriched row count
    total = agg.agg(F.sum("REVIEW_COUNT")).collect()[0][0]
    assert total == ran.df("REVIEWS_ENRICHED").count()
    # windowstart aligns on the half hour
    for r in agg.select("WINDOWSTART").distinct().collect():
        assert r.WINDOWSTART.minute in (0, 30)


def test_transient_pull_query_with_windowstart_predicate(ran):
    got = ran.execute(
        "SELECT * FROM REVIEWS_PER_MEMBER_PER_30MINUTE"
        " WHERE WINDOWSTART > '2021-03-01 09:59:00' EMIT CHANGES"
    )
    rows = got.collect()
    assert len(rows) > 0
    assert all(r.WINDOWSTART >= datetime.datetime(2021, 3, 1, 10, 0) for r in rows)


def test_transient_push_query_with_limit(ran):
    got = ran.execute("SELECT REVIEW_ID, SCORE FROM REVIEWS_CLEAN EMIT CHANGES LIMIT 5")
    assert got.count() == 5


def test_timestamptostring_translation(ran):
    got = ran.execute(
        "SELECT TIMESTAMPTOSTRING(1593098400000, 'yyyy-MM-dd HH:mm:ss') AS T"
        " FROM REVIEWS_CLEAN LIMIT 1"
    ).collect()
    assert got[0].T == "2020-06-25 15:20:00"


def test_unsupported_statement_raises(ran):
    with pytest.raises(ValueError):
        ran.execute("PAUSE QUERY CSAS_REVIEWS_CLEAN_1")


CONNECTOR_SCRIPT = """
CREATE SOURCE CONNECTOR CRM_SOURCE WITH (
    'connector.class' = 'io.debezium.connector.mysql.MySqlConnector',
    'database.server.name' = 'crm',
    'table.whitelist' = 'public.MEMBERS');

CREATE SINK CONNECTOR REVIEWS_TO_ES WITH (
    'connector.class' = 'io.confluent.connect.elasticsearch.ElasticsearchSinkConnector',
    'topics' = 'reviews-enriched',
    'connection.url' = 'http://elastic.test:9200',
    'key.ignore' = 'true',
    'errors.tolerance' = 'all');
"""


def test_connectors_register_and_show(ran):
    ran.execute_script(CONNECTOR_SCRIPT)
    shown = {r.name: r.type for r in ran.execute("SHOW CONNECTORS").collect()}
    assert shown == {"CRM_SOURCE": "source", "REVIEWS_TO_ES": "sink"}
    streams = {r.name for r in ran.execute("SHOW STREAMS").collect()}
    assert "REVIEWS_ENRICHED" in streams and "REVIEWS_CLEAN" in streams
    tables = {r.name for r in ran.execute("SHOW TABLES").collect()}
    assert "MEMBERS" in tables
    desc = {r.column: r.role for r in ran.execute("DESCRIBE MEMBERS").collect()}
    assert desc.get("MEMBER_ID") == "KEY"


def test_sink_connector_bulk_indexes_through_transport(ran, tmp_path):
    import json
    import os

    capture_dir = str(tmp_path)

    def transport(url, body):
        import uuid

        with open(os.path.join(capture_dir, f"{uuid.uuid4().hex}.ndjson"), "w") as f:
            f.write(url + "\n" + body)
        n = len(body.strip().splitlines()) // 2
        return 200, json.dumps(
            {"errors": False, "items": [{"index": {"status": 201}} for _ in range(n)]}
        )

    ran.execute_script(CONNECTOR_SCRIPT)
    indexed = ran.run_sink_connectors(transport=transport)
    assert indexed == {"reviews-enriched": ran.df("REVIEWS_ENRICHED").count()}
    docs = 0
    for fn in os.listdir(capture_dir):
        with open(os.path.join(capture_dir, fn)) as f:
            lines = f.read().strip().splitlines()
        assert lines[0].endswith("/_bulk")
        actions = [json.loads(x) for x in lines[1::2]]
        # key.ignore=true -> auto ids, no _id in the action line
        assert all("_id" not in a["index"] for a in actions)
        docs += len(actions)
    assert docs == indexed["reviews-enriched"]


def test_hopping_window_grammar(ran):
    df = ran.execute(
        "CREATE TABLE HOP_30_15 AS SELECT FULL_NAME, COUNT(*) AS N"
        " FROM REVIEWS_ENRICHED WINDOW HOPPING (SIZE 30 MINUTE, ADVANCE BY 15 MINUTE)"
        " GROUP BY FULL_NAME EMIT CHANGES"
    )
    # every event lands in exactly 2 hopping windows
    total = df.agg(F.sum("N")).collect()[0][0]
    assert total == 2 * ran.df("REVIEWS_ENRICHED").count()


def test_session_window_grammar(ran):
    df = ran.execute(
        "CREATE TABLE SESS_10 AS SELECT FULL_NAME, COUNT(*) AS N"
        " FROM REVIEWS_ENRICHED WINDOW SESSION (10 MINUTES)"
        " GROUP BY FULL_NAME EMIT CHANGES"
    )
    cols = [c.upper() for c in df.columns]
    assert cols[:2] == ["WINDOWSTART", "WINDOWEND"]
    total = df.agg(F.sum("N")).collect()[0][0]
    assert total == ran.df("REVIEWS_ENRICHED").count()


def test_insert_into_appends(ran, spark):
    engine = ran
    engine.execute(
        "CREATE STREAM INS_TARGET AS SELECT REVIEW_ID, SCORE FROM REVIEWS_CLEAN"
        " WHERE SCORE >= 4 EMIT CHANGES"
    )
    before = engine.df("INS_TARGET").count()
    engine.execute(
        "INSERT INTO INS_TARGET SELECT REVIEW_ID, SCORE FROM REVIEWS_CLEAN"
        " WHERE SCORE = 1"
    )
    after = engine.df("INS_TARGET").count()
    ones = engine.df("REVIEWS_CLEAN").filter("score = 1").count()
    assert after == before + ones and ones > 0


def test_drop_and_explain(ran):
    engine = ran
    engine.execute("CREATE STREAM DROP_ME AS SELECT REVIEW_ID FROM REVIEWS_CLEAN")
    assert "drop_me" in engine.relations
    engine.execute("DROP STREAM DROP_ME")
    assert "drop_me" not in engine.relations
    plan = engine.execute("EXPLAIN SELECT COUNT(*) AS N FROM REVIEWS_CLEAN").collect()
    assert any("Physical Plan" in r.plan for r in plan)
    assert engine.execute("TERMINATE ALL") is None


def test_stream_stream_within_join(ran):
    """JOIN ... WITHIN: each review correlates only with reviews of the
    SAME member within the time band."""
    df = ran.execute(
        "CREATE STREAM NEARBY AS"
        " SELECT A.REVIEW_ID AS LEFT_ID, B.REVIEW_ID AS RIGHT_ID"
        " FROM REVIEWS_CLEAN A JOIN REVIEWS_CLEAN B WITHIN 30 MINUTES"
        " ON A.MEMBER_ID = B.MEMBER_ID"
        " WHERE A.REVIEW_ID < B.REVIEW_ID EMIT CHANGES"
    )
    rows = df.collect()
    assert len(rows) > 0
    # verify the band against a hand-computed expectation
    base = {r.review_id: (r.member_id, r.rowtime) for r in ran.df("REVIEWS_CLEAN")
            .select("review_id", "member_id", "rowtime").collect()}
    import datetime

    for r in rows:
        (m1, t1), (m2, t2) = base[r.LEFT_ID], base[r.RIGHT_ID]
        assert m1 == m2
        assert abs(t1 - t2) <= datetime.timedelta(minutes=30)
    expected = sum(
        1
        for a, (m1, t1) in base.items()
        for b, (m2, t2) in base.items()
        if a < b and m1 == m2 and abs(t1 - t2) <= datetime.timedelta(minutes=30)
    )
    assert len(rows) == expected


def test_comment_stripping_preserves_quoted_dashes():
    """'--' inside a quoted literal (connector URLs, messages) is data,
    not a comment; real comments still go."""
    from kafka_cdc_elasticsearch_pipeline_spark.ksql.translate import (
        parse_with_props,
        split_statements,
        strip_comments,
    )

    script = (
        "-- leading comment\n"
        "CREATE SINK CONNECTOR SINK_ES WITH (\n"
        "  'connector.class' = 'ElasticsearchSinkConnector', -- trailing\n"
        "  'connection.url'  = 'http://es--blue-green:9200/a--b'\n"
        ");\n"
    )
    stmts = split_statements(script)
    assert len(stmts) == 1
    props = parse_with_props(stmts[0])
    assert props["CONNECTION.URL"] == "http://es--blue-green:9200/a--b"
    assert "trailing" not in stmts[0]
    assert strip_comments("SELECT '--not a comment' -- real\n") == (
        "SELECT '--not a comment' \n"
    )


def test_with_props_paren_inside_quoted_value():
    from kafka_cdc_elasticsearch_pipeline_spark.ksql.translate import parse_with_props

    stmt = (
        "CREATE STREAM X WITH (KAFKA_TOPIC='t', "
        "'doc.note' = 'half) closed (paren', VALUE_FORMAT='JSON') AS SELECT 1"
    )
    props = parse_with_props(stmt)
    assert props["DOC.NOTE"] == "half) closed (paren"
    assert props["VALUE_FORMAT"] == "JSON"


def test_insert_into_table_raises(ran):
    """ksqlDB permits INSERT INTO streams only; appending to a TABLE
    would break its latest-per-key invariant."""
    with pytest.raises(ValueError, match="INSERT INTO a TABLE"):
        ran.execute("INSERT INTO MEMBERS SELECT * FROM REVIEWS_CLEAN")


def test_sink_connector_reports_acknowledged_count_only(ran, tmp_path):
    """'rows indexed' = docs the bulk API acknowledged, not a separate
    count() re-execution: with errors.tolerance=all and a transport that
    rejects every other doc, the reported count is the acked subset."""
    import json as _json

    def flaky_transport(url, body):
        lines = body.strip().splitlines()
        items = []
        for doc_line in lines[1::2]:  # source docs (action/source pairs)
            doc = _json.loads(doc_line)
            ok = doc["REVIEW_ID"] % 2 == 0  # reject odd ids, deterministic
            items.append({"index": {"status": 201 if ok else 400}})
        return 200, _json.dumps({"errors": True, "items": items})

    engine = ran
    engine.execute_script(CONNECTOR_SCRIPT)
    indexed = engine.run_sink_connectors(transport=flaky_transport)
    expected = engine.df("REVIEWS_ENRICHED").filter("REVIEW_ID % 2 = 0").count()
    total = engine.df("REVIEWS_ENRICHED").count()
    assert indexed["reviews-enriched"] == expected
    assert 0 < expected < total
