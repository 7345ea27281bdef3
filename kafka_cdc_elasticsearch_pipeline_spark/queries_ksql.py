"""Gate queries that produce their result THROUGH the ksqlDB-dialect
translator (ksql/translate.py) — the statement path itself gets a
value-hash oracle row, not just unit tests.

The harness tables play the reference roles (FIXTURES.md §B): events ≙
the ratings stream (rowtime := ts), customer ≙ the CDC-fed dimension
(kafka_key := c_custkey). The DuckDB oracle recomputes the same result
relationally — if the translator mis-parses a clause, drops ROWTIME,
or breaks the latest-per-key TABLE reduce, the hash diverges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_cdc_elasticsearch_pipeline_spark.ksql import KsqlEngine
from kafka_cdc_elasticsearch_pipeline_spark.registry import query
from kafka_cdc_elasticsearch_pipeline_spark.sources.tables import load_table


def _engine(spark: SparkSession, sf_dir: str) -> KsqlEngine:
    events = load_table(spark, sf_dir, "events").withColumn("rowtime", F.col("ts"))
    customer = (
        load_table(spark, sf_dir, "customer")
        .withColumn("kafka_key", F.col("c_custkey").cast("string"))
        .withColumn("kafka_offset", F.col("c_custkey"))
        .withColumn("rowtime", F.lit("2024-01-01 00:00:00").cast("timestamp_ntz"))
    )
    eng = KsqlEngine(spark, {"events": events, "crm.customer": customer})
    eng.execute("CREATE STREAM EVENTS_S WITH (KAFKA_TOPIC='events', VALUE_FORMAT='JSON')")
    eng.execute(
        "CREATE TABLE CUSTOMERS (CUSTOMER_ID VARCHAR PRIMARY KEY)"
        " WITH (KAFKA_TOPIC='crm.customer', VALUE_FORMAT='AVRO')"
    )
    return eng


@query(
    "ksql_enrichment_via_translator",
    """
    SELECT e.event_id AS EVENT_ID, e.value AS VALUE,
           c.c_mktsegment AS CLUB_STATUS,
           c.c_name || ' ' || CAST(c.c_custkey AS VARCHAR) AS FULL_LABEL
    FROM events e
    LEFT JOIN customer c ON CAST(e.user_id AS VARCHAR) = CAST(c.c_custkey AS VARCHAR)
    WHERE lower(e.event_type) NOT LIKE '%err%' AND c.c_name IS NOT NULL
    """,
    tags=("ksql", "J1", "P3", "P4", "P6", "F"),
)
def ksql_enrichment_via_translator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's flagship enrichment CSAS executed from ksql
    STATEMENT TEXT (filter split → TABLE latest-per-key → LEFT join on
    CAST key → string-+ concat → IS NOT NULL), oracle-checked against
    the relational recomputation."""
    eng = _engine(spark, sf_dir)
    eng.execute(
        """
        CREATE STREAM LIVE AS
          SELECT * FROM EVENTS_S
          WHERE LCASE(EVENT_TYPE) NOT LIKE '%err%'
          EMIT CHANGES
        """
    )
    return eng.execute(
        """
        CREATE STREAM ENRICHED WITH (KAFKA_TOPIC='events-enriched') AS
          SELECT E.EVENT_ID, E.VALUE,
                 C.C_MKTSEGMENT AS CLUB_STATUS,
                 C.C_NAME + ' ' + CAST(C.C_CUSTKEY AS STRING) AS FULL_LABEL
          FROM LIVE E
          LEFT JOIN CUSTOMERS C ON CAST(E.USER_ID AS STRING) = C.CUSTOMER_ID
          WHERE C.C_NAME IS NOT NULL
          EMIT CHANGES
        """
    ).select("EVENT_ID", "VALUE", "CLUB_STATUS", "FULL_LABEL")


@query(
    "ksql_windowed_table_via_translator",
    """
    SELECT time_bucket(INTERVAL 15 MINUTES, ts) AS WINDOWSTART,
           user_id AS USER_ID, count(*) AS N_EVENTS
    FROM events
    WHERE lower(event_type) NOT LIKE '%err%'
    GROUP BY 1, 2
    """,
    tags=("ksql", "A1", "T3", "T4"),
)
def ksql_windowed_table_via_translator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's windowed CTAS (WINDOW TUMBLING + GROUP BY)
    executed from statement text; WINDOWSTART comes back as the
    epoch-aligned window start and must hash-match DuckDB's
    time_bucket."""
    eng = _engine(spark, sf_dir)
    eng.execute(
        "CREATE STREAM LIVE AS SELECT * FROM EVENTS_S"
        " WHERE LCASE(EVENT_TYPE) NOT LIKE '%err%' EMIT CHANGES"
    )
    return eng.execute(
        """
        CREATE TABLE PER_USER_15M AS
          SELECT USER_ID, COUNT(*) AS N_EVENTS
          FROM LIVE
          WINDOW TUMBLING (SIZE 15 MINUTE)
          GROUP BY USER_ID
          EMIT CHANGES
        """
    )

@query(
    "ksql_pull_query_epoch_via_translator",
    """
    WITH w AS (
      SELECT time_bucket(INTERVAL 15 MINUTES, ts) AS ws,
             user_id AS USER_ID, count(*) AS N_EVENTS
      FROM events
      WHERE lower(event_type) NOT LIKE '%err%'
      GROUP BY 1, 2
    )
    SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS WINDOW_START_TS,
           USER_ID, N_EVENTS
    FROM w
    WHERE USER_ID = 42 AND ws > epoch_ms(1705276800000)
    """,
    tags=("ksql", "T2", "T4", "F5"),
)
def ksql_pull_query_epoch_via_translator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's OTHER pull-query form — epoch-ms WINDOWSTART
    predicate over a materialized windowed table through the REST API
    (readme.md:589-597: ``WINDOWSTART >= 1593864000000``), alongside
    the string-literal form already covered
    (ksqldb-statements.sql:104-110). Exercises TIMESTAMPTOSTRING on the
    window key plus the translator's epoch-ms → timestamp_millis
    rewrite."""
    eng = _engine(spark, sf_dir)
    eng.execute(
        "CREATE STREAM LIVE AS SELECT * FROM EVENTS_S"
        " WHERE LCASE(EVENT_TYPE) NOT LIKE '%err%' EMIT CHANGES"
    )
    eng.execute(
        """
        CREATE TABLE PER_USER_15M AS
          SELECT USER_ID, COUNT(*) AS N_EVENTS
          FROM LIVE
          WINDOW TUMBLING (SIZE 15 MINUTE)
          GROUP BY USER_ID
          EMIT CHANGES
        """
    )
    return eng.execute(
        "SELECT TIMESTAMPTOSTRING(WINDOWSTART, 'yyyy-MM-dd HH:mm:ss')"
        " AS WINDOW_START_TS, USER_ID, N_EVENTS"
        " FROM PER_USER_15M"
        " WHERE USER_ID = 42 AND WINDOWSTART > 1705276800000"
    )
