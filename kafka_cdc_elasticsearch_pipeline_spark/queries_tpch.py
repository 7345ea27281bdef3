"""Scale workloads: the remaining TPC-H query shapes (Q2,Q4,Q6,Q8-Q17,
Q19-Q22), adapted to the harness's reduced star schema.

Round 1 shipped Q1/Q3/Q5/Q7/Q18 (queries_core.py); this module
completes the suite so the engine demonstrates every TPC-H plan shape:
correlated min (Q2), EXISTS semi-join (Q4), selective scan-agg (Q6),
market-share CASE ratio (Q8), multi-dim profit rollup (Q9), top-k
group (Q10), HAVING over global scalar (Q11), CASE pivot counts (Q12),
outer-join histogram (Q13), conditional ratio (Q14), argmax-by-scalar
(Q15), distinct-count with NOT IN (Q16), correlated avg filter (Q17),
OR-of-ANDs pushdown (Q19), nested semi-join chain (Q20), last-shipper
multi-join (Q21), anti-join over scalar threshold (Q22).

Schema adaptations (the harness tables lack partsupp, l_commitdate /
l_receiptdate / l_shipmode / l_shipinstruct, c_phone, p_container,
p_mfgr):
- part-supplier relation := DISTINCT (l_partkey, l_suppkey) from
  lineitem; "supplycost" := min observed unit price (Q2, Q16, Q20);
- "late shipment" := l_shipdate > o_orderdate + 60 days (Q4, Q21's
  "kept orders waiting" := supplier shipped at the order's max
  shipdate in a multi-supplier order);
- l_returnflag stands in for l_shipmode's role as the low-cardinality
  pivot axis (Q12, Q19's AND-leg);
- cntrycode := c_nationkey, "no recent orders" := none since 2000
  (Q22 — every customer has SOME order in the synthetic data).

Determinism contract (registry.py): money math through exact DECIMAL
sums cast once to double; ratios divide two exact-decimal-derived
doubles; per-row double arithmetic (unit prices) is IEEE-identical
across engines; every LIMIT carries a unique total order.

100 TB notes per query live in the docstrings; the common theme: dims
(region/nation/supplier/part/customer at their TPC-H proportions)
broadcast, the single big shuffle is lineitem on l_orderkey /
l_partkey, pre-aggregation happens before every join where the group
key is the join key, and no correlated subquery executes per-row —
each is rewritten as a broadcast scalar or an equi-join on the
grouping key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_cdc_elasticsearch_pipeline_spark.operators.caching import reuse
from kafka_cdc_elasticsearch_pipeline_spark.operators.relational import topk
from kafka_cdc_elasticsearch_pipeline_spark.registry import query
from kafka_cdc_elasticsearch_pipeline_spark.sources.tables import load_table


def _dec2(c: str):
    return F.col(c).cast("decimal(18,2)")


def _disc_price():
    """l_extendedprice * (1 - l_discount) with exact decimal math."""
    one = F.lit(1).cast("decimal(8,4)")
    return _dec2("l_extendedprice") * (one - F.col("l_discount").cast("decimal(8,4)"))


_SQL_DISC_PRICE = (
    "CAST(l_extendedprice AS DECIMAL(18,2))"
    " * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4)))"
)


def _ts(s: str):
    return F.lit(s).cast("timestamp_ntz")


# --------------------------------------------------------------------------
# Q2 — minimum-cost supplier (correlated MIN rewritten as equi-join)
# --------------------------------------------------------------------------


@query(
    "tpch_q2_min_cost_supplier",
    """
    WITH ps AS (
      SELECT l_partkey, l_suppkey,
             min(round(l_extendedprice / l_quantity, 4)) AS unit_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    eps AS (
      SELECT ps.l_partkey, ps.unit_cost, s.s_name, s.s_acctbal, n.n_name
      FROM ps
      JOIN supplier s ON ps.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'EUROPE'
    )
    SELECT round(e.s_acctbal, 2) AS s_acctbal, e.s_name AS s_name,
           e.n_name AS n_name, p.p_partkey AS p_partkey, p.p_name AS p_name,
           e.unit_cost AS unit_cost
    FROM part p JOIN eps e ON p.p_partkey = e.l_partkey
    WHERE p.p_type = 'LARGE' AND p.p_size BETWEEN 10 AND 20
      AND e.unit_cost = (SELECT min(e2.unit_cost) FROM eps e2
                         WHERE e2.l_partkey = p.p_partkey)
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
    tags=("scale", "J", "A"),
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: cheapest qualified supplier per part.

    The part-supplier catalog is derived (no partsupp table): per
    (part, supplier) the minimum observed unit price from lineitem.
    The correlated `= (SELECT min ...)` is rewritten as a broadcast
    equi-join against the per-part MIN — one pass, no per-row subquery.
    At 100 TB the ps aggregation is the only lineitem shuffle
    (partkey+suppkey keys); everything downstream is dim-sized and
    broadcasts.
    """
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "LARGE") & F.col("p_size").between(10, 20)
    )

    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.round(F.col("l_extendedprice") / F.col("l_quantity"), 4)).alias(
            "unit_cost"
        )
    )
    edim = supp.join(
        F.broadcast(nat.join(F.broadcast(reg), nat["n_regionkey"] == reg["r_regionkey"])),
        supp["s_nationkey"] == F.col("n_nationkey"),
    ).select("s_suppkey", "s_name", "s_acctbal", "n_name")
    eps = ps.join(F.broadcast(edim), ps["l_suppkey"] == F.col("s_suppkey")).select(
        "l_partkey", "unit_cost", "s_name", "s_acctbal", "n_name"
    )
    # Correlated MIN as a window over the per-part partition: one pass
    # over eps instead of re-aggregating and equi-joining it back
    # (which re-ran the whole lineitem aggregation a second time).
    from pyspark.sql import Window

    w_min = Window.partitionBy("l_partkey")
    best = eps.withColumn("min_cost", F.min("unit_cost").over(w_min)).filter(
        F.col("unit_cost") == F.col("min_cost")
    )
    out = best.join(F.broadcast(part), best["l_partkey"] == part["p_partkey"]).select(
        F.round(F.col("s_acctbal"), 2).alias("s_acctbal"),
        "s_name",
        "n_name",
        "p_partkey",
        "p_name",
        "unit_cost",
    )
    return topk(
        out,
        [
            F.col("s_acctbal").desc(),
            F.col("n_name").asc(),
            F.col("s_name").asc(),
            F.col("p_partkey").asc(),
        ],
        100,
    )


# --------------------------------------------------------------------------
# Q4 — order priority checking (EXISTS -> left-semi join)
# --------------------------------------------------------------------------


@query(
    "tpch_q4_order_priority",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    """,
    tags=("scale", "J", "A"),
)
def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS over lineitem as a LEFT SEMI join.

    "Late" := any line shipped >60 days after order date (the harness
    has no commit/receipt dates). The semi-join shuffles both sides on
    orderkey once and keeps at most one match per order — no fan-out,
    dedup-free. The date filter prunes the orders scan at the source.
    """
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1997-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1997-04-01 00:00:00"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (orders["o_orderkey"] == li["l_orderkey"])
        & (li["l_shipdate"] > orders["o_orderdate"] + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


# --------------------------------------------------------------------------
# Q6 — forecasting revenue change (pure scan-agg, full pushdown)
# --------------------------------------------------------------------------


@query(
    "tpch_q6_forecast_revenue",
    """
    SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                          * CAST(l_discount AS DECIMAL(8,4))) AS DOUBLE), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    tags=("scale", "A"),
    bench=True,
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: the canonical predicate-pushdown probe.

    No join, no group key — a single scan whose three filters must all
    reach the parquet reader (PushedFilters) with a 3-column ReadSchema,
    then one partial+final agg. At 100 TB this is the query where scan
    pruning IS the runtime; everything else is noise.
    """
    # spread=False: a single global agg — the pushed-down scan feeds
    # the partial sum directly and the one-row exchange is free; the
    # parallelism round-robin shipped the surviving rows an extra time
    # (r15 A/B: 0.30—0.37s → 0.25—0.31s).
    li = load_table(spark, sf_dir, "lineitem", spread=False).filter(
        (F.col("l_shipdate") >= _ts("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1998-01-01 00:00:00"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.round(
            F.sum(_dec2("l_extendedprice") * F.col("l_discount").cast("decimal(8,4)")).cast(
                "double"
            ),
            2,
        ).alias("revenue")
    )


# --------------------------------------------------------------------------
# Q8 — national market share (CASE ratio over two exact sums)
# --------------------------------------------------------------------------


@query(
    "tpch_q8_market_share",
    """
    SELECT o_year,
           round(CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume
                               ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                 / CAST(sum(volume) AS DOUBLE), 6) AS mkt_share
    FROM (
      SELECT year(o.o_orderdate) AS o_year,
             {disc_price} AS volume,
             n2.n_name AS supp_nation
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
      JOIN region r ON n1.n_regionkey = r.r_regionkey
      JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
      WHERE r.r_name = 'AMERICA'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        AND p.p_type = 'ECONOMY'
    )
    GROUP BY o_year
    """.format(disc_price=_SQL_DISC_PRICE),
    tags=("scale", "J", "A"),
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: NATION_3's share of AMERICA-customer ECONOMY-part
    volume per order year.

    Both the numerator (CASE-guarded) and denominator are exact DECIMAL
    sums computed in ONE aggregation pass; the ratio divides the two
    resulting doubles (bit-identical across engines). Dims all
    broadcast; lineitem joins orders on the one big shuffle key.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1998-01-01 00:00:00"))
    )
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    supp = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")

    cust_dim = cust.join(
        F.broadcast(
            nat.join(F.broadcast(reg), nat["n_regionkey"] == reg["r_regionkey"]).select(
                F.col("n_nationkey").alias("cn_key")
            )
        ),
        cust["c_nationkey"] == F.col("cn_key"),
    ).select("c_custkey")
    supp_dim = supp.join(
        F.broadcast(nat.select("n_nationkey", F.col("n_name").alias("supp_nation"))),
        supp["s_nationkey"] == F.col("n_nationkey"),
    ).select("s_suppkey", "supp_nation")

    joined = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust_dim), orders["o_custkey"] == F.col("c_custkey"))
        .join(F.broadcast(supp_dim), li["l_suppkey"] == F.col("s_suppkey"))
    )
    zero = F.lit(0).cast("decimal(18,2)")
    vol = _disc_price()
    return (
        joined.select(
            F.year("o_orderdate").alias("o_year"),
            vol.alias("volume"),
            F.col("supp_nation"),
        )
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_3", F.col("volume")).otherwise(
                        zero
                    )
                ).cast("double")
                / F.sum("volume").cast("double"),
                6,
            ).alias("mkt_share")
        )
    )


# --------------------------------------------------------------------------
# Q9 — product-type profit measure (multi-dim rollup by nation x year)
# --------------------------------------------------------------------------


@query(
    "tpch_q9_product_profit",
    """
    SELECT nation, o_year, round(CAST(sum(amount) AS DOUBLE), 2) AS sum_profit
    FROM (
      SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
             CAST(round(l.l_extendedprice * (1 - l.l_discount)
                        - 0.1 * p.p_retailprice * l.l_quantity, 4)
                  AS DECIMAL(18,4)) AS amount
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      WHERE p.p_name LIKE '%widget%'
    )
    GROUP BY nation, o_year
    """,
    tags=("scale", "J", "A", "F"),
)
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit on 'widget' parts by supplier nation and
    order year. "Cost" is modeled as 10% of retail price per unit (no
    partsupp.ps_supplycost in the harness schema).

    Per-row profit is computed in double (IEEE-identical both engines),
    rounded to a fixed scale, then summed EXACTLY as DECIMAL so the
    aggregate is reduction-order-free. part filter broadcasts into the
    lineitem scan; the orders join is the one big shuffle.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    nat = load_table(spark, sf_dir, "nation")

    supp_dim = supp.join(
        F.broadcast(nat.select("n_nationkey", F.col("n_name").alias("nation"))),
        supp["s_nationkey"] == F.col("n_nationkey"),
    ).select("s_suppkey", "nation")
    amount = F.round(
        F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
        - F.lit(0.1) * F.col("p_retailprice") * F.col("l_quantity"),
        4,
    ).cast("decimal(18,4)")
    joined = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(F.broadcast(supp_dim), li["l_suppkey"] == F.col("s_suppkey"))
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
    )
    return (
        joined.select(
            "nation", F.year("o_orderdate").alias("o_year"), amount.alias("amount")
        )
        .groupBy("nation", "o_year")
        .agg(F.round(F.sum("amount").cast("double"), 2).alias("sum_profit"))
    )


# --------------------------------------------------------------------------
# Q10 — returned-item reporting (top 20 customers by lost revenue)
# --------------------------------------------------------------------------


@query(
    "tpch_q10_returned_items",
    """
    SELECT c.c_custkey AS c_custkey, c.c_name AS c_name,
           round(CAST(sum({disc_price}) AS DOUBLE), 2) AS revenue,
           round(c.c_acctbal, 2) AS c_acctbal, n.n_name AS n_name
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """.format(disc_price=_SQL_DISC_PRICE),
    tags=("scale", "J", "A", "L"),
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: customers who returned the most revenue in a half-year.

    The returnflag + date filters push to the two fact scans before the
    orderkey shuffle; the customer/nation dims broadcast AFTER the
    aggregation (group key is c_custkey — aggregate first on the small
    key, then enrich 20... no: enrichment columns are group keys, so
    aggregate on custkey alone would need a re-join anyway; since
    customer is dim-sized it broadcasts pre-agg at no shuffle cost).
    Top-20 via TakeOrderedAndProject with custkey tiebreak.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1997-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1997-07-01 00:00:00"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nat = load_table(spark, sf_dir, "nation")
    joined = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nat), cust["c_nationkey"] == nat["n_nationkey"])
    )
    agg = joined.groupBy(
        "c_custkey", "c_name", "c_acctbal", "n_name"
    ).agg(F.round(F.sum(_disc_price()).cast("double"), 2).alias("revenue"))
    out = agg.select(
        "c_custkey",
        "c_name",
        "revenue",
        F.round(F.col("c_acctbal"), 2).alias("c_acctbal"),
        "n_name",
    )
    return topk(out, [F.col("revenue").desc(), F.col("c_custkey").asc()], 20)


# --------------------------------------------------------------------------
# Q11 — important stock identification (HAVING vs global scalar)
# --------------------------------------------------------------------------


@query(
    "tpch_q11_important_stock",
    """
    WITH val AS (
      SELECT l.l_partkey,
             sum({disc_price}) AS v
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      WHERE n.n_name IN ('NATION_7', 'NATION_12')
      GROUP BY l.l_partkey
    )
    SELECT l_partkey AS p_partkey, round(CAST(v AS DOUBLE), 2) AS part_value
    FROM val
    WHERE CAST(v AS DOUBLE) > (SELECT CAST(sum(v) AS DOUBLE) * 0.001 FROM val)
    """.format(disc_price=_SQL_DISC_PRICE),
    tags=("scale", "J", "A"),
)
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose traded value from two nations'
    suppliers exceeds 0.1% of the total.

    The global scalar (total value) is a second aggregation over the
    SAME per-part aggregate — not a second scan — and reaches the
    filter as a 1-row broadcast cross-join. Both sides of the ">"
    compare doubles derived from exact decimal sums.
    """
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_7", "NATION_12")
    )
    supp_dim = supp.join(
        F.broadcast(nat), supp["s_nationkey"] == nat["n_nationkey"]
    ).select("s_suppkey")
    val = (
        li.join(F.broadcast(supp_dim), li["l_suppkey"] == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(_disc_price()).alias("v"))
        .transform(reuse)
    )
    threshold = val.agg((F.sum("v").cast("double") * F.lit(0.001)).alias("thr"))
    out = (
        val.crossJoin(F.broadcast(threshold))
        .filter(F.col("v").cast("double") > F.col("thr"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.round(F.col("v").cast("double"), 2).alias("part_value"),
        )
    )
    return out


# --------------------------------------------------------------------------
# Q12 — shipping classes (CASE pivot counts over a fact join)
# --------------------------------------------------------------------------


@query(
    "tpch_q12_priority_classes",
    """
    SELECT l.l_returnflag AS l_returnflag,
           sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
           sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END)::BIGINT AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_returnflag IN ('R', 'A')
      AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l.l_returnflag
    """,
    tags=("scale", "J", "A"),
)
def tpch_q12_priority_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: per return class (standing in for ship mode),
    how many lines belong to high- vs low-priority orders.

    The CASE pivot folds into ONE aggregation pass (two conditional
    counts) after the one orderkey shuffle; the returnflag+date filters
    push into the lineitem scan, cutting the shuffle's build input.
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag").isin("R", "A")
        & (F.col("l_shipdate") >= _ts("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1998-01-01 00:00:00"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    joined = li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
    return joined.groupBy("l_returnflag").agg(
        F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
        F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
    )


# --------------------------------------------------------------------------
# Q13 — customer order-count distribution (outer join histogram)
# --------------------------------------------------------------------------


@query(
    "tpch_q13_customer_distribution",
    """
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '5-LOW'
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
    tags=("scale", "J", "A"),
)
def tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: histogram of orders-per-customer, keeping 0-order
    customers via the LEFT join (the join predicate's extra condition
    must NOT become a post-join filter, or the NULL rows vanish).

    Two-level aggregation: the first groups on the join key itself (so
    AQE can fold join+agg into one exchange); the second is tiny
    (distinct order counts).
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "5-LOW"
    )
    per_cust = (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left")
        .groupBy(cust["c_custkey"])
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# --------------------------------------------------------------------------
# Q14 — promotion effect (conditional revenue ratio)
# --------------------------------------------------------------------------


@query(
    "tpch_q14_promo_effect",
    """
    SELECT round(100.0 * CAST(sum(CASE WHEN p.p_type = 'PROMO'
                                       THEN {disc_price}
                                       ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                 / CAST(sum({disc_price}) AS DOUBLE), 6) AS promo_revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1997-10-01 00:00:00'
    """.format(disc_price=_SQL_DISC_PRICE),
    tags=("scale", "J", "A"),
)
def tpch_q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: PROMO parts' share of one month's revenue.

    Single broadcast join (part is the small side), one agg pass with
    a CASE-guarded and an unguarded exact-decimal sum, ratio in double.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-09-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1997-10-01 00:00:00"))
    )
    part = load_table(spark, sf_dir, "part")
    zero = F.lit(0).cast("decimal(18,2)")
    joined = li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
    return joined.agg(
        F.round(
            F.lit(100.0)
            * F.sum(F.when(F.col("p_type") == "PROMO", _disc_price()).otherwise(zero)).cast(
                "double"
            )
            / F.sum(_disc_price()).cast("double"),
            6,
        ).alias("promo_revenue")
    )


# --------------------------------------------------------------------------
# Q15 — top supplier (argmax against a broadcast scalar)
# --------------------------------------------------------------------------


@query(
    "tpch_q15_top_supplier",
    """
    WITH rev AS (
      SELECT l_suppkey,
             sum({disc_price}) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey AS s_suppkey, s.s_name AS s_name,
           round(CAST(r.total_revenue AS DOUBLE), 2) AS total_revenue
    FROM supplier s JOIN rev r ON s.s_suppkey = r.l_suppkey
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM rev)
    """.format(disc_price=_SQL_DISC_PRICE),
    tags=("scale", "J", "A"),
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: the supplier(s) with maximum quarterly revenue.

    The view is one lineitem aggregation (suppkey keys — tiny); the
    scalar max broadcasts back over it (exact DECIMAL equality, so
    ties surface exactly as the SQL does). supplier joins broadcast.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1997-04-01 00:00:00"))
    )
    supp = load_table(spark, sf_dir, "supplier")
    rev = reuse(
        li.groupBy("l_suppkey").agg(F.sum(_disc_price()).alias("total_revenue"))
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp["s_suppkey"])
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("total_revenue").cast("double"), 2).alias("total_revenue"),
        )
    )


# --------------------------------------------------------------------------
# Q16 — supplier diversity per part class (distinct count + NOT IN)
# --------------------------------------------------------------------------


@query(
    "tpch_q16_part_supplier_diversity",
    """
    SELECT p.p_brand AS p_brand, p.p_type AS p_type, p.p_size AS p_size,
           count(DISTINCT ps.l_suppkey) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
    JOIN part p ON p.p_partkey = ps.l_partkey
    WHERE p.p_brand <> 'Brand#5'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 4, 9, 14, 23, 36, 45, 49)
      AND ps.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
    tags=("scale", "J", "A"),
)
def tpch_q16_part_supplier_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many distinct (credit-worthy) suppliers
    serve each qualifying part class; the complaint-supplier NOT IN
    becomes a LEFT ANTI join (no NULL suppkeys exist, so the semantics
    coincide).

    The part-supplier catalog is the DISTINCT projection of lineitem —
    at 100 TB that distinct is the dominant shuffle and runs on exactly
    the two join/group columns (partial dedup map-side first).
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 23, 36, 45, 49)
    )
    bad_supp = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    ps = (
        li.select("l_partkey", "l_suppkey")
        .distinct()
        .join(F.broadcast(bad_supp), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
    )
    return (
        ps.join(F.broadcast(part), ps["l_partkey"] == part["p_partkey"])
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# --------------------------------------------------------------------------
# Q17 — small-quantity-order revenue (correlated AVG -> equi-join)
# --------------------------------------------------------------------------


@query(
    "tpch_q17_small_quantity_revenue",
    """
    WITH pq AS (
      SELECT l_partkey,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
               / count(*) AS avg_qty
      FROM lineitem GROUP BY l_partkey
    )
    SELECT round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                 / 7.0, 2) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN pq ON pq.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#5'
      AND l.l_quantity < 0.2 * pq.avg_qty
    """,
    tags=("scale", "J", "A"),
)
def tpch_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue lost to small orders, with the correlated
    per-part AVG rewritten as a pre-aggregated equi-join (one lineitem
    shuffle on partkey serves both the aggregate and the probe).

    The average is computed as exact-decimal-sum / count in double so
    both engines derive the identical threshold; the 0.2x comparison is
    then per-row IEEE arithmetic.

    Single-scan plan: the brand filter is keyed by p_partkey, and the
    per-part average only ever feeds rows of that same part — so the
    broadcast semi-reduction to Brand#5 lineitems happens FIRST, then
    ONE window over l_partkey yields the threshold (the textbook
    agg-then-join shape scans lineitem twice; the oracle keeps it and
    must match).
    """
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#5")
    branded = li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
    w = Window.partitionBy("l_partkey")
    avg_qty = (
        F.sum(_dec2("l_quantity")).over(w).cast("double")
        / F.count(F.lit(1)).over(w)
    )
    small = branded.withColumn("avg_qty", avg_qty).filter(
        F.col("l_quantity") < F.lit(0.2) * F.col("avg_qty")
    )
    return small.agg(
        F.round(
            F.sum(_dec2("l_extendedprice")).cast("double") / F.lit(7.0), 2
        ).alias("avg_yearly")
    )


# --------------------------------------------------------------------------
# Q19 — discounted revenue (OR-of-ANDs predicate pushdown)
# --------------------------------------------------------------------------


@query(
    "tpch_q19_discounted_revenue",
    """
    SELECT round(CAST(sum({disc_price}) AS DOUBLE), 2) AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity >= 1 AND l.l_quantity <= 11
           AND l.l_returnflag = 'N')
       OR (p.p_brand = 'Brand#14' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity >= 10 AND l.l_quantity <= 20
           AND l.l_returnflag = 'N')
       OR (p.p_brand = 'Brand#16' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 20 AND l.l_quantity <= 30
           AND l.l_returnflag = 'N')
    """.format(disc_price=_SQL_DISC_PRICE),
    tags=("scale", "J", "F"),
)
def tpch_q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: three brand/size/quantity bands OR-ed together.

    The single-table conjuncts common to all branches (returnflag,
    quantity range 1..30, the brand set) are factored out so they push
    into the scans BEFORE the join; the residual OR evaluates on the
    joined row. Part broadcasts.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_returnflag") == "N")
        & (F.col("l_quantity") >= 1)
        & (F.col("l_quantity") <= 30)
    )
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand").isin("Brand#12", "Brand#14", "Brand#16")
        & (F.col("p_size") >= 1)
    )
    qty, size, brand = F.col("l_quantity"), F.col("p_size"), F.col("p_brand")
    branch = (
        ((brand == "Brand#12") & size.between(1, 5) & qty.between(1, 11))
        | ((brand == "Brand#14") & size.between(1, 10) & qty.between(10, 20))
        | ((brand == "Brand#16") & size.between(1, 15) & qty.between(20, 30))
    )
    joined = li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"]).filter(
        branch
    )
    return joined.agg(
        F.round(F.sum(_disc_price()).cast("double"), 2).alias("revenue")
    )


# --------------------------------------------------------------------------
# Q20 — potential part promotion (nested semi-join chain)
# --------------------------------------------------------------------------


@query(
    "tpch_q20_part_promotion",
    """
    SELECT s.s_name AS s_name, round(s.s_acctbal, 2) AS s_acctbal
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE n.n_name = 'NATION_3'
      AND s.s_suppkey IN (
        SELECT l_suppkey FROM lineitem
        WHERE l_partkey IN (
          SELECT p_partkey FROM part WHERE p_name LIKE 'small%'
        )
        GROUP BY l_suppkey, l_partkey
        HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 60
      )
    ORDER BY s_name
    """,
    tags=("scale", "J", "A"),
)
def tpch_q20_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers in NATION_3 who moved >60 units of
    any 'small*' part (the availqty/supplycost leg has no harness
    twin). Two nested INs become semi-joins: part-filter semi-join
    into lineitem, then the HAVING aggregate's suppkey set semi-joins
    into supplier. Everything after the one lineitem aggregation is
    dim-sized.
    """
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    li = load_table(spark, sf_dir, "lineitem")

    qualifying = (
        li.join(F.broadcast(part.select("p_partkey")), li["l_partkey"] == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(_dec2("l_quantity")).alias("q"))
        .filter(F.col("q") > F.lit(60).cast("decimal(18,2)"))
        .select("l_suppkey")
        .distinct()
    )
    out = (
        supp.join(F.broadcast(nat), supp["s_nationkey"] == nat["n_nationkey"], "left_semi")
        .join(F.broadcast(qualifying), supp["s_suppkey"] == F.col("l_suppkey"), "left_semi")
        .select("s_name", F.round(F.col("s_acctbal"), 2).alias("s_acctbal"))
    )
    return out.orderBy("s_name")


# --------------------------------------------------------------------------
# Q21 — suppliers who kept orders waiting (last shipper in shared orders)
# --------------------------------------------------------------------------


@query(
    "tpch_q21_waiting_suppliers",
    """
    WITH order_ship AS (
      SELECT l_orderkey, max(l_shipdate) AS max_ship,
             count(DISTINCT l_suppkey) AS n_supp
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT s.s_name AS s_name, count(*) AS numwait
    FROM lineitem l
    JOIN order_ship os ON os.l_orderkey = l.l_orderkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    WHERE os.n_supp > 1
      AND l.l_shipdate = os.max_ship
      AND o.o_orderstatus = 'F'
    GROUP BY s.s_name
    ORDER BY numwait DESC, s_name
    LIMIT 25
    """,
    tags=("scale", "J", "A", "L"),
)
def tpch_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: in finished multi-supplier orders, count the
    lines where a supplier was the LAST to ship (the reference's
    receipt-vs-commit lateness has no harness columns; max-shipdate in
    a shared order is the analogous "everyone waited on you").

    The EXISTS/NOT EXISTS pair collapses into per-order window stats
    (max shipdate + distinct-supplier count): the per-order values are
    identical whether computed before or after the orderstatus
    semi-join (the order's line set doesn't change), so the semi-join
    runs FIRST and ONE windowed pass over l_orderkey replaces the
    aggregate-plus-probe-join double scan of lineitem.
    """
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    supp = load_table(spark, sf_dir, "supplier")
    finished = li.join(orders, li["l_orderkey"] == orders["o_orderkey"], "left_semi")
    w = Window.partitionBy("l_orderkey")
    stats = finished.select(
        "l_orderkey",
        "l_suppkey",
        "l_shipdate",
        F.max("l_shipdate").over(w).alias("max_ship"),
        F.size(F.collect_set("l_suppkey").over(w)).alias("n_supp"),
    )
    waiting = stats.filter(
        (F.col("n_supp") > 1) & (F.col("l_shipdate") == F.col("max_ship"))
    ).join(F.broadcast(supp), F.col("l_suppkey") == supp["s_suppkey"])
    agg = waiting.groupBy("s_name").agg(F.count(F.lit(1)).alias("numwait"))
    return topk(agg, [F.col("numwait").desc(), F.col("s_name").asc()], 25)


# --------------------------------------------------------------------------
# Q22 — global sales opportunity (anti-join over a scalar threshold)
# --------------------------------------------------------------------------


@query(
    "tpch_q22_sales_opportunity",
    """
    WITH avg_bal AS (
      SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
               / count(*) AS a
      FROM customer WHERE c_acctbal > 0.0
    ),
    recent AS (
      SELECT DISTINCT o_custkey FROM orders
      WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
    )
    SELECT c_nationkey AS cntrycode, count(*) AS numcust,
           round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 2)
             AS totacctbal
    FROM customer
    WHERE c_nationkey IN (1, 5, 7, 11, 13, 17, 19)
      AND CAST(c_acctbal AS DOUBLE) > (SELECT a FROM avg_bal)
      AND c_custkey NOT IN (SELECT o_custkey FROM recent)
    GROUP BY c_nationkey
    """,
    tags=("scale", "J", "A"),
)
def tpch_q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: well-funded customers in seven "country codes"
    (:= nationkey) with no order since 2000 (every synthetic customer
    has SOME order, so the textbook no-orders-ever anti-join would be
    vacuously empty).

    The positive-balance average broadcasts as a 1-row scalar; the
    "has recent orders" set distinct-aggregates orders down to custkeys
    and anti-joins. No correlated execution anywhere.
    """
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_nationkey").isin(1, 5, 7, 11, 13, 17, 19)
    )
    all_cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    avg_bal = all_cust.filter(F.col("c_acctbal") > 0.0).agg(
        (F.sum(_dec2("c_acctbal")).cast("double") / F.count(F.lit(1))).alias("a")
    )
    recent = (
        orders.filter(F.col("o_orderdate") >= _ts("2000-01-01 00:00:00"))
        .select("o_custkey")
        .distinct()
    )
    out = (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal").cast("double") > F.col("a"))
        .join(recent, cust["c_custkey"] == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum(_dec2("c_acctbal")).cast("double"), 2).alias("totacctbal"),
        )
    )
    return out
