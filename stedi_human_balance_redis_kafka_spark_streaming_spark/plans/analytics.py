"""Batch analytics queries (TPC-H-shaped) over the testdata star schema.

These exercise the engine's general OLAP capability — multi-way joins,
partial-aggregable groupBys, windows, rollups, sessionization — and are
the bench.py headline set.

Floating-point determinism strategy: monetary doubles are quantized
per-row to exact int64 units (cents / basis points) with ``round`` —
deterministic for any given double in both Spark and DuckDB — and then
aggregated with EXACT integer arithmetic.  Derived doubles (averages,
dollar values) are produced by a single deterministic scalar op on the
exact sums.  This removes all reassociation-order risk from the oracle
comparison, and at cluster scale integer aggregation is also simply
faster than decimal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.files import load_table
from .registry import register

# Per-row exact quantizations (mirrored verbatim in oracle SQL).  Lazy
# functions, not module-level Columns — Column construction needs an
# active SparkContext, which doesn't exist at import time.
def _qty():
    return F.col("l_quantity").cast("long")


def _price_c():
    return F.round(F.col("l_extendedprice") * 100).cast("long")


def _disc_b():
    return F.round(F.col("l_discount") * 10000).cast("long")


def _rev_e6():
    # revenue in 1e-6 dollar units: cents * (10000 - disc_bp) — exact int64.
    return _price_c() * (F.lit(10000) - _disc_b())

SQL_QTY = "CAST(l_quantity AS BIGINT)"
SQL_PRICE_C = "CAST(round(l_extendedprice * 100) AS BIGINT)"
SQL_DISC_B = "CAST(round(l_discount * 10000) AS BIGINT)"
SQL_TAX_B = "CAST(round(l_tax * 10000) AS BIGINT)"
SQL_REV_E6 = f"{SQL_PRICE_C} * (10000 - {SQL_DISC_B})"


@register(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM({SQL_QTY}) AS BIGINT) AS sum_qty,
           CAST(SUM({SQL_PRICE_C}) AS BIGINT) AS sum_base_price_cents,
           CAST(SUM({SQL_REV_E6}) AS BIGINT) AS sum_disc_price_e6,
           CAST(CAST(SUM({SQL_QTY}) AS BIGINT) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(CAST(SUM({SQL_PRICE_C}) AS BIGINT) AS DOUBLE) / COUNT(*) / 100.0
             AS avg_price,
           CAST(CAST(SUM({SQL_DISC_B}) AS BIGINT) AS DOUBLE) / COUNT(*) / 10000.0
             AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-heavy groupBy with 7 aggregates.

    Fully partial-aggregable — one shuffle of 4 groups regardless of
    scale; the parquet scan prunes to the 8 referenced columns.
    """
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_qty()).alias("sum_qty"),
            F.sum(_price_c()).alias("sum_base_price_cents"),
            F.sum(_rev_e6()).alias("sum_disc_price_e6"),
            (F.sum(_qty()).cast("double") / F.count("*")).alias("avg_qty"),
            (F.sum(_price_c()).cast("double") / F.count("*") / 100.0).alias("avg_price"),
            (F.sum(_disc_b()).cast("double") / F.count("*") / 10000.0).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l.l_orderkey AS o_orderkey,
           CAST(SUM({SQL_REV_E6}) AS BIGINT) AS revenue_e6,
           strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue_e6 DESC, o_orderkey ASC
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → 3-way join → top-10.

    customer is the small side (broadcast); the orders⨝lineitem join
    shuffles on orderkey.  Deterministic tie-break on o_orderkey.
    """
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("l_orderkey").alias("o_orderkey"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
        )
        .agg(F.sum(_rev_e6()).alias("revenue_e6"))
        .select("o_orderkey", "revenue_e6", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue_e6"), F.asc("o_orderkey"))
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    oracle=f"""
    SELECT n.n_name,
           CAST(SUM({SQL_REV_E6}) AS BIGINT) AS revenue_e6,
           COUNT(*) AS n_lineitems
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n.n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way snowflake join → groupBy nation.

    region/nation/supplier/customer are broadcast dims; only
    orders⨝lineitem shuffles.  (No region filter — every region kept so
    the result exercises all nations.)
    """
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .join(
            F.broadcast(s),
            (s.s_suppkey == l.l_suppkey) & (s.s_nationkey == n.n_nationkey),
        )
        .groupBy("n_name")
        .agg(
            F.sum(_rev_e6()).alias("revenue_e6"),
            F.count("*").alias("n_lineitems"),
        )
    )


@register(
    "top_parts_per_brand",
    oracle="""
    SELECT p_brand, p_partkey, p_name, p_retailprice, rank FROM (
      SELECT p_brand, p_partkey, p_name, p_retailprice,
             row_number() OVER (
               PARTITION BY p_brand
               ORDER BY p_retailprice DESC, p_partkey ASC) AS rank
      FROM part
    ) WHERE rank <= 3
    """,
)
def top_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group via window row_number (common OLAP pattern)."""
    p = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(
        F.desc("p_retailprice"), F.asc("p_partkey")
    )
    return (
        p.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 3)
        .select("p_brand", "p_partkey", "p_name", "p_retailprice", "rank")
    )


@register(
    "orders_rollup",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS total_cents
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def orders_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP aggregation (grouping-sets capability)."""
    o = load_table(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
            "total_cents"
        ),
    )


@register(
    "customer_order_stats",
    oracle="""
    SELECT c.c_custkey, c.c_mktsegment,
           COUNT(o.o_orderkey) AS n_orders,
           CAST(COALESCE(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)), 0)
                AS BIGINT) AS spend_cents
    FROM customer c
    LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_mktsegment
    """,
)
def customer_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join + aggregation (customers with zero orders kept)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(
                F.sum(F.round(F.col("o_totalprice") * 100).cast("long")),
                F.lit(0),
            ).cast("long").alias("spend_cents"),
        )
    )


@register(
    "event_type_stats",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
    FROM events
    GROUP BY event_type
    """,
)
def event_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupBy + count distinct (expands to two-phase agg under the hood)."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_cents"),
    )


@register(
    "user_sessionization",
    oracle="""
    WITH g AS (
      SELECT user_id,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
                    OR LAG(epoch_us(ts)) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id,
           CAST(SUM(new_session) AS BIGINT) AS n_sessions,
           COUNT(*) AS n_events
    FROM g GROUP BY user_id
    """,
)
def user_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: lag-gap > 30 min starts a new session (batch dual
    of streaming session_window).  Gap math in exact epoch-microseconds
    on both sides (second-truncated casts would disagree at boundaries).
    """
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
    new_session = F.when(
        gap.isNull() | (gap > 30 * 60 * 1_000_000), 1
    ).otherwise(0)
    return (
        e.withColumn("new_session", new_session)
        .groupBy("user_id")
        .agg(
            F.sum("new_session").cast("long").alias("n_sessions"),
            F.count("*").alias("n_events"),
        )
    )


@register(
    "q7_nation_trade_volume",
    oracle=f"""
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           EXTRACT(YEAR FROM l.l_shipdate) AS l_year,
           CAST(SUM({SQL_REV_E6}) AS BIGINT) AS revenue_e6,
           COUNT(*) AS n_lineitems
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
    WHERE n1.n_name <> n2.n_name
    GROUP BY 1, 2, 3
    """,
)
def q7_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: cross-nation trade volume by (supplier nation,
    customer nation, ship year).

    Scale shape: the fact-fact orders⨝lineitem join shuffles once on
    orderkey; supplier/customer/nation(×2) are broadcast dims.  The
    nation-pair inequality applies after two broadcast lookups — no
    extra shuffle.  Revenue is exact-int e6 units (FP policy).
    """
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            F.sum(_rev_e6()).alias("revenue_e6"),
            F.count("*").alias("n_lineitems"),
        )
    )


@register(
    "q10_returned_items",
    oracle=f"""
    SELECT c.c_custkey, c.c_name,
           CAST(SUM({SQL_REV_E6}) AS BIGINT) AS revenue_e6,
           COUNT(*) AS n_items
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_returnflag = 'R'
    GROUP BY 1, 2
    ORDER BY revenue_e6 DESC, c.c_custkey ASC
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by returned-item revenue.

    Scale shape: the returnflag filter pushes into the lineitem scan
    (ReadSchema prunes to 5 columns), the fact join shuffles once,
    customer broadcasts, and the top-20 runs as TakeOrderedAndProject
    (per-partition top-k then a single merge — no global sort).  The
    (revenue DESC, custkey ASC) total order makes LIMIT deterministic
    cross-engine.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            F.sum(_rev_e6()).alias("revenue_e6"),
            F.count("*").alias("n_items"),
        )
        .orderBy(F.desc("revenue_e6"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "q4_priority_semi",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
    GROUP BY o_orderpriority
    """,
)
def q4_priority_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS → left-semi join, then priority counts.

    Scale shape: the returnflag filter pushes into the lineitem scan;
    the semi-join shuffles both sides on orderkey but emits each order
    at most once (no fact-fact row blowup), and the 5-group aggregate
    is fully partial-aggregable.
    """
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    ret = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    return (
        o.join(ret, o.o_orderkey == ret.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@register(
    "q12_priority_lines",
    oracle="""
    SELECT l.l_returnflag,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l.l_returnflag
    """,
)
def q12_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: fact-fact join + conditional (CASE) aggregation.

    Integer CASE counts — no FP anywhere.  One shuffle for the orderkey
    join (AQE may broadcast the filtered side at small SF), one tiny
    3-group aggregate.
    """
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    o = load_table(spark, sf_dir, "orders")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q19_disjunctive_revenue",
    oracle=f"""
    SELECT CAST(SUM({SQL_REV_E6}) AS BIGINT) AS revenue_e6,
           COUNT(*) AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#3'  AND p.p_size BETWEEN 1  AND 15
           AND l.l_quantity BETWEEN 1  AND 20)
       OR (p.p_brand = 'Brand#14' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity BETWEEN 10 AND 40)
       OR (p.p_brand = 'Brand#22' AND p.p_size BETWEEN 20 AND 45
           AND l.l_quantity BETWEEN 20 AND 50)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-conjunctions predicate mixing both join sides.

    The part-only disjuncts (brand + size) prefilter the dim side before
    the broadcast — the union-of-brands filter reaches the part scan, so
    the build side is a few % of part regardless of scale; the mixed
    residual predicate evaluates post-join inside the same codegen stage.
    """
    def _branch(brand, smin, smax, qmin, qmax, side):
        if side == "p":
            return (F.col("p_brand") == brand) & F.col("p_size").between(smin, smax)
        return (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(smin, smax)
            & F.col("l_quantity").between(qmin, qmax)
        )

    branches = [
        ("Brand#3", 1, 15, 1, 20),
        ("Brand#14", 10, 30, 10, 40),
        ("Brand#22", 20, 45, 20, 50),
    ]
    p_pred = None
    full_pred = None
    for br in branches:
        pp, fp = _branch(*br, "p"), _branch(*br, "f")
        p_pred = pp if p_pred is None else p_pred | pp
        full_pred = fp if full_pred is None else full_pred | fp

    p = load_table(spark, sf_dir, "part").filter(p_pred)
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .filter(full_pred)
        .agg(
            F.sum(_rev_e6()).alias("revenue_e6"),
            F.count("*").alias("n_lines"),
        )
    )


# Exact-integer global-threshold comparisons (Q11/Q22 shapes): the scalar
# "average" / "share of total" thresholds are never materialized as doubles
# — membership tests multiply through by the count instead
# (cents * n > total_cents), so there is no ULP boundary to disagree on.

@register(
    "q22_idle_rich_customers",
    oracle="""
    WITH pos AS (
      SELECT SUM(CAST(round(c_acctbal * 100) AS BIGINT)) AS tot,
             COUNT(*) AS n
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c.c_nationkey,
           COUNT(*) AS numcust,
           CAST(SUM(CAST(round(c.c_acctbal * 100) AS BIGINT)) AS BIGINT)
             AS totacctbal_cents
    FROM customer c, pos
    WHERE CAST(round(c.c_acctbal * 100) AS BIGINT) * pos.n > pos.tot
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    GROUP BY c.c_nationkey
    """,
)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar-subquery threshold + NOT EXISTS anti-join.

    Above-average-balance customers with no urgent orders, by nation.
    The global average is a 1-row broadcast; the anti-join shuffles on
    custkey (high-cardinality, uniform).  Exact-integer threshold per
    the module FP policy.
    """
    cust = load_table(spark, sf_dir, "customer").withColumn(
        "bal_c", F.round(F.col("c_acctbal") * 100).cast("long")
    )
    pos = cust.filter(F.col("c_acctbal") > 0.0).agg(
        F.sum("bal_c").alias("tot"), F.count("*").alias("n")
    )
    urgent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    cand = cust.crossJoin(F.broadcast(pos)).filter(
        F.col("bal_c") * F.col("n") > F.col("tot")
    )
    return (
        cand.join(urgent, cand.c_custkey == urgent.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            F.sum("bal_c").alias("totacctbal_cents"),
        )
    )


@register(
    "q11_supplier_concentration",
    oracle="""
    WITH t AS (
      SELECT s_nationkey,
             SUM(CAST(round(s_acctbal * 100) AS BIGINT)) AS value_cents
      FROM supplier GROUP BY s_nationkey
    ), g AS (SELECT SUM(value_cents) AS tot FROM t)
    SELECT t.s_nationkey, CAST(t.value_cents AS BIGINT) AS value_cents
    FROM t, g WHERE t.value_cents * 20 > g.tot
    """,
)
def q11_supplier_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: HAVING against a global scalar (>5% share).

    Two passes over one tiny aggregate (25 groups): the total is a
    1-row broadcast re-joined to the per-nation sums; share compare is
    exact-integer (value_cents * 20 > tot).
    """
    s = load_table(spark, sf_dir, "supplier").withColumn(
        "bal_c", F.round(F.col("s_acctbal") * 100).cast("long")
    )
    t = s.groupBy("s_nationkey").agg(F.sum("bal_c").alias("value_cents"))
    g = t.agg(F.sum("value_cents").alias("tot"))
    return (
        t.crossJoin(F.broadcast(g))
        .filter(F.col("value_cents") * 20 > F.col("tot"))
        .select("s_nationkey", "value_cents")
    )


@register(
    "events_session_window",
    # Native session_window semantics: sessions are [ts, last_ts + gap)
    # intervals merged while they OVERLAP — an event exactly gap after
    # the previous one starts a NEW session (strict <), so the lag-idiom
    # oracle uses >= gap as the session break (user_sessionization's
    # plain-gap idiom uses > and would disagree on exact-gap ties).
    oracle="""
    WITH g AS (
      SELECT user_id, event_id, epoch_us(ts) AS us,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w >= 1800000000
                    OR LAG(epoch_us(ts)) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
      SELECT user_id, us,
             SUM(new_session) OVER (
               PARTITION BY user_id ORDER BY us, event_id
               ROWS UNBOUNDED PRECEDING) AS sess
      FROM g
    )
    SELECT user_id,
           MIN(us) AS session_start_us,
           MAX(us) + 1800000000 AS session_end_us,
           COUNT(*) AS n_events
    FROM s GROUP BY user_id, sess
    """,
)
def events_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-session stats via Spark's native session_window (the third
    window type; in streaming it is its own stateful operator — the
    streaming form is streaming/stateful.py:streaming_user_sessions).

    Scale shape: one shuffle on the grouping key; session merging is
    per-key and incremental.  Edge times in exact epoch-micros so the
    oracle's lag/cumsum formulation compares without timestamp-cast
    drift.
    """
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.unix_micros("session_window.start").alias("session_start_us"),
            F.unix_micros("session_window.end").alias("session_end_us"),
            "n_events",
        )
    )


@register(
    "events_cube",
    # Subtotal rows carry NULL grouping keys, which value-hash
    # canonicalizers choke on — coalesce to sentinels on both sides
    # (the source columns are non-null, so no ambiguity).
    oracle="""
    SELECT COALESCE(event_type, '(all)') AS event_type,
           COALESCE(CAST(user_id % 10 AS BIGINT), -1) AS user_bucket,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(round(value * 10000) AS BIGINT)) AS BIGINT)
             AS sum_value_e4
    FROM events
    GROUP BY CUBE (event_type, CAST(user_id % 10 AS BIGINT))
    """,
)
def events_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE aggregation — all four grouping sets of (event_type,
    user_bucket) in one pass (completes grouping-sets coverage next to
    orders_rollup's ROLLUP).

    Scale shape: Spark expands the cube with an Expand node feeding ONE
    partial-aggregable shuffle — grouping-set count multiplies rows
    map-side, not shuffles.
    """
    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        (F.col("user_id") % 10).cast("long").alias("user_bucket"),
        F.round(F.col("value") * 10000).cast("long").alias("value_e4"),
    )
    return (
        e.cube("event_type", "user_bucket")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value_e4").alias("sum_value_e4"),
        )
        .select(
            F.coalesce("event_type", F.lit("(all)")).alias("event_type"),
            F.coalesce("user_bucket", F.lit(-1)).alias("user_bucket"),
            "n_events",
            "sum_value_e4",
        )
    )


@register(
    "q17_small_quantity_revenue",
    # Per-group average threshold in the exact-int domain:
    # qty < 0.2·avg(qty)  ⇔  5·qty·cnt < sum_qty  — no double avg to
    # disagree on (module FP policy).
    oracle=f"""
    WITH lp AS (
      SELECT l.l_quantity, l.l_extendedprice, p.p_partkey
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_brand = 'Brand#5'
    ), a AS (
      SELECT p_partkey,
             SUM(CAST(l_quantity AS BIGINT)) AS sum_qty,
             COUNT(*) AS cnt
      FROM lp GROUP BY p_partkey
    )
    SELECT CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS sum_price_cents,
           COUNT(*) AS n_lines
    FROM lp JOIN a USING (p_partkey)
    WHERE 5 * CAST(l_quantity AS BIGINT) * cnt < sum_qty
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: per-group (part) average as a correlated
    threshold — fact rows below 20% of their own part's mean quantity.

    Scale shape: the brand filter broadcasts into the fact join FIRST,
    so the per-part aggregate runs over only that brand's lineitems
    (the classic decorrelation + pushdown); the aggregate re-joins on
    partkey (both sides already partitioned by it after the groupBy).
    """
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#5")
    l = load_table(spark, sf_dir, "lineitem")
    lp = l.join(F.broadcast(p), l.l_partkey == p.p_partkey).select(
        "p_partkey", _qty().alias("qty"), _price_c().alias("price_c")
    )
    a = lp.groupBy("p_partkey").agg(
        F.sum("qty").alias("sum_qty"), F.count("*").alias("cnt")
    )
    return (
        lp.join(a, "p_partkey")
        .filter(F.lit(5) * F.col("qty") * F.col("cnt") < F.col("sum_qty"))
        .agg(
            F.sum("price_c").alias("sum_price_cents"),
            F.count("*").alias("n_lines"),
        )
    )


# --------------------------------------------------------------------------
# Extended TPC-H shapes (registered beyond the driver check window —
# plans/registry.py EXTENDED_QUERIES; locally parity-verified every round
# by tests/test_oracle_parity.py).  partsupp / commit-receipt dates don't
# exist in the testdata schema, so q16/q20/q21 use the standard
# adaptations noted per query.
# --------------------------------------------------------------------------


@register(
    "q6_forecast_revenue",
    oracle=f"""
    SELECT CAST(SUM({SQL_PRICE_C} * {SQL_DISC_B}) AS BIGINT) AS revenue_e6,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-aggregate, no join.

    Every predicate (dates, discount band, quantity) is scan-pushable;
    the aggregate is one partial-aggregable scalar — the canonical
    predicate-pushdown benchmark (plan-audited in tests/test_plans.py).
    Revenue price·discount is exact cents×bp (1e-6 dollar units).
    """
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_price_c() * _disc_b()).alias("revenue_e6"),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "q13_customer_distribution",
    oracle="""
    WITH co AS (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o
        ON o.o_custkey = c.c_custkey
       AND o.o_orderpriority <> '4-NOT SPECIFIED'
      GROUP BY c.c_custkey
    )
    SELECT c_count, COUNT(*) AS custdist
    FROM co GROUP BY c_count
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: outer join with a join-side (not WHERE) filter,
    then a distribution-of-counts double aggregation.

    The priority filter must live in the JOIN condition — a WHERE would
    turn the outer join inner and drop zero-order customers, the rows
    Q13 exists to count.  Both groupBys are partial-aggregable; the
    second one runs on ~tens of distinct counts.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    )
    co = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return co.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "q14_promo_revenue_share",
    # Share in exact 1e-6 units via integer div — no double division for
    # the engines to disagree on.
    oracle=f"""
    WITH lp AS (
      SELECT {SQL_REV_E6} AS rev_e6, p.p_type
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l.l_shipdate <  TIMESTAMP '1997-02-01 00:00:00'
    )
    SELECT CAST(SUM(CASE WHEN p_type = 'PROMO' THEN rev_e6 ELSE 0 END)
                AS BIGINT) AS promo_rev_e6,
           CAST(SUM(rev_e6) AS BIGINT) AS total_rev_e6,
           CAST((SUM(CASE WHEN p_type = 'PROMO' THEN rev_e6 ELSE 0 END)
                 * 1000000) // SUM(rev_e6) AS BIGINT) AS promo_share_e6
    FROM lp
    """,
)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional aggregation over a fact⨝dim join —
    the promo share of one month's revenue.

    part broadcasts (bounded dim); the date window prunes the fact scan
    before the join; the share is computed once on the exact integer
    sums (1e6·promo div total).
    """
    p = load_table(spark, sf_dir, "part")
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-02-01 00:00:00").cast("timestamp"))
    )
    lp = l.join(F.broadcast(p), l.l_partkey == p.p_partkey).select(
        _rev_e6().alias("rev_e6"), "p_type"
    )
    return lp.agg(
        F.sum(F.when(F.col("p_type") == "PROMO", F.col("rev_e6")).otherwise(0))
        .alias("promo_rev_e6"),
        F.sum("rev_e6").alias("total_rev_e6"),
        # the ×1e6 blow-up runs in DECIMAL(38,0): at sf0.1 the int64
        # product already overflows ANSI (DuckDB is immune — its SUM is
        # int128); the quotient (a share ≤ 1e6) is what must fit int64
        F.expr(
            "(CAST(SUM(CASE WHEN p_type = 'PROMO' THEN rev_e6 ELSE 0 END)"
            " AS DECIMAL(38,0)) * 1000000) div SUM(rev_e6)"
        ).alias("promo_share_e6"),
    )


@register(
    "q15_top_supplier",
    oracle=f"""
    WITH r AS (
      SELECT l_suppkey, CAST(SUM({SQL_REV_E6}) AS BIGINT) AS total_rev_e6
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    ), m AS (SELECT MAX(total_rev_e6) AS mx FROM r)
    SELECT s.s_suppkey, s.s_name, r.total_rev_e6
    FROM r JOIN m ON r.total_rev_e6 = m.mx
    JOIN supplier s ON s.s_suppkey = r.l_suppkey
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: aggregate, take the global max, and return every
    row achieving it (the "top supplier view" — ties included, exact
    integer compare so tie membership is deterministic).

    The max is a 1-row broadcast re-join, not a driver collect or a
    global window sort; supplier is a broadcast dim.
    """
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    r = l.groupBy("l_suppkey").agg(F.sum(_rev_e6()).alias("total_rev_e6"))
    m = r.agg(F.max("total_rev_e6").alias("mx"))
    s = load_table(spark, sf_dir, "supplier")
    return (
        r.crossJoin(F.broadcast(m))
        .filter(F.col("total_rev_e6") == F.col("mx"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_rev_e6")
    )


@register(
    "q16_supplier_count_by_part",
    # partsupp doesn't exist in this schema — lineitem's observed
    # (partkey, suppkey) pairs are the supplier-catalog stand-in.
    # "Complaint" suppliers (excluded via NOT IN in the original) are
    # modeled as negative-balance suppliers, an anti join.
    oracle="""
    WITH ps AS (
      SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
    ), bad AS (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    SELECT p.p_brand, p.p_type, CAST(p.p_size AS BIGINT) AS p_size,
           COUNT(DISTINCT ps.l_suppkey) AS supplier_cnt
    FROM ps
    JOIN part p ON p.p_partkey = ps.l_partkey
    WHERE p.p_brand <> 'Brand#5' AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 4, 9, 14, 19, 23, 36, 49)
      AND ps.l_suppkey NOT IN (SELECT s_suppkey FROM bad)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def q16_supplier_count_by_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct pair projection → dim filter join →
    anti join (supplier exclusion list) → count-distinct rollup.

    Scale shape: the distinct on (partkey, suppkey) is the only
    fact-sized shuffle; part broadcasts pre-filtered; the exclusion
    list is bounded (broadcast anti join); count(distinct) expands
    inside the keyed aggregate, never corpus-wide.
    """
    ps = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 49))
    )
    bad = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        ps.join(F.broadcast(bad), ps.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), ps.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", F.col("p_size").cast("long").alias("p_size"))
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q18_large_volume_customers",
    oracle="""
    WITH big AS (
      SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)
               AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS BIGINT)) > 300
    )
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
           CAST(round(o.o_totalprice * 100) AS BIGINT) AS o_totalprice_cents,
           b.sum_qty
    FROM big b
    JOIN orders o ON o.o_orderkey = b.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    """,
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING-filtered fact aggregate driving a join
    back to its dimensions (orders, customer).

    The quantity rollup is partial-aggregable and keyed by orderkey;
    only qualifying orders (rare) reach the joins, so the join input is
    tiny regardless of fact size — AQE broadcasts it at runtime (no
    hint: the qualifying set's size is data-dependent).
    """
    l = load_table(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(_qty()).alias("sum_qty"))
        .filter(F.col("sum_qty") > 300)
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias(
                "o_totalprice_cents"
            ),
            "sum_qty",
        )
    )


@register(
    "q20_heavy_share_suppliers",
    # partsupp/availqty don't exist — the "excess stock" predicate
    # becomes "supplied more than a sixth of a part's shipped volume",
    # same nested-aggregate + semi-join shape.
    oracle="""
    WITH red AS (
      SELECT p_partkey FROM part WHERE p_name LIKE '%red%'
    ), per AS (
      SELECT l_partkey, l_suppkey,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
      FROM lineitem JOIN red ON p_partkey = l_partkey
      GROUP BY l_partkey, l_suppkey
    ), tot AS (
      SELECT l_partkey, CAST(SUM(qty) AS BIGINT) AS part_qty
      FROM per GROUP BY l_partkey
    )
    SELECT DISTINCT s.s_suppkey, s.s_name
    FROM per JOIN tot USING (l_partkey)
    JOIN supplier s ON s.s_suppkey = per.l_suppkey
    WHERE per.qty * 6 > tot.part_qty
    """,
)
def q20_heavy_share_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: nested two-level aggregate (per supplier-part vs
    per part) driving a semi-style supplier projection.

    The part-name filter broadcasts into the fact first; both rollup
    levels are partial-aggregable on their keys; the second level
    re-joins on l_partkey, where both sides are already partitioned
    after the first groupBy.  DISTINCT bounds the output by supplier
    count.
    """
    red = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%red%")
    ).select("p_partkey")
    l = load_table(spark, sf_dir, "lineitem")
    per = (
        l.join(F.broadcast(red), l.l_partkey == red.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(_qty()).alias("qty"))
    )
    tot = per.groupBy("l_partkey").agg(F.sum("qty").alias("part_qty"))
    s = load_table(spark, sf_dir, "supplier")
    return (
        per.join(tot, "l_partkey")
        .filter(F.col("qty") * 6 > F.col("part_qty"))
        .join(F.broadcast(s), per.l_suppkey == s.s_suppkey)
        .select("s_suppkey", "s_name")
        .distinct()
    )


@register(
    "q21_waiting_suppliers",
    # No commit/receipt dates in this schema — "late" is shipping more
    # than 60 days after the order date.  The multi-supplier exists /
    # sole-late-supplier not-exists pair is re-expressed as one keyed
    # aggregate (n_supp ≥ 2, n_late_supp = 1), the shape that scales:
    # the EXISTS pair would be two extra fact-fact joins.
    oracle="""
    WITH lo AS (
      SELECT l.l_orderkey, l.l_suppkey,
             CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
                  THEN 1 ELSE 0 END AS late
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderstatus = 'F'
    ), per AS (
      SELECT l_orderkey,
             COUNT(DISTINCT l_suppkey) AS n_supp,
             COUNT(DISTINCT CASE WHEN late = 1 THEN l_suppkey END)
               AS n_late_supp,
             MAX(CASE WHEN late = 1 THEN l_suppkey END) AS late_supp
      FROM lo GROUP BY l_orderkey
    )
    SELECT s.s_name, COUNT(*) AS numwait
    FROM per JOIN supplier s ON s.s_suppkey = per.late_supp
    WHERE n_supp >= 2 AND n_late_supp = 1
    GROUP BY s.s_name
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the SOLE late shipper on
    finished multi-supplier orders.

    The textbook EXISTS + NOT-EXISTS pair is re-expressed as one
    aggregate per order (distinct suppliers, distinct late suppliers,
    and — valid exactly because n_late_supp = 1 — MAX(late supplier)),
    replacing two fact-fact joins with one keyed partial-aggregable
    shuffle.  orders filters to 'F' before the join; supplier
    broadcasts for the name lookup.
    """
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    l = load_table(spark, sf_dir, "lineitem")
    lo = l.join(o, l.l_orderkey == o.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        F.when(
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("late"),
    )
    per = lo.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("late") == 1, F.col("l_suppkey"))
        ).alias("n_late_supp"),
        F.max(F.when(F.col("late") == 1, F.col("l_suppkey"))).alias(
            "late_supp"
        ),
    )
    s = load_table(spark, sf_dir, "supplier")
    return (
        per.filter((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
        .join(F.broadcast(s), F.col("late_supp") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


@register(
    "q2_min_cost_supplier",
    # partsupp doesn't exist — observed lineitem prices stand in for the
    # supplier catalog: the minimum extended price per size-15 part among
    # EUROPE suppliers, and every (supplier, part) pair achieving it.
    oracle="""
    WITH eligible AS (
      SELECT p.p_partkey, s.s_suppkey, s.s_name,
             CAST(round(s.s_acctbal * 100) AS BIGINT) AS s_acctbal_cents,
             n.n_name,
             CAST(round(l.l_extendedprice * 100) AS BIGINT) AS price_c
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey AND p.p_size = 15
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey AND r.r_name = 'EUROPE'
    ), m AS (
      SELECT p_partkey, MIN(price_c) AS min_price_c
      FROM eligible GROUP BY p_partkey
    )
    SELECT DISTINCT e.s_acctbal_cents, e.s_name, e.n_name, e.p_partkey,
                    m.min_price_c
    FROM eligible e
    JOIN m ON m.p_partkey = e.p_partkey AND e.price_c = m.min_price_c
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: min-per-group correlated subquery, decorrelated
    into a keyed MIN + re-join (ties included, exact-int compare).

    part/supplier/nation/region all broadcast (bounded dims — region
    prunes suppliers before the fact join); the only fact-sized shuffle
    is the per-part MIN, partial-aggregable on partkey; the re-join
    meets it on the same key.
    """
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    sn = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("s_acctbal") * 100).cast("long").alias(
                "s_acctbal_cents"
            ),
            "n_name",
        )
    )
    eligible = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(sn), l.l_suppkey == sn.s_suppkey)
        .select(
            "p_partkey",
            "s_name",
            "s_acctbal_cents",
            "n_name",
            _price_c().alias("price_c"),
        )
    )
    m = eligible.groupBy("p_partkey").agg(F.min("price_c").alias("min_price_c"))
    return (
        eligible.join(m, "p_partkey")
        .filter(F.col("price_c") == F.col("min_price_c"))
        .select("s_acctbal_cents", "s_name", "n_name", "p_partkey", "min_price_c")
        .distinct()
    )


# Q8's data-coupled parameters, shared by the Spark plan and the oracle
# text — swap BOTH by changing these constants when porting to real data
# (the values match the driver's synthetic dimension naming).
Q8_SUPP_NATION = "NATION_3"
Q8_CUST_REGION = "AMERICA"


@register(
    "q8_market_share",
    # Share per year in exact 1e-6 units (integer div).
    oracle=f"""
    WITH t AS (
      SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
             {SQL_REV_E6} AS rev_e6,
             sn.n_name AS supp_nation
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
       AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
       AND o.o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation cn ON cn.n_nationkey = c.c_nationkey
      JOIN region cr ON cr.r_regionkey = cn.n_regionkey
       AND cr.r_name = '{Q8_CUST_REGION}'
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation sn ON sn.n_nationkey = s.s_nationkey
    )
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nation = '{Q8_SUPP_NATION}' THEN rev_e6 ELSE 0 END)
                AS BIGINT) AS nation_rev_e6,
           CAST(SUM(rev_e6) AS BIGINT) AS total_rev_e6,
           CAST((SUM(CASE WHEN supp_nation = '{Q8_SUPP_NATION}' THEN rev_e6 ELSE 0 END)
                 * 1000000) // SUM(rev_e6) AS BIGINT) AS share_e6
    FROM t GROUP BY o_year
    """,
)
def q8_market_share(
    spark: SparkSession,
    sf_dir: str,
    *,
    supp_nation: str = Q8_SUPP_NATION,
    cust_region: str = Q8_CUST_REGION,
) -> DataFrame:
    """TPC-H Q8 shape: one supplier-nation's share of a customer
    region's revenue, by order year — a 6-way join where every
    dimension chain broadcasts and only orders⨝lineitem shuffles.

    The share is conditional-sum over total on the exact integer sums,
    per group (integer div — engines cannot disagree).

    ``supp_nation`` / ``cust_region`` default to the module constants;
    the registered ORACLE text mirrors those defaults only — calls with
    overrides are live parameterizations without a registered mirror.
    """
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01 00:00:00").cast("timestamp"))
    )
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == cust_region
    )
    s = load_table(spark, sf_dir, "supplier")
    cust_region_df = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("c_custkey")
    )
    supp_nation_df = s.join(
        F.broadcast(n.select("n_nationkey", F.col("n_name").alias("supp_nation"))),
        s.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey", "supp_nation")
    t = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(cust_region_df), o.o_custkey == cust_region_df.c_custkey)
        .join(F.broadcast(supp_nation_df), l.l_suppkey == supp_nation_df.s_suppkey)
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            _rev_e6().alias("rev_e6"),
            "supp_nation",
        )
    )
    return t.groupBy("o_year").agg(
        F.sum(
            F.when(
                F.col("supp_nation") == supp_nation, F.col("rev_e6")
            ).otherwise(0)
        ).alias("nation_rev_e6"),
        F.sum("rev_e6").alias("total_rev_e6"),
        # decimal-widened multiply — same overflow guard as q14
        F.expr(
            f"(CAST(SUM(CASE WHEN supp_nation = '{supp_nation}' THEN rev_e6"
            " ELSE 0 END) AS DECIMAL(38,0)) * 1000000) div SUM(rev_e6)"
        ).alias("share_e6"),
    )


@register(
    "q9_product_profit",
    # ps_supplycost doesn't exist — part retail price stands in as unit
    # cost.  Revenue is cents·bp (e6); cost is scaled cents→e6 so the
    # subtraction stays in one exact integer domain.
    oracle=f"""
    WITH t AS (
      SELECT sn.n_name,
             CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
             {SQL_REV_E6}
               - CAST(round(p.p_retailprice * 100) AS BIGINT)
                 * CAST(l.l_quantity AS BIGINT) * 10000 AS profit_e6
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN part p ON p.p_partkey = l.l_partkey AND p.p_name LIKE '%blue%'
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation sn ON sn.n_nationkey = s.s_nationkey
    )
    SELECT n_name, o_year, CAST(SUM(profit_e6) AS BIGINT) AS profit_e6,
           COUNT(*) AS n_lines
    FROM t GROUP BY n_name, o_year
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit (revenue − cost) for one product family,
    rolled up by supplier nation × order year.

    The part-name filter broadcasts into the fact scan first; profit is
    computed per row in one exact-integer e6 domain (negative values
    fine in int64), then partial-aggregated on the (nation, year) key.
    """
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%blue%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    sn = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        "s_suppkey", "n_name"
    )
    profit = (
        _rev_e6()
        - F.round(F.col("p_retailprice") * 100).cast("long")
        * _qty()
        * F.lit(10000)
    )
    t = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(sn), l.l_suppkey == sn.s_suppkey)
        .select(
            "n_name",
            F.year("o_orderdate").cast("long").alias("o_year"),
            profit.alias("profit_e6"),
        )
    )
    return t.groupBy("n_name", "o_year").agg(
        F.sum("profit_e6").alias("profit_e6"), F.count("*").alias("n_lines")
    )


@register(
    "events_rolling_value",
    # Time-RANGE window frame (not covered by any other query: rows
    # frames and unbounded frames exist elsewhere) — trailing 1-hour
    # per-user rolling sum/count in exact epoch-micros.
    oracle="""
    SELECT event_id, user_id, epoch_us(ts) AS ts_us,
           COUNT(*) OVER w AS n_1h,
           CAST(SUM(CAST(round(value * 10000) AS BIGINT)) OVER w AS BIGINT)
             AS sum_value_e4_1h
    FROM events
    WINDOW w AS (
      PARTITION BY user_id ORDER BY epoch_us(ts)
      RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
    )
    """,
)
def events_rolling_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 1-hour rolling aggregate per user — the time-RANGE
    window frame (peers by value distance, not row position, so
    equal-timestamp ties contribute symmetrically on both engines).

    Scale shape: one shuffle on user_id; frames evaluate with a sliding
    pointer over each sorted partition.  Time math in exact epoch
    micros (int64) per the FP policy.
    """
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.round(F.col("value") * 10000).cast("long").alias("value_e4"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-3_600_000_000, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        "ts_us",
        F.count("*").over(w).alias("n_1h"),
        F.sum("value_e4").over(w).alias("sum_value_e4_1h"),
    )
