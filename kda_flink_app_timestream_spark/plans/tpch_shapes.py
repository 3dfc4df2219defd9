"""Classic TPC-H query shapes beyond Q1/Q3/Q5 — the decision-support
patterns a user of a production engine runs daily: correlated mins,
nation-pair volume, market share, distribution histograms, HAVING with
join-back, disjunctive predicate groups, and the Q22-style anti-join
with an aggregate subquery. (Adapted to the driver's slimmer star
schema — no partsupp table.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions.exact import cents
from ..sources.batch import load_table
from .catalog import query


@query(
    "q2_min_price_per_part",
    oracle="""
    SELECT l.l_partkey, p.p_name,
           round(l.l_extendedprice, 2) AS l_extendedprice,
           l.l_suppkey
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_extendedprice = (
        SELECT min(l2.l_extendedprice) FROM lineitem l2
        WHERE l2.l_partkey = l.l_partkey
    )
    AND l.l_suppkey = (
        SELECT min(l3.l_suppkey) FROM lineitem l3
        WHERE l3.l_partkey = l.l_partkey
          AND l3.l_extendedprice = l.l_extendedprice
    )
    """,
    tags=("join", "subquery", "tpch"),
)
def q2_min_price_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: the row achieving the per-group minimum
    (correlated min subquery), tie-broken on suppkey. Spark-first:
    row_number over (price, suppkey) — one shuffle, no correlated
    re-scan."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    w = W.partitionBy("l_partkey").orderBy("l_extendedprice", "l_suppkey")
    best = li.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return best.join(F.broadcast(p), best.l_partkey == p.p_partkey).select(
        "l_partkey",
        "p_name",
        F.round("l_extendedprice", 2).alias("l_extendedprice"),
        "l_suppkey",
    )


@query(
    "q7_nation_volume",
    oracle="""
    WITH agged AS (
    SELECT n1.n_name AS cust_nation, n2.n_name AS supp_nation,
           CAST(year(l.l_shipdate) AS BIGINT) AS ship_year,
           sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS s4
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
    JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
    WHERE n1.n_name IN ('NATION_1', 'NATION_2')
      AND n2.n_name IN ('NATION_1', 'NATION_2')
      AND n1.n_name <> n2.n_name
    GROUP BY 1, 2, 3
    )
    SELECT cust_nation, supp_nation, ship_year,
           ((s4 * 2 + 100) // 200) / 100.0 AS volume
    FROM agged
    """,
    tags=("join", "tpch"),
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: shipping volume between a nation pair per year —
    two roles of the same dimension (nation joined twice under different
    aliases), both broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("nk1"), F.col("n_name").alias("cust_nation"))
    n2 = n.select(F.col("n_nationkey").alias("nk2"), F.col("n_name").alias("supp_nation"))
    pair = ("NATION_1", "NATION_2")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("nk1"))
        .join(F.broadcast(n2), s.s_nationkey == F.col("nk2"))
        .filter(
            F.col("cust_nation").isin(*pair)
            & F.col("supp_nation").isin(*pair)
            & (F.col("cust_nation") != F.col("supp_nation"))
        )
        .groupBy(
            "cust_nation",
            "supp_nation",
            F.year("l_shipdate").cast("long").alias("ship_year"),
        )
        .agg(
            F.sum(
                cents(F.col("l_extendedprice")) * (100 - cents(F.col("l_discount")))
            ).alias("s4")
        )
        .selectExpr(
            "cust_nation", "supp_nation", "ship_year",
            "((s4 * 2 + 100) div 200) / 100.0D AS volume",
        )
    )


@query(
    "q8_market_share",
    oracle="""
    SELECT CAST(year(o.o_orderdate) AS BIGINT) AS order_year,
           round(sum(CASE WHEN n.n_name = 'NATION_3'
                          THEN CAST(round(l.l_extendedprice * 100) AS BIGINT)
                               * (100 - CAST(round(l.l_discount * 100) AS BIGINT))
                          ELSE 0 END)
                 / CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                        * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS DOUBLE),
                 6) AS mkt_share
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    GROUP BY 1
    """,
    tags=("join", "agg", "tpch"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's revenue share per year — conditional
    aggregation ratio in a single pass."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    rev = cents(F.col("l_extendedprice")) * (100 - cents(F.col("l_discount")))
    national = F.when(F.col("n_name") == "NATION_3", rev).otherwise(F.lit(0))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.year("o_orderdate").cast("long").alias("order_year"))
        .agg(F.round(F.sum(national) / F.sum(rev).cast("double"), 6).alias("mkt_share"))
    )


@query(
    "q13_order_count_distribution",
    oracle="""
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
        SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
        FROM customer c
        LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
    tags=("join", "agg", "tpch"),
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: customer distribution by order count — double
    aggregation with an outer join preserving zero-order customers."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@query(
    "q18_large_volume_orders",
    oracle="""
    SELECT c.c_name, o.o_orderkey, o.o_orderdate,
           round(o.o_totalprice, 2) AS o_totalprice,
           round(t.total_qty, 2) AS total_qty
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN (
        SELECT l_orderkey, sum(l_quantity) AS total_qty
        FROM lineitem GROUP BY l_orderkey
        HAVING sum(l_quantity) > 90
    ) t ON o.o_orderkey = t.l_orderkey
    """,
    tags=("join", "having", "tpch"),
)
def q18_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING on an aggregate, joined back to the
    header tables. The aggregate runs FIRST so only qualifying orderkeys
    (a tiny set) join against orders/customer."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 90)
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.round("total_qty", 2).alias("total_qty"),
        )
    )


@query(
    "q19_disjunctive_revenue",
    oracle="""
    SELECT ((sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) * 2 + 100) // 200)
           / 100.0 AS revenue
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#1' AND l.l_quantity BETWEEN 1 AND 11
           AND p.p_size BETWEEN 1 AND 5)
       OR (p.p_brand = 'Brand#2' AND l.l_quantity BETWEEN 10 AND 20
           AND p.p_size BETWEEN 1 AND 10)
       OR (p.p_brand = 'Brand#3' AND l.l_quantity BETWEEN 20 AND 30
           AND p.p_size BETWEEN 1 AND 15)
    """,
    tags=("join", "filter", "tpch"),
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs predicate groups spanning both join
    sides — exercises predicate normalization/pushdown across a join."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("l_quantity").between(1, 11) & F.col("p_size").between(1, 5))
        | ((F.col("p_brand") == "Brand#2") & F.col("l_quantity").between(10, 20) & F.col("p_size").between(1, 10))
        | ((F.col("p_brand") == "Brand#3") & F.col("l_quantity").between(20, 30) & F.col("p_size").between(1, 15))
    )
    return (
        j.filter(cond)
        .agg(
            F.sum(
                cents(F.col("l_extendedprice")) * (100 - cents(F.col("l_discount")))
            ).alias("s4")
        )
        .selectExpr("((s4 * 2 + 100) div 200) / 100.0D AS revenue")
    )


@query(
    "q22_global_sales_opportunity",
    oracle="""
    WITH avg_bal AS (
        SELECT avg(c_acctbal) AS a FROM customer WHERE c_acctbal > 0
    )
    SELECT right(c.c_name, 1) AS code,
           CAST(count(*) AS BIGINT) AS numcust,
           round(sum(c.c_acctbal), 2) AS totacctbal
    FROM customer c, avg_bal
    WHERE right(c.c_name, 1) IN ('1', '3', '5', '7', '9')
      AND c.c_acctbal > avg_bal.a
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderstatus = 'P')
    GROUP BY 1
    """,
    tags=("join", "anti", "subquery", "tpch"),
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar aggregate subquery (global avg of
    positive balances — a broadcast 1-row cross join) + NOT EXISTS
    anti-join + substring bucketing."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("a"))
    code = F.expr("right(c_name, 1)")
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(code.isin("1", "3", "5", "7", "9") & (F.col("c_acctbal") > F.col("a")))
        .join(o.filter(F.col("o_orderstatus") == "P"), c.c_custkey == o.o_custkey, "left_anti")
        .groupBy(code.alias("code"))
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


@query(
    "q4_order_priority",
    oracle="""
    SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
      AND EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey
            AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
      )
    GROUP BY 1
    """,
    tags=("semi", "subquery", "tpch"),
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (correlated EXISTS → left-semi join): orders in a
    one-year window having at least one line shipped >30 days after the
    order date (the commit/receipt lateness test adapted to this
    schema's columns), counted per priority."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 30 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


@query(
    "q6_revenue_forecast",
    oracle="""
    SELECT ((sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                 * CAST(round(l_discount * 100) AS BIGINT)) * 2 + 100) // 200)
           / 100.0 AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND round(l_discount * 100) BETWEEN 5 AND 7
      AND l_quantity < 24
    """,
    tags=("filter", "agg", "tpch"),
)
def q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: single-table predicate + product aggregate — the purest
    pushdown test (filters reach the parquet scan; no joins, one partial
    agg). Exact integer 10^-4-dollar units end-rounded half-up."""
    li = load_table(spark, sf_dir, "lineitem")
    sel = li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & cents(F.col("l_discount")).between(5, 7)
        & (F.col("l_quantity") < 24)
    )
    return (
        sel.agg(
            F.sum(cents(F.col("l_extendedprice")) * cents(F.col("l_discount"))).alias("s4")
        )
        .selectExpr("((s4 * 2 + 100) div 200) / 100.0D AS revenue")
    )


@query(
    "q10_returned_items",
    oracle="""
    WITH agged AS (
        SELECT c.c_custkey, c.c_name, n.n_name,
               round(c.c_acctbal, 2) AS c_acctbal,
               sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                   * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS s4
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate < TIMESTAMP '1996-04-01'
          AND l.l_returnflag = 'R'
        GROUP BY 1, 2, 3, 4
    )
    SELECT c_custkey, c_name, n_name, c_acctbal,
           ((s4 * 2 + 100) // 200) / 100.0 AS revenue
    FROM agged
    ORDER BY s4 DESC, c_custkey
    LIMIT 20
    """,
    tags=("join", "topk", "tpch"),
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returns per customer for a
    quarter, top 20. Ranked on the EXACT integer revenue (not the
    rounded double) with custkey tie-break → deterministic LIMIT."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    n = load_table(spark, sf_dir, "nation")
    rev = cents(F.col("l_extendedprice")) * (100 - cents(F.col("l_discount")))
    agged = (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
            & (F.col("l_returnflag") == "R")
        )
        .groupBy(
            "c_custkey", "c_name", "n_name",
            F.round("c_acctbal", 2).alias("c_acctbal"),
        )
        .agg(F.sum(rev).alias("s4"))
    )
    return (
        agged.orderBy(F.desc("s4"), F.asc("c_custkey"))
        .limit(20)
        .selectExpr(
            "c_custkey", "c_name", "n_name", "c_acctbal",
            "((s4 * 2 + 100) div 200) / 100.0D AS revenue",
        )
    )


@query(
    "q12_late_lines_by_priority",
    oracle="""
    SELECT l.l_returnflag,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
    GROUP BY 1
    """,
    tags=("join", "agg", "tpch"),
)
def q12_late_lines_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional counts of high- vs low-priority
    orders among LATE lineitems (>60 days ship lag — the ship-mode
    lateness test adapted to this schema), grouped by return flag."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .filter(li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "q14_promo_revenue",
    oracle="""
    SELECT round(100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                  THEN CAST(round(l.l_extendedprice * 100) AS BIGINT)
                       * (100 - CAST(round(l.l_discount * 100) AS BIGINT))
                  ELSE 0 END)
             / CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS DOUBLE),
             6) AS promo_revenue_pct
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-03-01'
      AND l.l_shipdate < TIMESTAMP '1996-04-01'
    """,
    tags=("join", "agg", "tpch"),
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promotional revenue share for one month — conditional
    ratio over a broadcast part join, integer-exact numerator and
    denominator with one final double division."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    rev = cents(F.col("l_extendedprice")) * (100 - cents(F.col("l_discount")))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0))
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0 * F.sum(promo) / F.sum(rev).cast("double"), 6
            ).alias("promo_revenue_pct")
        )
    )


@query(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                   * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS s4
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'
        GROUP BY 1
    )
    SELECT s.s_suppkey, s.s_name,
           ((r.s4 * 2 + 100) // 200) / 100.0 AS total_revenue
    FROM supplier s
    JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.s4 = (SELECT max(s4) FROM revenue)
    """,
    tags=("join", "subquery", "tpch"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: the supplier(s) achieving maximum quarterly revenue —
    view-style aggregate reused for both the per-supplier rows and the
    global max (a broadcast 1-row join), compared on EXACT integers so
    ties match the oracle bit-for-bit."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    rev = cents(F.col("l_extendedprice")) * (100 - cents(F.col("l_discount")))
    revenue = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(rev).alias("s4"))
    )
    mx = revenue.agg(F.max("s4").alias("mx"))
    return (
        s.join(revenue, s.s_suppkey == revenue.supplier_no)
        .crossJoin(F.broadcast(mx))
        .filter(F.col("s4") == F.col("mx"))
        .selectExpr(
            "s_suppkey", "s_name",
            "((s4 * 2 + 100) div 200) / 100.0D AS total_revenue",
        )
    )


@query(
    "q17_small_quantity_revenue",
    oracle="""
    WITH pq AS (
        SELECT l_partkey,
               sum(CAST(round(l_quantity * 100) AS BIGINT)) AS sum_qc,
               count(*) AS cnt
        FROM lineitem GROUP BY 1
    )
    SELECT ((sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) * 100 * 2 + 700)
            // (700 * 2)) / 100.0 AS avg_yearly
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN pq ON l.l_partkey = pq.l_partkey
    WHERE p.p_brand = 'Brand#1'
      AND p.p_size <= 3
      AND 5 * CAST(round(l.l_quantity * 100) AS BIGINT) * pq.cnt < pq.sum_qc
    """,
    tags=("join", "subquery", "agg", "tpch"),
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: lines below 20%% of their part's average
    quantity (correlated avg → one aggregate + join-back; the comparison
    is cross-multiplied to EXACT integers: 5·q·cnt < Σq), summed and
    divided by 7 with integer half-up rounding."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#1") & (F.col("p_size") <= 3)
    )
    qc = cents(F.col("l_quantity"))
    pq = li.groupBy("l_partkey").agg(
        F.sum(qc).alias("sum_qc"), F.count("*").alias("cnt")
    )
    sel = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(pq, "l_partkey")
        .filter(5 * qc * F.col("cnt") < F.col("sum_qc"))
    )
    return sel.agg(F.sum(cents(F.col("l_extendedprice"))).alias("sc")).selectExpr(
        "((sc * 100 * 2 + 700) div (700 * 2)) / 100.0D AS avg_yearly"
    )


@query(
    "q21_waiting_suppliers",
    oracle="""
    WITH late AS (
        SELECT l.l_orderkey, l.l_suppkey
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
    )
    SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM late l1
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    WHERE EXISTS (
            SELECT 1 FROM lineitem l2
            WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
          )
      AND NOT EXISTS (
            SELECT 1 FROM late l3
            WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          )
    GROUP BY 1
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
    tags=("semi", "anti", "subquery", "tpch"),
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (the hardest subquery pattern: correlated EXISTS
    and NOT EXISTS against two aliases of the same fact table): count,
    per supplier, late lines (>60-day ship lag — the commit/receipt
    lateness test adapted to this schema) on multi-supplier orders where
    that supplier was the ONLY late one. EXISTS → left-semi,
    NOT EXISTS → left-anti, both on (orderkey, suppkey<>) conditions."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    s = load_table(spark, sf_dir, "supplier")
    late = (
        load_table(spark, sf_dir, "lineitem")
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey")
    )
    l1 = late
    l2 = li.select(
        F.col("l_orderkey").alias("r_orderkey"), F.col("l_suppkey").alias("r_suppkey")
    )
    l3 = late.select(
        F.col("l_orderkey").alias("r_orderkey"), F.col("l_suppkey").alias("r_suppkey")
    )
    other = (F.col("l_orderkey") == F.col("r_orderkey")) & (
        F.col("l_suppkey") != F.col("r_suppkey")
    )
    waiting = l1.join(l2, other, "left_semi").join(l3, other, "left_anti")
    return (
        waiting.join(F.broadcast(s), waiting.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(100)
    )


@query(
    "q9_product_profit",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(year(o.o_orderdate) AS INT) AS o_year,
           ((sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                 * (100 - CAST(round(l.l_discount * 100) AS BIGINT)) * 10
                 - CAST(round(l.l_quantity * 100) AS BIGINT)
                   * CAST(round(p.p_retailprice * 100) AS BIGINT) * 2)
             * 2 + 1000) // 2000) / 100.0 AS profit
    FROM lineitem l
    JOIN part p     ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY 1, 2
    """,
    tags=("join", "agg", "tpch"),
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (five-way join + profit aggregate by nation and
    year): profit = revenue − 20%%-of-retail supply cost (the
    ps_supplycost stand-in — this schema has no partsupp), for parts
    matching '%%red%%'. All arithmetic in exact 10^-5-dollar integers,
    end-rounded to cents; part/supplier/nation dims broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    amount5 = (
        cents(F.col("l_extendedprice")) * (100 - cents(F.col("l_discount"))) * 10
        - cents(F.col("l_quantity")) * cents(F.col("p_retailprice")) * 2
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.sum(amount5).alias("s5"))
        .selectExpr(
            "nation", "o_year", "((s5 * 2 + 1000) div 2000) / 100.0D AS profit"
        )
    )


@query(
    "q16_supplier_part_counts",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM part p
    JOIN lineitem l ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_size IN (1, 2, 3, 4, 5)
      AND l.l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY 1, 2, 3
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    tags=("join", "anti", "distinct", "tpch"),
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct supplier counts per (brand, type,
    size) excluding one brand and a NOT-IN supplier set (negative
    balance — the complaints-comment test adapted to this schema).
    NOT IN → broadcast left-anti; countDistinct expands partially
    map-side before the final shuffle."""
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & F.col("p_size").isin(1, 2, 3, 4, 5)
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    bad = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@query(
    "q11_important_stock",
    oracle="""
    WITH v AS (
        SELECT n.n_name AS nation, l.l_partkey,
               sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                   * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS s4
        FROM lineitem l
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n   ON s.s_nationkey = n.n_nationkey
        GROUP BY 1, 2
    ),
    w AS (SELECT *, sum(s4) OVER (PARTITION BY nation) AS tot FROM v)
    SELECT nation, l_partkey, ((s4 * 2 + 100) // 200) / 100.0 AS part_value
    FROM w
    WHERE s4 * 200 > tot
    ORDER BY nation, part_value DESC, l_partkey
    """,
    tags=("agg", "having", "tpch"),
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (grouped value with a HAVING against a fraction
    of a total): per (supplier nation, part) shipped value, keeping
    parts above 0.5%% of their nation's total — adapted to this schema
    (no partsupp; lineitem is the supplier-part fact, and the single
    hardcoded nation becomes a per-nation grouping so every scale
    factor has qualifying rows).

    Spark-first scale note: the nation totals are a 25-row aggregate,
    so they're computed as a separate tiny agg and BROADCAST back —
    NOT a ``sum over (partition by nation)`` window, which would sort
    the full (nation, part) relation into 25 giant partitions at
    100 TB. The oracle uses the window form (identical semantics;
    DuckDB materializes it fine at oracle scale)."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    v = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), "l_partkey")
        .agg(
            F.sum(
                cents(F.col("l_extendedprice")) * (100 - cents(F.col("l_discount")))
            ).alias("s4")
        )
    )
    tot = v.groupBy("nation").agg(F.sum("s4").alias("tot"))
    return (
        v.join(F.broadcast(tot), "nation")
        .filter(F.col("s4") * 200 > F.col("tot"))
        .selectExpr(
            "nation", "l_partkey", "((s4 * 2 + 100) div 200) / 100.0D AS part_value"
        )
        .orderBy("nation", F.desc("part_value"), "l_partkey")
    )


@query(
    "q20_dominant_suppliers",
    oracle="""
    WITH f AS (
        SELECT l_partkey, l_suppkey,
               sum(CAST(round(l_quantity * 100) AS BIGINT)) AS sq
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
          AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%bolt%')
        GROUP BY 1, 2
    ),
    w AS (SELECT *, sum(sq) OVER (PARTITION BY l_partkey) AS tq FROM f)
    SELECT s.s_name, CAST(count(*) AS BIGINT) AS dominant_parts
    FROM w
    JOIN supplier s ON w.l_suppkey = s.s_suppkey
    WHERE w.sq * 2 > w.tq
    GROUP BY 1
    ORDER BY 1
    """,
    tags=("join", "semi", "window", "tpch"),
)
def q20_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (nested semi-join against a correlated aggregate
    threshold): suppliers who shipped MORE THAN HALF of a qualifying
    part's total 1997 volume, with the count of parts they dominate —
    adapted to this schema (no partsupp availqty; "excess stock"
    becomes "majority of shipped quantity", the same
    compare-my-slice-to-the-group-total pattern).

    Spark-first: the part-name filter is a broadcast LEFT SEMI before
    the aggregate (prunes the fact scan's groups); the per-part total
    is a ``sum over (partition by l_partkey)`` window — safe at scale
    because partition width is bounded by suppliers-per-part, not data
    volume; quantities aggregate as exact integer centi-units."""
    li = load_table(spark, sf_dir, "lineitem")
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%bolt%"))
        .select("p_partkey")
    )
    s = load_table(spark, sf_dir, "supplier")
    f = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(F.broadcast(p), li.l_partkey == p.p_partkey, "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(cents(F.col("l_quantity"))).alias("sq"))
    )
    w = W.partitionBy("l_partkey")
    return (
        f.withColumn("tq", F.sum("sq").over(w))
        .filter(F.col("sq") * 2 > F.col("tq"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").cast("long").alias("dominant_parts"))
        .orderBy("s_name")
    )
