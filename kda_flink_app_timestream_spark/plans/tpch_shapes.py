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
