"""Relational operator coverage (SURVEY §2.2): scans, filters, joins of
every flavor, aggregations (grouped/distinct/rollup/cube/grouping-sets),
window functions, sorts/limits/top-k, set ops, scalar functions, pivot.

The reference contains none of these (its dataflow is source→map→window→
sink, StreamingJob.java:112-186); they are mandated by the driver
contract (BASELINE.json "same query and data-processing capabilities…
Beyond the reference's own surface…"). Everything here is built-in
PySpark — declarative DataFrame ops that Catalyst plans with pushdown,
pruning, AQE join selection and skew handling. Scale notes are on each
query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions.exact import cents, floor_round, spark_div_round
from ..functions.time import epoch_micros
from ..sources.batch import load_table
from .catalog import query

# ---------------------------------------------------------------------------
# Flagship: the batch analog of the reference pipeline — time-bucketed
# aggregation over the events stream table (StreamingJob.java:147-166's
# 10 s tumbling window, but keyed and parallel instead of windowAll's
# parallelism-1 global window).
# ---------------------------------------------------------------------------


@query(
    "events_tumbling_agg",
    oracle="""
    WITH agged AS (
        SELECT time_bucket(INTERVAL '10 seconds', CAST(ts AS TIMESTAMP)) AS window_start,
               event_type,
               CAST(count(*) AS BIGINT) AS n_events,
               sum(CAST(round(value * 100) AS BIGINT)) AS sum_cents
        FROM events
        GROUP BY 1, 2
    )
    SELECT window_start, event_type, n_events,
           sum_cents / 100.0 AS sum_value,
           ((sum_cents * 2 + n_events) // (n_events * 2)) / 100.0 AS avg_value
    FROM agged
    """,
    tags=("window", "agg", "flagship"),
)
def events_tumbling_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10 s tumbling event-time window × event_type → count/sum/avg.

    Batch analog of StreamingJob.java:147-166 (TumblingEventTimeWindows
    of 10 s) — except the reference's windowAll collapses to a single
    parallelism-1 task, while ``groupBy(window(...), key)`` here
    hash-partitions windows across all executors. At 100 TB the group-by
    does one shuffle with map-side partial aggregation; AQE coalesces
    output partitions.
    """
    events = load_table(spark, sf_dir, "events")
    agged = events.groupBy(
        F.window("ts", "10 seconds").start.alias("window_start"),
        "event_type",
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(cents(F.col("value"))).alias("sum_cents"),
    )
    # exact-integer aggregation + explicit half-up rounding: float sums
    # round differently across engines at exact half-boundaries
    # (functions/exact.py)
    return agged.selectExpr(
        "window_start",
        "event_type",
        "n_events",
        "sum_cents / 100.0D AS sum_value",
        f"({spark_div_round('sum_cents', 'n_events')}) / 100.0D AS avg_value",
    )


# ---------------------------------------------------------------------------
# Aggregation family
# ---------------------------------------------------------------------------


@query(
    "q1_pricing_summary",
    oracle="""
    WITH ints AS (
        SELECT l_returnflag, l_linestatus,
               CAST(round(l_quantity * 100) AS BIGINT) AS qc,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS pc,
               CAST(round(l_discount * 100) AS BIGINT) AS dc,
               CAST(round(l_tax * 100) AS BIGINT) AS tc
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2000-09-02'
    ),
    agged AS (
        SELECT l_returnflag, l_linestatus,
               sum(qc) AS sum_qc, sum(pc) AS sum_pc, sum(dc) AS sum_dc,
               sum(pc * (100 - dc)) AS s4,
               sum(pc * (100 - dc) * (100 + tc)) AS s6,
               CAST(count(*) AS BIGINT) AS n
        FROM ints GROUP BY 1, 2
    )
    SELECT l_returnflag, l_linestatus,
           sum_qc / 100.0 AS sum_qty,
           sum_pc / 100.0 AS sum_base_price,
           ((s4 * 2 + 100) // 200) / 100.0 AS sum_disc_price,
           ((s6 * 2 + 10000) // 20000) / 100.0 AS sum_charge,
           ((sum_qc * 2 + n) // (n * 2)) / 100.0 AS avg_qty,
           ((sum_pc * 2 + n) // (n * 2)) / 100.0 AS avg_price,
           ((sum_dc * 100 * 2 + n) // (n * 2)) / 10000.0 AS avg_disc,
           n AS count_order
    FROM agged
    """,
    tags=("agg", "scan", "filter"),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: filtered scan → 2-key hash agg with 8 aggregates.

    Scale: the WHERE reaches the parquet scan as a pushed filter and only
    8 of 11 columns are read (check `PushedFilters`/`ReadSchema` in
    explain). Partial aggregation runs map-side; the shuffle carries only
    |groups| × 8 values per partition.

    Money arithmetic runs on exact integer cents (functions/exact.py):
    the disc-price/charge PRODUCTS have 4-6 exact decimals, and float
    sums of them round differently across engines at half-boundaries.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp")
    )
    qc, pc = cents(F.col("l_quantity")), cents(F.col("l_extendedprice"))
    dc, tc = cents(F.col("l_discount")), cents(F.col("l_tax"))
    agged = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(qc).alias("sum_qc"),
        F.sum(pc).alias("sum_pc"),
        F.sum(dc).alias("sum_dc"),
        F.sum(pc * (100 - dc)).alias("s4"),
        F.sum(pc * (100 - dc) * (100 + tc)).alias("s6"),
        F.count("*").alias("n"),
    )
    return agged.selectExpr(
        "l_returnflag",
        "l_linestatus",
        "sum_qc / 100.0D AS sum_qty",
        "sum_pc / 100.0D AS sum_base_price",
        "((s4 * 2 + 100) div 200) / 100.0D AS sum_disc_price",
        "((s6 * 2 + 10000) div 20000) / 100.0D AS sum_charge",
        f"({spark_div_round('sum_qc', 'n')}) / 100.0D AS avg_qty",
        f"({spark_div_round('sum_pc', 'n')}) / 100.0D AS avg_price",
        f"({spark_div_round('sum_dc * 100', 'n')}) / 10000.0D AS avg_disc",
        "n AS count_order",
    )


@query(
    "agg_distinct_users",
    oracle="""
    WITH agged AS (
        SELECT event_type,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
               CAST(count(*) AS BIGINT) AS n_events,
               sum(CAST(round(value * 100) AS BIGINT)) AS sum_cents
        FROM events
        GROUP BY event_type
    )
    SELECT event_type, n_users, n_events,
           ((sum_cents * 2 + n_users) // (n_users * 2)) / 100.0 AS value_per_user
    FROM agged
    """,
    tags=("agg", "distinct"),
)
def agg_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregation (expand + two-phase agg in Spark's planner).
    The per-user ratio rounds on exact integer cents (functions/exact.py)."""
    events = load_table(spark, sf_dir, "events")
    agged = events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count("*").alias("n_events"),
        F.sum(cents(F.col("value"))).alias("sum_cents"),
    )
    return agged.selectExpr(
        "event_type",
        "n_users",
        "n_events",
        f"({spark_div_round('sum_cents', 'n_users')}) / 100.0D AS value_per_user",
    )


@query(
    "agg_rollup_nation_region",
    oracle="""
    SELECT r_name, n_name,
           CAST(count(*) AS BIGINT) AS n_customers,
           round(sum(c_acctbal), 2) AS total_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
    tags=("agg", "rollup", "join"),
)
def agg_rollup_nation_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over a region→nation hierarchy after two broadcast joins."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    joined = c.join(
        F.broadcast(n), c.c_nationkey == n.n_nationkey
    ).join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    return joined.rollup("r_name", "n_name").agg(
        F.count("*").alias("n_customers"),
        F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
    )


@query(
    "agg_cube_flags",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    tags=("agg", "cube"),
)
def agg_cube_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE (all 4 grouping combinations) on lineitem flags."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(o_totalprice), 2) AS total_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """,
    tags=("agg", "grouping-sets"),
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS: per-status totals ∪ per-priority totals."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS total_price
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """
    )


# ---------------------------------------------------------------------------
# Join family
# ---------------------------------------------------------------------------


@query(
    "q3_shipping_priority",
    oracle="""
    WITH agged AS (
        SELECT l_orderkey,
               sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                   * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS s4,
               o_orderdate, o_orderpriority
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1999-01-01'
          AND l_shipdate > TIMESTAMP '1999-01-01'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
    )
    SELECT l_orderkey, ((s4 * 2 + 100) // 200) / 100.0 AS revenue,
           o_orderdate, o_orderpriority
    FROM agged
    ORDER BY s4 DESC, l_orderkey
    LIMIT 10
    """,
    tags=("join", "agg", "topk"),
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join, filters on all inputs, agg, top-10.

    Scale: customer(filtered) is the small side → broadcast into orders;
    orders⋈lineitem shuffles on orderkey. All three filters push to the
    scans. LIMIT is totally ordered (revenue desc, orderkey) so the
    top-10 is deterministic.
    """
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1999-01-01").cast("timestamp")
    )
    pc = cents(F.col("l_extendedprice"))
    dc = cents(F.col("l_discount"))
    agged = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(pc * (100 - dc)).alias("s4"))
    )
    # exact-integer revenue: float product-sums round differently across
    # engines at half-boundaries, and the top-10 cut must order on the
    # exact value (functions/exact.py)
    return (
        agged.selectExpr(
            "l_orderkey",
            "((s4 * 2 + 100) div 200) / 100.0D AS revenue",
            "o_orderdate",
            "o_orderpriority",
            "s4",
        )
        .orderBy(F.desc("s4"), F.asc("l_orderkey"))
        .limit(10)
        .drop("s4")
    )


@query(
    "q5_region_revenue",
    oracle="""
    WITH agged AS (
        SELECT n_name,
               sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                   * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS s4
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1998-01-01'
        GROUP BY n_name
    )
    SELECT n_name, ((s4 * 2 + 100) // 200) / 100.0 AS revenue FROM agged
    """,
    tags=("join", "agg"),
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-table star join with a local-supplier condition.

    Scale: region/nation/supplier broadcast; the big fact-fact join
    (orders⋈lineitem) shuffles on orderkey; Catalyst reorders the
    broadcasts below the shuffle. The c_nationkey = s_nationkey equality
    rides along as a join condition, not a post-filter.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.sum(
                cents(F.col("l_extendedprice")) * (100 - cents(F.col("l_discount")))
            ).alias("s4")
        )
        .selectExpr("n_name", "((s4 * 2 + 100) div 200) / 100.0D AS revenue")
    )


@query(
    "join_semi_customers_with_orders",
    oracle="""
    SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_customers
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_mktsegment
    """,
    tags=("join", "semi"),
)
def join_semi_customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join (EXISTS): customers having ≥1 order, by segment.

    Scale: semi-join shuffles only the distinct key set of the right
    side; no row multiplication.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
    )


@query(
    "join_anti_customers_no_orders",
    oracle="""
    SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_customers,
           round(sum(c_acctbal), 2) AS total_acctbal
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_mktsegment
    """,
    tags=("join", "anti"),
)
def join_anti_customers_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join (NOT EXISTS): customers with no orders, by segment."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
        )
    )


@query(
    "join_left_outer_order_counts",
    oracle="""
    SELECT c_custkey,
           CAST(count(o_orderkey) AS BIGINT) AS n_orders,
           round(coalesce(sum(o_totalprice), 0.0), 2) AS total_spent
    FROM customer
    LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
    tags=("join", "outer", "agg"),
)
def join_left_outer_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join preserving order-less customers (count=0, spent=0)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("total_spent"),
        )
    )


@query(
    "join_theta_acctbal",
    oracle="""
    SELECT s_nationkey, CAST(count(*) AS BIGINT) AS n_pairs
    FROM supplier
    JOIN customer ON s_acctbal > c_acctbal AND s_nationkey = c_nationkey
    GROUP BY s_nationkey
    """,
    tags=("join", "theta"),
)
def join_theta_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta join: inequality predicate alongside an equi-key.

    Scale: the equi-part (nationkey) lets Spark plan a hash join with
    the inequality as a residual filter — never a cartesian product.
    Supplier is tiny → broadcast.
    """
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    return (
        c.join(
            F.broadcast(s),
            (s.s_acctbal > c.c_acctbal) & (s.s_nationkey == c.c_nationkey),
        )
        .groupBy("s_nationkey")
        .agg(F.count("*").alias("n_pairs"))
    )


@query(
    "join_range_quantity_size",
    oracle="""
    SELECT p_type, CAST(count(*) AS BIGINT) AS n_lines,
           round(sum(l_extendedprice), 2) AS total_price
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
             AND l_quantity BETWEEN p_size - 5 AND p_size + 5
    GROUP BY p_type
    """,
    tags=("join", "range"),
)
def join_range_quantity_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-band join: equi-key plus a BETWEEN band on the payload."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    cond = (
        (li.l_partkey == p.p_partkey)
        & (li.l_quantity >= p.p_size - 5)
        & (li.l_quantity <= p.p_size + 5)
    )
    return (
        li.join(F.broadcast(p), cond)
        .groupBy("p_type")
        .agg(
            F.count("*").alias("n_lines"),
            F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
        )
    )


# ---------------------------------------------------------------------------
# Window-function family
# ---------------------------------------------------------------------------


@query(
    "window_topk_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, CAST(rk AS INT) AS rk
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey
               ) AS rk
        FROM orders
    )
    WHERE rk <= 3
    """,
    tags=("window", "topk"),
)
def window_topk_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer via row_number() — the scalable top-k
    per group idiom (single shuffle on the partition key, no global sort)."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
    )


@query(
    "window_running_total",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ), 2) AS running_total
    FROM orders
    """,
    tags=("window", "frame"),
)
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative sum with an explicit ROWS frame (tie-broken by key)."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
    )


@query(
    "window_lag_event_gaps",
    oracle="""
    SELECT event_id, user_id,
           epoch_us(CAST(ts AS TIMESTAMP)) - lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
           ) AS gap_us,
           lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
           ) AS next_event_type
    FROM events
    """,
    tags=("window", "lag", "lead"),
)
def window_lag_event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead analytics: per-user inter-event gap (µs) and next event."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    us = epoch_micros(F.col("ts"))
    return e.select(
        "event_id",
        "user_id",
        (us - F.lag(us).over(w)).alias("gap_us"),
        F.lead("event_type").over(w).alias("next_event_type"),
    )


@query(
    "window_ntile_value_quartiles",
    oracle="""
    SELECT event_type, CAST(quartile AS INT) AS quartile,
           CAST(count(*) AS BIGINT) AS n,
           round(min(value), 2) AS min_value,
           round(max(value), 2) AS max_value
    FROM (
        SELECT event_type, value,
               ntile(4) OVER (PARTITION BY event_type ORDER BY value, event_id) AS quartile
        FROM events
    )
    GROUP BY event_type, quartile
    """,
    tags=("window", "ntile"),
)
def window_ntile_value_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile(4) bucketing then per-bucket min/max/count."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("event_type").orderBy("value", "event_id")
    return (
        e.select("event_type", "value", F.ntile(4).over(w).alias("quartile"))
        .groupBy("event_type", "quartile")
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("value"), 2).alias("min_value"),
            F.round(F.max("value"), 2).alias("max_value"),
        )
    )


# ---------------------------------------------------------------------------
# Sorts / limits / set ops
# ---------------------------------------------------------------------------


@query(
    "sort_top10_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
    tags=("sort", "limit"),
)
def sort_top10_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 — Spark plans TakeOrderedAndProject (per-partition
    top-10 then a 10-row merge on the driver; no global sort at 100 TB)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )


@query(
    "setops_active_or_rich",
    oracle="""
    SELECT * FROM (
        (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
         UNION
         SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
        INTERSECT
        SELECT o_custkey AS c_custkey FROM orders
    )
    """,
    tags=("setop",),
)
def setops_active_or_rich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) then INTERSECT — parenthesized explicitly in the
    oracle: SQL gives INTERSECT HIGHER precedence than UNION, so the
    unparenthesized form means A ∪ (B ∩ C), not the (A ∪ B) ∩ C
    this DataFrame chain computes."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    rich = c.filter(F.col("c_acctbal") > 9000).select("c_custkey")
    with_orders = o.select(F.col("o_custkey").alias("c_custkey"))
    return building.union(rich).distinct().intersect(with_orders)


@query(
    "setops_except_inactive",
    oracle="""
    SELECT c_custkey FROM customer
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    tags=("setop",),
)
def setops_except_inactive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct set difference).

    ``subtract`` IS SQL's EXCEPT DISTINCT. The previous
    ``exceptAll().distinct()`` composition diverges on duplicated left
    rows (a row appearing 3× left / 1× right survives bag-subtraction
    with multiplicity 2 and then distincts to PRESENT, where EXCEPT
    drops it entirely) — identical results here only because c_custkey
    is unique; review fix keeps the operator honest for any input."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    finished = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return c.select("c_custkey").subtract(finished)


# ---------------------------------------------------------------------------
# Scalar-function family (string / date / json / conditional)
# ---------------------------------------------------------------------------


@query(
    "scalar_string_funcs",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS name_upper,
           CAST(length(p_name) AS BIGINT) AS name_len,
           substr(p_name, 1, 5) AS name_prefix,
           replace(p_name, ' ', '_') AS name_snake,
           concat(p_brand, ':', p_type) AS brand_type,
           CAST(regexp_extract(p_brand, '[0-9]+') AS BIGINT) AS brand_num,
           split_part(p_name, ' ', 2) AS name_word2
    FROM part
    WHERE p_partkey < 100
    """,
    tags=("scalar", "string"),
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function battery: case, length, substr, replace, concat,
    regexp extraction, token split — all JVM-codegen'd expressions."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 100)
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").cast("long").alias("name_len"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.regexp_extract("p_brand", r"[0-9]+", 0).cast("long").alias("brand_num"),
        # split_part matches the oracle's missing-token contract ('' when
        # the index exceeds the parts); the previous split().getItem(1)
        # returned NULL there — divergent on any one-word name (review
        # fix; TPC-H part names are always multi-word, so results here
        # are identical)
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(2)).alias("name_word2"),
    )


@query(
    "scalar_date_funcs",
    oracle="""
    SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS order_month,
           CAST(year(o_orderdate) AS BIGINT) AS order_year,
           CAST(month(o_orderdate) AS BIGINT) AS order_month_num,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(o_totalprice), 2) AS monthly_total
    FROM orders
    GROUP BY 1, 2, 3
    """,
    tags=("scalar", "date", "agg"),
)
def scalar_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date bucketing: date_trunc/year/month over the order history."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy(
        F.date_trunc("month", "o_orderdate").alias("order_month"),
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.month("o_orderdate").cast("long").alias("order_month_num"),
    ).agg(
        F.count("*").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("monthly_total"),
    )


@query(
    "scalar_json_extract",
    oracle="""
    WITH agged AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
                   AS sum_k
        FROM events
        GROUP BY event_type
    )
    SELECT event_type, n, sum_k,
           ((sum_k * 100 * 2 + n) // (n * 2)) / 100.0 AS avg_k
    FROM agged
    """,
    tags=("scalar", "json", "agg"),
)
def scalar_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-in-string extraction (events.props like ``{"k": 87}``).

    ``get_json_object`` stays JVM-side; at scale prefer ``from_json``
    with an explicit schema once the shape is known (single parse,
    typed struct, prunable).
    """
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    agged = e.groupBy("event_type").agg(
        F.count("*").alias("n"), F.sum(k).alias("sum_k")
    )
    return agged.selectExpr(
        "event_type",
        "n",
        "sum_k",
        f"({spark_div_round('sum_k * 100', 'n')}) / 100.0D AS avg_k",
    )


@query(
    "scalar_case_buckets",
    oracle="""
    WITH agged AS (
        SELECT CASE WHEN c_acctbal < 0 THEN 'negative'
                    WHEN c_acctbal < 3000 THEN 'low'
                    WHEN c_acctbal < 7000 THEN 'mid'
                    ELSE 'high' END AS balance_bucket,
               CAST(count(*) AS BIGINT) AS n_customers,
               sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS sum_cents
        FROM customer
        GROUP BY 1
    )
    SELECT balance_bucket, n_customers,
           floor((sum_cents * 2 + n_customers) / (n_customers * 2.0)) / 100.0
               AS avg_balance
    FROM agged
    """,
    tags=("scalar", "conditional"),
)
def scalar_case_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN bucketing + aggregation."""
    c = load_table(spark, sf_dir, "customer")
    bucket = (
        F.when(F.col("c_acctbal") < 0, "negative")
        .when(F.col("c_acctbal") < 3000, "low")
        .when(F.col("c_acctbal") < 7000, "mid")
        .otherwise("high")
        .alias("balance_bucket")
    )
    agged = c.groupBy(bucket).agg(
        F.count("*").alias("n_customers"),
        F.sum(cents(F.col("c_acctbal"))).alias("sum_cents"),
    )
    # double-floor rounding: balances can be NEGATIVE, and integer `div`
    # truncates toward zero (≠ floor) — functions/exact.py
    return agged.select(
        "balance_bucket",
        "n_customers",
        (floor_round(F.col("sum_cents"), F.col("n_customers")) / 100.0).alias(
            "avg_balance"
        ),
    )


@query(
    "pivot_daily_event_matrix",
    oracle="""
    SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS day,
           CAST(count(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS click,
           CAST(count(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT) AS error,
           CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS purchase,
           CAST(count(CASE WHEN event_type = 'signup' THEN 1 END) AS BIGINT) AS signup,
           CAST(count(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS view
    FROM events
    GROUP BY 1
    """,
    tags=("pivot", "agg"),
)
def pivot_daily_event_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: day × event_type count matrix (explicit pivot values so no
    extra value-discovery job runs — mandatory at scale)."""
    e = load_table(spark, sf_dir, "events")
    kinds = ["click", "error", "purchase", "signup", "view"]
    pivoted = (
        e.groupBy(F.date_trunc("day", "ts").alias("day"))
        .pivot("event_type", kinds)
        .count()
    )
    return pivoted.select(
        "day", *[F.coalesce(F.col(k), F.lit(0)).alias(k) for k in kinds]
    )
