"""Scale-engineering queries: the skew/salting lever exposed as a
scored, oracle-paired query.

``operators/scale.py`` holds the machinery (bucketed writes, salted
joins); this module proves the salted join is SEMANTICS-PRESERVING —
its output hash-matches the plain-join oracle — so a user can reach for
it on a skewed 100 TB key without wondering whether it changes results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import cents
from ..operators.scale import salted_join
from ..sources.batch import load_table
from .catalog import query

SALT_BUCKETS = 8

_SALTED_ORACLE = """
WITH dim AS (
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS type_events,
           CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS type_value_cents
    FROM events
    GROUP BY event_type
)
SELECT e.event_id, e.user_id, e.event_type, d.type_events, d.type_value_cents
FROM events e JOIN dim d USING (event_type)
"""


@query("join_salted_skew", oracle=_SALTED_ORACLE, tags=("join", "skew", "salting", "scale"))
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted equi-join on a 5-distinct-value key (``event_type``
    — every key is hot by construction): the fact side gets a
    deterministic salt, the dim side replicates once per salt value, so
    one hot key's rows spread over ``SALT_BUCKETS`` reducers instead of
    piling onto one.

    The oracle is the PLAIN join — bit-identical output is the whole
    point (salting only changes partitioning). The dim here is small
    enough to broadcast (which would also kill the skew); the join is
    hinted onto the shuffle path precisely so the salted plan is what
    executes and gets scored. At real scale the use case is fact-fact
    joins whose build side exceeds broadcast limits; AQE's skew split
    handles sort-merge joins, salting covers the rest.

    Exact-integer cents (``floor(value·100)``) keep the per-type sums
    engine-portable (double SUM order differs between Spark and DuckDB).
    """
    ev = load_table(spark, sf_dir, "events")
    dim = ev.groupBy("event_type").agg(
        F.count("*").alias("type_events"),
        F.sum(F.floor(F.col("value") * 100).cast("long")).alias("type_value_cents"),
    )
    fact = ev.select("event_id", "user_id", "event_type")
    joined = salted_join(fact, dim.hint("shuffle_hash"), "event_type", SALT_BUCKETS)
    return joined.select(
        "event_id", "user_id", "event_type", "type_events", "type_value_cents"
    )


BUCKET_N = 16

_BUCKETED_ORACLE = """
SELECT o.o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
GROUP BY o.o_orderpriority
"""


@query(
    "join_bucketed_colocated",
    oracle=_BUCKETED_ORACLE,
    tags=("join", "bucketing", "scale"),
)
def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact join over BUCKETED storage: both tables are persisted
    ``bucketBy(16, o_orderkey)`` + sorted, so the sort-merge join reads
    co-located, pre-sorted buckets — NO exchange and no sort on either
    side (`tests/test_scale_ops.py::test_bucketed_join_has_no_shuffle`
    pins the plan). This is THE lever for a recurring 100 TB fact-fact
    join whose build side exceeds broadcast limits: the one-time
    bucketed write amortizes the shuffle across every later query.

    The query pays the bucketed write each run (honest: at scale it's a
    one-time layout decision, and the write cost is the thing being
    amortized); the join itself is hinted MERGE so the bucketed SMJ path
    executes even where the optimizer would broadcast at test scale.
    Exact-integer cents (prices carry ≤ 2 decimals) keep the aggregate
    engine-portable."""
    from ..operators.scale import write_bucketed

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"),
        cents(F.col("l_extendedprice")).alias("price_cents"),
    )
    write_bucketed(o, "bq_orders", ["o_orderkey"], BUCKET_N, sort_cols=["o_orderkey"])
    write_bucketed(li, "bq_lineitem", ["o_orderkey"], BUCKET_N, sort_cols=["o_orderkey"])
    joined = spark.table("bq_orders").hint("merge").join(
        spark.table("bq_lineitem"), "o_orderkey"
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_lines"),
        F.sum("price_cents").alias("revenue_cents"),
    )
