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
