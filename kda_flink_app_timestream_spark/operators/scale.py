"""Scale-engineering operators: bucketed co-located joins, salted skew
joins, and time-sliced sessionization — the levers that matter most at
100 TB beyond what AQE does automatically (AQE can split skewed JOIN
partitions but never WINDOW partitions, so ordered-window operators
need their own skew story).
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions.time import epoch_micros


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int = 16,
    sort_cols: Sequence[str] | None = None,
) -> None:
    """Persist a table bucketed (and optionally sorted) on its join key.

    Two tables bucketed the same way join with NO shuffle on either side
    (and no sort, if sorted) — for a recurring 100 TB fact-fact join the
    one-time bucketed write amortizes across every later query.
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS `{table}`")
    # a crashed previous write can leave the managed location behind with
    # no catalog entry — saveAsTable then fails LOCATION_ALREADY_EXISTS
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    leftover = os.path.join(warehouse.removeprefix("file:"), table.lower())
    if os.path.isdir(leftover):
        shutil.rmtree(leftover, ignore_errors=True)
    writer = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with key salting for pathological skew.

    The skewed LEFT side gets a random-ish (hash-derived, deterministic)
    salt in [0, salt_buckets); the RIGHT side is replicated once per salt
    value via an explode — so one hot key's rows spread over
    ``salt_buckets`` reducers instead of one. Use when AQE's skew-join
    split isn't available (non-shuffle joins) or the skew is extreme;
    costs a ``salt_buckets``× blow-up of the right side.

    Only left-preserving joins are legal: an unmatched RIGHT row exists
    once per replica, so right/full outer (or right semi/anti) would
    emit it ``salt_buckets`` times.

    The salt hashes the left row's CONTENT (all columns), never a
    positional id: ``monotonically_increasing_id`` re-numbers rows when
    a lost shuffle partition is recomputed, so a positional salt can
    route the recomputed rows to different reducers than the original
    attempt — the classic repartition-on-random correctness hazard
    under fault recovery at scale. Content-identical duplicate rows
    share a salt (they collapse onto one reducer); that only matters if
    the hot key's rows are also near-identical, in which case add a
    distinguishing column before salting.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "semi", "left_semi",
               "leftsemi", "anti", "left_anti", "leftanti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports only left-preserving joins {sorted(allowed)}; "
            f"got how={how!r} — the replicated right side would duplicate "
            "unmatched right rows"
        )
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt_buckets)
    )
    l_salted = left.withColumn("__salt", salt.cast("int"))
    r_salted = right.withColumn(
        "__salt",
        F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)])),
    )
    out = l_salted.join(r_salted, [key, "__salt"], how)
    return out.drop("__salt")


def sessionize_sliced(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_cols: Sequence[str] = ("event_id",),
    gap_seconds: int = 1800,
    slice_seconds: int = 3600,
) -> DataFrame:
    """Skew-proof sessionization: two-phase per-key time slicing.

    The classic gaps-and-islands formulation partitions an ordered
    window by ``user_col`` alone, so one pathological hot key (the skew
    rehearsal's 80%-hot fixture: 2.4 M rows on one user at sf1) lands
    its ENTIRE row set in a single window task — and AQE cannot split
    window partitions (SCALE.md, r3 residual #2). This operator bounds
    every task instead:

    - **Phase 1 (sliced local sessions)**: rows shuffle on
      ``(user, slice)`` where ``slice = epoch_seconds div
      slice_seconds`` — a hot user's rows spread over its time range,
      so the per-task row bound is ``slice_seconds × peak event rate``,
      independent of total per-user volume. Within each slice the usual
      lag → new-session flag → running sum produces *local* sessions,
      reduced immediately to one summary row (first/last ts, count)
      per local session.
    - **Phase 2 (border merge)**: summaries — bounded per user by
      (slices touched + true sessions), NOT by event count — go
      through the same gaps-and-islands on ``(first_ts, last_ts)``
      partitioned by user only. Two adjacent local sessions merge iff
      the border gap < ``gap_seconds``; chains merge transitively via
      the running sum, reconstructing the global sessions exactly
      (within-summary gaps are < gap by construction; summary-boundary
      gaps decide, same rule as row-level).

    Equivalence: ties share a timestamp so they share a slice, and the
    per-slice order ``(ts, *order_cols)`` equals the global order —
    slicing can only cut a session at a slice border, and phase 2
    rejoins exactly those cuts. Gap comparison is in exact
    microseconds; a new session starts when ``diff >= gap`` (the
    ``ts >= lag(ts) + INTERVAL gap`` convention of the DuckDB oracle).

    Returns one row per session: ``(user_col, session_start,
    session_end, n_events)``.
    """
    gap_us = gap_seconds * 1_000_000
    sliced = events.withColumn(
        "__slice",
        F.expr(
            f"unix_micros(cast(`{ts_col}` as timestamp)) div "
            f"{slice_seconds * 1_000_000}"
        ),
    )

    w1 = W.partitionBy(user_col, "__slice").orderBy(ts_col, *order_cols)
    prev_ts = F.lag(ts_col).over(w1)
    is_new = F.when(
        prev_ts.isNull()
        | ((epoch_micros(F.col(ts_col)) - epoch_micros(prev_ts)) >= gap_us),
        1,
    ).otherwise(0)
    w1run = w1.rowsBetween(W.unboundedPreceding, W.currentRow)
    local = sliced.withColumn("__sid", F.sum(is_new).over(w1run))
    summaries = local.groupBy(user_col, "__slice", "__sid").agg(
        F.min(ts_col).alias("first_ts"),
        F.max(ts_col).alias("last_ts"),
        F.count("*").alias("n"),
    )

    w2 = W.partitionBy(user_col).orderBy("first_ts", "last_ts")
    prev_last = F.lag("last_ts").over(w2)
    merge_new = F.when(
        prev_last.isNull()
        | ((epoch_micros(F.col("first_ts")) - epoch_micros(prev_last)) >= gap_us),
        1,
    ).otherwise(0)
    w2run = w2.rowsBetween(W.unboundedPreceding, W.currentRow)
    merged = summaries.withColumn("__gsid", F.sum(merge_new).over(w2run))
    return merged.groupBy(user_col, "__gsid").agg(
        F.min("first_ts").alias("session_start"),
        F.max("last_ts").alias("session_end"),
        F.sum("n").alias("n_events"),
    ).drop("__gsid")
