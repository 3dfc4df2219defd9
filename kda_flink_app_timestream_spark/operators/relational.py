"""Composed relational operators Spark lacks as single primitives.

As-of join: Spark has no native ASOF JOIN (DuckDB/Pandas do). The
scalable formulation here is the union-and-forward-fill trick: tag both
sides, union on (key, ts), and carry the latest right-side payload
forward with ``last(..., ignorenulls)`` over an ordered window. That is
ONE shuffle on the partition key — same cost as a regular join — versus
the naive per-row subquery (quadratic) or a per-group
``pd.merge_asof`` (Python serde + memory-bound groups).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions.time import epoch_seconds


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    right_payload: Sequence[str],
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach the payload of the latest right row with
    ``right[right_ts] <= left[left_ts]`` and matching key(s) (backward
    as-of, inclusive — DuckDB ``ASOF LEFT JOIN`` semantics).

    Right rows sort before left rows at equal timestamps so an exact tie
    matches (<=, not <). Payload columns come back as ``{col}{suffix}``.

    Scale: one shuffle on ``on``; window state is a single struct per
    key (the forward-fill), so skewed keys cost memory O(1) per row
    streamed, not O(group).
    """
    keys = [on] if isinstance(on, str) else list(on)
    payload = F.struct(*[F.col(c) for c in right_payload])

    r = right.select(
        *keys,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        payload.alias("__payload"),
        *[F.lit(None).alias(f"__l_{c}") for c in left.columns],
    )
    l = left.select(
        *keys,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
        *[F.col(c).alias(f"__l_{c}") for c in left.columns],
    )
    w = (
        W.partitionBy(*keys)
        .orderBy("__ts", "__is_left")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = r.unionByName(l).withColumn(
        "__match", F.last("__payload", ignorenulls=True).over(w)
    )
    out = filled.filter(F.col("__is_left") == 1).select(
        *[F.col(f"__l_{c}").alias(c) for c in left.columns],
        *[F.col("__match").getField(c).alias(f"{c}{suffix}") for c in right_payload],
    )
    return out


def topk_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence,
    k: int,
    rank_col: str = "rk",
) -> DataFrame:
    """Top-k rows per group via row_number() — single shuffle, no global
    sort; the per-partition heap keeps memory at O(k) per group."""
    w = W.partitionBy(*group_cols).orderBy(*order_cols)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)


def interval_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_start: str,
    right_end: str,
    bucket_seconds: int = 600,
    extra_keys: Sequence[str] = (),
) -> DataFrame:
    """Point-in-interval join (``left.ts ∈ [right.start, right.end]``)
    without an equi-key.

    Naively this is a nested-loop join (quadratic — Spark plans BNLJ).
    The scalable formulation manufactures an equi-key: time is cut into
    fixed buckets; each interval EXPLODES onto every bucket it overlaps,
    each point maps to its single bucket, and the join becomes a hash
    join on (bucket, *extra_keys) with the exact BETWEEN as a residual
    filter. Cost: interval replication ×(len/bucket + 1) — pick
    ``bucket_seconds`` near the median interval length.
    """
    b = F.lit(bucket_seconds)
    l_bucket = (epoch_seconds(F.col(left_ts)) / b).cast("long")
    r_from = (epoch_seconds(F.col(right_start)) / b).cast("long")
    r_to = (epoch_seconds(F.col(right_end)) / b).cast("long")

    l = left.withColumn("__bucket", l_bucket)
    r = right.withColumn("__bucket", F.explode(F.sequence(r_from, r_to)))
    cond = [F.col(f"l.__bucket") == F.col(f"r.__bucket")] + [
        F.col(f"l.{k}") == F.col(f"r.{k}") for k in extra_keys
    ]
    joined = l.alias("l").join(r.alias("r"), cond)
    within = (F.col(f"l.{left_ts}") >= F.col(f"r.{right_start}")) & (
        F.col(f"l.{left_ts}") <= F.col(f"r.{right_end}")
    )
    keep = [F.col(f"l.{c}") for c in left.columns] + [
        F.col(f"r.{c}") for c in right.columns if c not in left.columns
    ]
    return joined.filter(within).select(*keep)
