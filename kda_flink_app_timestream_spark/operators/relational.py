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

from ..functions.time import epoch_micros, epoch_seconds


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    right_payload: Sequence[str],
    suffix: str = "_asof",
    direction: str = "backward",
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """For each left row, attach the payload of the nearest right row
    with matching key(s): ``direction="backward"`` takes the latest
    right row with ``right_ts <= left_ts`` (DuckDB ``ASOF LEFT JOIN``
    semantics), ``"forward"`` the earliest with ``right_ts >= left_ts``.
    ``tolerance_seconds`` (optional) nulls the match when the nearest
    row is farther than the bound — pandas ``merge_asof(tolerance=…)``
    semantics, LEFT rows are always kept.

    Ties: the right row sorts on the matching side of the left row at
    equal timestamps, so an exact tie matches in either direction
    (<=/>=, not strict). Payload columns come back as ``{col}{suffix}``.

    Precondition (review note): right rows should be UNIQUE per
    ``(key, right_ts)`` — with duplicates there, which payload wins is
    tie-order-dependent (here, DuckDB's ASOF, and pandas merge_asof all
    leave it unspecified); dedupe or add a finer ts first if it matters.

    Scale: one shuffle on ``on``; window state is a single struct per
    key (the forward-/backward-fill), so skewed keys cost memory O(1)
    per row streamed, not O(group).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    # carry the matched row's ts inside the struct so the tolerance
    # bound can be applied after the fill
    payload = F.struct(
        F.col(right_ts).alias("__match_ts"),
        *[F.col(c) for c in right_payload],
    )

    # tie order: backward wants right BEFORE left (last() picks it up at
    # <=); forward wants right AFTER left (first() in the following
    # frame sees it at >=)
    right_rank = 0 if direction == "backward" else 1
    r = right.select(
        *keys,
        F.col(right_ts).alias("__ts"),
        F.lit(right_rank).alias("__side"),
        payload.alias("__payload"),
        *[F.lit(None).alias(f"__l_{c}") for c in left.columns],
    )
    l = left.select(
        *keys,
        F.col(left_ts).alias("__ts"),
        F.lit(1 - right_rank).alias("__side"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
        *[F.col(c).alias(f"__l_{c}") for c in left.columns],
    )
    base = W.partitionBy(*keys).orderBy("__ts", "__side")
    if direction == "backward":
        w = base.rowsBetween(W.unboundedPreceding, W.currentRow)
        fill = F.last("__payload", ignorenulls=True).over(w)
    else:
        w = base.rowsBetween(W.currentRow, W.unboundedFollowing)
        fill = F.first("__payload", ignorenulls=True).over(w)
    filled = r.unionByName(l).withColumn("__match", fill)
    match = F.col("__match")
    if tolerance_seconds is not None:
        # Exact-microsecond gap: testdata timestamps carry microsecond
        # precision, and SQL `INTERVAL n SECOND` bounds compare exactly.
        # Whole-second epoch math truncates, letting a true gap in
        # (n, n+1) seconds pass a floor-diff == n check.
        gap = F.abs(
            epoch_micros(match.getField("__match_ts")) - epoch_micros(F.col("__ts"))
        )
        match = F.when(gap <= tolerance_seconds * 1_000_000, F.col("__match"))
    is_left = F.col("__side") == (1 - right_rank)
    out = filled.filter(is_left).select(
        *[F.col(f"__l_{c}").alias(c) for c in left.columns],
        *[match.getField(c).alias(f"{c}{suffix}") for c in right_payload],
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
