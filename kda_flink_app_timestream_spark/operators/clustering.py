"""Distributed k-means over embedding columns — the codebook trainer
the IVF index defers to (operators/similarity.py:229 calls it "an
offline iterative job") and the clustering stage of SemDeDup-style
semantic deduplication (cluster, then near-dup only within a cluster).

Spark-first shape (the same one MLlib's KMeans uses, expressed in pure
DataFrame ops):

- **Assignment is broadcast-side.** The centroid table is k rows; it
  broadcasts, so assigning N vectors is a narrow map over the corpus —
  the corpus NEVER shuffles for assignment, at any scale.
- **Update is a tree-aggregate.** Recomputing centroids is a
  ``groupBy(cluster, dim).sum`` over the exploded vectors: map-side
  partial aggregation collapses each partition to ≤ k·dim cells before
  the shuffle, so the update shuffle moves O(partitions · k · dim)
  rows, independent of N.
- **The driver loop is over iterations, not rows** — a handful of
  rounds, each a fixed-size plan.

Cross-engine determinism: float centroid averaging is order-dependent
in the last bits (Spark's partial-agg order ≠ DuckDB's), so vectors are
quantized ONCE to integers (``floor(x · 2^20)`` as bigint — exact: a
float32 times a power of two is exactly representable in double, and
floor has no half-way ambiguity, unlike cast-rounding). Distances and
centroid means then stay in exact bigint arithmetic: sums are
order-independent, and Spark's ``div`` matches DuckDB's ``//``
(both truncate toward zero). Max magnitude: |q| ≤ 2^21 ⇒ squared
distance ≤ dim · 2^44 ≪ 2^63.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .similarity import as_double

KMEANS_K = 8
KMEANS_ITERS = 2
KMEANS_SCALE = 1 << 20


def quantize_vec(vec: Column, scale: int = KMEANS_SCALE) -> Column:
    """``array<float>`` → ``array<long>`` of ``floor(x · scale)``."""
    return F.transform(
        as_double(vec), lambda x: F.floor(x * F.lit(float(scale))).cast("long")
    )


def _sq_dist(a: Column, b: Column) -> Column:
    """Exact integer squared L2 distance between two ``array<long>``."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def _assign(pts: DataFrame, cents: DataFrame) -> DataFrame:
    """Nearest centroid per point (ties → smaller cluster id).

    ``crossJoin(broadcast(k rows))`` + a per-point row_number over k
    candidates: narrow over the corpus; the window partitions by point
    id with exactly k rows each — no skew possible."""
    w = W.partitionBy("pid").orderBy("dist_sq", "cid")
    return (
        pts.crossJoin(F.broadcast(cents))
        .withColumn("dist_sq", _sq_dist(F.col("qv"), F.col("cv")))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("pid", "qv", F.col("cid"), "dist_sq")
    )


def _update(assigned: DataFrame, dim: int) -> DataFrame:
    """New centroid per cluster: element-wise integer mean of members
    (``sum div count`` — truncating division, the portable semantics).
    An emptied cluster simply disappears (deterministically on both
    engines)."""
    long_form = assigned.select("cid", F.posexplode("qv").alias("pos", "v"))
    per_dim = long_form.groupBy("cid", "pos").agg(
        F.expr("sum(v) div count(*)").alias("cv_el")
    )
    return per_dim.groupBy("cid").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "cv_el"))),
            lambda s: s["cv_el"],
        ).alias("cv")
    )


def kmeans_assign(
    df: DataFrame,
    k: int = KMEANS_K,
    iters: int = KMEANS_ITERS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Lloyd's k-means: ``iters`` assignment rounds with ``iters - 1``
    centroid updates between them; returns the final assignment
    ``(vec_id, cluster_id, dist_sq)``.

    Init is deterministic: the k vectors with the smallest ids seed the
    centroids (k-means++ would trade determinism for quality; for a
    reproducible pipeline stage, fixed seeding wins). The quantized
    corpus is cached — every round re-reads it, and at 100 TB the
    long-form explode would otherwise re-run per iteration."""
    pts = df.select(
        F.col(id_col).alias("pid"), quantize_vec(F.col(vec_col)).alias("qv")
    ).cache()
    cents = pts.filter(F.col("pid") < k).select(
        F.col("pid").alias("cid"), F.col("qv").alias("cv")
    )
    assigned = _assign(pts, cents)
    for _ in range(iters - 1):
        cents = _update(assigned, dim)
        assigned = _assign(pts, cents)
    return assigned.select(
        F.col("pid").alias(id_col),
        F.col("cid").alias("cluster_id"),
        F.col("dist_sq"),
    )
