"""Distributed k-means over embedding columns — the codebook trainer
the IVF index defers to (operators/similarity.py:229 calls it "an
offline iterative job") and the clustering stage of SemDeDup-style
semantic deduplication (cluster, then near-dup only within a cluster).

Spark-first shape — the same one MLlib's KMeans uses, expressed in
DataFrame ops:

- **Centroids are model state, not data.** k·dim integers live on the
  driver and are inlined into the plan each round (MLlib ships them as
  a broadcast variable; at literal-unfriendly k·dim, switch to a
  broadcast-DataFrame join + ``min_by`` — same semantics, one extra
  shuffle). The corpus itself NEVER moves.
- **Assignment is a pure projection.** Nearest centroid =
  ``array_min`` over a ``transform`` of the inlined centroid array —
  no join, no window, no shuffle, whole-stage-codegen friendly.
- **Update is a tree-aggregate.** ``posexplode`` + ``groupBy(cid,
  pos).sum`` collapses, via map-side partial aggregation, to
  ≤ partitions · k · dim cells before the single shuffle; the k·dim
  result rows come back to the driver to seed the next round.
- **The driver loop is over iterations, not rows** — each round is one
  fixed-size job.

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
from pyspark.sql import functions as F

from ..sources.batch import scatter
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


def _centroid_literal(cents: list[tuple[int, list[int]]]) -> Column:
    """The k centroids inlined as an ``array<struct<cid, cv>>`` literal.

    Built as ONE ``F.expr`` SQL string instead of nested
    ``F.array``/``F.lit`` calls: k·dim literals via the Column API cost
    a py4j round-trip each (~1.5 s for 8×64 at local latency, and the
    assignment plan is rebuilt every Lloyd round), while a single SQL
    parse of the same tree is milliseconds on the JVM."""
    structs = ", ".join(
        f"named_struct('cid', {int(cid)}L, 'cv', array("
        + ", ".join(f"{int(v)}L" for v in cv)
        + "))"
        for cid, cv in cents
    )
    return F.expr(f"array({structs})")


def _assign(pts: DataFrame, cents: list[tuple[int, list[int]]]) -> DataFrame:
    """Nearest centroid per point (ties → smaller cluster id) as a pure
    narrow projection: ``array_min`` over (dist_sq, cid) structs orders
    lexicographically, so the min is the closest centroid with the
    smallest id breaking ties. Zero shuffle at any corpus size."""
    cand = F.transform(
        _centroid_literal(cents),
        lambda c: F.struct(
            _sq_dist(F.col("qv"), c["cv"]).alias("dist_sq"),
            c["cid"].alias("cid"),
        ),
    )
    best = F.array_min(cand)
    return pts.select(
        "pid", "qv", best["cid"].alias("cid"), best["dist_sq"].alias("dist_sq")
    )


def _update(assigned: DataFrame) -> list[tuple[int, list[int]]]:
    """New centroids: element-wise integer mean of each cluster's
    members (``sum div count`` — truncating division, the portable
    semantics), tree-aggregated to k·dim cells and assembled on the
    driver. An emptied cluster simply disappears (deterministically on
    both engines)."""
    per_dim = (
        assigned.select("cid", F.posexplode("qv").alias("pos", "v"))
        .groupBy("cid", "pos")
        .agg(F.expr("sum(v) div count(*)").alias("cv_el"))
        .collect()
    )
    by_cid: dict[int, dict[int, int]] = {}
    for r in per_dim:
        by_cid.setdefault(r["cid"], {})[r["pos"]] = r["cv_el"]
    return sorted(
        (cid, [dims[p] for p in sorted(dims)]) for cid, dims in by_cid.items()
    )


def kmeans_assign(
    df: DataFrame,
    k: int = KMEANS_K,
    iters: int = KMEANS_ITERS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd's k-means: ``iters`` assignment rounds with ``iters - 1``
    centroid updates between them; returns the final assignment
    ``(vec_id, cluster_id, dist_sq)``.

    Init is deterministic: the k vectors with the smallest ids seed the
    centroids (k-means++ would trade determinism for quality; for a
    reproducible pipeline stage, fixed seeding wins). The quantized
    corpus is cached — every update round re-scans it."""
    pts = scatter(
        df.select(F.col(id_col).alias("pid"), quantize_vec(F.col(vec_col)).alias("qv"))
    ).cache()
    cents = sorted(
        (r["pid"], list(r["qv"]))
        for r in pts.filter(F.col("pid") < k).collect()
    )
    assigned = _assign(pts, cents)
    for _ in range(iters - 1):
        cents = _update(assigned)
        assigned = _assign(pts, cents)
    return assigned.select(
        F.col("pid").alias(id_col),
        F.col("cid").alias("cluster_id"),
        F.col("dist_sq"),
    )
