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
  no join, no window, no shuffle, whole-stage-codegen friendly. Above
  ``ASSIGN_VECTORIZE_CELLS`` k·dim cells the same projection switches
  to an Arrow ``mapInPandas`` BLAS matmul (still zero-shuffle): the
  r4 100× rehearsal measured the HOF fold at k=782 taking ~50 s per
  round at 200 k vectors (O(N·k·dim) element-wise expression eval),
  vs ~2 s vectorized — identical results, because every intermediate
  is an integer < 2^53 and therefore EXACT in float64 (|q|,|c| ≤ 2^21
  ⇒ products ≤ 2^42, 64-dim sums ≤ 2^48, distances ≤ 2^50).
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

from ..session import defer_release
from ..sources.batch import scatter
from .similarity import as_double

KMEANS_K = 8
KMEANS_ITERS = 2
KMEANS_SCALE = 1 << 20
# k·dim threshold above which assignment runs as an Arrow matmul rather
# than an inlined-literal expression fold (identical exact results; see
# module docstring — the fold is ~25x slower at rehearsal scale and the
# literal tree itself stops being codegen-friendly)
ASSIGN_VECTORIZE_CELLS = 4096


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
    narrow projection — zero shuffle at any corpus size. Small k·dim:
    ``array_min`` over (dist_sq, cid) structs of the inlined centroid
    literal (lexicographic min = closest centroid, smallest id breaking
    ties). Large k·dim: the Arrow matmul twin with the identical
    contract (``argmin`` returns the FIRST minimum and centroids are
    sorted by cid, so tie-breaking matches the struct ordering)."""
    if len(cents) * max((len(cv) for _, cv in cents), default=0) > ASSIGN_VECTORIZE_CELLS:
        return _assign_vectorized(pts, cents)
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


def _assign_vectorized(
    pts: DataFrame, cents: list[tuple[int, list[int]]]
) -> DataFrame:
    """Large-k assignment as one Arrow-batched BLAS matmul per input
    batch: ``dist² = |q|² + |c|² − 2·q·cᵀ``. Exact despite float64 —
    every term is an integer below 2^53 (see module docstring), so the
    distances come out as exact integers and ``argmin`` decides on the
    same values the integer fold computes. Centroids ride along as a
    closure broadcast; the corpus still never shuffles."""
    import numpy as np
    import pandas as pd

    cid_arr = np.array([cid for cid, _ in cents], dtype=np.int64)
    cmat = np.array([cv for _, cv in cents], dtype=np.float64)
    c_sq = (cmat * cmat).sum(axis=1)

    def assign_batches(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            q = np.array(pdf["qv"].tolist(), dtype=np.float64)
            d = (q * q).sum(axis=1)[:, None] + c_sq[None, :] - 2.0 * (q @ cmat.T)
            best = d.argmin(axis=1)  # first min → smallest cid (sorted)
            yield pd.DataFrame(
                {
                    "pid": pdf["pid"],
                    "qv": pdf["qv"],
                    "cid": cid_arr[best],
                    "dist_sq": d[np.arange(len(best)), best].astype(np.int64),
                }
            )

    return pts.mapInPandas(
        assign_batches, "pid long, qv array<long>, cid long, dist_sq long"
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


def _lloyd(pts: DataFrame, k: int, iters: int) -> DataFrame:
    """``iters`` Lloyd assignment rounds over a cached quantized corpus
    ``pts(pid, qv)`` → ``(pid, qv, cid, dist_sq)``. Init is
    deterministic: the points with ``id < k`` seed the centroids — the
    EXACT rule the DuckDB oracle's ``c0`` CTE encodes
    (plans/clustering.py: ``WHERE pid < k``), so it is a cross-engine
    contract, not a smallest-k selection; it presumes a dense 0-based
    id space, which the driver's testdata provides. (k-means++ would
    trade determinism for quality; for a reproducible pipeline stage,
    fixed seeding wins.)"""
    cents = sorted(
        (r["pid"], list(r["qv"]))
        for r in pts.filter(F.col("pid") < k).collect()
    )
    if len(cents) < k:
        # fail loudly here: an empty/short seed set otherwise surfaces
        # as an opaque AnalysisException from the centroid literal
        raise ValueError(
            f"k-means seeding found {len(cents)} of {k} seed points with "
            f"id < {k}: the id<k seed contract (shared with the SQL "
            "oracle) requires a dense 0-based id space"
        )
    assigned = _assign(pts, cents)
    for _ in range(iters - 1):
        # each round evaluates the prior assignment exactly once (the
        # update's single collect) and the next _assign depends only on
        # the cached pts + driver-side cents — so no caching of the
        # intermediate assignment: it would be written once and never
        # read again (an r4 review finding; an earlier comment here
        # claimed a recompute that cannot occur)
        cents = _update(assigned)
        assigned = _assign(pts, cents)
    return assigned


def kmeans_assign(
    df: DataFrame,
    k: int = KMEANS_K,
    iters: int = KMEANS_ITERS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd's k-means: ``iters`` assignment rounds with ``iters - 1``
    centroid updates between them; returns the final assignment
    ``(vec_id, cluster_id, dist_sq)``. The quantized corpus is cached —
    every update round re-scans it."""
    pts = scatter(
        df.select(F.col(id_col).alias("pid"), quantize_vec(F.col(vec_col)).alias("qv"))
    ).cache()
    defer_release(pts)  # the returned assignment still reads it
    return _lloyd(pts, k, iters).select(
        F.col("pid").alias(id_col),
        F.col("cid").alias("cluster_id"),
        F.col("dist_sq"),
    )


# seed count above which the fine assignment switches from the
# driver-collected closure matmul to a fully distributed cell join:
# seeds number ~N/target, so at billions of vectors the collected seed
# matrix would itself be GB-scale driver/closure state — the exact
# bounded-model-state assumption it would violate
SEED_COLLECT_CAP = 20_000


def kmeans_assign_twolevel(
    df: DataFrame,
    k: int,
    iters: int = KMEANS_ITERS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    target_cluster_size: int = 256,
    seed_tag: str = "hseed",
    seed_collect_cap: int = SEED_COLLECT_CAP,
) -> DataFrame:
    """Two-level (coarse-quantizer) clustering — the LINEAR-work answer
    to flat k-means' O(N·k) assignment when k ∝ corpus (the honest
    limit the r4 100× rehearsal measured, SCALE.md):

    - **Coarse**: Lloyd k-means with ``k1 = ceil(sqrt(k))`` centroids —
      assignment work N·√k·dim instead of N·k·dim.
    - **Fine**: inside each coarse cell, a one-shot Voronoi refinement
      around deterministic seeds — a point's cluster is its nearest
      seed IN ITS CELL (ties → smallest seed id). Seeds are the points
      whose ``portable_hash64(pid)`` lands on 0 mod
      ``target_cluster_size`` (≈ N/target seeds, uniformly), plus each
      cell's minimum pid so no cell is seedless. Expected fine-cluster
      size ≈ target, independent of N; total assignment work
      N·(√k + N/(k1·target))·dim — linear in N at fixed target.

    Exactness: same integer quantization; the fine distances run
    through the vectorized float64 matmul (exact — integers < 2^53) on
    per-cell seed matrices collected once while the seed count is small
    (≤ ``seed_collect_cap``). Seeds number ~N/target, so beyond the cap
    the collected matrix would itself become GB-scale driver/closure
    state — there the fine assignment switches to a fully distributed
    cell join (points ⋈ same-cell seeds → exact integer fold distance →
    map-side partial ``min(struct(dist, sid))`` per point): identical
    results (same values, same tie rule), one extra N-row shuffle, no
    driver materialization of the model. Every step is replicated in
    SQL by the DuckDB oracle of ``dedup_semantic_prune_twolevel``.

    Returns ``(id_col, cluster_id, dist_sq)`` where cluster_id is the
    winning seed's id (globally unique across cells).
    """
    import math

    import numpy as np
    import pandas as pd

    from ..functions.text import portable_hash64

    k1 = max(2, math.ceil(math.sqrt(k)))
    pts = scatter(
        df.select(F.col(id_col).alias("pid"), quantize_vec(F.col(vec_col)).alias("qv"))
    ).cache()
    coarse = (
        _lloyd(pts, k1, iters)
        .select("pid", "qv", F.col("cid").alias("ccid"))
        .cache()
    )
    defer_release(pts, coarse)

    mins = coarse.groupBy("ccid").agg(F.min("pid").alias("pid")).select("pid")
    hash_hit = (
        F.pmod(
            portable_hash64(F.col("pid").cast("string"), seed_tag),
            F.lit(target_cluster_size),
        )
        == 0
    )
    seeds_df = (
        coarse.filter(hash_hit)
        .unionByName(coarse.join(F.broadcast(mins), "pid", "left_semi"))
        .dropDuplicates(["pid"])
        .select("ccid", "pid", "qv")
        .cache()
    )
    defer_release(seeds_df)
    # ONE bounded take probes the cap AND fetches the seed rows (r14):
    # the previous count()-then-collect() pair was two driver jobs over
    # the same cached frame; take(cap + 1) answers "over the cap?"
    # without a full count and IS the collect when under it (seed ORDER
    # is irrelevant — rows are re-sorted per cell below).
    seed_rows = seeds_df.take(seed_collect_cap + 1)
    if len(seed_rows) > seed_collect_cap:
        s = seeds_df.select(
            "ccid", F.col("pid").alias("__sid"), F.col("qv").alias("__sqv")
        )
        cand = coarse.join(s, "ccid").select(
            "pid",
            F.struct(
                _sq_dist(F.col("qv"), F.col("__sqv")).alias("dist_sq"),
                F.col("__sid").alias("sid"),
            ).alias("__c"),
        )
        best = cand.groupBy("pid").agg(F.min("__c").alias("__b"))
        return best.select(
            F.col("pid").alias(id_col),
            F.col("__b.sid").alias("cluster_id"),
            F.col("__b.dist_sq").alias("dist_sq"),
        )

    by_cell: dict[int, list[tuple[int, list[int]]]] = {}
    for r in seed_rows:
        by_cell.setdefault(r["ccid"], []).append((r["pid"], list(r["qv"])))
    # one sort per cell feeds BOTH arrays — their row order must agree
    by_cell = {ccid: sorted(rows) for ccid, rows in by_cell.items()}
    cell_sids = {
        ccid: np.array([sid for sid, _ in rows], dtype=np.int64)
        for ccid, rows in by_cell.items()
    }
    cell_mats = {
        ccid: np.array([qv for _, qv in rows], dtype=np.float64)
        for ccid, rows in by_cell.items()
    }
    cell_sq = {ccid: (m * m).sum(axis=1) for ccid, m in cell_mats.items()}

    def fine_batches(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            cid = np.empty(len(pdf), dtype=np.int64)
            dsq = np.empty(len(pdf), dtype=np.int64)
            cells = pdf["ccid"].to_numpy()
            qmat = np.array(pdf["qv"].tolist(), dtype=np.float64)
            for ccid in np.unique(cells):
                idx = np.nonzero(cells == ccid)[0]
                q = qmat[idx]
                smat, s_sq = cell_mats[int(ccid)], cell_sq[int(ccid)]
                d = (q * q).sum(axis=1)[:, None] + s_sq[None, :] - 2.0 * (q @ smat.T)
                best = d.argmin(axis=1)  # first min → smallest sid (sorted)
                cid[idx] = cell_sids[int(ccid)][best]
                dsq[idx] = d[np.arange(len(best)), best].astype(np.int64)
            yield pd.DataFrame(
                {"pid": pdf["pid"], "cluster_id": cid, "dist_sq": dsq}
            )

    out = coarse.mapInPandas(
        fine_batches, "pid long, cluster_id long, dist_sq long"
    )
    return out.select(
        F.col("pid").alias(id_col), "cluster_id", "dist_sq"
    )
