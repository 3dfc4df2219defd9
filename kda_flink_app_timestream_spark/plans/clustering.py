"""Clustering queries: distributed k-means over the embedding corpus
(the IVF codebook trainer) and SemDeDup-style semantic deduplication —
cluster first, then near-dup search only WITHIN a cluster, so the
expensive pairwise stage is bounded by cluster geometry instead of
corpus size (Abbas et al. 2023, "SemDeDup", the public recipe this
mirrors).

Both queries are oracle-checked: the exact-integer quantization in
operators/clustering.py makes every k-means intermediate (distances,
centroid means, assignments) bit-identical across Spark and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.clustering import (
    KMEANS_ITERS,
    KMEANS_K,
    KMEANS_SCALE,
    kmeans_assign,
    kmeans_assign_twolevel,
)
from ..operators.similarity import embedding_near_dup_pairs
from ..session import defer_release
from ..sources.batch import load_table
from .catalog import query
from .dedup import COSINE_THRESHOLD

_DIM = 64


def _kmeans_ctes(k_sql: str = str(KMEANS_K), src: str = "embeddings") -> str:
    """The shared k-means CTE chain (``k_sql`` seeds, KMEANS_ITERS
    assignment rounds), ending in ``asg(pid, cid, dist_sq)`` — the DuckDB
    twin of operators/clustering.py:kmeans_assign. ``k_sql`` may be any
    scalar SQL expression (a literal, or a subquery deriving k from the
    corpus size for the scale-honest variant); ``src`` is the corpus
    relation (a table or CTE name exposing ``vec_id, embedding`` — the
    collapse-first composition points it at the collapsed CTE)."""
    assert KMEANS_ITERS == 2, "oracle CTE chain is unrolled for 2 rounds"
    return f"""
    pts AS (
        SELECT vec_id AS pid,
               list_transform(embedding::DOUBLE[],
                              x -> CAST(floor(x * {float(KMEANS_SCALE)}) AS BIGINT)) AS qv
        FROM {src}
    ),
    u AS (
        SELECT pid, p.pos AS pos, qv[p.pos] AS v
        FROM pts, (SELECT unnest(range(1, {_DIM + 1})) AS pos) p
    ),
    c0 AS (SELECT pid AS cid, pos, v AS cv FROM u WHERE pid < ({k_sql})),
    d1 AS (
        SELECT u.pid, c.cid,
               CAST(sum((u.v - c.cv) * (u.v - c.cv)) AS BIGINT) AS dist_sq
        FROM u JOIN c0 c ON u.pos = c.pos
        GROUP BY u.pid, c.cid
    ),
    a1 AS (
        SELECT pid, cid FROM (
            SELECT pid, cid,
                   row_number() OVER (PARTITION BY pid ORDER BY dist_sq, cid) AS rn
            FROM d1) WHERE rn = 1
    ),
    c1 AS (
        SELECT a.cid, u.pos, CAST(sum(u.v) // count(*) AS BIGINT) AS cv
        FROM u JOIN a1 a USING (pid)
        GROUP BY a.cid, u.pos
    ),
    d2 AS (
        SELECT u.pid, c.cid,
               CAST(sum((u.v - c.cv) * (u.v - c.cv)) AS BIGINT) AS dist_sq
        FROM u JOIN c1 c ON u.pos = c.pos
        GROUP BY u.pid, c.cid
    ),
    asg AS (
        SELECT pid, cid, dist_sq FROM (
            SELECT pid, cid, dist_sq,
                   row_number() OVER (PARTITION BY pid ORDER BY dist_sq, cid) AS rn
            FROM d2) WHERE rn = 1
    )"""


_KMEANS_ORACLE = f"""
WITH {_kmeans_ctes()}
SELECT pid AS vec_id, cid AS cluster_id, dist_sq FROM asg
"""


@query("sim_kmeans_clusters", oracle=_KMEANS_ORACLE, tags=("clustering", "kmeans", "iterative"))
def sim_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Lloyd's k-means (k=8, two assignment rounds) over the
    embedding corpus: broadcast-centroid assignment (corpus never
    shuffles), tree-aggregated centroid update (shuffle is O(k·dim)
    cells after map-side combine), exact-integer arithmetic throughout."""
    e = load_table(spark, sf_dir, "embeddings")
    return kmeans_assign(e, k=KMEANS_K, iters=KMEANS_ITERS)


def _semantic_prune_oracle() -> str:
    # Within-cluster pairwise cosine — the published SemDeDup shape
    # (no banding: the k-means cluster IS the blocking key, and its
    # size is bounded by the choice of k).
    from .similarity import sql_safe_cosine

    # guarded twin of the Spark path's _safe_cosine (the near-dup
    # operator now pins the zero-norm edge to 0.0 on both engines)
    cos = sql_safe_cosine("a.v", "b.v")
    return f"""
    WITH {_kmeans_ctes()},
    e0 AS (
        SELECT e.vec_id, a.cid AS cluster_id, e.embedding::DOUBLE[] AS v
        FROM embeddings e JOIN asg a ON e.vec_id = a.pid
    ),
    pruned AS (
        SELECT DISTINCT b.vec_id
        FROM e0 a JOIN e0 b
          ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id
        WHERE round({cos}, 6) >= {COSINE_THRESHOLD}
    )
    SELECT a.pid AS vec_id, a.cid AS cluster_id,
           (p.vec_id IS NOT NULL) AS pruned
    FROM asg a LEFT JOIN pruned p ON a.pid = p.vec_id
    """


@query(
    "dedup_semantic_prune",
    oracle=_semantic_prune_oracle(),
    tags=("dedup", "clustering", "semdedup", "test-config"),
)
def dedup_semantic_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup: k-means clusters the corpus, then
    cosine near-dup pairs are searched only WITHIN a cluster — the
    published algorithm, where the quadratic term is bounded because k
    is chosen so clusters stay worker-sized (k ∝ N). Of each near-dup
    pair the smaller vec_id survives. Output is the full corpus with
    its learned cluster and a ``pruned`` verdict — exactly the
    keep/drop table a curation pipeline feeds downstream.

    This is the ORACLE-PINNED test configuration (fixed k=8, exact
    within-cluster all-pairs). At fixed k the per-cluster quadratic term
    grows with the corpus (100 TB / 8 clusters ⇒ 12.5 TB blocks), so
    the production entry is ``dedup_semantic_prune_scaled`` below:
    k ∝ corpus size AND banded sub-bucketing, same output contract."""
    e = load_table(spark, sf_dir, "embeddings")
    asg = kmeans_assign(e, k=KMEANS_K, iters=KMEANS_ITERS).cache()
    defer_release(asg)
    with_cluster = e.join(asg.select("vec_id", "cluster_id"), "vec_id")
    pairs = embedding_near_dup_pairs(
        with_cluster, threshold=COSINE_THRESHOLD, block_col="cluster_id", n_bands=0
    )
    pruned = (
        pairs.select(F.col("id_b").alias("vec_id"))
        .distinct()
        .withColumn("__pruned", F.lit(True))
    )
    return asg.select("vec_id", "cluster_id").join(pruned, "vec_id", "left").select(
        "vec_id",
        "cluster_id",
        F.coalesce(F.col("__pruned"), F.lit(False)).alias("pruned"),
    )


# --- two-level (coarse-quantizer) SemDeDup: linear-work assignment -----------

# average cluster size both scale-honest variants target; every Spark
# AND oracle occurrence derives from this one constant — a literal 256
# anywhere would let the two engines compute k (or the seed rule) from
# different targets and surface only as an opaque driver hash failure
TARGET_CLUSTER_SIZE = 256

_SEED_TAG = "hseed"
_K1_SQL = (
    f"SELECT greatest(2, CAST(ceil(sqrt(greatest({KMEANS_K}, "
    f"ceil(count(*) / {TARGET_CLUSTER_SIZE}.0)))) AS BIGINT)) FROM embeddings"
)


def _semantic_prune_twolevel_oracle() -> str:
    from ..functions.text import sql_portable_hash64
    from ..operators.similarity import (
        EMB_N_BANDS,
        EMB_PLANES_PER_BAND,
        plane_components,
    )

    def band_expr(band: int) -> str:
        terms = []
        for p in range(EMB_PLANES_PER_BAND):
            comps = plane_components(band * EMB_PLANES_PER_BAND + p)
            arr = "[" + ", ".join(repr(c) for c in comps) + "]::DOUBLE[]"
            terms.append(
                f"CASE WHEN list_dot_product(e.v, {arr}) > 0 THEN {1 << p} ELSE 0 END"
            )
        return " + ".join(terms)

    band_case = "CASE b.i " + " ".join(
        f"WHEN {i} THEN ({band_expr(i)})" for i in range(EMB_N_BANDS)
    ) + " END"
    band_values = ", ".join(f"({i})" for i in range(EMB_N_BANDS))
    from .similarity import sql_safe_cosine

    # guarded twin of the Spark path's _safe_cosine (the near-dup
    # operator now pins the zero-norm edge to 0.0 on both engines)
    cos = sql_safe_cosine("a.v", "b.v")
    seed_hash = sql_portable_hash64("CAST(a.pid AS VARCHAR)", _SEED_TAG)
    return f"""
    WITH {_kmeans_ctes(f"({_K1_SQL})")},
    mins AS (SELECT cid, min(pid) AS mpid FROM asg GROUP BY cid),
    seeds AS (
        SELECT a.pid AS sid, a.cid AS ccid
        FROM asg a
        WHERE ({seed_hash}) % {TARGET_CLUSTER_SIZE} = 0
           OR EXISTS (SELECT 1 FROM mins m
                      WHERE m.cid = a.cid AND m.mpid = a.pid)
    ),
    fd AS (
        SELECT a.pid, s.sid,
               CAST(sum((up.v - us.v) * (up.v - us.v)) AS BIGINT) AS dist_sq
        FROM asg a
        JOIN seeds s ON s.ccid = a.cid
        JOIN u up ON up.pid = a.pid
        JOIN u us ON us.pid = s.sid AND us.pos = up.pos
        GROUP BY a.pid, s.sid
    ),
    fine AS (
        SELECT pid, sid AS cluster_id FROM (
            SELECT pid, sid,
                   row_number() OVER (PARTITION BY pid ORDER BY dist_sq, sid) AS rn
            FROM fd) WHERE rn = 1
    ),
    e0 AS (
        SELECT e.vec_id, f.cluster_id, e.embedding::DOUBLE[] AS v
        FROM embeddings e JOIN fine f ON e.vec_id = f.pid
    ),
    bands AS (
        SELECT e.vec_id, e.cluster_id, b.i AS band, {band_case} AS bkt
        FROM e0 AS e CROSS JOIN (VALUES {band_values}) AS b(i)
    ),
    cand AS (
        SELECT DISTINCT ba.vec_id AS id_a, bb.vec_id AS id_b
        FROM bands ba JOIN bands bb
          ON ba.cluster_id = bb.cluster_id AND ba.band = bb.band
         AND ba.bkt = bb.bkt AND ba.vec_id < bb.vec_id
    ),
    pruned AS (
        SELECT DISTINCT cand.id_b AS vec_id
        FROM cand
        JOIN e0 a ON cand.id_a = a.vec_id
        JOIN e0 b ON cand.id_b = b.vec_id
        WHERE round({cos}, 6) >= {COSINE_THRESHOLD}
    )
    SELECT f.pid AS vec_id, f.cluster_id,
           (p.vec_id IS NOT NULL) AS pruned
    FROM fine f LEFT JOIN pruned p ON f.pid = p.vec_id
    """


@query(
    "dedup_semantic_prune_twolevel",
    oracle=_semantic_prune_twolevel_oracle(),
    tags=("dedup", "clustering", "semdedup", "scale", "production"),
)
def dedup_semantic_prune_twolevel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup with a two-level coarse-quantizer assignment — the
    100 TB-honest variant SCALE.md's r4 rehearsal called for: flat
    k-means with k ∝ corpus does O(N·k) = O(N²/target) assignment work,
    while the two-level shape (coarse Lloyd at √k, one-shot seed-Voronoi
    refinement within each cell) is linear in N at fixed target cluster
    size. Same keep/drop output contract as the other SemDeDup entries;
    the oracle replicates every stage — coarse CTE chain at
    k1=ceil(sqrt(k)), hash+cell-min seed selection, exact integer fine
    distances with (dist, sid) tie-breaking, and the banded
    within-cluster candidate set."""
    e = load_table(spark, sf_dir, "embeddings")
    k = scaled_k(e.count())
    asg = kmeans_assign_twolevel(
        e, k=k, iters=KMEANS_ITERS,
        target_cluster_size=TARGET_CLUSTER_SIZE, seed_tag=_SEED_TAG,
    ).cache()
    defer_release(asg)
    with_cluster = e.join(asg.select("vec_id", "cluster_id"), "vec_id")
    pairs = embedding_near_dup_pairs(
        with_cluster, threshold=COSINE_THRESHOLD, block_col="cluster_id"
    )
    pruned = (
        pairs.select(F.col("id_b").alias("vec_id"))
        .distinct()
        .withColumn("__pruned", F.lit(True))
    )
    return asg.select("vec_id", "cluster_id").join(pruned, "vec_id", "left").select(
        "vec_id",
        "cluster_id",
        F.coalesce(F.col("__pruned"), F.lit(False)).alias("pruned"),
    )


# --- scale-honest SemDeDup: k ∝ corpus size + banded within-cluster pairing ---

# (TARGET_CLUSTER_SIZE is defined once above the twolevel section; with
# banding on top, even a cluster far above target never goes quadratic —
# per-(band, bucket) blocks are ~|cluster| / 2^planes_per_band)
def _k_sql(src: str = "embeddings") -> str:
    return (
        f"SELECT greatest({KMEANS_K}, "
        f"CAST(ceil(count(*) / {TARGET_CLUSTER_SIZE}.0) AS BIGINT)) FROM {src}"
    )


_K_SQL = _k_sql()


def scaled_k(n_vectors: int) -> int:
    """k for a corpus of ``n_vectors``: clusters average
    TARGET_CLUSTER_SIZE members, never fewer than KMEANS_K clusters —
    the SQL twin is ``_K_SQL`` (greatest/ceil match exactly because
    both are integer ceilings of n/256)."""
    return max(KMEANS_K, -(-n_vectors // TARGET_CLUSTER_SIZE))


def _semantic_prune_scaled_oracle(src: str = "embeddings") -> str:
    # Same compound blocking as the Spark path: (cluster_id, band,
    # sign-LSH bucket), OR-amplified over EMB_N_BANDS bands, using the
    # identical inlined hyperplane constants as the operator
    # (plans/dedup.py:_embed_neardup_oracle proves sign parity).
    from ..operators.similarity import (
        EMB_N_BANDS,
        EMB_PLANES_PER_BAND,
        plane_components,
    )

    def band_expr(band: int) -> str:
        terms = []
        for p in range(EMB_PLANES_PER_BAND):
            comps = plane_components(band * EMB_PLANES_PER_BAND + p)
            arr = "[" + ", ".join(repr(c) for c in comps) + "]::DOUBLE[]"
            terms.append(
                f"CASE WHEN list_dot_product(e.v, {arr}) > 0 THEN {1 << p} ELSE 0 END"
            )
        return " + ".join(terms)

    band_case = "CASE b.i " + " ".join(
        f"WHEN {i} THEN ({band_expr(i)})" for i in range(EMB_N_BANDS)
    ) + " END"
    band_values = ", ".join(f"({i})" for i in range(EMB_N_BANDS))
    from .similarity import sql_safe_cosine

    # guarded twin of the Spark path's _safe_cosine (the near-dup
    # operator now pins the zero-norm edge to 0.0 on both engines)
    cos = sql_safe_cosine("a.v", "b.v")
    return f"""
    WITH {_kmeans_ctes(f"({_k_sql(src)})", src)},
    e0 AS (
        SELECT e.vec_id, a.cid AS cluster_id, e.embedding::DOUBLE[] AS v
        FROM {src} e JOIN asg a ON e.vec_id = a.pid
    ),
    bands AS (
        SELECT e.vec_id, e.cluster_id, b.i AS band, {band_case} AS bkt
        FROM e0 AS e CROSS JOIN (VALUES {band_values}) AS b(i)
    ),
    cand AS (
        SELECT DISTINCT ba.vec_id AS id_a, bb.vec_id AS id_b
        FROM bands ba JOIN bands bb
          ON ba.cluster_id = bb.cluster_id AND ba.band = bb.band
         AND ba.bkt = bb.bkt AND ba.vec_id < bb.vec_id
    ),
    pruned AS (
        SELECT DISTINCT cand.id_b AS vec_id
        FROM cand
        JOIN e0 a ON cand.id_a = a.vec_id
        JOIN e0 b ON cand.id_b = b.vec_id
        WHERE round({cos}, 6) >= {COSINE_THRESHOLD}
    )
    SELECT a.pid AS vec_id, a.cid AS cluster_id,
           (p.vec_id IS NOT NULL) AS pruned
    FROM asg a LEFT JOIN pruned p ON a.pid = p.vec_id
    """


@query(
    "dedup_semantic_prune_scaled",
    oracle=_semantic_prune_scaled_oracle(),
    tags=("dedup", "clustering", "semdedup", "scale", "test-config"),
)
def dedup_semantic_prune_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production SemDeDup: identical keep/drop contract to
    ``dedup_semantic_prune``, but scale-honest on both axes the fixed
    configuration is weak on (VERDICT r2 item 9):

    - **k grows with the corpus** (``scaled_k``: clusters average
      TARGET_CLUSTER_SIZE members), so per-cluster work stays bounded
      as N grows instead of clusters growing to N/8.
    - **Banded sign-LSH sub-bucketing within each cluster**
      (``n_bands=EMB_N_BANDS``): even a skewed giant cluster is cut
      into ~|cluster|/2^planes per-(band, bucket) blocks, so no block
      ever goes quadratic — OR-amplification across bands keeps
      high-cosine recall (the candidate bound is pinned by
      tests/test_llm_ops.py on a worst-case single-cluster fixture).

    The oracle replicates both k-scaling (scalar subquery) and the
    banded candidate set (same inlined hyperplanes), so this is a full
    value-checked row, not rows-only.

    TEST-CONFIG since r14: this RAW-corpus form is the oracle subject,
    but under heavy exact duplication its within-block pairing is
    honestly quadratic in the copy count (identical vectors land in
    the same cluster AND the same sign-LSH bucket — no blocking scheme
    can separate them; SCALE.md r13 measured 149.6 s / 14.9 M scored
    pairs at 100× duplicate inflation). The production entry is
    ``dedup_collapse_then_semantic`` below — exact-collapse first,
    measured 10× cheaper at 100× with matching keep/drop semantics."""
    e = load_table(spark, sf_dir, "embeddings")
    k = scaled_k(e.count())
    asg = kmeans_assign(e, k=k, iters=KMEANS_ITERS).cache()
    defer_release(asg)
    with_cluster = e.join(asg.select("vec_id", "cluster_id"), "vec_id")
    pairs = embedding_near_dup_pairs(
        with_cluster, threshold=COSINE_THRESHOLD, block_col="cluster_id"
    )
    pruned = (
        pairs.select(F.col("id_b").alias("vec_id"))
        .distinct()
        .withColumn("__pruned", F.lit(True))
    )
    return asg.select("vec_id", "cluster_id").join(pruned, "vec_id", "left").select(
        "vec_id",
        "cluster_id",
        F.coalesce(F.col("__pruned"), F.lit(False)).alias("pruned"),
    )


# --- collapse-first composition: the production semantic-dedup path ----------

# deterministic id shift for the in-query duplicate inflation (the sf
# fixtures carry no identical embeddings, so the composition inflates
# its own corpus — every even-id vector gets one exact copy — to make
# the driver row exercise real collapse semantics, the
# curate-corpus-invariance test pattern)
DUP_OFFSET = 1_000_000


def _collapse_then_semantic_oracle() -> str:
    # The scaled-prune chain is reused VERBATIM (same builder), just
    # pointed at the collapsed CTE — the composed oracle is the
    # composition of two already-verified oracles, the curate_corpus
    # pattern.
    return f"""
    WITH corpus AS MATERIALIZED (
        SELECT vec_id, embedding FROM embeddings
        UNION ALL
        SELECT vec_id + {DUP_OFFSET} AS vec_id, embedding
        FROM embeddings WHERE vec_id % 2 = 0
    ),
    collapsed AS MATERIALIZED (
        SELECT min(vec_id) AS vec_id, embedding FROM corpus GROUP BY embedding
    ),
    verdict AS MATERIALIZED (
        {_semantic_prune_scaled_oracle("collapsed")}
    )
    SELECT c2.vec_id,
           c.vec_id AS rep_id,
           v.cluster_id,
           (c2.vec_id <> c.vec_id OR v.pruned) AS pruned
    FROM corpus c2
    JOIN collapsed c ON c2.embedding = c.embedding
    JOIN verdict v ON v.vec_id = c.vec_id
    """


@query(
    "dedup_collapse_then_semantic",
    oracle=_collapse_then_semantic_oracle(),
    tags=("dedup", "clustering", "semdedup", "scale", "composition", "production"),
)
def dedup_collapse_then_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION semantic-dedup composition as one registered
    pipeline: exact-collapse identical vectors (min vec_id per
    embedding) BEFORE the scaled SemDeDup prune, then expand the
    per-representative verdict back over every copy. Registered in r14
    from the r13 rehearsal (VERDICT r13 #6): at 100× duplicate
    inflation the raw form scores 14.9 M pairs in 149.6 s — identical
    copies form C(n,2) cliques inside every (cluster, band, bucket)
    block, a quadratic term NO blocking scheme can cut because the
    vectors are indistinguishable — while collapse-first runs the same
    semantics in 14.6 s end to end with 576 scored pairs (SCALE.md
    r13). Mirrors the r4 collapse-first rule proven for n-gram Jaccard
    (``dedup_collapse_then_jaccard``), on the vector column instead of
    text.

    The corpus is inflated in-query (one exact copy of every even-id
    vector, shifted by DUP_OFFSET) because the sf fixtures are
    duplicate-free; the expansion contract is the composed keep/drop
    table: each row carries its exact-dup representative, the
    representative's learned cluster, and ``pruned`` = "is a non-winner
    copy OR its representative lost the semantic prune". Restricted to
    representatives the verdict is byte-identical to
    ``dedup_semantic_prune_scaled`` on the base corpus (pinned by
    tests/test_llm_ops.py) — the composition changes cost, not answers.

    Scale shape: the collapse is one map-side-combinable groupBy on the
    vector (at 100 TB group on a 64-bit fingerprint of the vector bytes
    instead — ``dedup_exact_summary``'s rule — same result, 8-byte
    shuffle key); the prune stage sees only unique vectors, so its
    banded blocks are clique-free; the expansion is one join keyed by
    the same vector/fingerprint. Everything downstream of the collapse
    is corpus-size-independent under duplication — cost scales with
    UNIQUE vectors."""
    e = load_table(spark, sf_dir, "embeddings")
    base = e.select("vec_id", "embedding")
    # in-query duplicate inflation as ONE scan (r14): the previous
    # base UNION filtered-copy form scanned the parquet twice per
    # consumption, and `corpus` executes twice (collapse + final
    # expansion join) — 4 corpus scans per run, 2 with the explode.
    # Row set identical: every even id contributes offsets {0,
    # DUP_OFFSET}, every odd id just {0}.
    offsets = F.when(
        F.col("vec_id") % 2 == 0,
        F.array(F.lit(0).cast("long"), F.lit(DUP_OFFSET).cast("long")),
    ).otherwise(F.array(F.lit(0).cast("long")))
    corpus = base.select(
        F.explode(offsets).alias("__off"), "vec_id", "embedding"
    ).select((F.col("vec_id") + F.col("__off")).alias("vec_id"), "embedding")
    collapsed = (
        corpus.groupBy("embedding")
        .agg(F.min("vec_id").alias("vec_id"))
        .select("vec_id", "embedding")
        .cache()
    )
    defer_release(collapsed)  # reused by k-count, k-means, pairing, expansion
    k = scaled_k(collapsed.count())
    asg = kmeans_assign(collapsed, k=k, iters=KMEANS_ITERS).cache()
    defer_release(asg)
    with_cluster = collapsed.join(asg.select("vec_id", "cluster_id"), "vec_id")
    pairs = embedding_near_dup_pairs(
        with_cluster, threshold=COSINE_THRESHOLD, block_col="cluster_id"
    )
    pruned = (
        pairs.select(F.col("id_b").alias("vec_id"))
        .distinct()
        .withColumn("__pruned", F.lit(True))
    )
    verdict = asg.select("vec_id", "cluster_id").join(pruned, "vec_id", "left").select(
        F.col("vec_id").alias("rep_id"),
        "cluster_id",
        F.coalesce(F.col("__pruned"), F.lit(False)).alias("rep_pruned"),
    )
    reps = collapsed.select(F.col("vec_id").alias("rep_id"), "embedding")
    return (
        corpus.join(reps, "embedding")
        .join(verdict, "rep_id")
        .select(
            "vec_id",
            "rep_id",
            "cluster_id",
            ((F.col("vec_id") != F.col("rep_id")) | F.col("rep_pruned")).alias(
                "pruned"
            ),
        )
    )
