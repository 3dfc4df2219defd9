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
)
from ..operators.similarity import embedding_near_dup_pairs
from ..sources.batch import load_table
from .catalog import query
from .dedup import COSINE_THRESHOLD

_DIM = 64


def _kmeans_ctes() -> str:
    """The shared k-means CTE chain (k=KMEANS_K, KMEANS_ITERS assignment
    rounds), ending in ``asg(pid, cid, dist_sq)`` — the DuckDB twin of
    operators/clustering.py:kmeans_assign."""
    assert KMEANS_ITERS == 2, "oracle CTE chain is unrolled for 2 rounds"
    return f"""
    pts AS (
        SELECT vec_id AS pid,
               list_transform(embedding::DOUBLE[],
                              x -> CAST(floor(x * {float(KMEANS_SCALE)}) AS BIGINT)) AS qv
        FROM embeddings
    ),
    u AS (
        SELECT pid, p.pos AS pos, qv[p.pos] AS v
        FROM pts, (SELECT unnest(range(1, {_DIM + 1})) AS pos) p
    ),
    c0 AS (SELECT pid AS cid, pos, v AS cv FROM u WHERE pid < {KMEANS_K}),
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
    cos = (
        "list_dot_product(a.v, b.v) / "
        "(sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))"
    )
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
    tags=("dedup", "clustering", "semdedup"),
)
def dedup_semantic_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup: k-means clusters the corpus, then
    cosine near-dup pairs are searched only WITHIN a cluster — the
    published algorithm, where the quadratic term is bounded because k
    is chosen so clusters stay worker-sized (k ∝ N). Of each near-dup
    pair the smaller vec_id survives. Output is the full corpus with
    its learned cluster and a ``pruned`` verdict — exactly the
    keep/drop table a curation pipeline feeds downstream.

    (Banded sign-LSH sub-bucketing — ``n_bands > 0`` — is NOT used
    here: learned clusters are cohesive, so their members collapse into
    the same sign buckets and banding only adds a no-op shuffle +
    distinct. For metadata blocks of unbounded size, use
    ``dedup_embedding_pairs``'s compound banded blocking instead.)"""
    e = load_table(spark, sf_dir, "embeddings")
    asg = kmeans_assign(e, k=KMEANS_K, iters=KMEANS_ITERS).cache()
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
