"""Similarity-search queries over ``embeddings`` (LLM-pipeline surface):
exact brute-force cosine top-k and the LSH-bucketed ANN scale path.
The oracle SQL mirrors the Spark arithmetic exactly: DOUBLE casts,
sequential dot products, round-then-rank with id tie-breaks, and the
same inlined hyperplane constants.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.similarity import HYPERPLANES, N_PLANES, brute_force_topk, lsh_topk
from ..sources.batch import load_table
from .catalog import query

N_QUERIES = 20  # query set: vec_id < 20
TOP_K = 5

def sql_safe_cosine(qv: str, cv: str) -> str:
    """SQL twin of ``operators.similarity._safe_cosine``: cosine with
    the zero-norm edge pinned to 0.0 (DuckDB's x/0.0 is inf/nan while
    Spark's non-ANSI division is NULL — without the shared guard an
    all-zero embedding would rank differently per engine)."""
    qq, cc = f"list_dot_product({qv}, {qv})", f"list_dot_product({cv}, {cv})"
    return (
        f"CASE WHEN {qq} <> 0 AND {cc} <> 0 "
        f"THEN list_dot_product({qv}, {cv}) / (sqrt({qq}) * sqrt({cc})) "
        f"ELSE 0.0 END"
    )


_COSINE = sql_safe_cosine("q.v", "c.v")

_BRUTEFORCE_ORACLE = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT * FROM e WHERE vec_id < {N_QUERIES}),
scored AS (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           round({_COSINE}, 6) AS cosine_sim
    FROM q JOIN e c ON q.vec_id <> c.vec_id
)
SELECT query_id, neighbor_id, cosine_sim, CAST(rk AS INT) AS rk
FROM (
    SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id
    ) AS rk
    FROM scored
)
WHERE rk <= {TOP_K}
"""


@query("sim_bruteforce_topk", oracle=_BRUTEFORCE_ORACLE, tags=("similarity", "topk"))
def sim_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 for 20 query vectors against the full corpus.

    Scale: the query set broadcasts (corpus never shuffles for the
    join); per-query top-k is a row_number window — the partial top-k
    keeps only k rows per query per partition before the final merge."""
    e = load_table(spark, sf_dir, "embeddings")
    return brute_force_topk(e, e.filter(F.col("vec_id") < N_QUERIES), k=TOP_K)


def _bucket_sql(alias: str) -> str:
    terms = []
    for p in range(N_PLANES):
        arr = "[" + ", ".join(repr(c) for c in HYPERPLANES[p]) + "]::DOUBLE[]"
        terms.append(
            f"CASE WHEN list_dot_product({alias}.v, {arr}) > 0 THEN {1 << p} ELSE 0 END"
        )
    return " + ".join(terms)


_LSH_ORACLE = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
b AS (SELECT vec_id, v, ({_bucket_sql('e')}) AS bucket FROM e AS e),
q AS (SELECT * FROM b WHERE vec_id < {N_QUERIES}),
scored AS (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           round({_COSINE}, 6) AS cosine_sim
    FROM q JOIN b c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
)
SELECT query_id, neighbor_id, cosine_sim, CAST(rk AS INT) AS rk
FROM (
    SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id
    ) AS rk
    FROM scored
)
WHERE rk <= {TOP_K}
"""


@query("sim_lsh_topk", oracle=_LSH_ORACLE, tags=("similarity", "ann", "lsh"))
def sim_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-5 via n-hyperplane LSH buckets (2^n-way partition of the
    corpus), exact re-rank within the bucket. The deterministic inlined
    hyperplanes make the index reproducible across engines with no
    stored state; at 100 TB the corpus is written bucket-partitioned so
    a probe prunes to one partition.

    ``spark.kda.sim.numPlanes`` (default 8, the oracle-matched value)
    trades recall vs bucket size; non-default values diverge from the
    static oracle SQL."""
    n_planes = int(spark.conf.get("spark.kda.sim.numPlanes", str(N_PLANES)))
    e = load_table(spark, sf_dir, "embeddings")
    return lsh_topk(e, e.filter(F.col("vec_id") < N_QUERIES), k=TOP_K, n_planes=n_planes)


from ..operators.similarity import IVF_CENTROID_RANGE, IVF_NPROBE, ivf_topk  # noqa: E402

_IVF_ORACLE = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cents AS (
    SELECT vec_id AS cid, v AS centroid FROM e
    WHERE vec_id >= {IVF_CENTROID_RANGE[0]} AND vec_id < {IVF_CENTROID_RANGE[1]}
),
assigned AS (
    SELECT vec_id AS neighbor_id, v AS cv, cid FROM (
        SELECT e.vec_id, e.v, c.cid,
               row_number() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY {sql_safe_cosine('e.v', 'c.centroid')} DESC,
                            c.cid
               ) AS rn
        FROM e CROSS JOIN cents c
    ) WHERE rn = 1
),
probed AS (
    SELECT vec_id AS query_id, v AS qv, cid FROM (
        SELECT e.vec_id, e.v, c.cid,
               row_number() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY {sql_safe_cosine('e.v', 'c.centroid')} DESC,
                            c.cid
               ) AS rn
        FROM e CROSS JOIN cents c
        WHERE e.vec_id < {N_QUERIES}
    ) WHERE rn <= {IVF_NPROBE}
),
scored AS (
    -- no DISTINCT: assignment is rn = 1, so a (query, neighbor) pair
    -- meets on at most one cid (kept aligned with the Spark side,
    -- whose dead dedup shuffle was removed — BACKLOG r6 #11)
    SELECT p.query_id, a.neighbor_id,
           round({sql_safe_cosine('p.qv', 'a.cv')}, 6) AS cosine_sim
    FROM probed p JOIN assigned a ON p.cid = a.cid
    WHERE p.query_id <> a.neighbor_id
)
SELECT query_id, neighbor_id, cosine_sim, CAST(rk AS INT) AS rk
FROM (
    SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id
    ) AS rk
    FROM scored
)
WHERE rk <= {TOP_K}
"""


@query("sim_ivf_topk", oracle=_IVF_ORACLE, tags=("similarity", "ann", "ivf"))
def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN top-5: corpus vectors assigned to their nearest of 16
    codebook centroids; each query probes its 2 closest lists and
    exact-re-ranks only those candidates. Codebook is a fixed corpus
    slice (k-means training is an orthogonal offline job) so the whole
    index is reproducible in the oracle. At 100 TB the corpus writes out
    partitionBy(cid) → a probe reads nprobe/16 of the data."""
    e = load_table(spark, sf_dir, "embeddings")
    return ivf_topk(e, e.filter(F.col("vec_id") < N_QUERIES), k=TOP_K)


_ANN_RECALL_ORACLE = f"""
WITH truth AS (SELECT query_id, neighbor_id FROM ({_BRUTEFORCE_ORACLE}) t0),
approx AS (SELECT query_id, neighbor_id FROM ({_LSH_ORACLE}) a0)
SELECT t.query_id,
       CAST(count(a.neighbor_id) AS BIGINT) AS n_hits,
       CAST(count(a.neighbor_id) * {1000 // TOP_K} AS BIGINT) AS recall_permille
FROM truth t
LEFT JOIN approx a
  ON t.query_id = a.query_id AND t.neighbor_id = a.neighbor_id
GROUP BY t.query_id
"""


@query("sim_ann_recall", oracle=_ANN_RECALL_ORACLE, tags=("similarity", "ann", "evaluation"))
def sim_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-quality evaluation as a first-class query: recall@5 of the
    LSH ANN index against exact brute-force ground truth, per query —
    the metric that decides whether an approximate index is usable
    before a 100 TB corpus commits to it. Both top-k sets come from the
    registered operators (same plans the scored queries run); the
    comparison is one (query_id, neighbor_id) left join + count.

    Scale shape: ground truth is exact brute-force, so the evaluation
    runs on a query SAMPLE (here the 20-query probe set), never the full
    corpus — the corpus-side cost is the same broadcast-probe scan both
    top-k operators already have; the join/agg is over ≤ queries × k
    rows, driver-trivial. recall_permille is exact integer (hits ×
    1000/k, k divides 1000)."""
    e = load_table(spark, sf_dir, "embeddings")
    probes = e.filter(F.col("vec_id") < N_QUERIES)
    truth = brute_force_topk(e, probes, k=TOP_K).select("query_id", "neighbor_id")
    approx = lsh_topk(e, probes, k=TOP_K).select(
        F.col("query_id").alias("a_query_id"), F.col("neighbor_id").alias("a_neighbor_id")
    )
    joined = truth.join(
        approx,
        (F.col("query_id") == F.col("a_query_id"))
        & (F.col("neighbor_id") == F.col("a_neighbor_id")),
        "left",
    )
    hits = F.count("a_neighbor_id")
    return joined.groupBy("query_id").agg(
        hits.alias("n_hits"),
        (hits * (1000 // TOP_K)).alias("recall_permille"),
    )


_L2_NORM = "sqrt(list_dot_product(e.v, e.v))"

_VECTOR_OPS_ORACLE = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id < 100)
SELECT vec_id,
       round({_L2_NORM}, 6) AS l2_norm,
       -- zero-vector guard: Spark's non-ANSI x/0 makes unit_sum NULL
       -- there naturally; DuckDB's x/0.0 would give nan — pin to NULL
       CASE WHEN list_dot_product(e.v, e.v) <> 0
            THEN round(list_sum(list_transform(e.v, x -> x / {_L2_NORM})), 6)
       END AS unit_sum,
       CAST(list_sum(list_transform(e.v,
            x -> CAST(round(greatest(-127, least(127, x * 127 / 0.25))) AS BIGINT)))
            AS BIGINT) AS int8_sum
FROM e
"""


@query("sim_vector_normalize_quantize", oracle=_VECTOR_OPS_ORACLE, tags=("similarity", "vector-ops"))
def sim_vector_normalize_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector preprocessing: L2 norm, unit-normalized component sum, and
    symmetric int8 quantization (clamp ±127 at scale 0.25) — the
    embedding-pipeline steps before storage/ANN. All expression-level
    (zip_with/transform/aggregate), checked component-for-component
    against the oracle."""
    from ..functions.vectors import as_double, dot

    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    v = as_double(F.col("embedding"))
    staged = e.select("vec_id", v.alias("v"))
    norm = F.sqrt(dot(F.col("v"), F.col("v")))
    with_norm = staged.select("vec_id", "v", norm.alias("n"))
    unit_sum = F.aggregate(
        F.transform(F.col("v"), lambda x: x / F.col("n")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    int8_sum = F.aggregate(
        F.transform(
            F.col("v"),
            lambda x: F.round(
                F.greatest(F.lit(-127.0), F.least(F.lit(127.0), x * 127 / 0.25))
            ).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return with_norm.select(
        "vec_id",
        F.round(F.col("n"), 6).alias("l2_norm"),
        F.round(unit_sum, 6).alias("unit_sum"),
        int8_sum.alias("int8_sum"),
    )


from ..operators.similarity import (  # noqa: E402
    PQ_CODEBOOK_RANGE,
    PQ_N_SUB,
    PQ_SCALE,
    pq_codes,
)

_PQ_SUB_DIM = 64 // PQ_N_SUB


def _pq_oracle() -> str:
    lo, hi = PQ_CODEBOOK_RANGE
    code_cols = ",\n       ".join(
        f"CAST(max(CASE WHEN sub = {s} THEN code END) AS BIGINT) AS code_{s}"
        for s in range(PQ_N_SUB)
    )
    return f"""
WITH pts AS (
    SELECT vec_id,
           list_transform(embedding::DOUBLE[],
                          x -> CAST(floor(x * {float(PQ_SCALE)}) AS BIGINT)) AS qv
    FROM embeddings
),
u AS (
    SELECT vec_id, p.pos AS pos, qv[p.pos] AS v
    FROM pts, (SELECT unnest(range(1, 65)) AS pos) p
),
cb AS (
    SELECT vec_id AS code, pos, (pos - 1) // {_PQ_SUB_DIM} AS sub, v AS w
    FROM u WHERE vec_id >= {lo} AND vec_id < {hi}
),
d AS (
    SELECT u.vec_id, cb.sub, cb.code,
           CAST(sum((u.v - cb.w) * (u.v - cb.w)) AS BIGINT) AS dist
    FROM u JOIN cb ON u.pos = cb.pos
    GROUP BY u.vec_id, cb.sub, cb.code
),
a AS (
    SELECT vec_id, sub, code, dist FROM (
        SELECT vec_id, sub, code, dist,
               row_number() OVER (PARTITION BY vec_id, sub ORDER BY dist, code) AS rn
        FROM d) WHERE rn = 1
)
SELECT vec_id,
       {code_cols},
       CAST(sum(dist) AS BIGINT) AS recon_err
FROM a
GROUP BY vec_id
"""


@query("sim_pq_codes", oracle=_pq_oracle(), tags=("similarity", "pq", "compression"))
def sim_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization encoding of the embedding corpus: 4 codes +
    exact reconstruction error per vector (256 B of floats → 4 B of
    codes — the storage-side compression a billion-vector ANN index
    needs). Encoding is a narrow codegen projection against the inlined
    8-codeword codebook; the corpus never shuffles."""
    e = load_table(spark, sf_dir, "embeddings")
    return pq_codes(e)


# --- sparse random projection (Achlioptas) -----------------------------------

RP_OUT_DIM = 16
_RP_IN_DIM = 64


def _rp_component(j: int, d: int) -> int:
    """Deterministic sparse-RP entry ∈ {+1, 0, -1} with the Achlioptas
    distribution (1/6, 2/3, 1/6) — md5-derived like the LSH hyperplanes,
    so the identical matrix inlines into BOTH engines with no stored
    model (Achlioptas 2003, the public database-friendly RP recipe)."""
    import hashlib

    h = int(hashlib.md5(f"rp|j{j}d{d}".encode()).hexdigest()[:15], 16) % 6
    return 1 if h == 0 else (-1 if h == 1 else 0)


def _rp_rows() -> list[list[int]]:
    return [
        [_rp_component(j, d) for d in range(_RP_IN_DIM)] for j in range(RP_OUT_DIM)
    ]


def _rp_oracle() -> str:
    rows = _rp_rows()

    def arr(r: list[int]) -> str:
        return "[" + ", ".join(f"{x}.0" for x in r) + "]::DOUBLE[]"

    # Components are micro-scaled to exact integers (floor(x * 1e6) — the
    # double multiply and floor are IEEE-identical across engines) before
    # the ±1/0 dot, so both engines sum identical integers; the final
    # /1e6 divides the same exact-integer-valued double on both sides.
    # Raw-double round(.,6) was the documented cross-engine half-boundary
    # hazard (functions/exact.py): DuckDB rounds the shortest decimal
    # repr, Spark the binary value.
    proj_case = "CASE p.i " + " ".join(
        f"WHEN {j} THEN list_dot_product(e.v, {arr(rows[j])}) / 1000000.0"
        for j in range(RP_OUT_DIM)
    ) + " END"
    dim_values = ", ".join(f"({j})" for j in range(RP_OUT_DIM))
    return f"""
    WITH e AS (
        SELECT vec_id,
               list_transform(embedding::DOUBLE[],
                              x -> CAST(floor(x * 1000000) AS BIGINT))::DOUBLE[] AS v
        FROM embeddings),
    dims AS (SELECT * FROM (VALUES {dim_values}) AS p0(i))
    SELECT e.vec_id, CAST(p.i AS INT) AS dim_idx, {proj_case} AS value
    FROM e CROSS JOIN dims p
    """


@query(
    "sim_random_projection",
    oracle=_rp_oracle(),
    tags=("similarity", "vector-ops", "dimensionality-reduction"),
)
def sim_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse random projection 64 → 16 dims (Achlioptas ±1/0 matrix,
    density 1/3): the cheap distance-preserving reduction a pipeline
    runs before ANN indexing or clustering when the native embedding is
    wider than the index wants. Pure narrow projection — the matrix is
    16×64 literal ±1/0 entries inlined into the plan (NO driver-side
    model, no shuffle, no Python); each output dim is one
    zip_with/aggregate fold, the same sequential-fold shape the whole
    similarity family uses for cross-engine bit-equality. Long-form
    output (vec_id, dim_idx, value) keeps the oracle hash stable across
    engines' array orderings.

    Cross-engine exactness: components are micro-scaled to integers
    (``floor(x * 1e6)`` — IEEE-identical in Spark and DuckDB) before the
    ±1/0 dot, so the sum is exact integer arithmetic on both engines and
    the final ``/1e6`` divides the same integer-valued double. The
    previous ``round(raw_double, 6)`` relied on float round parity — the
    exact half-boundary divergence ``functions/exact.py`` documents."""
    from ..functions.vectors import dot

    rows = _rp_rows()
    e = load_table(spark, sf_dir, "embeddings")
    v = F.transform(
        F.col("embedding"),
        lambda x: F.floor(x.cast("double") * 1000000.0).cast("double"),
    )
    staged = e.select("vec_id", v.alias("v"))

    def lit_row(r: list[int]):
        return F.expr("array(" + ", ".join(f"{x}.0D" for x in r) + ")")

    projected = F.array(
        *[(dot(F.col("v"), lit_row(rows[j])) / 1000000.0) for j in range(RP_OUT_DIM)]
    )
    return staged.select(
        "vec_id", F.posexplode(projected).alias("dim_idx", "value")
    ).select("vec_id", F.col("dim_idx").cast("int").alias("dim_idx"), "value")


# --- dimension-truncation recall (matryoshka-style eval) ----------------------

TRUNC_DIM = 16


def _bruteforce_cte(vec_expr: str) -> str:
    """Brute-force top-k as a parenthesizable SELECT, over an arbitrary
    vector expression (full embedding or a prefix slice)."""
    return f"""
WITH e AS (SELECT vec_id, {vec_expr} AS v FROM embeddings),
q AS (SELECT * FROM e WHERE vec_id < {N_QUERIES}),
scored AS (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           round({_COSINE}, 6) AS cosine_sim
    FROM q JOIN e c ON q.vec_id <> c.vec_id
)
SELECT query_id, neighbor_id FROM (
    SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id
    ) AS rk
    FROM scored
)
WHERE rk <= {TOP_K}
"""


_TRUNC_RECALL_ORACLE = f"""
WITH truth AS (SELECT * FROM ({_bruteforce_cte("embedding::DOUBLE[]")}) t0),
approx AS (SELECT * FROM ({_bruteforce_cte(f"(embedding::DOUBLE[])[1:{TRUNC_DIM}]")}) a0)
SELECT t.query_id,
       CAST(count(a.neighbor_id) AS BIGINT) AS n_hits,
       CAST(count(a.neighbor_id) * {1000 // TOP_K} AS BIGINT) AS recall_permille
FROM truth t
LEFT JOIN approx a
  ON t.query_id = a.query_id AND t.neighbor_id = a.neighbor_id
GROUP BY t.query_id
"""


@query(
    "sim_dim_truncation_recall",
    oracle=_TRUNC_RECALL_ORACLE,
    tags=("similarity", "evaluation", "dimensionality-reduction"),
)
def sim_dim_truncation_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-truncation quality eval: recall@5 of cosine search on the
    FIRST 16 of 64 dims against full-dim ground truth — the decision
    metric for matryoshka-style storage tiering (keep a short prefix
    hot for candidate generation, full vectors cold for re-rank; a 4×
    smaller hot index is only safe if this recall holds). Same
    query-sample shape as ``sim_ann_recall``: corpus-side work is two
    broadcast-probe scans, the comparison is ≤ queries × k rows."""
    from ..operators.similarity import DIM

    e = load_table(spark, sf_dir, "embeddings")
    probes = e.filter(F.col("vec_id") < N_QUERIES)
    truth = brute_force_topk(e, probes, k=TOP_K, dim=DIM).select(
        "query_id", "neighbor_id"
    )
    trunc = F.slice(F.col("embedding"), 1, TRUNC_DIM)
    e16 = e.select("vec_id", trunc.alias("embedding"))
    p16 = probes.select("vec_id", trunc.alias("embedding"))
    approx = brute_force_topk(e16, p16, k=TOP_K, dim=TRUNC_DIM).select(
        F.col("query_id").alias("a_query_id"),
        F.col("neighbor_id").alias("a_neighbor_id"),
    )
    joined = truth.join(
        approx,
        (F.col("query_id") == F.col("a_query_id"))
        & (F.col("neighbor_id") == F.col("a_neighbor_id")),
        "left",
    )
    hits = F.count("a_neighbor_id")
    return joined.groupBy("query_id").agg(
        hits.alias("n_hits"),
        (hits * (1000 // TOP_K)).alias("recall_permille"),
    )


# --- IVF-PQ with ADC lookup tables (the composed billion-scale index) ---------

from ..operators.ivfpq import ivfpq_adc_topk  # noqa: E402
from ..operators.similarity import PQ_SCALE  # noqa: E402


def _ivfpq_ctes() -> str:
    """The IVF-PQ ADC pipeline as a CTE chain ending in ``scored``
    (query_id, neighbor_id, adc_dist) — shared by the standalone ADC
    top-k oracle and the MMR-over-IVFPQ composed oracle."""
    lo_c, hi_c = IVF_CENTROID_RANGE
    lo, hi = PQ_CODEBOOK_RANGE
    sub_dim = 64 // PQ_N_SUB
    return f"""e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cents AS (
    SELECT vec_id AS cid, v AS centroid FROM e
    WHERE vec_id >= {lo_c} AND vec_id < {hi_c}
),
assigned AS (
    SELECT vec_id AS neighbor_id, cid FROM (
        SELECT e.vec_id, c.cid,
               row_number() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY {sql_safe_cosine('e.v', 'c.centroid')} DESC, c.cid
               ) AS rn
        FROM e CROSS JOIN cents c
    ) WHERE rn = 1
),
probed AS (
    SELECT vec_id AS query_id, cid FROM (
        SELECT e.vec_id, c.cid,
               row_number() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY {sql_safe_cosine('e.v', 'c.centroid')} DESC, c.cid
               ) AS rn
        FROM e CROSS JOIN cents c
        WHERE e.vec_id < {N_QUERIES}
    ) WHERE rn <= {IVF_NPROBE}
),
pts AS (
    SELECT vec_id,
           list_transform(embedding::DOUBLE[],
                          x -> CAST(floor(x * {float(PQ_SCALE)}) AS BIGINT)) AS qv
    FROM embeddings
),
u AS (
    SELECT vec_id, p.pos AS pos, qv[p.pos] AS v
    FROM pts, (SELECT unnest(range(1, 65)) AS pos) p
),
cb AS (
    SELECT vec_id AS code, pos, (pos - 1) // {sub_dim} AS sub, v AS w
    FROM u WHERE vec_id >= {lo} AND vec_id < {hi}
),
d AS (
    SELECT u.vec_id, cb.sub, cb.code,
           CAST(sum((u.v - cb.w) * (u.v - cb.w)) AS BIGINT) AS dist
    FROM u JOIN cb ON u.pos = cb.pos
    GROUP BY u.vec_id, cb.sub, cb.code
),
codes AS (
    SELECT vec_id, sub, code FROM (
        SELECT vec_id, sub, code,
               row_number() OVER (PARTITION BY vec_id, sub ORDER BY dist, code) AS rn
        FROM d) WHERE rn = 1
),
qlut AS (SELECT vec_id AS query_id, sub, code, dist FROM d WHERE vec_id < {N_QUERIES}),
scored AS (
    -- a (query, neighbor) pair meets on at most one cid (corpus
    -- assignment is rn = 1), so the sum groups exactly n_sub LUT rows
    SELECT p.query_id, a.neighbor_id, CAST(sum(ql.dist) AS BIGINT) AS adc_dist
    FROM probed p
    JOIN assigned a ON p.cid = a.cid
    JOIN codes c ON c.vec_id = a.neighbor_id
    JOIN qlut ql ON ql.query_id = p.query_id AND ql.sub = c.sub AND ql.code = c.code
    WHERE p.query_id <> a.neighbor_id
    GROUP BY p.query_id, a.neighbor_id
)"""


def _ivfpq_oracle() -> str:
    return f"""
WITH {_ivfpq_ctes()}
SELECT query_id, neighbor_id, adc_dist, CAST(rk AS INT) AS rk
FROM (
    SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY adc_dist, neighbor_id
    ) AS rk
    FROM scored
)
WHERE rk <= {TOP_K}
"""


@query(
    "sim_ivfpq_adc_topk",
    oracle=_ivfpq_oracle(),
    tags=("similarity", "ann", "ivf", "pq", "compression", "test-config"),
)
def sim_ivfpq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ ANN with asymmetric-distance lookup tables — the composed
    index (coarse quantizer + 4-byte PQ codes) every billion-vector
    deployment runs, as one query.

    Tagged ``test-config`` (VERDICT r12 #4, the applyinpandas_zscore
    precedent): this untrained nprobe=2 configuration retrieves at
    recall@5 ≈ 4% and now serves ONLY as `sim_ivfpq_recall`'s pinned
    baseline subject — the production twin is `sim_ivfpq_refined_topk`
    (trained coarse + trained PQ + exact shortlist refine, recall@5
    0.86), which also feeds the composed `sim_mmr_over_ivfpq` as of
    r13. The ADC mechanics proven here (LUT build, code→slot
    translation, broadcast probe join) are exactly what the trained
    twin executes. Each query precomputes n_sub×8
    integer LUT entries; scoring a candidate is then 4 array lookups +
    adds — NO vector arithmetic on the quadratic stage, and the full
    embedding column is never read at query time (only cid + codes).
    At 100 TB the encoded corpus is ~250× smaller than the raw vectors
    and is written partitionBy(cid), so a probe reads nprobe/16 of 4-
    byte codes instead of 256-byte floats. Integer-exact end to end
    (the pq_codes 2^20 grid), so the oracle hash-matches bit-for-bit.
    Plan: two zero-shuffle narrow projections (assignment + encoding),
    a broadcast hash join on cid, one final top-k shuffle."""
    e = load_table(spark, sf_dir, "embeddings")
    return ivfpq_adc_topk(e, e.filter(F.col("vec_id") < N_QUERIES), k=TOP_K)


# --- IVF-PQ retrieval-quality evaluation + the trained/refined fix path ------

from ..operators.ivfpq import (  # noqa: E402
    PQT_COARSE_LISTS,
    PQT_ITERS,
    PQT_N_CODES,
    PQT_N_SUB,
    PQT_NPROBE,
    PQT_SHORTLIST,
    ivfpq_refined_topk,
)

_IVFPQ_RECALL_ORACLE = f"""
WITH truth AS (SELECT query_id, neighbor_id FROM ({_BRUTEFORCE_ORACLE}) t0),
approx AS (SELECT query_id, neighbor_id FROM ({_ivfpq_oracle()}) a0)
SELECT t.query_id,
       CAST(count(a.neighbor_id) AS BIGINT) AS n_hits,
       CAST(count(a.neighbor_id) * {1000 // TOP_K} AS BIGINT) AS recall_permille
FROM truth t
LEFT JOIN approx a
  ON t.query_id = a.query_id AND t.neighbor_id = a.neighbor_id
GROUP BY t.query_id
"""


@query(
    "sim_ivfpq_recall",
    oracle=_IVFPQ_RECALL_ORACLE,
    tags=("similarity", "ann", "ivf", "pq", "evaluation"),
)
def sim_ivfpq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of the IVF-PQ ADC index against exact brute-force
    ground truth, per query — the ADC twin of `sim_ann_recall` (which
    evaluates the LSH index), and the metric that sizes nprobe and
    codebooks before a corpus commits to the compressed index.

    This eval EXPOSES the registered base config's weakness honestly:
    mean recall@5 ≈ 4% on the fixture. Measured r12 decomposition (see
    operators/ivfpq.py's PQT_* derivation notes): the corpus is
    already unit-norm, so the r11 L2-vs-cosine hypothesis contributes
    nothing — the loss is the coarse probe cap (23% at nprobe=2) times
    untrained-codebook ADC ranking noise. `sim_ivfpq_refined_recall`
    evaluates the fix path. Scale shape: identical to sim_ann_recall —
    truth runs on the bounded query sample only, the join/agg is over
    ≤ queries × k rows."""
    from ..operators.ivfpq import ivfpq_adc_topk as _adc_topk

    e = load_table(spark, sf_dir, "embeddings")
    probes = e.filter(F.col("vec_id") < N_QUERIES)
    truth = brute_force_topk(e, probes, k=TOP_K).select("query_id", "neighbor_id")
    approx = _adc_topk(e, probes, k=TOP_K).select(
        F.col("query_id").alias("a_query_id"),
        F.col("neighbor_id").alias("a_neighbor_id"),
    )
    joined = truth.join(
        approx,
        (F.col("query_id") == F.col("a_query_id"))
        & (F.col("neighbor_id") == F.col("a_neighbor_id")),
        "left",
    )
    hits = F.count("a_neighbor_id")
    return joined.groupBy("query_id").agg(
        hits.alias("n_hits"),
        (hits * (1000 // TOP_K)).alias("recall_permille"),
    )


def _ivfpq_refined_ctes(
    nprobe: int = PQT_NPROBE, shortlist: int = PQT_SHORTLIST
) -> str:
    """The trained IVF + trained PQ + exact-refine pipeline as a CTE
    chain ending in ``refined`` (query_id, neighbor_id, cosine_sim) —
    the SQL twin of operators/ivfpq.py:ivfpq_refined_topk. BOTH
    quantizers train with the `_kmeans_ctes` recipe (seeds are the
    id<k (sub-)vectors, one integer-mean update round, ties to the
    smaller code id, an emptied codeword disappears on both engines):
    the coarse chain (g0→gd1→ga1→gc1→gd2) is full-vector k-means into
    {PQT_COARSE_LISTS} inverted lists with integer-L2 assignment and
    probing; the PQ chain (cb0→d1→a1→cb1→d2) is the same recipe per
    SUBSPACE. ``nprobe``/``shortlist`` are the search-time knobs —
    defaults are the base-config constants; the composed retrieval
    passes its own swept values (MMR_CAND_NPROBE/MMR_CAND_SHORTLIST)."""
    sub_dim = 64 // PQT_N_SUB
    assert PQT_ITERS == 2, "oracle CTE chain is unrolled for 2 rounds"
    return f"""e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
pts AS (
    SELECT vec_id,
           list_transform(embedding::DOUBLE[],
                          x -> CAST(floor(x * {float(PQ_SCALE)}) AS BIGINT)) AS qv
    FROM embeddings
),
us AS (
    SELECT vec_id,
           CAST((p.pos - 1) // {sub_dim} AS BIGINT) AS sub,
           p.pos - ((p.pos - 1) // {sub_dim}) * {sub_dim} AS spos,
           qv[p.pos] AS v
    FROM pts, (SELECT unnest(range(1, 65)) AS pos) p
),
u0 AS (
    SELECT vec_id, p.pos AS pos, qv[p.pos] AS v
    FROM pts, (SELECT unnest(range(1, 65)) AS pos) p
),
g0 AS (SELECT vec_id AS code, pos, v AS w FROM u0 WHERE vec_id < {PQT_COARSE_LISTS}),
gd1 AS (
    SELECT u0.vec_id, g.code,
           CAST(sum((u0.v - g.w) * (u0.v - g.w)) AS BIGINT) AS dist
    FROM u0 JOIN g0 g ON u0.pos = g.pos
    GROUP BY u0.vec_id, g.code
),
ga1 AS (
    SELECT vec_id, code FROM (
        SELECT vec_id, code,
               row_number() OVER (PARTITION BY vec_id ORDER BY dist, code) AS rn
        FROM gd1) WHERE rn = 1
),
gc1 AS (
    SELECT a.code, u0.pos, CAST(sum(u0.v) // count(*) AS BIGINT) AS w
    FROM ga1 a JOIN u0 ON a.vec_id = u0.vec_id
    GROUP BY a.code, u0.pos
),
gd2 AS (
    SELECT u0.vec_id, g.code,
           CAST(sum((u0.v - g.w) * (u0.v - g.w)) AS BIGINT) AS dist
    FROM u0 JOIN gc1 g ON u0.pos = g.pos
    GROUP BY u0.vec_id, g.code
),
assigned AS (
    SELECT vec_id AS neighbor_id, code AS cid FROM (
        SELECT vec_id, code,
               row_number() OVER (PARTITION BY vec_id ORDER BY dist, code) AS rn
        FROM gd2) WHERE rn = 1
),
probed AS (
    SELECT vec_id AS query_id, code AS cid FROM (
        SELECT vec_id, code,
               row_number() OVER (PARTITION BY vec_id ORDER BY dist, code) AS rn
        FROM gd2 WHERE vec_id < {N_QUERIES}) WHERE rn <= {nprobe}
),
cb0 AS (SELECT sub, vec_id AS code, spos, v AS w FROM us WHERE vec_id < {PQT_N_CODES}),
d1 AS (
    SELECT us.vec_id, us.sub, c.code,
           CAST(sum((us.v - c.w) * (us.v - c.w)) AS BIGINT) AS dist
    FROM us JOIN cb0 c ON us.sub = c.sub AND us.spos = c.spos
    GROUP BY us.vec_id, us.sub, c.code
),
a1 AS (
    SELECT vec_id, sub, code FROM (
        SELECT vec_id, sub, code,
               row_number() OVER (PARTITION BY vec_id, sub ORDER BY dist, code) AS rn
        FROM d1) WHERE rn = 1
),
cb1 AS (
    SELECT a.sub, a.code, us.spos, CAST(sum(us.v) // count(*) AS BIGINT) AS w
    FROM a1 a JOIN us ON a.vec_id = us.vec_id AND a.sub = us.sub
    GROUP BY a.sub, a.code, us.spos
),
d2 AS (
    SELECT us.vec_id, us.sub, c.code,
           CAST(sum((us.v - c.w) * (us.v - c.w)) AS BIGINT) AS dist
    FROM us JOIN cb1 c ON us.sub = c.sub AND us.spos = c.spos
    GROUP BY us.vec_id, us.sub, c.code
),
codes AS (
    SELECT vec_id, sub, code FROM (
        SELECT vec_id, sub, code,
               row_number() OVER (PARTITION BY vec_id, sub ORDER BY dist, code) AS rn
        FROM d2) WHERE rn = 1
),
qlut AS (SELECT vec_id AS query_id, sub, code, dist FROM d2 WHERE vec_id < {N_QUERIES}),
adcs AS (
    SELECT p.query_id, a.neighbor_id, CAST(sum(ql.dist) AS BIGINT) AS adc_dist
    FROM probed p
    JOIN assigned a ON p.cid = a.cid
    JOIN codes c ON c.vec_id = a.neighbor_id
    JOIN qlut ql ON ql.query_id = p.query_id AND ql.sub = c.sub AND ql.code = c.code
    WHERE p.query_id <> a.neighbor_id
    GROUP BY p.query_id, a.neighbor_id
),
short AS (
    SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (
                   PARTITION BY query_id ORDER BY adc_dist, neighbor_id
               ) AS rn
        FROM adcs) WHERE rn <= {shortlist}
),
refined AS (
    SELECT s.query_id, s.neighbor_id,
           round({sql_safe_cosine('q.v', 'c2.v')}, 6) AS cosine_sim
    FROM short s
    JOIN e q ON q.vec_id = s.query_id
    JOIN e c2 ON c2.vec_id = s.neighbor_id
)"""


def _ivfpq_refined_oracle(
    nprobe: int = PQT_NPROBE, shortlist: int = PQT_SHORTLIST
) -> str:
    return f"""
WITH {_ivfpq_refined_ctes(nprobe, shortlist)}
SELECT query_id, neighbor_id, cosine_sim, CAST(rk AS INT) AS rk
FROM (
    SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id
    ) AS rk
    FROM refined
)
WHERE rk <= {TOP_K}
"""


@query(
    "sim_ivfpq_refined_topk",
    oracle=_ivfpq_refined_oracle(),
    tags=("similarity", "ann", "ivf", "pq", "compression", "rerank"),
)
def sim_ivfpq_refined_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRAINED IVF + TRAINED PQ + exact refine — the retrieval-quality
    fix path for the base ADC index (VERDICT r11 #3), FAISS
    `IVFPQ,Refine`-shaped: a Lloyd-trained coarse quantizer (16 lists,
    full-vector exact-integer k-means — lifting the probe cap from
    23/38/73% to 76/86/94% at nprobe 2/4/8 vs the corpus-slice
    codebook), per-subspace Lloyd-trained PQ codebooks (8×16),
    nprobe=4, ADC shortlist of 100 per query, exact cosine re-rank of
    ONLY the shortlist. Embeddings are read for ≤ queries×100 rows via
    a broadcast hash join — the corpus never shuffles and the
    quadratic stage does no vector arithmetic. Measured recall@5 at
    sf0.01: **0.86 probing 4/16 of the corpus** — the full nprobe=4
    probe cap, i.e. the shortlist saturates what exhaustive exact
    re-ranking of the probed lists could reach — vs 0.04 for the
    untrained no-refine base config (`sim_ivfpq_recall` /
    `sim_ivfpq_refined_recall` keep both numbers as registered
    evals)."""
    e = load_table(spark, sf_dir, "embeddings")
    return ivfpq_refined_topk(e, e.filter(F.col("vec_id") < N_QUERIES), k=TOP_K)


_IVFPQ_REFINED_RECALL_ORACLE = f"""
WITH truth AS (SELECT query_id, neighbor_id FROM ({_BRUTEFORCE_ORACLE}) t0),
approx AS (SELECT query_id, neighbor_id FROM ({_ivfpq_refined_oracle()}) a0)
SELECT t.query_id,
       CAST(count(a.neighbor_id) AS BIGINT) AS n_hits,
       CAST(count(a.neighbor_id) * {1000 // TOP_K} AS BIGINT) AS recall_permille
FROM truth t
LEFT JOIN approx a
  ON t.query_id = a.query_id AND t.neighbor_id = a.neighbor_id
GROUP BY t.query_id
"""


@query(
    "sim_ivfpq_refined_recall",
    oracle=_IVFPQ_REFINED_RECALL_ORACLE,
    tags=("similarity", "ann", "ivf", "pq", "evaluation", "rerank"),
)
def sim_ivfpq_refined_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of the trained/refined IVF-PQ pipeline
    (`sim_ivfpq_refined_topk`) against exact brute-force truth — the
    companion eval proving the fix path's measured win (mean ≈ 86% on
    the fixture vs ≈ 4% for the base config; the residual loss is
    EXACTLY the trained-coarse nprobe=4 probe cap — the shortlist
    saturates it, see operators/ivfpq.py). Registered so the
    index-quality claim stays a driver-checked number, not a
    docstring assertion."""
    e = load_table(spark, sf_dir, "embeddings")
    probes = e.filter(F.col("vec_id") < N_QUERIES)
    truth = brute_force_topk(e, probes, k=TOP_K).select("query_id", "neighbor_id")
    approx = ivfpq_refined_topk(e, probes, k=TOP_K).select(
        F.col("query_id").alias("a_query_id"),
        F.col("neighbor_id").alias("a_neighbor_id"),
    )
    joined = truth.join(
        approx,
        (F.col("query_id") == F.col("a_query_id"))
        & (F.col("neighbor_id") == F.col("a_neighbor_id")),
        "left",
    )
    hits = F.count("a_neighbor_id")
    return joined.groupBy("query_id").agg(
        hits.alias("n_hits"),
        (hits * (1000 // TOP_K)).alias("recall_permille"),
    )


# --- MMR diversity re-ranking --------------------------------------------------

from ..operators.mmr import (  # noqa: E402
    MMR_K,
    MMR_LAMBDA_NUM,
    MMR_LAMBDA_PEN,
    MMR_N_CAND,
    MMR_SCALE,
    mmr_topk,
)


def _int_dot_sql(a: str, b: str) -> str:
    return (
        f"CAST(list_sum(list_transform(list_zip({a}, {b}), "
        f"x -> x[1] * x[2])) AS BIGINT)"
    )


def _mmr_tail(prelude: str) -> str:
    """The greedy-MMR refinement oracle: pairs + unrolled pick chain +
    final select, over a caller-supplied CTE ``cand`` (query_id,
    cand_id, rel, cv — cv on the MMR integer grid). ``prelude`` is
    everything after WITH up to and including a MATERIALIZED ``cand``;
    shared by the brute-force oracle and the IVF-PQ-composed one."""
    int_dot = _int_dot_sql
    steps = []
    for t in range(2, MMR_K + 1):
        prev = f"selall{t - 1}"
        steps.append(f"""
pen{t} AS (
    SELECT p.query_id, p.a_id AS cand_id, max(p.psim) AS pen
    FROM pairs p JOIN {prev} s ON p.query_id = s.query_id AND p.b_id = s.cand_id
    WHERE NOT EXISTS (
        SELECT 1 FROM {prev} s2
        WHERE s2.query_id = p.query_id AND s2.cand_id = p.a_id
    )
    GROUP BY 1, 2
),
sel{t} AS (
    SELECT query_id, cand_id, {t} AS pick_idx, score FROM (
        SELECT c.query_id, c.cand_id,
               {MMR_LAMBDA_NUM} * c.rel - {MMR_LAMBDA_PEN} * p.pen AS score,
               row_number() OVER (
                   PARTITION BY c.query_id
                   ORDER BY {MMR_LAMBDA_NUM} * c.rel - {MMR_LAMBDA_PEN} * p.pen DESC,
                            c.cand_id
               ) AS rn
        FROM cand c JOIN pen{t} p
          ON c.query_id = p.query_id AND c.cand_id = p.cand_id
    ) WHERE rn = 1
),
selall{t} AS MATERIALIZED (
    SELECT query_id, cand_id, pick_idx, score FROM {prev}
    UNION ALL
    SELECT query_id, cand_id, pick_idx, score FROM sel{t}
)""")
    chained = ",".join(steps)
    return f"""
WITH {prelude},
pairs AS MATERIALIZED (
    SELECT a.query_id, a.cand_id AS a_id, b.cand_id AS b_id,
           {int_dot('a.cv', 'b.cv')} AS psim
    FROM cand a JOIN cand b
      ON a.query_id = b.query_id AND a.cand_id <> b.cand_id
),
sel1 AS (
    SELECT query_id, cand_id, 1 AS pick_idx,
           {MMR_LAMBDA_NUM} * rel AS score
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY rel DESC, cand_id
        ) AS rn FROM cand
    ) WHERE rn = 1
),
selall1 AS MATERIALIZED (SELECT query_id, cand_id, pick_idx, score FROM sel1),{chained}
SELECT query_id,
       CAST(pick_idx AS INT) AS pick_idx,
       cand_id AS neighbor_id,
       CAST(score AS BIGINT) AS mmr_score
FROM selall{MMR_K}
"""


def _mmr_oracle() -> str:
    """Brute-force candidate generation + greedy refinement."""
    return _mmr_tail(f"""e AS (
    SELECT vec_id,
           list_transform(embedding::DOUBLE[],
                          x -> CAST(floor(x * {float(MMR_SCALE)}) AS BIGINT)) AS v
    FROM embeddings
),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {N_QUERIES}),
rel0 AS (
    SELECT q.query_id, c.vec_id AS cand_id,
           {_int_dot_sql('q.qv', 'c.v')} AS rel, c.v AS cv
    FROM q JOIN e c ON q.query_id <> c.vec_id
),
cand AS MATERIALIZED (
    SELECT query_id, cand_id, rel, cv FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY rel DESC, cand_id
        ) AS crk FROM rel0
    ) WHERE crk <= {MMR_N_CAND}
)""")


@query(
    "sim_mmr_diverse_topk",
    oracle=_mmr_oracle(),
    tags=("similarity", "diversity", "rerank"),
)
def sim_mmr_diverse_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-marginal-relevance selection: for each of 20 queries,
    greedily pick the 5 most relevant-AND-mutually-diverse of its
    top-20 candidates (score = 7·rel − 3·max-sim-to-picked, λ=0.7) —
    the post-retrieval selection step of diverse few-shot sampling and
    dedup-aware curation, a different primitive from top-k (which
    happily returns 5 near-copies). The greedy loop is UNROLLED: k−1
    joins over the (queries × 20)-row candidate table; the corpus is
    touched exactly once (candidate generation — the same broadcast-
    query scan the brute-force path uses; in production the ANN index
    feeds this stage instead). Integer-exact throughout (2^10 grid,
    integer λ), so both engines pick identical items with identical
    scores. Oracle CTEs are MATERIALIZED: DuckDB inlines plain CTEs
    per reference, and the unrolled chain re-references cand/pairs/
    selall layers — un-materialized, the 10× oracle re-evaluated the
    candidate scan combinatorially (measured 235 s → 13 s)."""
    e = load_table(spark, sf_dir, "embeddings")
    return mmr_topk(e, e.filter(F.col("vec_id") < N_QUERIES))


# The composed retrieval's search-time knobs, promoted from the r14
# nprobe × shortlist sweep (VERDICT r13 #4; full grid in SCALE.md r14).
# (6, 200) DOMINATES the previous (PQT_NPROBE=4, PQT_SHORTLIST=100)
# default on mean AND min candidate recall@20 at both measured scales —
# sf0.01: 0.832/0.60 vs 0.752/0.40; sf0.1: 0.818/0.40 vs 0.695/0.40 —
# at indistinguishable query-half cost (the 200 k-vector grid is flat:
# fixed stage overhead dominates). The sweep's structural finding:
# widening nprobe at a FIXED shortlist (6,100 / 8,100) REDUCES recall
# at the larger scale — more probed mass means more ADC-noise
# candidates competing for the same shortlist slots, squeezing true
# neighbors out — so the shortlist must grow with probed mass; 200
# saturates it here. (8, 200) wins at sf0.01 (0.895/0.65) but inverts
# below (4/6, 200) at sf0.1 (0.795/0.40) for the same reason — the
# scale-STABLE choice is (6, 200). The base refined queries keep the
# PQT_* defaults: they are the recall eval's fixed subject.
MMR_CAND_NPROBE = 6
MMR_CAND_SHORTLIST = 200


def _mmr_over_ivfpq_oracle() -> str:
    """Trained IVF-PQ + exact-refine candidate generation (top-
    MMR_N_CAND by refined cosine — the `_ivfpq_refined_ctes` chain,
    i.e. the 0.86-recall trained index, NOT the untrained base ADC
    config whose 4%-recall candidate set the r12 composition
    inherited — VERDICT r12 #2; searched at the swept
    MMR_CAND_NPROBE/MMR_CAND_SHORTLIST knobs since r14) + exact
    MMR-grid relevance on the candidate set + the shared greedy
    refinement chain."""
    return _mmr_tail(f"""{_ivfpq_refined_ctes(MMR_CAND_NPROBE, MMR_CAND_SHORTLIST)},
annc AS MATERIALIZED (
    SELECT query_id, neighbor_id AS cand_id FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id
        ) AS rk FROM refined
    ) WHERE rk <= {MMR_N_CAND}
),
em AS (
    SELECT vec_id,
           list_transform(embedding::DOUBLE[],
                          x -> CAST(floor(x * {float(MMR_SCALE)}) AS BIGINT)) AS v
    FROM embeddings
),
cand AS MATERIALIZED (
    SELECT a.query_id, a.cand_id,
           {_int_dot_sql('qm.v', 'cm.v')} AS rel, cm.v AS cv
    FROM annc a
    JOIN em qm ON qm.vec_id = a.query_id
    JOIN em cm ON cm.vec_id = a.cand_id
)""")


@query(
    "sim_mmr_over_ivfpq",
    oracle=_mmr_over_ivfpq_oracle(),
    tags=("similarity", "diversity", "rerank", "ann", "ivf", "pq"),
)
def sim_mmr_over_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed retrieve-then-rerank pipeline a real curation stack
    runs (VERDICT r10 #4): TRAINED IVF-PQ retrieval with exact
    shortlist refine feeds greedy MMR diversity selection. Candidate
    generation is `ivfpq_refined_topk` (VERDICT r12 #2 — the r12 form
    fed MMR from the untrained base ADC config, recall@5 ≈ 4%, while
    the 0.86-recall trained index sat one import away; measured
    candidate-set recall for the composed stage is in SCALE.md):
    trained coarse quantizer routes the corpus, ADC shortlists from
    4-byte codes, and only ≤ shortlist embeddings per query are read
    for the exact cosine re-rank — the corpus never shuffles and the
    linear full-precision scan is gone from the registered query, not
    just from prose. The MMR re-rank then fetches real vectors for
    only (queries × n_cand) ids via one pushed-down point-lookup and
    recomputes relevance EXACT on the MMR integer grid (the ANN metric
    picks the candidate SET; refinement scores must not inherit its
    quantization error). Integer/rounding-deterministic end to end, so
    the oracle hash-matches; the refinement CTE chain is shared
    verbatim with the brute-force oracle (`_mmr_tail`), and the
    candidate chain verbatim with `sim_ivfpq_refined_topk`
    (`_ivfpq_refined_ctes`)."""
    from ..operators.mmr import mmr_over_candidates

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < N_QUERIES)
    ann = ivfpq_refined_topk(
        e, q, k=MMR_N_CAND,
        nprobe=MMR_CAND_NPROBE, shortlist=MMR_CAND_SHORTLIST,
    ).select("query_id", F.col("neighbor_id").alias("cand_id"))
    return mmr_over_candidates(e, q, ann)


def _rerank_at_n_cand(sql: str) -> str:
    """Re-render a registered top-k oracle at k = MMR_N_CAND by
    widening its final rank cut. Anchored with a word boundary and
    asserted to substitute EXACTLY once (ADVICE r13: a bare substring
    replace of 'WHERE rk <= 5' would also mangle a future
    'WHERE rk <= 50' cut instead of failing loudly)."""
    out, n = re.subn(rf"WHERE rk <= {TOP_K}\b", f"WHERE rk <= {MMR_N_CAND}", sql)
    assert n == 1, f"expected exactly one rank cut, substituted {n}"
    return out


def _mmr_candidate_recall_oracle() -> str:
    """Recall@MMR_N_CAND of the composed retrieval's CANDIDATE stage:
    both sides are the already-registered verified chains
    (`_BRUTEFORCE_ORACLE` truth, `_ivfpq_refined_oracle` approx)
    re-rendered at k = MMR_N_CAND — the exact frame
    `sim_mmr_over_ivfpq` re-ranks since the r13 rewire."""
    truth_sql = _rerank_at_n_cand(_BRUTEFORCE_ORACLE)
    approx_sql = _rerank_at_n_cand(
        _ivfpq_refined_oracle(MMR_CAND_NPROBE, MMR_CAND_SHORTLIST)
    )
    return f"""
WITH truth AS (SELECT query_id, neighbor_id FROM ({truth_sql}) t0),
approx AS (SELECT query_id, neighbor_id FROM ({approx_sql}) a0)
SELECT t.query_id,
       CAST(count(a.neighbor_id) AS BIGINT) AS n_hits,
       CAST(count(a.neighbor_id) * {1000 // MMR_N_CAND} AS BIGINT) AS recall_permille
FROM truth t
LEFT JOIN approx a
  ON t.query_id = a.query_id AND t.neighbor_id = a.neighbor_id
GROUP BY t.query_id
"""


@query(
    "sim_mmr_candidate_recall",
    oracle=_mmr_candidate_recall_oracle(),
    tags=("similarity", "ann", "ivf", "pq", "evaluation", "rerank", "diversity"),
)
def sim_mmr_candidate_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@MMR_N_CAND of the composed retrieve-then-rerank
    pipeline's candidate stage (`ivfpq_refined_topk` at
    k = MMR_N_CAND, exactly what `sim_mmr_over_ivfpq` consumes)
    against exact brute-force top-MMR_N_CAND truth. Registered in r14
    from the r13 staged draft (VERDICT r13 #3) so the candidate-set
    quality SCALE.md r13 measured ad hoc stays a driver-checked row:
    mean recall@20 ≈ 0.83 at sf0.01 under the swept (nprobe=6,
    shortlist=200) composed knobs (0.75 at the old (4,100) default,
    0.115 for the r12 untrained form). MMR diversifies WITHIN this
    candidate set, so its recall bounds the composed pipeline's
    retrieval quality from above."""
    e = load_table(spark, sf_dir, "embeddings")
    probes = e.filter(F.col("vec_id") < N_QUERIES)
    truth = brute_force_topk(e, probes, k=MMR_N_CAND).select(
        "query_id", "neighbor_id"
    )
    approx = ivfpq_refined_topk(
        e, probes, k=MMR_N_CAND,
        nprobe=MMR_CAND_NPROBE, shortlist=MMR_CAND_SHORTLIST,
    ).select(
        F.col("query_id").alias("a_query_id"),
        F.col("neighbor_id").alias("a_neighbor_id"),
    )
    joined = truth.join(
        approx,
        (F.col("query_id") == F.col("a_query_id"))
        & (F.col("neighbor_id") == F.col("a_neighbor_id")),
        "left",
    )
    hits = F.count("a_neighbor_id")
    return joined.groupBy("query_id").agg(
        hits.alias("n_hits"),
        (hits * (1000 // MMR_N_CAND)).alias("recall_permille"),
    )


# --- intra-cluster diversity without pairs -----------------------------------

DIVERSITY_SCALE = 10_000  # component quantization: floor(x * 1e4)

_DIVERSITY_ORACLE = f"""
WITH q AS (
    SELECT label,
           list_transform(embedding::DOUBLE[],
                          x -> CAST(floor(x * {DIVERSITY_SCALE}) AS BIGINT)) AS v
    FROM embeddings
),
per_row AS (
    SELECT label,
           CAST(list_sum(list_transform(v, x -> x * x)) AS BIGINT) AS sq_norm,
           v
    FROM q
),
dims AS (
    SELECT label, s.i AS dim, s.x AS x FROM (
        SELECT label,
               unnest(list_transform(v, (x, i) -> struct_pack(i := i, x := x))) AS s
        FROM per_row
    )
),
dim_sums AS (
    SELECT label, dim, CAST(sum(x) AS BIGINT) AS sd FROM dims GROUP BY label, dim
),
norm_of_sum AS (
    SELECT label, CAST(sum(sd * sd) AS BIGINT) AS sum_sq FROM dim_sums GROUP BY label
),
stats AS (
    SELECT label, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(sq_norm) AS BIGINT) AS total_sq
    FROM per_row GROUP BY label
)
SELECT s.label,
       s.n AS n_vectors,
       CAST(s.n * (s.n - 1) / 2 AS BIGINT) AS n_pairs,
       CASE WHEN s.n >= 2 THEN CAST(
           (2 * (CAST(s.n AS HUGEINT) * CAST(s.total_sq AS HUGEINT)
                 - CAST(ns.sum_sq AS HUGEINT))
            + CAST(s.n * (s.n - 1) / 2 AS HUGEINT))
           // (2 * CAST(s.n * (s.n - 1) / 2 AS HUGEINT)) AS BIGINT)
       END AS mean_sq_dist
FROM stats s JOIN norm_of_sum ns ON s.label = ns.label
"""


@query(
    "sim_cluster_diversity",
    oracle=_DIVERSITY_ORACLE,
    tags=("similarity", "diversity", "evaluation"),
)
def sim_cluster_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-cluster diversity WITHOUT materializing pairs: the mean
    pairwise squared L2 distance per label via the algebraic identity
    Σ_{{i<j}} |xi−xj|² = n·Σ|xi|² − |Σxi|² — two aggregates replace
    C(n,2) pair rows, the difference between an O(N·d) scan and an
    O(N²) join at corpus scale. The metric a diversity-aware data
    selector (cluster-then-sample) reads to decide how many examples a
    cluster deserves. Components quantized to exact integers
    (floor(x·1e4)) so every sum/square is integer-exact on both
    engines; the mean is integer half-up over the exact rational,
    computed in DECIMAL(38,0) (the numerator outgrows int64 past ~50 k
    vectors per label — caught before it could ship by reviewing
    against the 100× fixture shape)."""
    e = load_table(spark, sf_dir, "embeddings")
    v = F.transform(
        F.col("embedding"),
        lambda x: F.floor(x.cast("double") * DIVERSITY_SCALE).cast("long"),
    )
    per_row = e.select(
        "label",
        v.alias("v"),
        F.aggregate(
            F.transform(v, lambda x: x * x), F.lit(0).cast("long"), lambda a, x: a + x
        ).alias("sq_norm"),
    )
    dims = per_row.select("label", F.posexplode("v").alias("dim", "x"))
    dim_sums = dims.groupBy("label", "dim").agg(F.sum("x").alias("sd"))
    norm_of_sum = dim_sums.groupBy("label").agg(
        F.sum(F.col("sd") * F.col("sd")).alias("sum_sq")
    )
    stats = per_row.groupBy("label").agg(
        F.count("*").alias("n"), F.sum("sq_norm").alias("total_sq")
    )
    j = stats.join(norm_of_sum, "label")
    # numerator ~ n² · d · scale² overflows int64 for labels past ~50 k
    # vectors, so the mean is computed in exact DECIMAL(38,0) (integer
    # half-up via integral `div` — positive operands, identical to the
    # oracle's HUGEINT `//`); only the bounded mean (~d·scale²·2) is
    # emitted, as BIGINT. Singleton labels have zero pairs: the mean is
    # NULL on both engines, never a division.
    dec = "decimal(38,0)"
    numerator = (
        F.col("n").cast(dec) * F.col("total_sq").cast(dec)
        - F.col("sum_sq").cast(dec)
    )
    n_pairs_l = (F.col("n") * (F.col("n") - 1) / 2).cast("long")
    pairs_dec = n_pairs_l.cast(dec)
    mean = F.when(
        F.col("n") >= 2,
        F.expr(
            "CAST((2 * __num + __pairs) div (2 * __pairs) AS BIGINT)"
        ),
    )
    return (
        j.withColumn("__num", numerator)
        .withColumn("__pairs", pairs_dec)
        .select(
            "label",
            F.col("n").alias("n_vectors"),
            n_pairs_l.alias("n_pairs"),
            mean.alias("mean_sq_dist"),
        )
    )
