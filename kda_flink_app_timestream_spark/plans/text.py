"""Text-analysis queries over ``documents`` (LLM-pipeline surface):
language-ID, quality scoring, token counting, fingerprinting, n-gram
document frequency. Oracle SQL is generated from the same constants
(marker lists, regexes, hash seeds) so both engines express the
identical computation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import (
    ENGLISH_STOPWORDS,
    LANG_MARKERS,
    LANG_ORDER,
    TOKEN_REGEX,
    bpe_ish_token_count,
    language_id,
    quality_features,
    rolling_fingerprint,
    sql_portable_hash64,
    sql_rolling_fingerprint,
    tokens,
    word_shingles,
)
from ..sources.batch import load_table
from .catalog import query


def _sql_marker_hits(markers: tuple[str, ...]) -> str:
    arr = ", ".join(f"'{m}'" for m in markers)
    return (
        f"len(list_filter(str_split(text, ' '), t -> list_contains([{arr}], t)))"
    )


def _lang_id_oracle() -> str:
    hits = ",\n               ".join(
        f"{_sql_marker_hits(LANG_MARKERS[lang])} AS h_{lang}" for lang in LANG_ORDER
    )
    gmax = "greatest(" + ", ".join(f"h_{lang}" for lang in LANG_ORDER) + ")"
    first_match = " ".join(
        f"WHEN h_{lang} = {gmax} THEN '{lang}'" for lang in LANG_ORDER
    )
    return f"""
    WITH scored AS (
        SELECT doc_id, lang,
               {hits}
        FROM documents
    )
    SELECT doc_id, lang,
           CASE WHEN {gmax} <= 0 THEN 'und' {first_match} END AS predicted_lang
    FROM scored
    """


@query("text_language_id", oracle=_lang_id_oracle(), tags=("text", "lang-id"))
def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language-ID (deterministic n-gram-style heuristic):
    argmax of per-language marker hits, first-in-order tie-break, 'und'
    when nothing matches. Pure expressions — no shuffle, linear scan."""
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", "lang", language_id(F.col("text")).alias("predicted_lang"))


_STOP_ARR = ", ".join(f"'{m}'" for m in ENGLISH_STOPWORDS)

_QUALITY_ORACLE = f"""
WITH feats AS (
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(len(str_split(text, ' ')) AS BIGINT) AS n_tokens,
           len(list_filter(str_split(text, ' '), t -> list_contains([{_STOP_ARR}], t))) AS stop_hits,
           CAST(length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g')) AS BIGINT) AS n_punct
    FROM documents
)
SELECT doc_id, n_chars, n_tokens,
       round((n_chars - (n_tokens - 1)) / CAST(n_tokens AS DOUBLE), 4) AS mean_token_len,
       round(stop_hits / CAST(n_tokens AS DOUBLE), 4) AS stopword_ratio,
       round(n_punct / CAST(n_chars AS DOUBLE), 4) AS punct_ratio,
       round(least(n_tokens / 100.0, 1.0) * 0.4
             + least(stop_hits / CAST(n_tokens AS DOUBLE) * 5.0, 1.0) * 0.4
             + (1.0 - least(n_punct / CAST(n_chars AS DOUBLE) * 10.0, 1.0)) * 0.2,
             4) AS quality_score
FROM feats
"""


@query("text_quality_scores", oracle=_QUALITY_ORACLE, tags=("text", "quality"))
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document quality features + composite score (length, stopword
    density, punctuation) — the standard cheap pre-filter before
    expensive LLM-pipeline stages."""
    d = load_table(spark, sf_dir, "documents")
    feats = quality_features(F.col("text"))
    return d.select("doc_id", *[feats[k].alias(k) for k in feats])


# Gopher-style rule thresholds (Rae et al. 2021, table A1 — adapted to
# this corpus's short synthetic docs). Shared by the Spark expressions
# and the generated oracle so both engines apply identical rules.
GOPHER_MIN_WORDS, GOPHER_MAX_WORDS = 5, 1000
GOPHER_MIN_MEAN_WLEN, GOPHER_MAX_MEAN_WLEN = 2.0, 12.0
GOPHER_MIN_ALPHA_FRAC = 0.8
GOPHER_MAX_TOP_WORD_RATIO = 0.2

_GOPHER_ORACLE = f"""
WITH w AS (
    SELECT doc_id, str_split(text, ' ') AS words,
           CAST(length(text) AS BIGINT) AS n_chars
    FROM documents
),
feats AS (
    SELECT doc_id,
           CAST(len(words) AS BIGINT) AS n_words,
           round((n_chars - (len(words) - 1)) / CAST(len(words) AS DOUBLE), 4)
               AS mean_word_len,
           round(len(list_filter(words, x -> regexp_matches(x, '[a-zA-Z]')))
                 / CAST(len(words) AS DOUBLE), 4) AS alpha_word_frac,
           round(list_max(list_transform(list_distinct(words),
                     u -> len(list_filter(words, x -> x = u))))
                 / CAST(len(words) AS DOUBLE), 4) AS top_word_ratio
    FROM w
)
SELECT doc_id, n_words, mean_word_len, alpha_word_frac, top_word_ratio,
       (n_words BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS})
       AND (mean_word_len BETWEEN {GOPHER_MIN_MEAN_WLEN} AND {GOPHER_MAX_MEAN_WLEN})
       AND alpha_word_frac >= {GOPHER_MIN_ALPHA_FRAC}
       AND top_word_ratio <= {GOPHER_MAX_TOP_WORD_RATIO} AS keep
FROM feats
"""


@query("text_gopher_filters", oracle=_GOPHER_ORACLE, tags=("text", "quality", "gopher"))
def text_gopher_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition/shape filters (word-count bounds, mean
    word length bounds, alphabetic-word fraction, top-word repetition
    ratio) → per-doc signals + keep verdict. All row-local expressions
    (the per-doc top-word count is O(distinct²) over ≤~10² tokens — CPU
    inside whole-stage codegen, never a shuffle), so the filter runs at
    scan speed at any corpus size."""
    d = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    staged = d.select(
        "doc_id",
        words.alias("words"),
        F.length("text").cast("long").alias("n_chars"),
    )
    n_words = F.size("words").cast("long")
    mean_wlen = F.round(
        (F.col("n_chars") - (n_words - 1)) / n_words.cast("double"), 4
    )
    alpha_frac = F.round(
        F.size(F.filter(F.col("words"), lambda x: x.rlike("[a-zA-Z]")))
        / n_words.cast("double"),
        4,
    )
    top_ratio = F.round(
        F.array_max(
            F.transform(
                F.array_distinct("words"),
                lambda u: F.size(F.filter(F.col("words"), lambda x: x == u)),
            )
        )
        / n_words.cast("double"),
        4,
    )
    feats = staged.select(
        "doc_id",
        n_words.alias("n_words"),
        mean_wlen.alias("mean_word_len"),
        alpha_frac.alias("alpha_word_frac"),
        top_ratio.alias("top_word_ratio"),
    )
    keep = (
        F.col("n_words").between(GOPHER_MIN_WORDS, GOPHER_MAX_WORDS)
        & F.col("mean_word_len").between(GOPHER_MIN_MEAN_WLEN, GOPHER_MAX_MEAN_WLEN)
        & (F.col("alpha_word_frac") >= GOPHER_MIN_ALPHA_FRAC)
        & (F.col("top_word_ratio") <= GOPHER_MAX_TOP_WORD_RATIO)
    )
    return feats.withColumn("keep", keep)


_TOKEN_COUNT_ORACLE = f"""
SELECT doc_id,
       CAST(len(str_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
       CAST(len(regexp_extract_all(text, '{TOKEN_REGEX}')) AS BIGINT) AS n_subword_tokens,
       CAST(ceil(length(text) / 4.0) AS BIGINT) AS n_bpe_estimate
FROM documents
"""


@query("text_token_counts", oracle=_TOKEN_COUNT_ORACLE, tags=("text", "tokens"))
def text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting three ways: whitespace, BPE-ish regex runs, and
    the chars/4 budget estimate."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(tokens(F.col("text"))).cast("long").alias("n_ws_tokens"),
        bpe_ish_token_count(F.col("text")).alias("n_subword_tokens"),
        F.ceil(F.length("text") / 4.0).cast("long").alias("n_bpe_estimate"),
    )


@query(
    "text_fingerprint",
    oracle=f"""
    SELECT doc_id, {sql_rolling_fingerprint('text')} AS fingerprint
    FROM documents
    """,
    tags=("text", "fingerprint"),
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-sensitive rolling-hash document fingerprint (mod-prime
    polynomial fold over portable token hashes) — byte-identical across
    engines, usable as a cheap exact-dup key."""
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", rolling_fingerprint(F.col("text")).alias("fingerprint"))


_NGRAM_DF_ORACLE = """
WITH toks AS (SELECT doc_id, str_split(text, ' ') AS t FROM documents),
sh AS (
    SELECT doc_id,
           unnest(list_distinct(
               list_transform(
                   CASE WHEN len(t) >= 3 THEN range(1, len(t) - 1) ELSE [] END,
                   i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
           )) AS shingle
    FROM toks
)
SELECT shingle, CAST(count(*) AS BIGINT) AS doc_freq
FROM sh
GROUP BY shingle
ORDER BY doc_freq DESC, shingle
LIMIT 20
"""


@query("text_ngram_doc_freq", oracle=_NGRAM_DF_ORACLE, tags=("text", "ngram"))
def text_ngram_doc_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 3-gram shingles by document frequency (the n-gram stats
    that feed dedup stop-lists). Distinct-per-doc explode → count —
    one shuffle on the shingle."""
    d = load_table(spark, sf_dir, "documents")
    toked = d.select("doc_id", tokens(F.col("text")).alias("toks"))
    sh = toked.select(
        "doc_id", F.explode(word_shingles(F.col("toks"), 3)).alias("shingle")
    )
    return (
        sh.groupBy("shingle")
        .agg(F.count("*").alias("doc_freq"))
        .orderBy(F.desc("doc_freq"), F.asc("shingle"))
        .limit(20)
    )


_TFIDF_ORACLE = """
WITH toked AS (SELECT doc_id, str_split(text, ' ') AS toks FROM documents),
n_docs AS (SELECT count(*) AS n FROM toked),
terms AS (
    SELECT doc_id, unnest(toks) AS term, len(toks) AS doc_len FROM toked
),
tf AS (
    SELECT doc_id, term, doc_len, count(*) AS occurrences
    FROM terms GROUP BY 1, 2, 3
),
df AS (SELECT term, count(*) AS doc_freq FROM tf GROUP BY term),
scored AS (
    SELECT tf.doc_id, tf.term,
           round((tf.occurrences / CAST(tf.doc_len AS DOUBLE))
                 * ln(n_docs.n / CAST(df.doc_freq AS DOUBLE)), 6) AS tfidf
    FROM tf JOIN df ON tf.term = df.term CROSS JOIN n_docs
    WHERE tf.doc_id < 50
)
SELECT doc_id, term, tfidf, CAST(rk AS INT) AS rk
FROM (
    SELECT *, row_number() OVER (
        PARTITION BY doc_id ORDER BY tfidf DESC, term
    ) AS rk FROM scored
)
WHERE rk <= 5
"""


@query("text_tfidf_top_terms", oracle=_TFIDF_ORACLE, tags=("text", "tfidf"))
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF top-5 terms per document (docs 0-49): term frequency ×
    ln(N/doc-frequency), ranked with term tie-break. Document
    frequencies aggregate over the FULL corpus (one shuffle on term);
    only the scored subset re-joins — at 100 TB the df table is tiny
    (vocabulary-sized) and broadcasts."""
    from pyspark.sql import Window as W

    d = load_table(spark, sf_dir, "documents")
    toked = d.select("doc_id", tokens(F.col("text")).alias("toks"))
    # N stays IN-PLAN as a broadcast one-row aggregate (the oracle's
    # n_docs CTE shape; same pattern as events_retention_tiers) — the
    # old driver-side toked.count() cost a second full corpus scan at
    # 100 TB before the main job (BACKLOG r6 #16)
    n_docs = d.agg(F.count("*").cast("double").alias("__n"))
    terms = toked.select(
        "doc_id", F.explode("toks").alias("term"), F.size("toks").alias("doc_len")
    )
    tf = terms.groupBy("doc_id", "term", "doc_len").agg(
        F.count("*").alias("occurrences")
    )
    df_tbl = tf.groupBy("term").agg(F.count("*").alias("doc_freq"))
    scored = (
        tf.filter(F.col("doc_id") < 50)
        .join(F.broadcast(df_tbl), "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            F.round(
                (F.col("occurrences") / F.col("doc_len"))
                * F.log(F.col("__n") / F.col("doc_freq")),
                6,
            ).alias("tfidf"),
        )
    )
    w = W.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("doc_id", "term", "tfidf", F.col("rk").cast("int").alias("rk"))
    )


@query(
    "text_train_val_split",
    oracle=f"""
    WITH tagged AS (
        SELECT doc_id,
               CASE WHEN {sql_portable_hash64("CAST(doc_id AS VARCHAR)", "split")} % 100 < 80
                    THEN 'train'
                    WHEN {sql_portable_hash64("CAST(doc_id AS VARCHAR)", "split")} % 100 < 90
                    THEN 'val'
                    ELSE 'test' END AS split,
               n_chars
        FROM documents
    )
    SELECT split,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM tagged
    GROUP BY split
    """,
    tags=("text", "sampling", "split"),
)
def text_train_val_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split by portable hash of
    the document id — the canonical leakage-safe dataset split: stable
    across runs, engines, and repartitioning (never ``rand()``, which
    reshuffles membership on every execution)."""
    from ..functions.text import portable_hash64

    d = load_table(spark, sf_dir, "documents")
    bucket = portable_hash64(F.col("doc_id").cast("string"), "split") % 100
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    return d.groupBy(split.alias("split")).agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )


@query(
    "text_chunking",
    oracle="""
    WITH toked AS (
        SELECT doc_id, str_split(text, ' ') AS toks FROM documents WHERE doc_id < 100
    ),
    chunks AS (
        SELECT doc_id,
               CAST(i AS INT) AS chunk_idx,
               array_to_string(toks[i * 40 + 1 : i * 40 + 50], ' ') AS chunk
        FROM toked, unnest(range(0, CAST(ceil(len(toks) / 40.0) AS BIGINT))) AS t(i)
    )
    SELECT doc_id, chunk_idx, chunk,
           CAST(len(str_split(chunk, ' ')) AS BIGINT) AS chunk_tokens
    FROM chunks
    """,
    tags=("text", "chunking"),
)
def text_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document chunking for training windows: 50-token chunks at a
    40-token stride (10-token overlap), exploded one row per chunk —
    context-window packing's first stage. Row-local: tokenize once,
    slice per chunk index; downstream work parallelizes over chunks."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    toked = d.select("doc_id", tokens(F.col("text")).alias("toks"))
    n_chunks = F.ceil(F.size("toks") / 40.0).cast("long")
    with_idx = toked.select(
        "doc_id",
        "toks",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
    )
    chunk = F.concat_ws(" ", F.slice(F.col("toks"), F.col("chunk_idx") * 40 + 1, 50))
    return with_idx.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        chunk.alias("chunk"),
        F.size(F.split(chunk, " ")).cast("long").alias("chunk_tokens"),
    )


@query(
    "text_normalize",
    oracle="""
    SELECT doc_id,
           trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                               ' +', ' ', 'g')) AS normalized,
           CAST(length(text) - length(
               trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                                   ' +', ' ', 'g'))) AS BIGINT) AS chars_removed
    FROM documents
    WHERE doc_id < 100
    """,
    tags=("text", "normalize"),
)
def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text normalization (lowercase → strip non-alphanumerics →
    collapse runs of spaces → trim): the standard canonicalization
    before exact/fuzzy dedup. Pure regexp expressions."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    normalized = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", ""), " +", " "
        )
    )
    return d.select(
        "doc_id",
        normalized.alias("normalized"),
        (F.length("text") - F.length(normalized)).cast("long").alias("chars_removed"),
    )


@query(
    "text_context_packing",
    oracle="""
    WITH sized AS (
        SELECT doc_id, CAST(ceil(length(text) / 4.0) AS BIGINT) AS n_tokens
        FROM documents
    ),
    packed AS (
        SELECT doc_id, n_tokens,
               CAST(floor((sum(n_tokens) OVER (ORDER BY doc_id
                         ROWS UNBOUNDED PRECEDING) - n_tokens) / 2048)
                    AS BIGINT) AS pack_id
        FROM sized
    )
    SELECT pack_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS pack_tokens,
           CAST(min(doc_id) AS BIGINT) AS first_doc,
           CAST(max(doc_id) AS BIGINT) AS last_doc
    FROM packed
    GROUP BY pack_id
    """,
    tags=("text", "packing"),
)
def text_context_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window packing: documents assigned to 2048-token packs by
    running token budget in doc_id order (next-fit packing — the
    streaming-friendly approximation of bin packing). This catalog query
    uses the GLOBAL-order form (deterministic → oracle-checkable); the
    production path is ``operators.packing.pack_contexts(
    partition_local=True)`` — per-partition running sums keyed
    ``(partition_id, local_pack)``, no global order materialized
    (tests/test_llm_ops.py pins its packing guarantee)."""
    from ..operators.packing import pack_contexts, pack_summary

    d = load_table(spark, sf_dir, "documents")
    sized = d.select(
        "doc_id", F.ceil(F.length("text") / 4.0).cast("long").alias("n_tokens")
    )
    return pack_summary(pack_contexts(sized, partition_local=False))


@query(
    "text_stratified_sample",
    oracle=f"""
    WITH sampled AS (
        SELECT lang,
               CASE WHEN lang = 'en'
                    THEN {sql_portable_hash64("CAST(doc_id AS VARCHAR)", "strat")} % 100 < 50
                    ELSE {sql_portable_hash64("CAST(doc_id AS VARCHAR)", "strat")} % 100 < 10
               END AS keep
        FROM documents
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_total,
           CAST(count(CASE WHEN keep THEN 1 END) AS BIGINT) AS n_sampled
    FROM sampled
    GROUP BY lang
    """,
    tags=("text", "sampling", "stratified"),
)
def text_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling with per-stratum rates (50% of 'en', 10% of
    everything else) by deterministic hash-bucket membership — the
    language-rebalancing step of corpus curation, reproducible across
    runs and engines (unlike ``df.sample``, which is seed+partition
    dependent)."""
    from ..functions.text import portable_hash64

    d = load_table(spark, sf_dir, "documents")
    bucket = portable_hash64(F.col("doc_id").cast("string"), "strat") % 100
    keep = F.when(F.col("lang") == "en", bucket < 50).otherwise(bucket < 10)
    return d.groupBy("lang").agg(
        F.count("*").alias("n_total"),
        F.count(F.when(keep, 1)).alias("n_sampled"),
    )


DOMAIN_CAP = 20


@query(
    "text_domain_caps",
    oracle=f"""
    SELECT doc_id, source,
           CAST(rank_in_source AS INT) AS rank_in_source,
           rank_in_source <= {DOMAIN_CAP} AS kept
    FROM (
        SELECT doc_id, source,
               row_number() OVER (
                   PARTITION BY source ORDER BY n_chars DESC, doc_id
               ) AS rank_in_source
        FROM documents
    )
    """,
    tags=("text", "curation", "domain-cap"),
)
def text_domain_caps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain document caps (domain balancing, the C4/RefinedWeb
    "no domain dominates" rule): rank each source's documents by a
    deterministic quality proxy (length desc, doc_id tie-break) and keep
    the top ``DOMAIN_CAP``.

    Scale note: the per-domain ``row_number`` sorts each domain on one
    reducer — fine while the largest domain fits a partition (AQE skew
    split does not apply inside window sort). For a common-crawl-scale
    hot domain, pre-prune with a per-partition partial top-cap
    (``sortWithinPartitions`` + local rank) before the global window so
    the skewed reducer sees ≤ cap·partitions rows, not the whole
    domain."""
    from pyspark.sql import Window as W

    d = load_table(spark, sf_dir, "documents")
    w = W.partitionBy("source").orderBy(F.desc("n_chars"), "doc_id")
    return d.select(
        "doc_id",
        "source",
        F.row_number().over(w).cast("int").alias("rank_in_source"),
    ).withColumn("kept", F.col("rank_in_source") <= DOMAIN_CAP)


@query(
    "text_bpe_pair_merges",
    oracle="""
    WITH words AS (
        SELECT unnest(str_split(text, ' ')) AS w FROM documents
    ),
    pairs AS (
        SELECT unnest(list_transform(range(1, len(w)), i -> substr(w, i, 2))) AS pair
        FROM words WHERE len(w) >= 2
    ),
    counted AS (
        SELECT pair, CAST(count(*) AS BIGINT) AS n FROM pairs GROUP BY pair
    )
    SELECT pair, n FROM counted
    ORDER BY n DESC, pair
    LIMIT 20
    """,
    tags=("text", "tokenizer", "bpe"),
)
def text_bpe_pair_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First round of BPE tokenizer training: global adjacent-character
    pair frequencies over all words, top-20 merge candidates
    (count DESC, pair ASC — fully deterministic). The iterative trainer
    repeats this count→merge cycle; one round exercises the whole
    distributed shape: explode words → explode in-word pairs (narrow) →
    ONE hash aggregation (map-side combinable: partial counts collapse
    to |distinct pairs| per partition, tiny) → global top-k via
    TakeOrderedAndProject (no full sort). At 100 TB the shuffle carries
    only the distinct-pair partial counts, never the corpus.
    """
    d = load_table(spark, sf_dir, "documents")
    words = d.select(F.explode(tokens(F.col("text"))).alias("w")).filter(
        F.length("w") >= 2
    )
    pairs = words.select(
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substr(w, i, 2))")
        ).alias("pair")
    )
    counted = pairs.groupBy("pair").agg(F.count("*").alias("n"))
    return counted.orderBy(F.desc("n"), F.asc("pair")).limit(20)


# --- linear quality-model inference ------------------------------------------

# Inlined "trained" model: integer weights over exact integer features.
# A production pipeline loads these from a model artifact; the inference
# SHAPE is the point — a pure per-row codegen projection, no shuffle, no
# Python, so scoring 100 TB costs one scan at I/O speed.
INFER_W_STOP = 5
INFER_W_DISTINCT = 2
INFER_W_TOKENS = 1
INFER_W_CHARS_DIV10 = -1
INFER_THRESHOLD = 60

_MODEL_INFERENCE_ORACLE = f"""
WITH f AS (
    SELECT doc_id,
           CAST(len(str_split(text, ' ')) AS BIGINT) AS n_tokens,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(len(list_filter(str_split(text, ' '),
                t -> list_contains([{_STOP_ARR}], t))) AS BIGINT) AS stop_hits,
           CAST(len(list_distinct(str_split(text, ' '))) AS BIGINT) AS n_distinct
    FROM documents
)
SELECT doc_id, n_tokens, stop_hits, n_distinct,
       CAST({INFER_W_STOP} * stop_hits + {INFER_W_DISTINCT} * n_distinct
            + {INFER_W_TOKENS} * n_tokens
            + {INFER_W_CHARS_DIV10} * (n_chars // 10) AS BIGINT) AS score,
       ({INFER_W_STOP} * stop_hits + {INFER_W_DISTINCT} * n_distinct
            + {INFER_W_TOKENS} * n_tokens
            + {INFER_W_CHARS_DIV10} * (n_chars // 10)) >= {INFER_THRESHOLD} AS keep
FROM f
"""


def score_documents(d: DataFrame) -> DataFrame:
    """The inference projection itself, shared by the batch and
    streaming twins (their equality contract is THIS single
    definition): integer features → inlined-weight score → verdict."""
    from ..functions.text import marker_hits

    toks = tokens(F.col("text"))
    f = d.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars"),
        marker_hits(toks, ENGLISH_STOPWORDS).cast("long").alias("stop_hits"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
    )
    score = (
        INFER_W_STOP * F.col("stop_hits")
        + INFER_W_DISTINCT * F.col("n_distinct")
        + INFER_W_TOKENS * F.col("n_tokens")
        + INFER_W_CHARS_DIV10 * F.floor(F.col("n_chars") / 10).cast("long")
    ).cast("long")
    return f.select(
        "doc_id",
        "n_tokens",
        "stop_hits",
        "n_distinct",
        score.alias("score"),
        (score >= INFER_THRESHOLD).alias("keep"),
    )


@query(
    "text_model_inference",
    oracle=_MODEL_INFERENCE_ORACLE,
    tags=("text", "inference", "llm"),
)
def text_model_inference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear quality-classifier INFERENCE as a scan-side projection:
    integer feature vector (token count, char count, stopword hits,
    distinct-token count) dotted with inlined integer weights, verdict
    at a fixed threshold — the fastText-style quality-filter scoring
    pass of a pretraining pipeline (classifier itself trained offline;
    only inference runs at corpus scale).

    100 TB shape: zero shuffle, zero Python — the entire model is
    literals inside one whole-stage-codegen projection, so throughput
    is parquet-scan-bound. Exact integer arithmetic end-to-end (weights,
    features, and the `div 10` char term are all integers), so the
    oracle hash-matches bit-for-bit."""
    return score_documents(load_table(spark, sf_dir, "documents"))


_LENGTH_BUCKETING_ORACLE = """
WITH f AS (
    SELECT doc_id,
           CAST(len(str_split(text, ' ')) AS BIGINT) AS n_tokens,
           CAST(pow(2, ceil(log2(len(str_split(text, ' '))))) AS BIGINT) AS bucket
    FROM documents
)
SELECT bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS real_tokens,
       CAST(count(*) * bucket AS BIGINT) AS padded_tokens,
       CAST(count(*) * bucket - sum(n_tokens) AS BIGINT) AS wasted_tokens
FROM f
GROUP BY bucket
"""


@query(
    "text_length_bucketing",
    oracle=_LENGTH_BUCKETING_ORACLE,
    tags=("text", "batching", "llm"),
)
def text_length_bucketing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batching accounting: docs assigned to
    power-of-two token-length buckets (the standard padding-efficiency
    move — batching a 10-token doc with a 500-token doc pads 49× the
    useful tokens), with per-bucket real/padded/wasted token totals —
    the report that decides bucket boundaries before a training run.
    Pure projection + one aggregate; exact integers (`log2`/`ceil`/
    `pow` on integer token counts are IEEE-exact well past any
    document length, and both engines compute the identical bucket)."""
    d = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(tokens(F.col("text"))).cast("long")
    bucket = F.pow(
        F.lit(2.0), F.ceil(F.log2(n_tokens.cast("double")))
    ).cast("long")
    f = d.select(n_tokens.alias("n_tokens"), bucket.alias("bucket"))
    return f.groupBy("bucket").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("real_tokens"),
        (F.count("*") * F.col("bucket")).alias("padded_tokens"),
        (F.count("*") * F.col("bucket") - F.sum("n_tokens")).alias("wasted_tokens"),
    )
