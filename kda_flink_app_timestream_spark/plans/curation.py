"""Training-data curation queries (LLM-pipeline surface): benchmark
decontamination, duplicated-span stats, rarity scoring, PII redaction,
weighted dataset mixing. Oracle SQL is generated from the same
constants (n-gram width, hash seeds, regex patterns, weight formula)
so both engines express the identical computation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import sql_portable_hash64
from ..operators.curation import (
    DECON_NGRAM,
    DUPSPAN_NGRAM,
    EMAIL_PATTERN,
    EMAIL_TOKEN,
    PHONE_PATTERN,
    PHONE_TOKEN,
    RARE_MAX_CORPUS_COUNT,
    curate_corpus,
    decontaminate_overlap,
    duplicated_span_stats,
    rarity_scores,
    redact_pii,
    sql_permille,
    weighted_mix,
)
from ..sources.batch import load_table
from .catalog import query

# deterministic benchmark membership: ~1% of docs stand in for the
# held-out eval set a real pipeline decontaminates against
BENCH_MOD = 97


def _sql_shingles(seed: str, n: int) -> str:
    """DuckDB CTE body producing (doc_id, h): distinct word n-gram
    hashes per doc — the twin of ``operators.curation._doc_shingle_hashes``."""
    concat = " || ' ' || ".join(f"t[i+{k}]" for k in range(n))
    return f"""
    SELECT doc_id,
           unnest(list_transform(
               list_distinct(list_transform(
                   CASE WHEN len(t) >= {n} THEN range(1, len(t) - {n - 2}) ELSE [] END,
                   i -> {concat})),
               x -> {sql_portable_hash64('x', seed)})) AS h
    FROM (SELECT doc_id, str_split(text, ' ') AS t FROM documents)
    """


_DECON_ORACLE = f"""
WITH sh AS ({_sql_shingles('decon', DECON_NGRAM)}),
bench AS (SELECT DISTINCT h FROM sh WHERE doc_id % {BENCH_MOD} = 0),
train AS (SELECT doc_id, h FROM sh WHERE doc_id % {BENCH_MOD} <> 0)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shared_ngrams
FROM train JOIN bench USING (h)
GROUP BY doc_id
"""


@query("text_decontaminate_overlap", oracle=_DECON_ORACLE, tags=("text", "curation", "decontamination"))
def text_decontaminate_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: training docs sharing at least one
    word n-gram with the (deterministic ~1%) benchmark subset, with the
    count of shared n-grams — the drop-list fed back into the reader.
    The benchmark n-gram set is broadcast; the corpus never shuffles."""
    d = load_table(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % BENCH_MOD == 0)
    train = d.filter(F.col("doc_id") % BENCH_MOD != 0)
    return decontaminate_overlap(train, bench, n=DECON_NGRAM)


_DUPSPAN_ORACLE = f"""
WITH sh AS ({_sql_shingles('spans', DUPSPAN_NGRAM)}),
dfreq AS (SELECT h, count(*) AS df FROM sh GROUP BY h)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_ngrams,
       CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_ngrams,
       {sql_permille('sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END)', 'count(*)')} AS dup_permille
FROM sh JOIN dfreq USING (h)
GROUP BY doc_id
"""


@query("text_duplicate_spans", oracle=_DUPSPAN_ORACLE, tags=("text", "curation", "dedup"))
def text_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicated-span measurement (exact-substring dedup signal): per
    doc, the permille of its distinct word n-grams occurring in >= 2
    docs. Two hash-keyed shuffles (n-gram doc-frequency, join-back)."""
    d = load_table(spark, sf_dir, "documents")
    return duplicated_span_stats(d, n=DUPSPAN_NGRAM)


_RARITY_ORACLE = f"""
WITH occ AS (
    SELECT doc_id,
           {sql_portable_hash64('unnest(str_split(text, chr(32)))', 'rare')} AS h
    FROM documents
),
counts AS (SELECT h, count(*) AS c FROM occ GROUP BY h)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(CASE WHEN c <= {RARE_MAX_CORPUS_COUNT} THEN 1 ELSE 0 END) AS BIGINT) AS n_rare,
       {sql_permille(f'sum(CASE WHEN c <= {RARE_MAX_CORPUS_COUNT} THEN 1 ELSE 0 END)', 'count(*)')} AS rare_permille
FROM occ JOIN counts USING (h)
GROUP BY doc_id
"""


@query("text_rarity_score", oracle=_RARITY_ORACLE, tags=("text", "curation", "quality"))
def text_rarity_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-statistics quality score: share of token occurrences whose
    corpus-wide frequency is <= {RARE_MAX_CORPUS_COUNT} — the
    integer-exact stand-in for a unigram-LM perplexity filter."""
    d = load_table(spark, sf_dir, "documents")
    return rarity_scores(d, max_corpus_count=RARE_MAX_CORPUS_COUNT)


# Synthetic-but-deterministic PII: the corpus carries none, so both
# engines append the same contact line derived from doc_id, then redact
# it back out. The regexes are the Java/RE2 common subset.
_PII_SUFFIX_SQL = (
    "' Contact user' || CAST(doc_id AS VARCHAR) || '@example.com or +1-555-' || "
    "lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' now.'"
)

_PII_ORACLE = f"""
WITH aug AS (SELECT doc_id, text || {_PII_SUFFIX_SQL} AS t FROM documents)
SELECT doc_id,
       CAST(len(regexp_extract_all(t, '{EMAIL_PATTERN}')) AS INT) AS n_emails,
       CAST(len(regexp_extract_all(t, '{PHONE_PATTERN}')) AS INT) AS n_phones,
       md5(regexp_replace(regexp_replace(t, '{EMAIL_PATTERN}', '{EMAIL_TOKEN}', 'g'),
                          '{PHONE_PATTERN}', '{PHONE_TOKEN}', 'g')) AS redacted_md5
FROM aug
"""


@query("text_pii_redaction", oracle=_PII_ORACLE, tags=("text", "curation", "pii"))
def text_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction: email + phone regexes replaced with typed tokens,
    per-doc match counts, md5 of the redacted text (byte-parity proof).
    Pure per-row expressions — shuffle-free at any scale."""
    d = load_table(spark, sf_dir, "documents")
    aug = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" Contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or +1-555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.lit(" now."),
        ).alias("text"),
    )
    red = redact_pii(aug)
    return red.select(
        "doc_id",
        "n_emails",
        "n_phones",
        F.md5(F.col("redacted")).alias("redacted_md5"),
    )


# weight in hundredths of an epoch, derived from the source number:
# src0 -> 1.00x, src1 -> 1.50x, src2 -> 2.00x, src3 -> 2.50x, src4 -> 1.00x ...
_WEIGHT_SQL = "100 + (CAST(substr(source, 4, 10) AS INT) % 4) * 50"

_MIX_ORACLE = f"""
WITH w AS (
    SELECT doc_id, source, {_WEIGHT_SQL} AS wc FROM documents
),
c AS (
    SELECT doc_id, source, wc,
           wc // 100 + CASE WHEN {sql_portable_hash64('CAST(doc_id AS VARCHAR)', 'mix')} % 100
                                 < wc - (wc // 100) * 100
                            THEN 1 ELSE 0 END AS n
    FROM w
)
SELECT doc_id, source, CAST(wc AS BIGINT) AS weight_centi,
       CAST(unnest(range(0, n)) AS BIGINT) AS copy_idx
FROM c
WHERE n > 0
"""


@query("text_dataset_mixing", oracle=_MIX_ORACLE, tags=("text", "curation", "mixing"))
def text_dataset_mixing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted dataset mixing: per-source epoch weights (1.0-2.5x,
    derived deterministically from the source id), integer copies via
    floor(w) plus a hash-bucket share for the fractional part — never
    rand(), so replays and oracles agree. One row per kept copy."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        (
            F.lit(100)
            + (F.substring("source", 4, 10).cast("int") % 4) * 50
        ).cast("long").alias("weight_centi"),
    )
    mixed = weighted_mix(d, F.col("weight_centi"), id_col="doc_id")
    return mixed.select("doc_id", "source", "weight_centi", "copy_idx")


# -- end-to-end curation (registered r12; oracle verified as a staged
#    draft in r11 — tests/test_llm_ops.py kept the same builder pinned) --

CURATE_MIN_QUALITY = 0.5
CURATE_NEAR_DUP_THRESHOLD = 0.5


def curate_oracle(num_hashes: int | None = None, num_bands: int | None = None) -> str:
    """DuckDB oracle for ``curate_corpus`` — composes the existing
    verified twins: the langid CASE + quality formula (plans/text.py
    constants), the minhash sig CTE chain (plans/dedup.py, re-rooted
    from ``documents`` onto the gated exact survivors), and the
    recursive-CTE component closure (plans/dedup.py)."""
    from ..functions.text import (
        ENGLISH_STOPWORDS,
        LANG_MARKERS,
        LANG_ORDER,
        TOKEN_REGEX,
    )
    from ..operators.dedup import NUM_BANDS, NUM_MINHASHES
    from .dedup import minhash_sig_ctes

    if num_hashes is None:
        num_hashes = NUM_MINHASHES
    if num_bands is None:
        num_bands = NUM_BANDS

    def hits_sql(markers):
        arr = ", ".join(f"'{m}'" for m in markers)
        return (
            "len(list_filter(str_split(text, ' '), "
            f"t -> list_contains([{arr}], t)))"
        )

    hits = ",\n           ".join(
        f"{hits_sql(LANG_MARKERS[lang])} AS h_{lang}" for lang in LANG_ORDER
    )
    gmax = "greatest(" + ", ".join(f"h_{lang}" for lang in LANG_ORDER) + ")"
    first = " ".join(f"WHEN h_{lang} = {gmax} THEN '{lang}'" for lang in LANG_ORDER)
    stop_arr = ", ".join(f"'{m}'" for m in ENGLISH_STOPWORDS)

    sig = minhash_sig_ctes(num_hashes, num_bands).replace(
        "FROM documents", "FROM survivors0", 1
    )
    assert "FROM documents" not in sig, "sig chain must read the survivors"
    matches = " + ".join(
        f"CASE WHEN sa.sig[{i + 1}] = sb.sig[{i + 1}] THEN 1 ELSE 0 END"
        for i in range(num_hashes)
    )
    return f"""
WITH RECURSIVE scored AS (
    SELECT doc_id, text,
           {hits},
           CAST(len(str_split(text, ' ')) AS BIGINT) AS n_tokens,
           len(list_filter(str_split(text, ' '), t -> list_contains([{stop_arr}], t))) AS stop_hits,
           CAST(length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g')) AS BIGINT) AS n_punct,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(len(regexp_extract_all(text, '{TOKEN_REGEX}')) AS BIGINT) AS bpe_tokens
    FROM documents
),
scored2 AS (
    SELECT doc_id, text, n_tokens, bpe_tokens,
           CASE WHEN {gmax} <= 0 THEN 'und' {first} END AS lang,
           round(least(n_tokens / 100.0, 1.0) * 0.4
                 + least(stop_hits / CAST(n_tokens AS DOUBLE) * 5.0, 1.0) * 0.4
                 + (1.0 - least(n_punct / CAST(n_chars AS DOUBLE) * 10.0, 1.0)) * 0.2,
                 4) AS quality_score
    FROM scored
),
gated AS (SELECT * FROM scored2 WHERE lang = 'en' AND quality_score >= {CURATE_MIN_QUALITY}),
survivors0 AS (
    SELECT doc_id, text, lang, n_tokens, bpe_tokens, quality_score FROM (
        SELECT *, row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
        FROM gated) WHERE rn = 1
),
{sig},
cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b2.doc_id AS doc_b
    FROM bands a
    JOIN bands b2 ON a.band_idx = b2.band_idx
                 AND a.band_key = b2.band_key
                 AND a.doc_id < b2.doc_id
),
prs AS (
    SELECT doc_a, doc_b FROM cand
    JOIN sig sa ON cand.doc_a = sa.doc_id
    JOIN sig sb ON cand.doc_b = sb.doc_id
    WHERE round(({matches}) / {float(num_hashes)}, 4) >= {CURATE_NEAR_DUP_THRESHOLD}
),
und(a, b) AS (SELECT doc_a, doc_b FROM prs UNION SELECT doc_b, doc_a FROM prs),
reach(a, b) AS (
    SELECT a, b FROM und
  UNION
    SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a
),
losers AS (
    SELECT a AS doc_id FROM (
        SELECT a, least(a, min(b)) AS rep FROM reach GROUP BY a
    ) WHERE a > rep
)
SELECT doc_id, lang, n_tokens, bpe_tokens, quality_score
FROM survivors0
WHERE doc_id NOT IN (SELECT doc_id FROM losers)
"""


@query(
    "curate_corpus",
    oracle=curate_oracle(),
    tags=("text", "curation", "pipeline", "dedup"),
)
def curate_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end curation pipeline a pretraining corpus actually
    runs (the text-side twin of the composed retrieval query): language
    gate → quality gate → exact collapse (min id per text, map-side-
    combinable groupBy) → MinHash+LSH near-dup prune (connected-
    components cluster representative survives) → survivors with
    (lang, n_tokens, bpe_tokens, quality_score). Every stage is a
    verified catalog citizen; this query pins the composition wiring.
    Scale shape in operators/curation.py:curate_corpus — gates are
    per-row on one corpus scan, the collapse shuffles partial-
    aggregated (fingerprint, text, min_id) rows, the near-dup stage is
    banded/bucketed over survivors only, components iterate O(log n)
    rounds on the duplicate-sized edge list."""
    d = load_table(spark, sf_dir, "documents")
    return curate_corpus(
        d,
        min_quality=CURATE_MIN_QUALITY,
        near_dup_threshold=CURATE_NEAR_DUP_THRESHOLD,
    )
