"""Training-data curation operators (driver-mandated LLM-pipeline
surface, BASELINE.json:6): benchmark decontamination, duplicated-span
measurement, corpus-statistics quality scoring, PII redaction, and
weighted dataset mixing.

All hot paths are pure Catalyst expressions + hash-keyed shuffles:

- decontamination joins the corpus against a BROADCAST benchmark
  n-gram set (test sets are tiny next to a 100 TB corpus — the
  broadcast is the whole design);
- duplicated-span and rarity scoring are two-pass: one shuffle to build
  corpus statistics keyed by an 8-byte hash, one co-partitioned join
  back — the same inverted-index shape as ``operators/dedup.py``;
- PII redaction and mixing are per-row expressions (shuffle-free).

Ratios are integer permille with half-up rounding so both engines agree
bit-for-bit (see ``plans/catalog.py`` parity rules).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import portable_hash64, tokens, word_shingles

DECON_NGRAM = 3  # real pipelines use 8-13-gram; the synthetic corpus
#                  averages ~50 tokens/doc, so 3 keeps the fixture live
DUPSPAN_NGRAM = 3
RARE_MAX_CORPUS_COUNT = 3  # token is "rare" if it appears <= 3 times corpus-wide

# PII patterns restricted to syntax Java regex (Spark) and RE2 (DuckDB)
# parse identically: character classes, bounded repeats, no backrefs.
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_PATTERN = r"\+[0-9]{1,3}-[0-9]{3}-[0-9]{3,4}"
EMAIL_TOKEN = "<EMAIL>"
PHONE_TOKEN = "<PHONE>"


def _permille(num, den) -> F.Column:
    """Integer permille with half-up rounding. The floor-of-double is
    exact here: numerators are bounded by 2000×tokens-per-doc ≪ 2^53,
    so it equals DuckDB's int64 ``//`` bit-for-bit."""
    return F.floor((F.lit(1000) * num * 2 + den) / (den * 2)).cast("long")


def sql_permille(num: str, den: str) -> str:
    return f"CAST((1000 * {num} * 2 + {den}) // ({den} * 2) AS BIGINT)"


def _doc_shingle_hashes(df: DataFrame, n: int, seed: str, id_col: str = "doc_id") -> DataFrame:
    """(id, shingle_hash) — distinct word n-grams per doc, hashed to
    8-byte keys so downstream shuffles move longs, not strings."""
    toked = df.select(id_col, tokens(F.col("text")).alias("toks"))
    return toked.select(
        id_col,
        F.explode(word_shingles(F.col("toks"), n)).alias("shingle"),
    ).select(id_col, portable_hash64(F.col("shingle"), seed).alias("h"))


def decontaminate_overlap(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = DECON_NGRAM,
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination: per corpus doc, how many of its
    distinct word n-grams also occur in the benchmark set.

    Output: (doc_id, n_shared_ngrams) for contaminated docs only — the
    drop-list a training pipeline feeds back into its reader.

    Scale: the benchmark side is collapsed to DISTINCT n-gram hashes and
    broadcast (test suites are MBs against a 100 TB corpus), so the
    corpus is never shuffled — one scan, map-side hash-join, one
    partial-aggregated groupBy on doc_id."""
    corpus_h = _doc_shingle_hashes(corpus, n, "decon", id_col)
    bench_h = _doc_shingle_hashes(benchmark, n, "decon", id_col).select("h").distinct()
    return (
        corpus_h.join(F.broadcast(bench_h), "h")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_shared_ngrams"))
    )


def duplicated_span_stats(
    df: DataFrame, n: int = DUPSPAN_NGRAM, id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc duplicated-span measurement (the exact-substring dedup
    signal): the fraction of a doc's distinct word n-grams that occur in
    at least one OTHER doc.

    Two hash-keyed shuffles: n-gram document frequency, then a
    co-partitioned join back onto each doc's n-grams — the same
    inverted-index shape as the Jaccard dedup path, so hot n-grams are
    the only skew risk (bounded by the stop-list argument there).

    Output: (doc_id, n_ngrams, n_dup_ngrams, dup_permille)."""
    sh = _doc_shingle_hashes(df, n, "spans", id_col)
    dfreq = sh.groupBy("h").agg(F.count("*").alias("df"))
    return (
        sh.join(dfreq, "h")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_ngrams"),
            F.sum(F.when(F.col("df") >= 2, 1).otherwise(0)).alias("n_dup_ngrams"),
        )
        .select(
            id_col,
            "n_ngrams",
            "n_dup_ngrams",
            _permille(F.col("n_dup_ngrams"), F.col("n_ngrams")).alias("dup_permille"),
        )
    )


def rarity_scores(
    df: DataFrame,
    max_corpus_count: int = RARE_MAX_CORPUS_COUNT,
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-statistics quality score: per doc, the share of token
    OCCURRENCES whose corpus-wide frequency is <= ``max_corpus_count``
    (a rare/misspelled-token ratio — the integer-exact stand-in for a
    unigram-LM perplexity filter, which needs float ``ln``s two engines
    won't agree on bit-for-bit).

    One shuffle builds the (hashed) unigram table, a second
    co-partitioned join scores occurrences; both move 8-byte keys.

    Output: (doc_id, n_tokens, n_rare, rare_permille)."""
    occ = df.select(
        id_col, F.explode(tokens(F.col("text"))).alias("tok")
    ).select(id_col, portable_hash64(F.col("tok"), "rare").alias("h"))
    counts = occ.groupBy("h").agg(F.count("*").alias("c"))
    return (
        occ.join(counts, "h")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(F.when(F.col("c") <= max_corpus_count, 1).otherwise(0)).alias(
                "n_rare"
            ),
        )
        .select(
            id_col,
            "n_tokens",
            "n_rare",
            _permille(F.col("n_rare"), F.col("n_tokens")).alias("rare_permille"),
        )
    )


def redact_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Regex PII redaction (emails, then phone numbers) with per-doc
    redaction counts. Pure per-row expressions — shuffle-free, scales
    linearly. Patterns are the Java/RE2 common subset, so the DuckDB
    oracle applies the IDENTICAL automaton.

    Adds: n_emails, n_phones, redacted (text with ``<EMAIL>`` /
    ``<PHONE>`` substituted)."""
    redacted = F.regexp_replace(
        F.regexp_replace(F.col(text_col), EMAIL_PATTERN, EMAIL_TOKEN),
        PHONE_PATTERN,
        PHONE_TOKEN,
    )
    return df.withColumns(
        {
            "n_emails": F.regexp_count(F.col(text_col), F.lit(EMAIL_PATTERN)),
            "n_phones": F.regexp_count(F.col(text_col), F.lit(PHONE_PATTERN)),
            "redacted": redacted,
        }
    )


def weighted_mix(
    df: DataFrame,
    weight_col: F.Column,
    id_col: str = "doc_id",
) -> DataFrame:
    """Weighted dataset mixing (temperature-style source re-weighting):
    replicate each row ``floor(w)`` times plus one more for a
    deterministic ``frac(w)`` share of rows — hash-bucket membership on
    the row id, never ``rand()``, so every engine/retry agrees.

    ``weight_col`` is an expression in HUNDREDTHS of an epoch (int:
    150 = 1.5 epochs) to stay in integer arithmetic. Emits one row per
    kept copy with ``copy_idx`` (0-based) — the exploded layout a
    sequence-packing stage consumes directly. Per-row explode,
    shuffle-free."""
    w = weight_col.cast("long")
    base = (w / 100).cast("long")
    frac = w - base * 100  # hundredths
    extra = (
        portable_hash64(F.col(id_col).cast("string"), "mix") % 100 < frac
    ).cast("long")
    n_copies = (base + extra).alias("n_copies")
    return (
        df.withColumn("n_copies", n_copies)
        .filter(F.col("n_copies") > 0)
        .select(
            "*",
            F.explode(F.sequence(F.lit(0), F.col("n_copies") - 1)).alias("copy_idx"),
        )
        .drop("n_copies")
    )
