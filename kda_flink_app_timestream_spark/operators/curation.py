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


def curate_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang: str = "en",
    min_quality: float = 0.5,
    near_dup_threshold: float = 0.5,
    num_hashes: int | None = None,
    num_bands: int | None = None,
) -> DataFrame:
    """The end-to-end curation pipeline a pretraining corpus actually
    runs, composed from the already-verified stages (the text-side twin
    of the retrieval composition ``mmr_over_candidates``):

    1. **language gate** — keep docs whose ``language_id`` equals
       ``lang`` (functions/text.py marker-argmax);
    2. **quality gate** — keep docs with composite ``quality_score`` >=
       ``min_quality`` (length/stopword/punctuation mix);
    3. **exact dedup** — one doc per identical text, smallest id wins
       (hash-partitioned window over the text, the
       ``dedup_exact_summary`` collapse rule);
    4. **near-dup prune** — MinHash+LSH candidate pairs at
       ``near_dup_threshold`` → connected components (large-star/
       small-star) → only each cluster's representative (min id)
       survives;
    5. **emit** — survivors with ``(lang, n_tokens, bpe_tokens,
       quality_score)`` for downstream mixing/packing.

    Scale shape: gates are per-row expressions on the one corpus scan;
    the exact collapse is one hash shuffle of (text-hash-sized) keys;
    the near-dup stage is banded/bucketed (never all-pairs) over only
    the gate+collapse SURVIVORS; components iterate O(log n) rounds on
    the candidate-pair edge list, which is duplicate-sized, not
    corpus-sized. Nothing here widens with corpus size except the
    streams each verified stage already handles.
    """
    from ..functions.text import bpe_ish_token_count, language_id, quality_features
    from ..session import defer_release
    from .dedup import (
        NUM_BANDS,
        NUM_MINHASHES,
        connected_components,
        minhash_near_dup_pairs,
    )

    if num_hashes is None:
        num_hashes = NUM_MINHASHES
    if num_bands is None:
        num_bands = NUM_BANDS

    feats = quality_features(F.col(text_col))
    scored = docs.select(
        F.col(id_col),
        F.col(text_col),
        language_id(F.col(text_col)).alias("lang"),
        feats["n_tokens"].alias("n_tokens"),
        bpe_ish_token_count(F.col(text_col)).alias("bpe_tokens"),
        feats["quality_score"].alias("quality_score"),
    )
    gated = scored.filter(
        (F.col("lang") == lang) & (F.col("quality_score") >= min_quality)
    )
    # exact collapse: smallest id per identical text, as a groupBy (NOT
    # a row_number window — ADVICE r11): partial map-side aggregation
    # collapses a heavily duplicated text to one row PER MAP TASK
    # before the shuffle, so a million-copy doc never routes a million
    # full-text rows through one reducer. The 8-byte xxhash64
    # fingerprint leads the grouping key (dedup_exact_summary's
    # documented split); grouping ALSO by the text keeps equality exact
    # under hash collisions. The whole winner ROW comes out of the same
    # aggregate as min(struct) — id leads the struct, so this picks the
    # min-id row's payload (the other fields are text-derived, hence
    # identical across the group) — guaranteeing EXACTLY one survivor
    # per text even when ids are not unique in the input: the r12
    # id-keyed semi join kept every copy of a duplicated (id, text) row
    # and diverged from the oracle's row_number semantics (ADVICE r12).
    # min(struct) is map-side combinable like min(id), and the payload
    # adds four fixed-width columns to a shuffle row the text already
    # dominates; dropping the semi join also removes a join stage.
    exact = (
        gated.groupBy(
            F.xxhash64(F.col(text_col)).alias("__fp"), F.col(text_col)
        )
        .agg(
            F.min(
                F.struct(
                    id_col, "lang", "n_tokens", "bpe_tokens", "quality_score"
                )
            ).alias("__winner")
        )
        .select(F.col(text_col), F.col("__winner.*"))
        .cache()
    )
    defer_release(exact)  # feeds the near-dup stage AND the anti-join
    # docs under one shingle (< 3 tokens) have nothing to MinHash: they
    # pass through un-pruned, EXPLICITLY excluded from the signature
    # stage — the same >= 3-token precondition every registered minhash
    # query applies — rather than relying on null band keys never
    # joining (they can pass a stopword-heavy quality gate, so the
    # gate alone does not exclude them)
    from ..functions.text import tokens as _tokens

    pairs = minhash_near_dup_pairs(
        exact.select(F.col(id_col), F.col(text_col)).filter(
            F.size(_tokens(F.col(text_col))) >= 3
        ),
        id_col=id_col,
        text_col=text_col,
        threshold=near_dup_threshold,
        num_hashes=num_hashes,
        num_bands=num_bands,
    )
    comp = connected_components(pairs, src="doc_a", dst="doc_b")
    losers = comp.filter(F.col("node") != F.col("cluster_rep")).select(
        F.col("node").alias(id_col)
    )
    # no broadcast hint: the loser set is DUPLICATE-sized, not bounded
    # like a query batch — AQE broadcasts it at runtime when small and
    # falls back to a shuffled anti-join on a dup-heavy corpus
    return exact.join(losers, id_col, "left_anti").select(
        id_col, "lang", "n_tokens", "bpe_tokens", "quality_score"
    )
