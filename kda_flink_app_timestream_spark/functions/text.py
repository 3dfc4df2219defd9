"""Text-analysis expression library (driver-mandated LLM-pipeline
surface, BASELINE.json:6): tokenization, shingles, portable hashing,
language-ID, quality scoring, token counting, fingerprinting.

Everything is a pure Catalyst expression — whole-stage-codegen'd,
shuffle-free, linear per row — so these run unchanged over 100 TB of
documents. The only cross-engine subtlety is hashing: Spark's
xxhash64 and DuckDB's hash() disagree, so oracle-checkable operators use
``portable_hash64`` — the top 60 bits of md5, which both engines compute
identically (verified bit-for-bit).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# --- portable hashing -------------------------------------------------------

HASH_PRIME = 1_000_000_007  # fits intermediate products in int64


def portable_hash64(col: Column, seed: int | str = 0) -> Column:
    """60-bit hash both engines agree on: first 15 hex chars of
    md5(seed|value). DuckDB twin: ``sql_portable_hash64``."""
    tagged = F.concat(F.lit(f"{seed}|"), col)
    return F.conv(F.substring(F.md5(tagged), 1, 15), 16, 10).cast("long")


def sql_portable_hash64(expr: str, seed: int | str = 0) -> str:
    """DuckDB SQL rendering of ``portable_hash64`` (same bits)."""
    return f"CAST(concat('0x', substr(md5('{seed}|' || {expr}), 1, 15)) AS BIGINT)"


# --- tokenization -----------------------------------------------------------


def tokens(text: Column) -> Column:
    """Whitespace tokens (documents.text is single-space word soup)."""
    return F.split(text, " ")


def word_shingles(toks: Column, n: int = 3) -> Column:
    """Distinct n-word shingles. Guarded for <n tokens (empty array —
    NOT Spark's sequence(1,0) which counts backwards).

    PERF: pass a MATERIALIZED array column (project `tokens(text)` into
    its own column first), not the raw `tokens(text)` expression — the
    expression tree is substituted into every element access, so an
    unmaterialized split re-tokenizes the whole text per shingle
    position (O(n²) per document). `operators/dedup.py` shows the
    two-step projection pattern."""
    count = F.size(toks)
    idx = F.when(count >= n, F.sequence(F.lit(1), count - (n - 1))).otherwise(
        F.array().cast("array<int>")
    )
    joined = F.transform(
        idx,
        lambda i: F.concat_ws(" ", *[F.get(toks, i + k - 1) for k in range(n)]),
    )
    return F.array_distinct(joined)


# BPE-ish token pattern: letter runs, digit runs, single other non-space
TOKEN_REGEX = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

# language marker words (deterministic heuristic n-gram/stopword lang-ID)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is"),
    "es": ("el", "la", "de", "que", "y"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "de", "et", "est"),
    "zh": ("de5", "shi4", "le5", "zai4", "he2"),  # pinyin-romanized markers
}
LANG_ORDER = tuple(LANG_MARKERS)  # deterministic tie-break order

ENGLISH_STOPWORDS = ("the", "a", "of", "and", "is", "to", "in", "it", "on", "for")


def marker_hits(toks: Column, markers: tuple[str, ...]) -> Column:
    """Occurrence count of marker words (not distinct)."""
    arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def language_id(text: Column) -> Column:
    """Predict language: argmax of marker-word hits, ties broken by
    LANG_ORDER, 'und' (undetermined) when no marker hits at all.

    Expressed as ``array_max`` over per-language ``(hits, -order, lang)``
    structs — struct ordering makes the max the highest hit count with
    ties going to the EARLIEST language (larger ``-order``). Each
    language's hits expression appears exactly ONCE in the tree; the
    previous fold of nested ``when`` chains referenced the running
    best twice per language, doubling the codegen'd tree per step
    (~2^5 subtree copies, each re-splitting the text) — measured 1.40 s
    → 0.44 s for the sf0.1 gate scan, byte-identical predictions."""
    toks = tokens(text)
    cands = F.array(
        *[
            F.struct(
                marker_hits(toks, LANG_MARKERS[lang]).alias("hits"),
                F.lit(-i).alias("tie"),
                F.lit(lang).alias("lang"),
            )
            for i, lang in enumerate(LANG_ORDER)
        ]
    )
    best = F.array_max(cands)
    # null text → null hits in every struct → best["hits"] > 0 is null
    # → 'und', matching the old chain's coalesce(null-scored, 'und')
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


def quality_features(text: Column) -> dict[str, Column]:
    """Deterministic quality features: char/token counts, mean token
    length, stopword ratio, punctuation ratio, and a composite score
    in [0, 1] (higher = more natural-language-like)."""
    toks = tokens(text)
    n_chars = F.length(text).cast("long")
    n_tokens = F.size(toks).cast("long")
    mean_token_len = (n_chars - (n_tokens - 1)) / n_tokens  # chars minus separators
    stop_ratio = marker_hits(toks, ENGLISH_STOPWORDS) / n_tokens
    n_punct = F.length(F.regexp_replace(text, "[A-Za-z0-9 ]", "")).cast("long")
    punct_ratio = n_punct / n_chars
    score = (
        F.least(n_tokens / F.lit(100.0), F.lit(1.0)) * 0.4
        + F.least(stop_ratio * 5.0, F.lit(1.0)) * 0.4
        + (1.0 - F.least(punct_ratio * 10.0, F.lit(1.0))) * 0.2
    )
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "mean_token_len": F.round(mean_token_len, 4),
        "stopword_ratio": F.round(stop_ratio, 4),
        "punct_ratio": F.round(punct_ratio, 4),
        "quality_score": F.round(score, 4),
    }


def bpe_ish_token_count(text: Column) -> Column:
    """Sub-word-ish token count: regex token runs (TOKEN_REGEX)."""
    return F.size(F.regexp_extract_all(text, F.lit(TOKEN_REGEX), 0)).cast("long")


def rolling_fingerprint(text: Column) -> Column:
    """Order-sensitive document fingerprint: left-fold polynomial rolling
    hash over per-token portable hashes, mod HASH_PRIME. DuckDB twin
    built by ``sql_rolling_fingerprint``."""
    hashes = F.transform(tokens(text), lambda t: portable_hash64(t, "fp") % HASH_PRIME)
    return F.aggregate(
        hashes,
        F.lit(0).cast("long"),
        lambda acc, h: (acc * 31 + h) % HASH_PRIME,
    )


def sql_rolling_fingerprint(text_expr: str) -> str:
    h = sql_portable_hash64("x", "fp")
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(str_split({text_expr}, ' '), x -> {h} % {HASH_PRIME})), "
        f"(acc, h) -> (acc * 31 + h) % {HASH_PRIME})"
    )
