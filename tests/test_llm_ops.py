"""Unit tests for the LLM-pipeline operators beyond the oracle harness:
known-answer fixtures for minhash/simhash/jaccard, Python-reference
check for the pandas byte-histogram (rows-only in the oracle), and
recall sanity for the LSH ANN path."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from kda_flink_app_timestream_spark.operators.dedup import (
    exact_jaccard_pairs,
    minhash_near_dup_pairs,
    minhash_signature,
    simhash,
)
from kda_flink_app_timestream_spark.operators.multimodal import (
    attach_payload,
    byte_histogram_features,
    decode_image,
    frame_sample,
)
from kda_flink_app_timestream_spark.operators.similarity import (
    brute_force_topk,
    lsh_topk,
)


def _py_hash(seed, x) -> int:
    return int(hashlib.md5(f"{seed}|{x}".encode()).hexdigest()[:15], 16)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        Row(doc_id=1, text="a b c d e f g h"),
        Row(doc_id=2, text="a b c d e f g h"),           # exact dup of 1
        Row(doc_id=3, text="a b c d e f g x"),           # near dup of 1
        Row(doc_id=4, text="p q r s t u v w"),           # unrelated
        Row(doc_id=5, text="x y"),                       # too short to shingle
    ]
    return spark.createDataFrame(rows)


def test_minhash_signature_matches_python(spark, docs):
    from kda_flink_app_timestream_spark.operators.dedup import (
        MINHASH_A,
        MINHASH_B,
        MINHASH_PRIME,
    )

    sig = {r["doc_id"]: r["sig"] for r in minhash_signature(docs).collect()}
    toks = "a b c d e f g h".split()
    shingles = {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
    bases = [_py_hash("mh", x) % MINHASH_PRIME for x in shingles]
    expected = [
        min((b * MINHASH_A[s] + MINHASH_B[s]) % MINHASH_PRIME for b in bases)
        for s in range(8)
    ]
    assert sig[1] == expected
    assert sig[1] == sig[2]  # identical docs → identical signatures
    assert sig[5] == [None] * 8  # <3 tokens → no shingles


def test_minhash_pairs_find_dups(spark, docs):
    pairs = {
        (r["doc_a"], r["doc_b"]): r["est_jaccard"]
        for r in minhash_near_dup_pairs(docs.filter("doc_id <= 4"), threshold=0.3).collect()
    }
    assert pairs[(1, 2)] == 1.0  # exact dup: all signature positions agree
    assert (1, 4) not in pairs and (2, 4) not in pairs  # unrelated never pairs


def test_exact_jaccard_known_answer(spark, docs):
    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in exact_jaccard_pairs(docs.filter("doc_id <= 4"), threshold=0.1).collect()
    }
    assert pairs[(1, 2)] == 1.0
    # docs 1 & 3: 6 shingles each, 5 shared → 5/7
    assert pairs[(1, 3)] == round(5 / 7, 4)
    assert (1, 4) not in pairs


def test_containment_catches_doc_inside_doc(spark):
    """The asymmetric measure's reason to exist: a short doc fully
    quoted inside a long one scores containment 1.0 while its Jaccard
    stays below any useful threshold."""
    from kda_flink_app_timestream_spark.operators.dedup import (
        exact_containment_pairs,
    )

    quote = "the quick brown fox jumps over the lazy dog tonight"
    filler = " ".join(f"w{i} x{i} y{i}" for i in range(40))
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text=quote),
            Row(doc_id=2, text=f"{filler} {quote}"),
            Row(doc_id=3, text="completely different words entirely here now"),
        ]
    )
    cont = {
        (r["doc_a"], r["doc_b"]): r["containment"]
        for r in exact_containment_pairs(df, threshold=0.5).collect()
    }
    jac = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in exact_jaccard_pairs(df, threshold=0.0001).collect()
    }
    # doc 1 has 8 shingles; the embedding doc shares all but the seam
    # crossings — every doc-1 shingle except none (quote is intact) →
    # containment 1.0, while Jaccard is diluted by the 120-word filler
    assert cont[(1, 2)] == 1.0
    assert jac[(1, 2)] < 0.1
    assert (1, 3) not in cont and (2, 3) not in cont


def test_simhash_identical_docs_equal(spark, docs):
    sh = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    assert sh[1] == sh[2]
    assert 0 <= sh[1] < 2**16
    assert sh[1] != sh[4]


def test_brute_force_topk_ordering(spark):
    rows = [
        Row(vec_id=0, embedding=[1.0, 0.0, 0.0]),
        Row(vec_id=1, embedding=[1.0, 0.1, 0.0]),   # closest to 0
        Row(vec_id=2, embedding=[0.5, 0.5, 0.0]),
        Row(vec_id=3, embedding=[-1.0, 0.0, 0.0]),  # opposite
    ]
    df = spark.createDataFrame(rows)
    got = brute_force_topk(df, df.filter("vec_id = 0"), k=3, dim=3).collect()
    assert [r["neighbor_id"] for r in got] == [1, 2, 3]
    assert got[0]["cosine_sim"] > 0.99
    assert got[-1]["cosine_sim"] == -1.0


def test_zero_norm_embedding_ranks_last_not_null(spark):
    """An all-zero embedding must score cosine 0.0 (ranked after any
    positive match, before any negative one) on the Spark side — the
    shared zero-norm guard; unguarded, Spark's x/0 is NULL while
    DuckDB's is inf/nan, and the two engines would rank differently."""
    rows = [
        Row(vec_id=0, embedding=[1.0, 0.0, 0.0]),
        Row(vec_id=1, embedding=[1.0, 0.1, 0.0]),
        Row(vec_id=2, embedding=[0.0, 0.0, 0.0]),   # zero vector
        Row(vec_id=3, embedding=[-1.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows)
    got = brute_force_topk(df, df.filter("vec_id = 0"), k=3, dim=3).collect()
    by_id = {r["neighbor_id"]: r["cosine_sim"] for r in got}
    assert by_id[2] == 0.0  # not NULL, not nan
    assert [r["neighbor_id"] for r in got] == [1, 2, 3]


def test_lsh_bucket_survives_dim_above_default(spark):
    """``hyperplane`` must generate components for the CALLER's dim:
    the old ``[:dim]`` slice of a 64-wide tuple zip_with-NULL-padded any
    dim > 64, NULL-poisoned every plane dot, and collapsed all vectors
    into bucket 0 (degenerating the bucket join to a cross product)."""
    from kda_flink_app_timestream_spark.operators.similarity import lsh_bucket

    dim = 80
    rows = [
        Row(vec_id=i, v=[float((i * 31 + d * 7) % 17 - 8) for d in range(dim)])
        for i in range(12)
    ]
    df = spark.createDataFrame(rows)
    buckets = [
        r["b"] for r in df.select(lsh_bucket(F.col("v"), dim=dim).alias("b")).collect()
    ]
    assert all(b is not None for b in buckets)
    assert len(set(buckets)) > 1, "all vectors collapsed into one bucket"


def test_lsh_topk_bucket_consistency(spark, sf_dir):
    """Every ANN result must share the query's LSH bucket, be ranked by
    cosine desc within its query, and agree with brute force on the
    cosine value for the same pair. (Recall itself is data-dependent —
    these embeddings are unclustered — so it isn't asserted.)"""
    from kda_flink_app_timestream_spark.functions.vectors import as_double
    from kda_flink_app_timestream_spark.operators.similarity import lsh_bucket

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter("vec_id < 5")
    approx = lsh_topk(emb, queries, k=5).collect()
    assert approx, "LSH returned nothing"

    buckets = {
        r["vec_id"]: r["bucket"]
        for r in emb.select(
            "vec_id", lsh_bucket(as_double(F.col("embedding"))).alias("bucket")
        ).collect()
    }
    exact = {
        (r["query_id"], r["neighbor_id"]): r["cosine_sim"]
        for r in brute_force_topk(emb, queries, k=500).collect()
    }
    per_query: dict[int, list] = {}
    for r in approx:
        assert buckets[r["query_id"]] == buckets[r["neighbor_id"]]
        assert exact[(r["query_id"], r["neighbor_id"])] == r["cosine_sim"]
        per_query.setdefault(r["query_id"], []).append(r["cosine_sim"])
    for sims in per_query.values():
        assert sims == sorted(sims, reverse=True)


def test_jaccard_stop_list_drops_hot_shingle_candidates(spark):
    """A boilerplate shingle shared by every doc must not generate n²
    candidates: with max_doc_freq below its frequency, pairs connected
    ONLY through it disappear, while pairs sharing rare shingles keep
    their EXACT full-set Jaccard scores."""
    boiler = "subscribe to our newsletter today"
    rows = (
        # 10 unrelated docs that share ONLY the boilerplate prefix
        [Row(doc_id=i, text=f"{boiler} unique{i} alpha{i} beta{i}") for i in range(10)]
        # plus one genuine near-dup pair with rare-shingle overlap
        + [
            Row(doc_id=100, text="the quick brown fox jumps high"),
            Row(doc_id=101, text="the quick brown fox jumps far"),
        ]
    )
    df = spark.createDataFrame(rows)

    # truly-unbounded (None) is an OOM vector and must refuse loudly
    # (ADVICE r3 #5); the uncapped BASELINE is a cap above every
    # fixture frequency — an empty stop-list, identical semantics
    with pytest.raises(ValueError, match="doc"):
        exact_jaccard_pairs(df, threshold=0.01, max_doc_freq=None)
    uncapped = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in exact_jaccard_pairs(df, threshold=0.01, max_doc_freq=10_000).collect()
    }
    capped = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in exact_jaccard_pairs(df, threshold=0.01, max_doc_freq=5).collect()
    }
    # boilerplate-only pairs: present uncapped, gone with the cap
    assert (0, 1) in uncapped and (0, 1) not in capped
    # the genuine pair survives with an IDENTICAL exact score
    assert capped[(100, 101)] == uncapped[(100, 101)]
    # and nothing else from the boilerplate block leaked through
    assert set(capped) == {(100, 101)}


def test_lsh_banding_guards(spark, docs):
    """Signature-width mismatch fails fast (not silent wrong banding);
    indivisible band counts are rejected; a hot band can be stop-listed."""
    from kda_flink_app_timestream_spark.operators.dedup import lsh_candidate_pairs

    sig4 = minhash_signature(docs, num_hashes=4)
    with pytest.raises(Exception):  # runtime assert_true on sig width
        lsh_candidate_pairs(sig4, num_hashes=8).collect()
    with pytest.raises(ValueError, match="divisible"):
        lsh_candidate_pairs(sig4, num_hashes=4, num_bands=3)
    # docs 1+2 are exact dups → identical sigs → one hot band of size 2;
    # capping band frequency at 1 removes every candidate
    sig = minhash_signature(docs)
    assert lsh_candidate_pairs(sig, num_hashes=8).count() > 0
    assert lsh_candidate_pairs(sig, num_hashes=8, max_band_freq=1).count() == 0


def test_minhash_signature_is_prefix_stable(spark, docs):
    """r14 optimization contract: permutation coefficients depend only
    on the permutation index (``minhash_coeffs``), so a narrower
    signature is a PREFIX of a wider one. ``dedup_minhash_tuning``
    relies on this — one cached signature pass at the grid's max width
    is sliced per setting instead of re-hashing the corpus per setting.
    If the coefficient derivation ever keys on ``num_hashes``, this
    catches it before the tuning oracle does."""
    wide = {
        r["doc_id"]: list(r["sig"])
        for r in minhash_signature(docs, num_hashes=32).collect()
    }
    for n in (8, 16):
        narrow = {
            r["doc_id"]: list(r["sig"])
            for r in minhash_signature(docs, num_hashes=n).collect()
        }
        assert narrow == {k: v[:n] for k, v in wide.items()}


def test_minhash_recall_at_production_params(spark):
    """128 hashes / 16 bands (8 rows per band) on a known-answer corpus:
    every planted near-dup pair (Jaccard ≥ ~0.8) must surface, and the
    estimate must sit near the true Jaccard."""
    texts = {}
    for i in range(10):
        toks = [f"t{i}_{j}" for j in range(40)]
        texts[i * 2] = " ".join(toks)
        near = list(toks)
        near[7] = "changed"                       # 3 of 38 shingles differ
        texts[i * 2 + 1] = " ".join(near)
    df = spark.createDataFrame(
        [Row(doc_id=k, text=v) for k, v in texts.items()]
    )
    got = {
        (r["doc_a"], r["doc_b"]): r["est_jaccard"]
        for r in minhash_near_dup_pairs(
            df, threshold=0.5, num_hashes=128, num_bands=16
        ).collect()
    }
    for i in range(10):
        pair = (i * 2, i * 2 + 1)
        assert pair in got, f"planted near-dup {pair} missed at 128/16"
        assert 0.7 <= got[pair] <= 1.0
    # no cross-pair false positives (disjoint vocabularies)
    assert set(got) == {(i * 2, i * 2 + 1) for i in range(10)}


def test_embedding_pairs_compound_blocking_bounds_skewed_label(spark):
    """One dominant label must NOT produce one quadratic block: the
    compound (label, lsh_bucket) key sub-buckets it, and the emitted
    pairs match a Python reference that applies the same blocking."""
    import numpy as np

    from kda_flink_app_timestream_spark.operators.similarity import (
        EMB_N_BANDS,
        EMB_PLANES_PER_BAND,
        embedding_near_dup_pairs,
        plane_components,
    )

    n, dim, thr = 200, 64, 0.5
    rng = np.random.RandomState(7)
    vecs = rng.uniform(-1.0, 1.0, size=(n, dim))
    vecs[50] = vecs[40] * 1.7        # a genuine near-dup pair (cos = 1)
    df = spark.createDataFrame(
        [Row(vec_id=i, label="same", embedding=[float(x) for x in vecs[i]]) for i in range(n)]
    )

    got = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dup_pairs(df, threshold=thr, block_col="label").collect()
    }

    def band_bucket(v, band):
        return sum(
            (1 << p)
            for p in range(EMB_PLANES_PER_BAND)
            if float(np.dot(np.array(plane_components(band * EMB_PLANES_PER_BAND + p)), v)) > 0
        )

    buckets = [[band_bucket(v, b) for b in range(EMB_N_BANDS)] for v in vecs]

    def cos(a, b):
        return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))

    expected = {
        (i, j)
        for i in range(n) for j in range(i + 1, n)
        if any(buckets[i][b] == buckets[j][b] for b in range(EMB_N_BANDS))
        and round(cos(vecs[i], vecs[j]), 6) >= thr
    }
    assert got == expected
    assert (40, 50) in got           # identical-direction dups always collide

    # the dominant label got sub-bucketed: no per-band block holds most rows
    from collections import Counter
    for b in range(EMB_N_BANDS):
        assert max(Counter(bk[b] for bk in buckets).values()) < n / 2


def test_partition_local_packing_guarantee(spark):
    """The scale form of context packing (per-partition running sums —
    no global-order shuffle) must keep every pack within
    budget + one document, cover every doc exactly once, and its plan
    must contain no unpartitioned Window."""
    from kda_flink_app_timestream_spark.operators.packing import (
        pack_contexts,
        pack_summary,
    )

    budget, max_doc = 100, 40
    df = spark.range(0, 1000, 1, 8).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.xxhash64("id"), F.lit(max_doc)) + 1).cast("long").alias("n_tokens"),
    )
    packed = pack_contexts(df, budget=budget, partition_local=True)
    assert packed.count() == 1000                       # every doc kept
    summary = pack_summary(packed).collect()
    for r in summary:
        assert r["pack_tokens"] <= budget + max_doc, r  # next-fit bound
    # no single-partition window in the physical plan
    plan = packed._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan


def test_byte_histogram_matches_python(spark, docs):
    out = {
        r["doc_id"]: [r[f"bin_{i}"] for i in range(8)]
        for r in byte_histogram_features(attach_payload(docs)).collect()
    }
    for row in docs.collect():
        payload = row["text"].encode()
        expected = [0] * 8
        for b in payload:
            expected[b * 8 // 256] += 1
        assert out[row["doc_id"]] == expected


def test_thumbnail_plan_matches_python(spark, docs):
    from kda_flink_app_timestream_spark.operators.multimodal import (
        THUMB_STRIDE,
        thumbnail_plan,
    )

    out = {r["doc_id"]: r for r in thumbnail_plan(attach_payload(docs)).collect()}
    for row in docs.collect():
        payload = row["text"].encode()
        sampled = payload[::THUMB_STRIDE]
        r = out[row["doc_id"]]
        assert r["thumb_n_bytes"] == len(sampled)
        assert r["thumb_checksum"] == sum(sampled)
        assert r["thumb_w"] == r["width"] // THUMB_STRIDE
        assert r["thumb_h"] == r["height"] // THUMB_STRIDE


def test_audio_frame_energy_matches_python(spark, docs):
    from kda_flink_app_timestream_spark.operators.multimodal import (
        AUDIO_FRAME,
        audio_frame_energy,
    )

    out = {}
    for r in audio_frame_energy(attach_payload(docs)).collect():
        out[(r["doc_id"], r["frame_idx"])] = (r["frame_len"], r["energy"])
    for row in docs.collect():
        payload = row["text"].encode()
        for i in range(0, len(payload), AUDIO_FRAME):
            chunk = payload[i : i + AUDIO_FRAME]
            got_len, got_energy = out[(row["doc_id"], i // AUDIO_FRAME)]
            assert got_len == len(chunk)
            assert got_energy == sum((b - 128) ** 2 for b in chunk)


def test_gopher_filters_boundaries(spark):
    """Known-answer fixture spanning each rule: too short, too
    repetitive, non-alphabetic, and a clean doc."""
    from kda_flink_app_timestream_spark.plans.text import text_gopher_filters  # noqa: F401
    from kda_flink_app_timestream_spark.plans import REGISTRY, load_all_plans

    load_all_plans()
    rows = [
        Row(doc_id=1, text="too short"),                           # n_words < 5
        Row(doc_id=2, text="spam spam spam spam spam spam ok"),    # top ratio
        Row(doc_id=3, text="1 2 3 4 5 6 7 8 9 10"),                # no alpha
        Row(doc_id=4, text="the quick brown fox jumps over a lazy dog today"),
    ]
    df = spark.createDataFrame(rows)
    df.createOrReplaceTempView("gopher_fixture")
    # drive the operator body directly on the fixture
    import kda_flink_app_timestream_spark.plans.text as tx

    orig = tx.load_table
    tx.load_table = lambda s, sf, name: df
    try:
        got = {r["doc_id"]: r["keep"] for r in REGISTRY["text_gopher_filters"].fn(spark, "unused").collect()}
    finally:
        tx.load_table = orig
    assert got == {1: False, 2: False, 3: False, 4: True}


def test_frame_sample_explodes(spark):
    df = spark.createDataFrame([Row(doc_id=1, n_frames=25), Row(doc_id=2, n_frames=5)])
    got = frame_sample(df, stride=10).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r["frame_idx"])
    assert sorted(by_doc[1]) == [0, 10, 20]
    assert sorted(by_doc[2]) == [0]


def test_decode_image_rejects_non_image_payload(spark, docs):
    """decode_image is no longer a stub (r5) — but a text payload is
    not an image: every such row must degrade to decode_ok=false, not
    crash the batch or return fabricated pixels."""
    out = decode_image(attach_payload(docs)).collect()
    assert out and all(r["decode_ok"] is False for r in out)
    assert all(r["pixel_checksum"] is None for r in out)


# --- curation operators ------------------------------------------------------


def test_decontaminate_flags_planted_overlap(spark):
    from kda_flink_app_timestream_spark.operators.curation import (
        decontaminate_overlap,
    )

    corpus = spark.createDataFrame(
        [
            Row(doc_id=10, text="the secret benchmark answer is forty two"),
            Row(doc_id=11, text="completely unrelated training text here"),
        ]
    )
    bench = spark.createDataFrame(
        [Row(doc_id=99, text="we ask if the secret benchmark answer holds")]
    )
    got = {r["doc_id"]: r["n_shared_ngrams"] for r in decontaminate_overlap(corpus, bench, n=3).collect()}
    # doc 10 shares 'the secret benchmark', 'secret benchmark answer'; doc 11 none
    assert got == {10: 2}


def test_duplicated_span_stats_counts(spark, docs):
    from kda_flink_app_timestream_spark.operators.curation import (
        duplicated_span_stats,
    )

    got = {r["doc_id"]: r for r in duplicated_span_stats(docs, n=3).collect()}
    # docs 1 and 2 are identical: every 3-gram duplicated
    assert got[1]["dup_permille"] == 1000
    assert got[2]["dup_permille"] == 1000
    # doc 3 shares the first five 3-grams of six with 1/2 ('f g x' differs)
    assert got[3]["n_ngrams"] == 6
    assert got[3]["n_dup_ngrams"] == 5
    assert got[3]["dup_permille"] == 833  # 5000/6 = 833.33 -> half-up 833
    # doc 4 shares nothing
    assert got[4]["n_dup_ngrams"] == 0
    # doc 5 has no 3-grams at all -> absent (no rows to group)
    assert 5 not in got


def test_rarity_scores_threshold(spark):
    from kda_flink_app_timestream_spark.operators.curation import rarity_scores

    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="common common common rare1"),
            Row(doc_id=2, text="common common rare2 rare2"),
        ]
    )
    got = {r["doc_id"]: r for r in rarity_scores(df, max_corpus_count=2).collect()}
    # 'common' appears 5x (not rare); rare1 1x, rare2 2x (both rare)
    assert got[1]["n_tokens"] == 4 and got[1]["n_rare"] == 1
    assert got[2]["n_tokens"] == 4 and got[2]["n_rare"] == 2
    assert got[1]["rare_permille"] == 250
    assert got[2]["rare_permille"] == 500


def test_redact_pii_roundtrip(spark):
    from kda_flink_app_timestream_spark.operators.curation import (
        EMAIL_PATTERN,
        PHONE_PATTERN,
        redact_pii,
    )
    import re

    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="mail a.b_c%x+1@sub.example.co.uk or +44-123-4567 ok"),
            Row(doc_id=2, text="no pii at all"),
        ]
    )
    got = {r["doc_id"]: r for r in redact_pii(df).collect()}
    assert got[1]["n_emails"] == 1 and got[1]["n_phones"] == 1
    assert "<EMAIL>" in got[1]["redacted"] and "<PHONE>" in got[1]["redacted"]
    assert not re.search(EMAIL_PATTERN, got[1]["redacted"])
    assert not re.search(PHONE_PATTERN, got[1]["redacted"])
    assert got[2]["redacted"] == "no pii at all"


def test_weighted_mix_copy_counts(spark):
    from kda_flink_app_timestream_spark.functions.text import portable_hash64  # noqa: F401
    from kda_flink_app_timestream_spark.operators.curation import weighted_mix
    from pyspark.sql import functions as F

    df = spark.createDataFrame([Row(doc_id=i) for i in range(200)])
    # 1.5 epochs: every row kept once, ~half kept twice, deterministically
    mixed = weighted_mix(df, F.lit(150)).collect()
    by_id = {}
    for r in mixed:
        by_id.setdefault(r["doc_id"], []).append(r["copy_idx"])
    assert set(by_id) == set(range(200))  # floor(1.5) >= 1 keeps everyone
    n_twice = sum(1 for v in by_id.values() if len(v) == 2)
    assert all(sorted(v) == list(range(len(v))) for v in by_id.values())
    assert 60 <= n_twice <= 140  # hash-bucket ~50% of 200
    # deterministic: second run identical
    again = weighted_mix(df, F.lit(150)).collect()
    assert sorted((r["doc_id"], r["copy_idx"]) for r in again) == sorted(
        (r["doc_id"], r["copy_idx"]) for r in mixed
    )


def test_weighted_mix_zero_weight_drops(spark):
    from kda_flink_app_timestream_spark.operators.curation import weighted_mix
    from pyspark.sql import functions as F

    df = spark.createDataFrame([Row(doc_id=i) for i in range(10)])
    assert weighted_mix(df, F.lit(0)).count() == 0


def test_lineage_recursive_forest_semantics(spark):
    """Known-answer DAG: parent(3)=min(1,2)=1, parent(4)=3, parent(5)=2;
    roots/depths follow the primary-parent chains."""
    from kda_flink_app_timestream_spark.plans.dedup import _lineage_recursive_sql

    spark.createDataFrame(
        [(1, 3), (2, 3), (3, 4), (2, 5)], "doc_a long, doc_b long"
    ).createOrReplaceTempView("lineage_fixture_pairs")
    spark.sql(
        "SELECT doc_b AS node, min(doc_a) AS parent FROM lineage_fixture_pairs GROUP BY doc_b"
    ).createOrReplaceTempView("lineage_fixture_parent")
    spark.sql(
        "SELECT DISTINCT doc_a AS n FROM lineage_fixture_pairs "
        "UNION SELECT DISTINCT doc_b FROM lineage_fixture_pairs"
    ).createOrReplaceTempView("lineage_fixture_nodes")
    got = {
        r["doc_id"]: (r["lineage_root"], r["depth"])
        for r in spark.sql(
            "WITH RECURSIVE "
            + _lineage_recursive_sql(
                "lineage_fixture_parent", "lineage_fixture_nodes"
            ).lstrip()
        ).collect()
    }
    assert got == {1: (1, 0), 2: (2, 0), 3: (1, 1), 4: (1, 2), 5: (2, 1)}


def test_kmeans_known_answer_two_blobs(spark):
    """Two well-separated blobs, k=2: every point lands with its blob's
    seed, and the update round moves centroids to the blob means
    (checked via dist_sq shrinking for off-seed members)."""
    from pyspark.sql import Row

    from kda_flink_app_timestream_spark.operators.clustering import kmeans_assign

    def vec(base, wiggle):
        return [float(base)] * 32 + [float(base + wiggle)] * 32

    rows = [
        Row(vec_id=0, embedding=vec(0.0, 0.01)),
        Row(vec_id=1, embedding=vec(0.4, 0.01)),
        Row(vec_id=2, embedding=vec(0.0, 0.02)),
        Row(vec_id=3, embedding=vec(0.41, 0.02)),
        Row(vec_id=4, embedding=vec(0.01, 0.0)),
        Row(vec_id=5, embedding=vec(0.39, 0.0)),
    ]
    out = kmeans_assign(spark.createDataFrame(rows), k=2, iters=2)
    got = {r["vec_id"]: r["cluster_id"] for r in out.collect()}
    assert got == {0: 0, 2: 0, 4: 0, 1: 1, 3: 1, 5: 1}


def test_kmeans_update_round_tightens_assignment(spark, sf_dir):
    """Total within-cluster squared distance is non-increasing after a
    Lloyd's update round (the textbook convergence invariant)."""
    from kda_flink_app_timestream_spark.operators.clustering import kmeans_assign
    from kda_flink_app_timestream_spark.sources.batch import load_table

    e = load_table(spark, sf_dir, "embeddings")
    one = kmeans_assign(e, k=8, iters=1).agg(F.sum("dist_sq")).collect()[0][0]
    two = kmeans_assign(e, k=8, iters=2).agg(F.sum("dist_sq")).collect()[0][0]
    assert two <= one


def test_semantic_prune_keeps_min_id_of_pair(spark):
    """Of an identical pair, the smaller vec_id survives and the larger
    is pruned; singletons are never pruned."""
    from pyspark.sql import Row

    from kda_flink_app_timestream_spark.plans import load_all_plans  # noqa: F401
    from kda_flink_app_timestream_spark.operators.clustering import kmeans_assign
    from kda_flink_app_timestream_spark.operators.similarity import (
        embedding_near_dup_pairs,
    )

    dup = [0.3] * 64
    lone = [(-0.25 if i % 2 else 0.25) for i in range(64)]
    rows = [
        Row(vec_id=0, embedding=[float(x) for x in dup]),
        Row(vec_id=1, embedding=[float(x) for x in dup]),
        Row(vec_id=2, embedding=[float(x) for x in lone]),
    ]
    df = spark.createDataFrame(rows)
    asg = kmeans_assign(df, k=2, iters=2)
    with_cluster = df.join(asg.select("vec_id", "cluster_id"), "vec_id")
    pairs = embedding_near_dup_pairs(
        with_cluster, threshold=0.99, block_col="cluster_id", n_bands=0
    ).collect()
    assert [(p["id_a"], p["id_b"]) for p in pairs] == [(0, 1)]


def test_scaled_k_grows_with_corpus():
    """The production SemDeDup k is ∝ N (VERDICT r2 item 9: fixed k=8
    makes clusters grow to N/8 — quadratic within-cluster work at 100×)."""
    from kda_flink_app_timestream_spark.plans.clustering import (
        KMEANS_K,
        TARGET_CLUSTER_SIZE,
        scaled_k,
    )

    assert scaled_k(100) == KMEANS_K  # floor: never fewer than the base k
    assert scaled_k(10 * TARGET_CLUSTER_SIZE) == 10
    assert scaled_k(10 * TARGET_CLUSTER_SIZE + 1) == 11  # ceiling division
    # 1000× the corpus ⇒ 1000× the clusters ⇒ cluster size stays flat
    assert scaled_k(1_000_000 * TARGET_CLUSTER_SIZE) == 1_000_000


def test_banded_blocking_bounds_skewed_cluster_pairs(spark):
    """Worst-case SemDeDup skew: EVERY vector lands in ONE cluster. The
    banded sub-bucketing must keep the candidate-pair count well below
    the all-pairs quadratic bound — this is the property that makes the
    scaled path survive a 100 TB corpus with a runaway cluster."""
    from kda_flink_app_timestream_spark.operators.similarity import (
        EMB_N_BANDS,
        EMB_PLANES_PER_BAND,
        as_double,
        lsh_bucket,
    )

    m, dim = 400, 64
    rows = [
        Row(
            vec_id=i,
            embedding=[((_py_hash("skew", i * dim + d) % 2001) - 1000) / 1000.0
                       for d in range(dim)],
            cluster_id=0,  # the skew: one giant cluster
        )
        for i in range(m)
    ]
    df = spark.createDataFrame(rows)
    vecs = df.select("vec_id", "cluster_id", as_double(F.col("embedding")).alias("v"))
    # the operator's exact blocking keys: (cluster, band, sign-bucket)
    buckets = F.array(
        *[
            lsh_bucket("v", EMB_PLANES_PER_BAND, plane_offset=b * EMB_PLANES_PER_BAND)
            for b in range(EMB_N_BANDS)
        ]
    )
    block_sizes = (
        vecs.select("cluster_id", F.posexplode(buckets).alias("band", "bkt"))
        .groupBy("cluster_id", "band", "bkt")
        .count()
        .collect()
    )
    all_pairs = m * (m - 1) // 2
    candidate_bound = sum(r["count"] * (r["count"] - 1) // 2 for r in block_sizes)
    max_block = max(r["count"] for r in block_sizes)
    # no per-task block anywhere near the full cluster...
    assert max_block < m / 2, f"a (band, bucket) block holds {max_block} of {m}"
    # ...and total candidates far below all-pairs (4 bands ⇒ ~m²/8 expected)
    assert candidate_bound < all_pairs / 2, (
        f"banded candidates {candidate_bound} vs all-pairs {all_pairs}"
    )


def test_kmeans_assignment_paths_identical(spark):
    """The Arrow matmul assignment (k·dim above ASSIGN_VECTORIZE_CELLS)
    must produce bit-identical (cid, dist_sq) to the inlined-expression
    fold — exactness argument: every float64 intermediate is an integer
    < 2^53. Deterministic fixture, k chosen above the switch threshold
    with ties included (duplicate vectors)."""
    import numpy as np
    from pyspark.sql import functions as F

    from kda_flink_app_timestream_spark.operators import clustering as C

    rng = np.random.default_rng(7)
    dim = 64
    vecs = rng.uniform(-1, 1, size=(300, dim)).astype("float32")
    vecs[50] = vecs[10]  # exact duplicates → distance ties
    vecs[51] = vecs[10]
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(len(vecs))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pts = df.select(
        F.col("vec_id").alias("pid"), C.quantize_vec(F.col("embedding")).alias("qv")
    )
    k = 80
    assert k * dim > C.ASSIGN_VECTORIZE_CELLS
    cents = sorted(
        (r["pid"], list(r["qv"])) for r in pts.filter(F.col("pid") < k).collect()
    )
    # call both paths explicitly (dispatch would hide one of them)
    cand = F.transform(
        C._centroid_literal(cents),
        lambda c: F.struct(
            C._sq_dist(F.col("qv"), c["cv"]).alias("dist_sq"),
            c["cid"].alias("cid"),
        ),
    )
    best = F.array_min(cand)
    expr_path = {
        r["pid"]: (r["cid"], r["dist_sq"])
        for r in pts.select(
            "pid", best["cid"].alias("cid"), best["dist_sq"].alias("dist_sq")
        ).collect()
    }
    vec_path = {
        r["pid"]: (r["cid"], r["dist_sq"])
        for r in C._assign_vectorized(pts, cents).collect()
    }
    assert expr_path == vec_path
    # tie triples must have identical (cid, dist_sq)
    assert vec_path[10] == vec_path[50] == vec_path[51]


def test_twolevel_fine_assignment_paths_identical(spark, sf_dir):
    """The distributed cell-join fine assignment (seed count above
    seed_collect_cap) must produce exactly the rows of the collected
    closure-matmul path — same distances, same (dist, sid) tie rule."""
    from kda_flink_app_timestream_spark.operators.clustering import (
        kmeans_assign_twolevel,
    )
    from kda_flink_app_timestream_spark.plans.clustering import scaled_k

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    k = scaled_k(e.count())
    closure = {
        tuple(r) for r in kmeans_assign_twolevel(e, k=k).collect()
    }
    joined = {
        tuple(r)
        for r in kmeans_assign_twolevel(e, k=k, seed_collect_cap=0).collect()
    }
    assert closure == joined and closure


def test_cluster_diversity_singleton_and_identity(spark):
    """Singleton labels must yield NULL mean (zero pairs — the ANSI
    divide-by-zero crash class), and the pair-free identity must equal
    a brute-force pairwise computation on a multi-vector label."""
    from itertools import combinations

    from kda_flink_app_timestream_spark.plans.similarity import (
        DIVERSITY_SCALE,
        sim_cluster_diversity,
    )

    import math

    vecs = {
        "a": [[0.1 * i + 0.01 * d for d in range(64)] for i in range(4)],
        "solo": [[0.5 + 0.001 * d for d in range(64)]],
    }
    rows = [
        (label, i, v)
        for label, vs in vecs.items()
        for i, v in enumerate(vs)
    ]
    df = spark.createDataFrame(rows, "label string, vec_id long, embedding array<double>")

    import tempfile, os

    # reuse the registered query fn by pointing it at a dir shaped like
    # a sf_dir (embeddings.parquet)
    sfdir = tempfile.mkdtemp()
    df.write.parquet(os.path.join(sfdir, "embeddings.parquet"))
    got = {r["label"]: r for r in sim_cluster_diversity(spark, sfdir).collect()}

    assert got["solo"]["n_pairs"] == 0
    assert got["solo"]["mean_sq_dist"] is None

    q = [[math.floor(x * DIVERSITY_SCALE) for x in v] for v in vecs["a"]]
    dists = [
        sum((xi - yi) ** 2 for xi, yi in zip(x, y))
        for x, y in combinations(q, 2)
    ]
    num, den = sum(dists), len(dists)
    expected_mean = (2 * num + den) // (2 * den)
    assert got["a"]["n_pairs"] == den
    assert got["a"]["mean_sq_dist"] == expected_mean


def test_png_codec_roundtrip_all_filters_and_shapes():
    """The built-in PNG codec (the jar-free decode path): encode→decode
    identity for gray/RGB/RGBA, and decode correctness for every
    scanline filter type (0-4) via hand-filtered scanlines built from
    the spec's reconstruction equations run in reverse."""
    import binascii
    import struct
    import zlib

    import numpy as np

    from kda_flink_app_timestream_spark.operators.multimodal import (
        PNG_MAGIC,
        decode_png,
        encode_png,
    )

    rng = np.random.RandomState(42)
    for shape in ((5, 7), (6, 4, 3), (3, 5, 4)):
        img = rng.randint(0, 256, size=shape, dtype=np.uint8)
        out = decode_png(encode_png(img))
        assert out.shape == img.shape
        assert (out == img).all()

    # hand-filter an RGB image with each filter type per row and check
    # the decoder reconstructs the original
    img = rng.randint(0, 256, size=(5, 6, 3), dtype=np.uint8)
    h, w, ch = img.shape
    stride = w * ch
    flat = img.reshape(h, stride).astype(np.int32)
    raw = b""
    for y in range(h):
        f = y % 5
        line = flat[y]
        prev = flat[y - 1] if y > 0 else np.zeros(stride, dtype=np.int32)
        filt = np.empty(stride, dtype=np.int32)
        for i in range(stride):
            a = line[i - ch] if i >= ch else 0
            b = prev[i]
            c = prev[i - ch] if i >= ch else 0
            if f == 0:
                filt[i] = line[i]
            elif f == 1:
                filt[i] = line[i] - a
            elif f == 2:
                filt[i] = line[i] - b
            elif f == 3:
                filt[i] = line[i] - (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                filt[i] = line[i] - pred
        raw += bytes([f]) + (filt & 0xFF).astype(np.uint8).tobytes()

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", binascii.crc32(tag + data) & 0xFFFFFFFF)
        )

    png = (
        PNG_MAGIC
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    assert (decode_png(png) == img).all()

    # corruption must raise, not return garbage
    import pytest as _pytest

    good = encode_png(img)
    with _pytest.raises(ValueError):
        decode_png(b"\x00" * 8 + good[8:])  # wrong magic
    bad_crc = bytearray(good)
    bad_crc[20] ^= 0xFF  # flip a byte inside IHDR
    with _pytest.raises(ValueError):
        decode_png(bytes(bad_crc))


def test_decode_image_operator_mixed_batch(spark):
    """decode_image over a mixed batch: valid PNGs decode with exact
    checksums; corrupt payloads degrade per-row (decode_ok=false, NULL
    features) without failing the micro-batch."""
    import numpy as np

    from kda_flink_app_timestream_spark.operators.multimodal import (
        decode_image,
        encode_png,
    )

    rows = []
    expected = {}
    for i in range(6):
        img = ((i * 13 + np.arange(48) * 5) % 256).astype(np.uint8).reshape(6, 8)
        png = encode_png(img)
        if i % 3 == 0:
            png = png[: len(png) // 2]  # truncated
            expected[i] = None
        else:
            expected[i] = int(img.sum())
        rows.append((i, bytearray(png)))
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in decode_image(df).collect()}
    for i, checksum in expected.items():
        if checksum is None:
            assert got[i]["decode_ok"] is False
            assert got[i]["pixel_checksum"] is None
        else:
            assert got[i]["decode_ok"] is True
            assert (got[i]["width"], got[i]["height"], got[i]["channels"]) == (8, 6, 1)
            assert got[i]["pixel_checksum"] == checksum


def test_decode_image_via_pil_when_installed(spark):
    """PIL-backed decode path — exercised only where PIL exists (absent
    in this container: the built-in PNG path above is the executed
    fallback, so this skip is honest, not a fake pass)."""
    import pytest as _pytest

    _pytest.importorskip("PIL")
    import numpy as np
    from io import BytesIO

    from PIL import Image

    from kda_flink_app_timestream_spark.operators.multimodal import decode_image

    img = np.arange(96, dtype=np.uint8).reshape(8, 12)
    buf = BytesIO()
    Image.fromarray(img).save(buf, format="JPEG")  # a non-PNG format
    df = spark.createDataFrame([(1, bytearray(buf.getvalue()))],
                               "doc_id long, payload binary")
    row = decode_image(df).collect()[0]
    assert row["decode_ok"] is True
    assert (row["width"], row["height"]) == (12, 8)


def test_ivfpq_adc_dist_matches_python_reference(spark, sf_dir):
    """Every (query, neighbor, adc_dist) the IVF-PQ operator returns is
    re-derived in pure Python from the raw parquet: quantize to the 2^20
    grid, PQ-encode the neighbor against the codebook slice (argmin ties
    to the smaller code), sum the query's per-subspace LUT entries for
    those codes — the integers must match exactly, and the neighbor must
    live in one of the query's nprobe probed lists."""
    import math

    from kda_flink_app_timestream_spark.operators.ivfpq import ivfpq_adc_topk
    from kda_flink_app_timestream_spark.operators.similarity import (
        IVF_CENTROID_RANGE,
        IVF_NPROBE,
        PQ_CODEBOOK_RANGE,
        PQ_N_SUB,
        PQ_SCALE,
    )

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    vecs = {
        r["vec_id"]: [float(x) for x in r["embedding"]] for r in e.collect()
    }
    q = {k: [math.floor(x * float(PQ_SCALE)) for x in v] for k, v in vecs.items()}
    sub_dim = 64 // PQ_N_SUB

    def cos(a, b):
        da = sum(x * x for x in a)
        db = sum(x * x for x in b)
        if da == 0 or db == 0:
            return 0.0
        return sum(x * y for x, y in zip(a, b)) / (math.sqrt(da) * math.sqrt(db))

    cents = {
        cid: vecs[cid]
        for cid in range(*IVF_CENTROID_RANGE)
        if cid in vecs
    }

    def nearest_cids(v, k):
        # cosine desc then cid asc (the operator's tie rule)
        ranked = sorted(cents, key=lambda c: (-cos(v, cents[c]), c))
        return ranked[:k]

    codebook = sorted(
        (cid, q[cid]) for cid in range(*PQ_CODEBOOK_RANGE) if cid in q
    )

    def codes_of(qv):
        out = []
        for s in range(PQ_N_SUB):
            sub = qv[s * sub_dim : (s + 1) * sub_dim]
            best = min(
                (sum((a - b) ** 2 for a, b in zip(sub, w[s * sub_dim : (s + 1) * sub_dim])), c)
                for c, w in codebook
            )
            out.append(best[1])
        return out

    got = ivfpq_adc_topk(
        e, e.filter(F.col("vec_id") < 20), k=5
    ).collect()
    assert got, "operator returned no rows"
    for r in got:
        qid, nid, adc = r["query_id"], r["neighbor_id"], r["adc_dist"]
        assert nearest_cids(vecs[nid], 1)[0] in nearest_cids(vecs[qid], IVF_NPROBE)
        ncodes = codes_of(q[nid])
        expect = 0
        for s, code in enumerate(ncodes):
            w = dict(codebook)[code][s * sub_dim : (s + 1) * sub_dim]
            sub = q[qid][s * sub_dim : (s + 1) * sub_dim]
            expect += sum((a - b) ** 2 for a, b in zip(sub, w))
        assert adc == expect, (qid, nid, adc, expect)


def test_ivfpq_split_equals_composed(spark, sf_dir):
    """The production split (encode once → search over stored codes)
    returns exactly the composed catalog form's rows — including through
    a real partitionBy(cid) parquet round trip, the deployment layout."""
    import tempfile

    from kda_flink_app_timestream_spark.operators.ivfpq import (
        _collect_pq_codebook,
        ivfpq_adc_search,
        ivfpq_adc_topk,
        ivfpq_encode,
    )
    from kda_flink_app_timestream_spark.operators.similarity import (
        _collect_centroids,
        ivf_centroids,
    )

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 20)
    cents = _collect_centroids(ivf_centroids(e, "vec_id", "embedding"))
    cb = _collect_pq_codebook(e, "vec_id", "embedding")
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/ivfpq_index"
        ivfpq_encode(e, cents, cb).write.partitionBy("cid").parquet(path)
        stored = spark.read.parquet(path)
        split_rows = sorted(
            tuple(r) for r in ivfpq_adc_search(stored, q, cents, cb, k=5).collect()
        )
    composed_rows = sorted(tuple(r) for r in ivfpq_adc_topk(e, q, k=5).collect())
    assert split_rows == composed_rows


def test_empty_centroid_slice_fails_loudly(spark, sf_dir):
    """VERDICT r10 #5 (deferred from r10): a corpus MISSING the whole
    IVF centroid id-slice used to yield an empty literal codebook and
    silently EMPTY ivf/ivfpq results (every vector's nearest-centroid
    explode produces zero rows) — a plausible-looking wrong answer.
    _collect_centroids now raises, mirroring _collect_pq_codebook."""
    from kda_flink_app_timestream_spark.operators.similarity import (
        IVF_CENTROID_RANGE,
        _collect_centroids,
        ivf_centroids,
        ivf_topk,
    )

    lo, hi = IVF_CENTROID_RANGE
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(
        (F.col("vec_id") < lo) | (F.col("vec_id") >= hi)
    )
    with pytest.raises(ValueError, match="centroid codebook is empty"):
        _collect_centroids(ivf_centroids(e, "vec_id", "embedding"))
    with pytest.raises(ValueError, match="centroid codebook is empty"):
        ivf_topk(e, e.filter(F.col("vec_id") < 5), k=3)


def test_ivfpq_mismatched_codebook_fails_loudly(spark, sf_dir):
    """ADVICE r10: Spark's asc() ranks NULLs FIRST, so an encoded table
    whose codes don't resolve against the codebook passed to
    ivfpq_adc_search (stale index / split-API misuse) used to rank the
    mismatched candidates at the TOP of every query's top-k. The ADC
    projection must instead fail the query loudly."""
    from kda_flink_app_timestream_spark.operators.ivfpq import (
        _collect_pq_codebook,
        ivfpq_adc_search,
        ivfpq_encode,
    )
    from kda_flink_app_timestream_spark.operators.similarity import (
        _collect_centroids,
        ivf_centroids,
    )

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 5)
    cents = _collect_centroids(ivf_centroids(e, "vec_id", "embedding"))
    cb = _collect_pq_codebook(e, "vec_id", "embedding")
    encoded = ivfpq_encode(e, cents, cb)
    # a codebook from a DIFFERENT id slice: none of the stored codes
    # resolve to one of its LUT slots
    stale = [(code + 1000, w) for code, w in cb]
    with pytest.raises(Exception, match="do not match the supplied codebook"):
        ivfpq_adc_search(encoded, q, cents, stale, k=3).collect()


def test_mmr_over_ivfpq_split_equals_composed(spark, sf_dir):
    """The composed registered query rebuilds the TRAINED IVF-PQ index
    inline (oracle-checkable without stored state); the production
    deployment trains once, encodes once at write time, and
    MMR-reranks over the STORED index. Both paths must return
    identical rows — including through a real partitionBy(cid) parquet
    round trip of the encoded table. (r13: rewired from the untrained
    base ADC split to the trained refined split, matching the
    registered query's VERDICT r12 #2 rewire; r14: searches at the
    swept MMR_CAND_NPROBE/MMR_CAND_SHORTLIST knobs the composed query
    promoted per VERDICT r13 #4.)"""
    import tempfile

    from kda_flink_app_timestream_spark.operators.ivfpq import (
        ivfpq_refined_encode,
        ivfpq_refined_search,
        ivfpq_refined_train,
    )
    from kda_flink_app_timestream_spark.operators.mmr import (
        MMR_N_CAND,
        mmr_over_candidates,
    )
    from kda_flink_app_timestream_spark.plans import REGISTRY, load_all_plans
    from kda_flink_app_timestream_spark.plans.similarity import (
        MMR_CAND_NPROBE,
        MMR_CAND_SHORTLIST,
    )

    load_all_plans()
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 20)
    coarse, cbs = ivfpq_refined_train(e)
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/ivfpq_index"
        ivfpq_refined_encode(e, coarse, cbs).write.partitionBy("cid").parquet(path)
        stored = spark.read.parquet(path)
        ann = ivfpq_refined_search(
            stored, e, q, coarse, cbs, k=MMR_N_CAND,
            nprobe=MMR_CAND_NPROBE, shortlist=MMR_CAND_SHORTLIST,
        ).select("query_id", F.col("neighbor_id").alias("cand_id"))
        split_rows = sorted(
            tuple(r) for r in mmr_over_candidates(e, q, ann).collect()
        )
    composed = REGISTRY["sim_mmr_over_ivfpq"].fn(spark, sf_dir)
    assert split_rows == sorted(tuple(r) for r in composed.collect())


def test_mmr_over_candidates_lookup_filter_is_pushed_down(spark, sf_dir):
    """The re-rank's candidate point lookup must PRUNE the corpus scan:
    the bounded candidate-id set is inlined as an In predicate, so the
    parquet scan shows a pushed filter on vec_id instead of projecting
    and quantizing the whole corpus for a broadcast join to discard
    (measured 11.2 s → ~4 s search+rerank at 200 k vectors)."""
    from kda_flink_app_timestream_spark.operators.mmr import _quantized

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    ids = sorted(r["vec_id"] for r in e.filter(F.col("vec_id") < 25).collect())
    scan = e.filter(F.col("vec_id").isin(ids)).select(
        F.col("vec_id").alias("cand_id"), _quantized("embedding").alias("cq")
    )
    plan = scan._jdf.queryExecution().executedPlan().toString()
    tail = plan.split("PushedFilters")[-1][:300]
    assert "In(vec_id" in tail, tail


def test_mmr_prefers_diverse_over_near_copies(spark):
    """The property MMR exists for: when the top of the relevance
    ranking is a block of near-copies, plain top-k returns the block
    while MMR's pick 2 skips the near-copy of pick 1 in favor of a
    less-relevant but diverse candidate. Built on an orthogonal-ish
    fixture where the scores are hand-checkable."""
    from pyspark.sql import Row

    from kda_flink_app_timestream_spark.operators.mmr import mmr_topk

    dim = 4

    def v(*xs):
        return [float(x) for x in xs] + [0.0] * (dim - len(xs))

    # hand-checkable dots (λ = 0.7 → score = 7·rel − 3·penalty): after
    # pick 1 the near-copy carries penalty ≈ 9 against rel ≈ 3
    # (7·3 − 3·9 < 0), while the orthogonal candidate keeps its full
    # 7·2.8 — MMR must skip the copy; plain top-k would rank it second.
    rows = [
        Row(vec_id=0, embedding=v(1.0, 1.0)),          # the query
        Row(vec_id=1, embedding=v(3.0, 0.0)),          # most relevant (rel 3)
        Row(vec_id=2, embedding=v(3.0, -0.02)),        # near-copy of 1 (sim 9), rel 2.98
        Row(vec_id=3, embedding=v(0.0, 2.8)),          # orthogonal to 1, rel 2.8
        Row(vec_id=4, embedding=v(0.5, 0.5)),          # mild both ways
        Row(vec_id=5, embedding=v(-3.0, 0.0)),         # anti-relevant
    ]
    df = spark.createDataFrame(rows)
    got = mmr_topk(df, df.filter("vec_id = 0"), k=3, n_cand=5).collect()
    picks = {r["pick_idx"]: r["neighbor_id"] for r in got}
    assert picks[1] == 1                     # pure relevance
    assert picks[2] == 3                     # orthogonal beats the near-copy
    assert picks[3] == 4                     # copy's penalty keeps it out
    assert len({r["neighbor_id"] for r in got}) == 3  # no repeats


def test_mmr_matches_python_greedy_reference(spark):
    """The unrolled DataFrame loop must equal a direct Python greedy MMR
    over random integer fixtures — same quantization grid, same λ pair,
    same (score DESC, id ASC) tie rule at every step."""
    import random

    from kda_flink_app_timestream_spark.operators.mmr import (
        MMR_LAMBDA_NUM,
        MMR_LAMBDA_PEN,
        MMR_SCALE,
        mmr_topk,
    )

    rng = random.Random(1234)
    dim = 6
    n = 15
    rows = [
        Row(
            vec_id=i,
            embedding=[rng.uniform(-1, 1) for _ in range(dim)],
        )
        for i in range(n)
    ]
    df = spark.createDataFrame(rows)
    k, n_cand = 4, 8
    got = {
        (r["query_id"], r["pick_idx"]): (r["neighbor_id"], r["mmr_score"])
        for r in mmr_topk(df, df.filter("vec_id < 3"), k=k, n_cand=n_cand).collect()
    }

    import math

    qv = {
        r.vec_id: [math.floor(x * MMR_SCALE) for x in r.embedding] for r in rows
    }

    def dot(a, b):
        return sum(x * y for x, y in zip(a, b))

    for query in range(3):
        rel = sorted(
            ((dot(qv[query], qv[c]), c) for c in qv if c != query),
            key=lambda t: (-t[0], t[1]),
        )[:n_cand]
        cand = {c: r for r, c in rel}
        picked = []
        first = max(cand, key=lambda c: (cand[c], -c))
        picked.append((first, MMR_LAMBDA_NUM * cand[first]))
        while len(picked) < k:
            chosen = None
            for c in cand:
                if c in [p for p, _ in picked]:
                    continue
                pen = max(dot(qv[c], qv[p]) for p, _ in picked)
                score = MMR_LAMBDA_NUM * cand[c] - MMR_LAMBDA_PEN * pen
                if chosen is None or (score, -c) > (chosen[1], -chosen[0]):
                    chosen = (c, score)
            picked.append(chosen)
        for idx, (c, s) in enumerate(picked, start=1):
            assert got[(query, idx)] == (c, s), (query, idx, got[(query, idx)], (c, s))


def test_ivfpq_survives_sparse_codebook_ids(spark, sf_dir):
    """A corpus MISSING an id inside PQ_CODEBOOK_RANGE must still score
    correctly: the ADC code→LUT-slot translation is an explicit map, so
    a gap in the codeword id range shifts slot numbering without
    breaking lookups (the previous positional ``code − base + 1``
    arithmetic silently read the wrong slot here). Verified against the
    same pure-Python re-derivation as the dense test."""
    import math

    from kda_flink_app_timestream_spark.operators.ivfpq import ivfpq_adc_topk
    from kda_flink_app_timestream_spark.operators.similarity import (
        IVF_CENTROID_RANGE,
        PQ_CODEBOOK_RANGE,
        PQ_N_SUB,
        PQ_SCALE,
    )

    lo, _hi = PQ_CODEBOOK_RANGE
    dropped = lo + 2  # knock a hole in the codeword id range
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(
        F.col("vec_id") != dropped
    )
    got = ivfpq_adc_topk(e, e.filter(F.col("vec_id") < 10), k=3).collect()
    assert got

    vecs = {r["vec_id"]: [float(x) for x in r["embedding"]] for r in e.collect()}
    q = {k_: [math.floor(x * float(PQ_SCALE)) for x in v] for k_, v in vecs.items()}
    sub_dim = 64 // PQ_N_SUB
    codebook = sorted(
        (cid, q[cid]) for cid in range(*PQ_CODEBOOK_RANGE) if cid in q
    )
    assert len(codebook) == (PQ_CODEBOOK_RANGE[1] - PQ_CODEBOOK_RANGE[0]) - 1

    def codes_of(qv):
        out = []
        for s in range(PQ_N_SUB):
            sub = qv[s * sub_dim : (s + 1) * sub_dim]
            best = min(
                (
                    sum(
                        (a - b) ** 2
                        for a, b in zip(sub, w[s * sub_dim : (s + 1) * sub_dim])
                    ),
                    c,
                )
                for c, w in codebook
            )
            out.append(best[1])
        return out

    cb = dict(codebook)
    for r in got:
        qid, nid, adc = r["query_id"], r["neighbor_id"], r["adc_dist"]
        expect = 0
        for s, code in enumerate(codes_of(q[nid])):
            w = cb[code][s * sub_dim : (s + 1) * sub_dim]
            sub = q[qid][s * sub_dim : (s + 1) * sub_dim]
            expect += sum((a - b) ** 2 for a, b in zip(sub, w))
        assert adc == expect, (qid, nid, adc, expect)


def test_ivfpq_refined_survives_emptied_trained_codeword(spark):
    """An EMPTIED trained codeword (two identical seeds → the tie goes
    to the smaller code, the other keeps zero members and vanishes at
    the update) leaves a per-subspace codebook with a gap — the slot
    translation must switch to the literal code→slot map and the
    pipeline must neither raise the NULL-ADC guard nor mis-rank.
    Pinned end-to-end: a planted exact copy of the query must come
    back as pick 1 with cosine 1.0 through the refine."""
    import random

    from kda_flink_app_timestream_spark.operators.ivfpq import (
        PQT_N_CODES,
        PQT_N_SUB,
        ivfpq_refined_topk,
        train_pq_codebooks,
    )

    rng = random.Random(12)

    def vec():
        return [rng.uniform(-1.0, 1.0) for _ in range(64)]

    rows = []
    v0 = vec()
    for i in range(16):
        # seeds 0 and 1 identical → trained code 1 empties everywhere
        rows.append((i, v0 if i <= 1 else vec()))
    for i in range(16, 50):
        rows.append((i, vec()))
    rows.append((50, list(rows[0][1])))  # exact copy of query 0
    for i in range(100, 116):
        rows.append((i, vec()))  # extra corpus bulk (the trained coarse
        #                          quantizer seeds from id<16, so these
        #                          are plain candidates)
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    cbs = train_pq_codebooks(e)
    for s in range(PQT_N_SUB):
        codes = [c for c, _ in cbs[s]]
        assert 1 not in codes, f"sub {s}: code 1 should have emptied"
        assert len(codes) == PQT_N_CODES - 1
        assert codes != list(range(codes[0], codes[0] + len(codes)))

    got = ivfpq_refined_topk(e, e.filter(F.col("vec_id") == 0), k=5).collect()
    assert len(got) == 5
    # BOTH exact copies of the query (vec 1 — the duplicated seed — and
    # the planted vec 50) must lead, cosine 1.0, id tie-break
    by_rk = {r["rk"]: (r["neighbor_id"], r["cosine_sim"]) for r in got}
    assert by_rk[1] == (1, 1.0)
    assert by_rk[2] == (50, 1.0)


def test_refined_train_fused_equals_separate_trainings(spark, sf_dir):
    """r14 optimization guard: ivfpq_refined_train fuses the coarse and
    subspace trainings into one seed collect + one assignment/update
    job per Lloyd round. The fused codebooks must be BIT-IDENTICAL to
    running ``train_pq_codebooks`` separately at each granularity (the
    pre-r14 composition) — the oracle's unrolled CTE chain models the
    unfused recipe, so any drift here is an oracle break, not a tuning
    change. Also covers n_lists != n_codes (the shared seed collect
    slices per granularity)."""
    from kda_flink_app_timestream_spark.operators.ivfpq import (
        PQT_COARSE_LISTS,
        PQT_N_CODES,
        PQT_N_SUB,
        ivfpq_refined_train,
        train_pq_codebooks,
    )

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    coarse_f, cbs_f = ivfpq_refined_train(e)
    coarse_u = train_pq_codebooks(
        e, n_sub=1, n_codes=PQT_COARSE_LISTS
    )[0]
    cbs_u = train_pq_codebooks(e, n_sub=PQT_N_SUB, n_codes=PQT_N_CODES)
    assert coarse_f == coarse_u
    assert cbs_f == cbs_u
    # asymmetric granularities: coarse lists != codewords per subspace
    coarse_f2, cbs_f2 = ivfpq_refined_train(e, n_codes=8, n_lists=12)
    assert coarse_f2 == train_pq_codebooks(e, n_sub=1, n_codes=12)[0]
    assert cbs_f2 == train_pq_codebooks(e, n_sub=PQT_N_SUB, n_codes=8)


def test_sub_code_sql_matches_python_argmin(spark):
    """r15 optimization guard: the codebook expressions are assembled
    as per-stage SQL strings (_sub_code_sql / _adc_sum_sql replaced the
    Column-API composition; physical plans verified identical modulo
    lambda numbering — plans/r15). Pin the generated SQL's semantics
    against a pure-Python reference: exact integer argmin per subspace
    with ties to the smaller code id, and the ADC sum through the
    code→slot translation — including a GAPPED codebook (the sparse
    literal-map branch)."""
    import random

    from kda_flink_app_timestream_spark.operators.ivfpq import (
        _adc_sum_sql,
        _sub_code_sql,
    )

    rng = random.Random(7)
    sub_dim = 4
    # gapped code ids (2 missing) exercise the sparse-map slot branch;
    # duplicate codeword vectors force the smaller-id tie-break
    cb = [(0, [5, -3, 2, 7]), (1, [5, -3, 2, 7]), (3, [-9, 0, 4, 1]), (6, [2, 2, 2, 2])]
    rows = [(i, [rng.randint(-10, 10) for _ in range(sub_dim)]) for i in range(40)]
    df = spark.createDataFrame(rows, "rid long, qv array<bigint>")

    def py_code(v):
        best = min((sum((x - y) ** 2 for x, y in zip(v, w)), c) for c, w in cb)
        return best[1]

    got = {
        r["rid"]: r["c"]
        for r in df.selectExpr("rid", f"{_sub_code_sql(cb, 0, sub_dim)} AS c").collect()
    }
    assert got == {rid: py_code(v) for rid, v in rows}

    # ADC: lut in code-id order, slot translated through the gapped map
    lut = [17, 4, 99, 23]
    adc_rows = [(i, lut, c) for i, (c, _w) in enumerate(cb)]
    adc_df = spark.createDataFrame(adc_rows, "rid long, lut_0 array<bigint>, code_0 long")
    got_adc = {
        r["rid"]: r["adc"]
        for r in adc_df.selectExpr(
            "rid", f"{_adc_sum_sql([[c for c, _w in cb]])} AS adc"
        ).collect()
    }
    assert got_adc == {i: lut[i] for i in range(len(cb))}


def test_mmr_semi_join_fallback_matches_pushdown(spark, sf_dir, monkeypatch):
    """Above MMR_PUSHDOWN_MAX_IDS the candidate lookup falls back to a
    broadcast semi-join instead of an inlined In filter (ADVICE r11);
    both paths must produce byte-identical MMR picks."""
    import kda_flink_app_timestream_spark.operators.mmr as mmr_mod
    from kda_flink_app_timestream_spark.operators.similarity import (
        brute_force_topk,
    )

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 3)
    ann = brute_force_topk(e, q, k=8).select(
        "query_id", F.col("neighbor_id").alias("cand_id")
    )
    via_pushdown = {
        tuple(r) for r in mmr_mod.mmr_over_candidates(e, q, ann).collect()
    }
    monkeypatch.setattr(mmr_mod, "MMR_PUSHDOWN_MAX_IDS", 5)
    via_semi_join = {
        tuple(r) for r in mmr_mod.mmr_over_candidates(e, q, ann).collect()
    }
    assert via_pushdown == via_semi_join
    assert len(via_pushdown) == 3 * mmr_mod.MMR_K


def test_curate_corpus_composition_matches_stagewise_set_algebra(spark, sf_dir):
    """The end-to-end curation pipeline (r11, the text-side twin of the
    retrieval composition) must equal the SET ALGEBRA of its
    individually-verified stages computed stage by stage in the test:
    survivors = (language+quality gate) ∘ (exact collapse, min id per
    text) − (near-dup cluster non-representatives). Sub-operator
    internals are already oracle-green (dedup_exact_summary,
    dedup_minhash_pairs, dedup_cluster_representatives, text quality
    queries) — this pins the composition wiring: filter order, the
    keep-min rules, and the anti-join."""
    from kda_flink_app_timestream_spark.functions.text import (
        language_id,
        quality_features,
    )
    from kda_flink_app_timestream_spark.operators.curation import curate_corpus
    from kda_flink_app_timestream_spark.operators.dedup import (
        connected_components,
        minhash_near_dup_pairs,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = {
        r["doc_id"]: (r["lang"], r["n_tokens"], r["bpe_tokens"], r["quality_score"])
        for r in curate_corpus(docs, min_quality=0.5, near_dup_threshold=0.5).collect()
    }

    feats = quality_features(F.col("text"))
    scored = docs.select(
        "doc_id",
        "text",
        language_id(F.col("text")).alias("lang"),
        feats["quality_score"].alias("q"),
    )
    gated = scored.filter((F.col("lang") == "en") & (F.col("q") >= 0.5))
    by_text: dict[str, int] = {}
    for r in gated.select("doc_id", "text").collect():
        if r["text"] not in by_text or r["doc_id"] < by_text[r["text"]]:
            by_text[r["text"]] = r["doc_id"]
    exact_ids = set(by_text.values())
    exact_df = gated.filter(F.col("doc_id").isin(sorted(exact_ids)))
    # same >= 3-token minhash precondition the operator (and every
    # registered minhash query) applies — sub-shingle docs bypass the
    # near-dup stage un-pruned
    pairs = minhash_near_dup_pairs(
        exact_df.select("doc_id", "text").filter(
            F.size(F.split(F.col("text"), " ")) >= 3
        ),
        threshold=0.5,
    )
    comp = connected_components(pairs, src="doc_a", dst="doc_b")
    losers = {
        r["node"] for r in comp.collect() if r["node"] != r["cluster_rep"]
    }
    expected_ids = exact_ids - losers
    assert set(got) == expected_ids
    assert expected_ids, "fixture must keep at least one document"
    assert len(expected_ids) < docs.count(), "pipeline must drop something"
    # emitted stats match the verified feature expressions for survivors
    stats = {
        r["doc_id"]: (r["lang"], r["n_tokens"], r["q"])
        for r in scored.select(
            "doc_id", "lang", feats["n_tokens"].alias("n_tokens"), "q"
        ).collect()
    }
    for did, (lang, n_tokens, _bpe, q) in got.items():
        assert (lang, n_tokens, q) == stats[did]


def test_curate_corpus_degenerate_inputs(spark):
    """Empty corpus → empty survivors (schema intact); an all-duplicate
    corpus keeps exactly the smallest id."""
    from kda_flink_app_timestream_spark.operators.curation import curate_corpus

    empty = spark.createDataFrame([], "doc_id long, text string")
    out = curate_corpus(empty)
    assert out.columns == ["doc_id", "lang", "n_tokens", "bpe_tokens", "quality_score"]
    assert out.count() == 0

    text = (
        "the quick brown fox jumps over the lazy dog and then the dog "
        "sleeps while the fox runs far away to find some food for all"
    )
    dup = spark.createDataFrame(
        [(i, text) for i in (7, 3, 9)], "doc_id long, text string"
    )
    rows = curate_corpus(dup).collect()
    assert [r["doc_id"] for r in rows] == [3]

    # non-unique ids: two byte-identical (id, text) ROWS must still
    # collapse to ONE survivor — the r12 id-keyed semi join kept every
    # copy of a duplicated winner row (ADVICE r12 medium); the
    # min(struct) collapse restores the oracle's exactly-one-row-per-
    # text semantics without an id-uniqueness precondition
    dup_rows = spark.createDataFrame(
        [(3, text), (3, text), (7, text)], "doc_id long, text string"
    )
    rows = curate_corpus(dup_rows).collect()
    assert [r["doc_id"] for r in rows] == [3]


def test_language_id_argmax_tiebreak_und_semantics(spark):
    """Pins the r13 array_max rewrite of ``language_id`` to the exact
    contract of the original nested-when fold: argmax of marker hits,
    ties to the EARLIEST language in LANG_ORDER, 'und' when nothing
    hits, and null/empty-safe. The rewrite was motivated purely by
    codegen shape (the fold referenced the running best twice per
    language → ~2^5 subtree copies, 1.40 s → 0.44 s on the sf0.1 gate
    scan); these rows are the semantics that must not drift with it."""
    from kda_flink_app_timestream_spark.functions.text import (
        LANG_ORDER,
        language_id,
    )

    assert LANG_ORDER[:2] == ("en", "es")  # tie-break order assumed below
    rows = [
        ("the quick brown fox is here", "en"),  # clear winner
        ("der die das und ist hier", "de"),  # later lang, strictly more hits
        ("la de", "es"),  # es/fr tie (both hit 'la','de') → earliest wins
        ("xyzzy plugh qwerty", "und"),  # no marker hits anywhere
        ("", "und"),  # empty text
        (None, "und"),  # null text
        # one en hit vs two es hits → strictly-greater later lang wins
        ("the el la", "es"),
    ]
    df = spark.createDataFrame([(t,) for t, _ in rows], "text string")
    got = [
        r["lang"]
        for r in df.select(language_id(F.col("text")).alias("lang")).collect()
    ]
    assert got == [want for _, want in rows]


def test_curate_corpus_duplicate_inflation_invariance(spark, sf_dir):
    """The defining property of a dedup-centred curation pipeline: a
    corpus with every document duplicated under fresh (larger) ids
    curates to the BYTE-IDENTICAL survivor set of the original corpus —
    exact collapse keeps the min id, so every injected copy loses
    (the 10x scale run in SCALE.md pins the cost side; this pins the
    semantics at test scale)."""
    from kda_flink_app_timestream_spark.operators.curation import curate_corpus

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    inflated = docs.unionByName(
        docs.select((F.col("doc_id") + 10_000_000).alias("doc_id"), "text")
    )
    base = {tuple(r) for r in curate_corpus(docs).collect()}
    infl = {tuple(r) for r in curate_corpus(inflated).collect()}
    assert base == infl
    assert base, "fixture must keep at least one survivor"


def test_curate_corpus_matches_registered_oracle(spark, sf_dir):
    """Driver-style compare (rows + schema + exact values) of the
    composed curation pipeline against its composed DuckDB oracle —
    drafted and verified in r11, REGISTERED as `curate_corpus` in r12
    (plans/curation.py:curate_oracle); this pin runs the registered
    pair directly so the in-repo check stays byte-identical to what
    the driver scores."""
    from kda_flink_app_timestream_spark.plans import REGISTRY, load_all_plans

    from .oracle_utils import compare_query, duckdb_connection

    load_all_plans()
    q = REGISTRY["curate_corpus"]
    df = q.fn(spark, sf_dir)
    con = duckdb_connection(sf_dir)
    problems = compare_query(df, con, q.oracle, "curate_corpus")
    assert not problems, problems[:3]


def test_ivfpq_recall_queries_match_registered_oracles(spark, sf_dir):
    """The two registered index-quality evals (`sim_ivfpq_recall` for
    the base ADC config, `sim_ivfpq_refined_recall` for the trained/
    refined fix path — both REGISTERED in r12 from the r11 staged
    draft) run driver-style against their composed oracles, and the
    measured quality gap is pinned: the refined pipeline must beat the
    base config by a wide margin (sf0.01 measurement: mean recall@5
    0.86 vs 0.04; this asserts the ORDERING with slack, not the exact
    means, so a testdata regeneration shifts numbers without lying
    about the claim)."""
    from kda_flink_app_timestream_spark.plans import REGISTRY, load_all_plans

    from .oracle_utils import compare_query, duckdb_connection

    load_all_plans()
    con = duckdb_connection(sf_dir)
    means = {}
    for name in ("sim_ivfpq_recall", "sim_ivfpq_refined_recall"):
        q = REGISTRY[name]
        df = q.fn(spark, sf_dir)
        problems = compare_query(df, con, q.oracle, name)
        assert not problems, (name, problems[:3])
        rows = q.fn(spark, sf_dir).collect()
        means[name] = sum(r["recall_permille"] for r in rows) / len(rows)
    assert means["sim_ivfpq_refined_recall"] >= 3 * means["sim_ivfpq_recall"], means
    # ≥ 50% mean recall@5 (measured 0.86 with the trained coarse +
    # trained PQ + saturated-shortlist refine at nprobe=4; generous
    # slack for a testdata regeneration, but far above anything the
    # base config can reach)
    assert means["sim_ivfpq_refined_recall"] >= 500, means


def test_rerank_at_n_cand_rejects_ambiguous_cut():
    """The oracle k-substitution is word-boundary anchored and asserts
    exactly one hit (ADVICE r13): a SQL body whose rank cut is a
    longer number sharing the TOP_K prefix (e.g. 50 vs 5) must FAIL
    loudly, not silently mangle '<= 50' into '<= 200'."""
    import pytest

    from kda_flink_app_timestream_spark.plans.similarity import (
        MMR_N_CAND,
        TOP_K,
        _rerank_at_n_cand,
    )

    ok = _rerank_at_n_cand(f"SELECT 1 WHERE rk <= {TOP_K}\n")
    assert f"WHERE rk <= {MMR_N_CAND}" in ok
    with pytest.raises(AssertionError):
        _rerank_at_n_cand(f"SELECT 1 WHERE rk <= {TOP_K}0\n")  # prefix-sharing cut
    with pytest.raises(AssertionError):
        _rerank_at_n_cand(
            f"SELECT 1 WHERE rk <= {TOP_K} UNION SELECT 2 WHERE rk <= {TOP_K}"
        )


def test_collapse_then_semantic_matches_scaled_on_reps(spark, sf_dir):
    """The composition changes cost, not answers: restricted to
    exact-dup representatives, `dedup_collapse_then_semantic`'s verdict
    is byte-identical to `dedup_semantic_prune_scaled` on the base
    corpus (the collapsed corpus IS the base corpus here — the sf
    fixtures are duplicate-free, so every original id wins its group),
    and every injected copy drops with a representative below it."""
    from kda_flink_app_timestream_spark.plans import REGISTRY, load_all_plans

    load_all_plans()
    composed = REGISTRY["dedup_collapse_then_semantic"].fn(spark, sf_dir).cache()
    reps = {
        tuple(r)
        for r in composed.filter(F.col("vec_id") == F.col("rep_id"))
        .select("vec_id", "cluster_id", "pruned")
        .collect()
    }
    base = {
        tuple(r)
        for r in REGISTRY["dedup_semantic_prune_scaled"].fn(spark, sf_dir).collect()
    }
    assert reps == base
    copies = composed.filter(F.col("vec_id") != F.col("rep_id")).collect()
    composed.unpersist()
    assert copies, "inflation must inject at least one exact copy"
    assert all(c.pruned for c in copies)
    assert all(c.rep_id < c.vec_id for c in copies)


def test_mmr_candidate_recall_matches_registered_oracle(spark, sf_dir):
    """Driver-style compare of `sim_mmr_candidate_recall` — drafted and
    verified in r13, REGISTERED in r14 (plans/similarity.py): the
    trained/refined candidate stage at k = MMR_N_CAND (the exact frame
    `sim_mmr_over_ivfpq` re-ranks since the r13 rewire) vs exact
    brute-force top-MMR_N_CAND truth. Measured sf0.01 mean recall@20
    ≈ 0.75 (sf0.001 ≈ 0.76) — pinned here with slack ≥ 500‰ so a
    testdata regeneration moves the number without voiding the
    claim."""
    from kda_flink_app_timestream_spark.plans import REGISTRY, load_all_plans

    from .oracle_utils import compare_query, duckdb_connection

    load_all_plans()
    q = REGISTRY["sim_mmr_candidate_recall"]
    df = q.fn(spark, sf_dir)
    con = duckdb_connection(sf_dir)
    problems = compare_query(df, con, q.oracle, "sim_mmr_candidate_recall")
    assert not problems, problems[:3]
    rows = df.collect()
    mean = sum(r["recall_permille"] for r in rows) / len(rows)
    assert mean >= 500, mean
