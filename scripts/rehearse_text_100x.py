"""100× scale probe for the TEXT-analysis family (round 6).

Dedup, streaming, and ANN all have measured 100× points; this closes
the gap for the text operators, whose SCALE claims ("df table is
vocabulary-sized and broadcasts", "corpus never shuffles for
decontamination", "packing is partition-local", "inference at scan
speed") were verified at 10× only.

Runs the registered text queries UNCHANGED (same (spark, sf_dir)
callables the driver scores) against a `make_scaled_sf.py
--tables=documents,embeddings` K=100 replication of sf0.1 (500 k docs),
timing the full plan into a noop sink and pulling the heaviest stage's
max-task share from the UI REST API — the skew indicator the other
100× probes record.

Usage:
    python scripts/make_scaled_sf.py 100 /root/testdata/sf0.1 \
        /root/repo/.scratch/sf10_docs --tables=documents,embeddings
    python scripts/rehearse_text_100x.py [/root/repo/.scratch/sf10_docs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rehearse_100x import _stage_metrics  # noqa: E402 — shared probe helper

# the text queries whose SCALE.md claims are structural (shuffle shape,
# broadcast, partition-locality) rather than constant-factor
PROBE_QUERIES = [
    "text_quality_scores",       # pure narrow projection — scan-bound
    "text_gopher_filters",       # narrow projection + filter
    "text_ngram_doc_freq",       # explode -> groupBy(term): THE text shuffle
    "text_tfidf_top_terms",      # full-corpus df agg + broadcast re-join
    "text_decontaminate_overlap",  # claim: corpus never shuffles (broadcast bench set)
    "text_bpe_pair_merges",      # iterative driver loop, bounded rounds
    "text_context_packing",      # claim: partition-local, no SinglePartition
    "text_model_inference",      # claim: scan-speed, shuffle-free
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scratch/sf10_docs"

    from kda_flink_app_timestream_spark.plans import load_all_plans
    from kda_flink_app_timestream_spark.session import build_spark

    registry = load_all_plans()
    spark = build_spark(
        app_name="rehearse-text-100x", **{"spark.ui.enabled": "true"}
    )

    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    print(f"corpus: {n_docs} docs at {sf_dir}", flush=True)

    results: dict[str, dict] = {}
    for name in PROBE_QUERIES:
        fn = registry[name].fn
        t0 = time.perf_counter()
        since = time.time() * 1000
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        elapsed = round(time.perf_counter() - t0, 2)
        results[name] = {"sec": elapsed, **_stage_metrics(spark, since)}
        print(f"{name}: {results[name]}", flush=True)
        spark.catalog.clearCache()

    print("\n| Query | 100x wall | heaviest stage max-task share |")
    print("|---|---|---|")
    for name, r in results.items():
        share = r.get("max_task_share", "n/a")
        print(f"| `{name}` | {r['sec']} s | {share} ({r.get('num_tasks', '?')} tasks) |")


if __name__ == "__main__":
    main()
