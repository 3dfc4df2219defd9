"""100× scale probe for the RELATIONAL / TPC-H-shape family (round 7).

Dedup, streaming, ANN, text, and multimodal all have measured 100×
points; this closes the last gap in the matrix. The relational queries
are pure Catalyst plans, so the claims under test are structural ones
made in their docstrings: filters reach the scans, small sides
broadcast, fact-fact joins shuffle once on their keys, top-k is
TakeOrderedAndProject (never a global sort), window partitions stay
bounded, and the Q21-style semi/anti self-join doesn't degenerate.

Runs the registered queries UNCHANGED (same (spark, sf_dir) callables
the driver scores) against a `make_scaled_sf.py
--tables=region,nation,customer,supplier,part,orders,lineitem` K=100
replication of sf0.1 (~60 M lineitem rows), timing the full plan into
a noop sink and pulling the heaviest stage's max-task share from the
UI REST API — the skew indicator the other 100× probes record.

Usage:
    python scripts/make_scaled_sf.py 100 /root/testdata/sf0.1 \
        /root/repo/.scratch/sf10_rel \
        --tables=region,nation,customer,supplier,part,orders,lineitem
    python scripts/rehearse_relational_100x.py [/root/repo/.scratch/sf10_rel]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rehearse_100x import _stage_metrics  # noqa: E402 — shared probe helper

# one query per structural claim class
PROBE_QUERIES = [
    "q1_pricing_summary",               # pushed filter + 2-key hash agg, map-side partials
    "q3_shipping_priority",             # broadcast dim + fact-fact shuffle + exact top-10
    "q5_region_revenue",                # 6-table star join, dims broadcast
    "q9_product_profit",                # five-way join, %LIKE% filter prunes part early
    "q13_order_count_distribution",     # outer join + double aggregation
    "q17_small_quantity_revenue",       # correlated-avg join-back (two lineitem passes)
    "q18_large_volume_orders",          # HAVING-first: tiny qualifying set joins back
    "q21_waiting_suppliers",            # semi + anti self-join on the fact table
    "q2_min_price_per_part",            # row_number over (partkey): full-fact window
    "window_topk_orders_per_customer",  # per-group top-k window shuffle
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scratch/sf10_rel"

    from kda_flink_app_timestream_spark.plans import load_all_plans
    from kda_flink_app_timestream_spark.session import build_spark

    registry = load_all_plans()
    spark = build_spark(
        app_name="rehearse-relational-100x", **{"spark.ui.enabled": "true"}
    )

    n_li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    print(f"fact: {n_li} lineitem rows at {sf_dir}", flush=True)

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
