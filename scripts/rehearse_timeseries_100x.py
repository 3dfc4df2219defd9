"""100× scale probe for the BATCH events/time-series family (round 7).

The streaming renditions got their 100× point in r5 (10 M events,
watermark-gated plans); the BATCH analogs over the same table —
flagship tumbling agg, multi-resolution rollup, OHLC, rate-of-change,
retention tiers, sessionization, the map-explode parse — only had 10×
(and the r3 hot-key skew rehearsal). This closes that gap with the
same method as the other family probes: registered queries UNCHANGED
against a `make_scaled_sf.py --tables=events` K=100 replication of
sf0.1 (10 M events, TIMESTAMP(NANOS) physical type preserved via
pyarrow), full plan into a noop sink, heaviest-stage max-task share
from the UI REST API.

Growth profile note: the arrow replication shifts event_id/user_id per
copy (cardinality ×100, per-user volume constant) and keeps timestamps
— so per-window volume grows 100× (the window-agg stressor) while
per-user session row counts stay fixed (the hot-key case is the r3
skew rehearsal's separate fixture).

Usage:
    python scripts/make_scaled_sf.py 100 /root/testdata/sf0.1 \
        /root/repo/.scratch/sf10_events --tables=events
    python scripts/rehearse_timeseries_100x.py [/root/repo/.scratch/sf10_events]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rehearse_100x import _stage_metrics  # noqa: E402 — shared probe helper

PROBE_QUERIES = [
    "events_tumbling_agg",        # flagship: window bucket × type hash agg
    "timeseries_multi_rollup",    # GROUPING SETS: two resolutions, one shuffle
    "timeseries_ohlc",            # (series, bucket) shuffle feeds ranks + agg
    "timeseries_rate_of_change",  # lag window per user — bounded partitions
    "events_retention_tiers",     # broadcast one-row max + single scan
    "batch_sessionization",       # gaps-and-islands, per-user windows
    "batch_sessionization_sliced",  # the skew-proof two-phase twin
    "map_dimensions_long_form",   # render → parse → explode map → count
    "agg_distinct_users",         # distinct agg expand path
    "window_lag_event_gaps",      # lag/lead over (user, ts) — full-width output
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scratch/sf10_events"

    from kda_flink_app_timestream_spark.plans import load_all_plans
    from kda_flink_app_timestream_spark.session import build_spark

    registry = load_all_plans()
    spark = build_spark(
        app_name="rehearse-timeseries-100x", **{"spark.ui.enabled": "true"}
    )

    n_ev = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    print(f"events: {n_ev} rows at {sf_dir}", flush=True)

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
