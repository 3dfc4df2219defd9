"""Scale rehearsal for the two watermark-gated streaming flagships
(`stream_leftouter_interval_join`, `stream_session_append_finalized`)
against a `make_scaled_sf.py --tables=events` replication — the r8
fourth-decade runner (1×/10× from r4, 100× from r6 used ad-hoc
invocations; this pins the method in a committed harness).

Each query runs exactly as the driver would call it — the registered
catalog fn on a `build_spark` session — then the returned batch frame
is counted (the answer at 1000× is ~10⁸ rows; counting measures the
full plan without driver-collecting the result). The staged stream
machinery inside the fn does the real work: 4-file split staged to
/tmp, maxFilesPerTrigger=1, 8 state partitions, watermark-gated
finalization across ≥4 genuine micro-batches.

Usage:
    python scripts/make_scaled_sf.py 1000 /root/testdata/sf0.1 \
        /root/repo/.scratch/sf100_events --tables=events
    SPARK_GRAFT_DRIVER_MEM=64g python scripts/rehearse_streaming_scale.py \
        [/root/repo/.scratch/sf100_events] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_QUERIES = (
    "stream_leftouter_interval_join",
    "stream_session_append_finalized",
)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scratch/sf100_events"
    names = sys.argv[2:] or list(DEFAULT_QUERIES)

    from kda_flink_app_timestream_spark.plans import load_all_plans
    from kda_flink_app_timestream_spark.session import build_spark

    registry = load_all_plans()
    # the staged stream queries land each micro-batch in a MEMORY sink
    # (the driver-twin harness device — production uses real sinks), so
    # the driver's task-result budget must be sized to the ANSWER: at
    # 1000x the finalized-session answer is ~10^8 rows and the default
    # 1g maxResultSize kills the final micro-batch (measured r8)
    spark = build_spark(
        app_name="rehearse-streaming-scale",
        **{"spark.driver.maxResultSize": "16g"},
    )
    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    print(f"events rows: {n_events}", flush=True)

    # optional override probing the r4 state-sizing rule at scale
    # (state partitions ∝ state volume): STREAM_STATE_PARTITIONS=32 ...
    sp = os.environ.get("STREAM_STATE_PARTITIONS")
    if sp:
        from kda_flink_app_timestream_spark.plans import streaming_queries

        streaming_queries.STREAM_STATE_PARTITIONS = int(sp)
        print(f"state partitions overridden to {sp}", flush=True)

    for name in names:
        t0 = time.perf_counter()
        df = registry[name].fn(spark, sf_dir)
        n = df.count()
        wall = round(time.perf_counter() - t0, 1)
        print(f"{name}: {wall}s, {n} rows emitted", flush=True)
        spark.catalog.clearCache()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
