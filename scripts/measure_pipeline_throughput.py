"""Sustained end-to-end throughput of the reference pipeline (r7).

The reference publishes no benchmark numbers (BASELINE.md), but the
mandate is to match-or-beat its single-node throughput. Its ceiling is
structural: the generator produces ONE record per ``put_records`` call
(timestream_kinesis_data_gen.py:83-84 — hundreds of rec/s at best),
the consumer polls each shard at 1000 ms / 10 000 records
(StreamingJob.java:90-94 ⇒ ≤ 10 k rec/s/shard), and the window is a
parallelism-1 ``windowAll`` (StreamingJob.java:148).

This probe measures OUR full pipeline — rate source rendering the
exact reference record template → gzip-free parse (pure codegen) →
watermark → late split → batching JSONL sink (50-record chunks, the
reference's TimestreamIngestBatchSize) — at increasing source rates,
reporting the sustained ``processedRowsPerSecond`` from the engine's
own progress metrics plus the rows actually landed in the sink.

Usage: python scripts/measure_pipeline_throughput.py [rates...]
       # default rates: 20000 50000 100000 rows/sec, ~40 s each
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_rate(spark, rate: int, seconds: int = 40, percent_late: float = 0.0) -> dict:
    from kda_flink_app_timestream_spark.streaming.pipeline import (
        start_reference_pipeline,
    )

    sink_dir = tempfile.mkdtemp(prefix=f"tput_sink_{rate}_")
    ckpt = tempfile.mkdtemp(prefix=f"tput_ckpt_{rate}_")
    late_counts: list[int] = []

    def late_sink(df, epoch_id):
        late_counts.append(df.count())

    query = start_reference_pipeline(
        spark,
        source_kind="rate",
        sink_dir=sink_dir,
        late_sink=late_sink,
        checkpoint_dir=ckpt,
        options={"rows_per_second": rate, "percent_late": percent_late},
    )
    try:
        time.sleep(seconds)
        prog = [p for p in query.recentProgress if p]
        # drop the warm-up batch(es): the first micro-batch pays plan
        # compilation and state init
        proc = [
            p["processedRowsPerSecond"]
            for p in prog[2:]
            if p.get("processedRowsPerSecond")
        ]
        landed = 0
        for f in glob.glob(os.path.join(sink_dir, "epoch=*", "*.jsonl")):
            with open(f) as fh:
                landed += sum(1 for _ in fh)
        return {
            "rate": rate,
            "batches": len(prog),
            "processed_rps_median": round(statistics.median(proc), 0) if proc else None,
            "processed_rps_max": round(max(proc), 0) if proc else None,
            "rows_landed": landed,
            "rows_late": sum(late_counts),
            "seconds": seconds,
        }
    finally:
        query.stop()
        shutil.rmtree(sink_dir, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def main() -> None:
    from kda_flink_app_timestream_spark.session import build_spark

    rates = [int(a) for a in sys.argv[1:]] or [20000, 50000, 100000]
    spark = build_spark(app_name="pipeline-throughput")
    for rate in rates:
        r = run_rate(spark, rate)
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
