#!/usr/bin/env python
"""r15 optimization-round measurement harness (guide §1).

Same methodology as scripts/measure_r14.py (min-of-N noop timings +
explain("formatted") captures, jobs labelled via setJobDescription),
pointed at ``plans/r15/``. Prints one JSON line.

Usage: python scripts/measure_r15.py TAG q1,q2,... [SF_DIR] [N_RUNS]
       # TAG is "before" or "after" (plan file suffix); "none" skips
       # the plan capture and only times.
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2].split(",")
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    n_runs = int(sys.argv[4]) if len(sys.argv) > 4 else 3

    from kda_flink_app_timestream_spark.plans import load_all_plans
    from kda_flink_app_timestream_spark.session import build_spark, release_deferred

    registry = load_all_plans()
    spark = build_spark(app_name=f"measure-r15-{tag}")
    # same warmup as bench.py: JVM + parquet footers + python workers
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    def _noop_batches(batches):
        import numpy  # noqa: F401

        yield from batches

    spark.range(spark.sparkContext.defaultParallelism * 4).repartition(
        spark.sparkContext.defaultParallelism
    ).mapInPandas(_noop_batches, "id long").write.format("noop").mode(
        "overwrite"
    ).save()

    plans_dir = os.path.join(REPO, "plans", "r15")
    os.makedirs(plans_dir, exist_ok=True)
    out: dict[str, dict] = {}
    for name in names:
        q = registry[name]
        spark.sparkContext.setJobDescription(f"r15:{tag}:{name}:plan-build")
        t0 = time.perf_counter()
        df = q.fn(spark, sf_dir)
        build_s = round(time.perf_counter() - t0, 3)
        if tag != "none":
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(plans_dir, f"{name}_{tag}.txt"), "w") as f:
                f.write(buf.getvalue())
        samples = []
        for i in range(n_runs):
            release_deferred()
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"r15:{tag}:{name}:run{i}")
            t0 = time.perf_counter()
            df = q.fn(spark, sf_dir)  # bench methodology: build + execute
            df.write.format("noop").mode("overwrite").save()
            samples.append(round(time.perf_counter() - t0, 3))
        release_deferred()
        spark.catalog.clearCache()
        out[name] = {
            "plan_build_s": build_s,
            "min": min(samples),
            "samples": samples,
        }
        print(f"{name}: min={min(samples)} samples={samples}", file=sys.stderr)
    spark.sparkContext.setLogLevel("OFF")
    print(json.dumps({"tag": tag, "sf_dir": sf_dir, "results": out}))
    spark.stop()


if __name__ == "__main__":
    main()
