#!/usr/bin/env python
"""Phase decomposition of the trained-IVFPQ fixed per-invocation cost
(guide §1: measure first — VERDICT r14 'Next round' #2).

Splits one sim_ivfpq_refined_topk-shaped invocation into
  train   — ivfpq_refined_train (2 collect jobs + their plan analysis)
  encode  — ivfpq_refined_encode expression construction (no job)
  search  — ivfpq_refined_search expression construction (no job)
  exec    — the noop-sink write (optimize + codegen + run)
and cProfiles the driver-side Python to attribute construction time
(py4j vs string building vs parse). Prints one JSON line.

Usage: python scripts/profile_refined_r15.py [SF_DIR] [N_REPS]
"""

from __future__ import annotations

import cProfile
import io
import json
import os
import pstats
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from pyspark.sql import functions as F

    from kda_flink_app_timestream_spark.operators.ivfpq import (
        PQT_SHORTLIST,
        _quantized,
        ivfpq_refined_encode,
        ivfpq_refined_search,
        ivfpq_refined_train,
    )
    from kda_flink_app_timestream_spark.session import (
        build_spark,
        defer_release,
        release_deferred,
    )
    from kda_flink_app_timestream_spark.sources.batch import load_table

    spark = build_spark(app_name="profile-refined-r15")
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    results = []
    for rep in range(reps):
        release_deferred()
        spark.catalog.clearCache()
        e = load_table(spark, sf_dir, "embeddings")
        q = e.filter(F.col("vec_id") < 20)

        t = {}
        t0 = time.perf_counter()
        pts = e.select(
            F.col("vec_id").alias("pid"), _quantized("embedding").alias("qv")
        ).cache()
        defer_release(pts)
        coarse, cbs = ivfpq_refined_train(e, pts=pts)
        t["train"] = round(time.perf_counter() - t0, 3)

        t0 = time.perf_counter()
        encoded = ivfpq_refined_encode(e, coarse, cbs, pts=pts)
        t["encode_build"] = round(time.perf_counter() - t0, 3)

        t0 = time.perf_counter()
        df = ivfpq_refined_search(
            encoded, e, q, coarse, cbs, k=5, shortlist=PQT_SHORTLIST
        )
        t["search_build"] = round(time.perf_counter() - t0, 3)

        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t["exec"] = round(time.perf_counter() - t0, 3)
        t["total"] = round(sum(t.values()), 3)
        results.append(t)
        print(f"rep{rep}: {t}", file=sys.stderr)

    # cProfile one more full build (no exec) to attribute construction
    release_deferred()
    spark.catalog.clearCache()
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 20)
    prof = cProfile.Profile()
    prof.enable()
    pts = e.select(
        F.col("vec_id").alias("pid"), _quantized("embedding").alias("qv")
    ).cache()
    defer_release(pts)
    coarse, cbs = ivfpq_refined_train(e, pts=pts)
    encoded = ivfpq_refined_encode(e, coarse, cbs, pts=pts)
    df = ivfpq_refined_search(encoded, e, q, coarse, cbs, k=5)
    prof.disable()
    buf = io.StringIO()
    stats = pstats.Stats(prof, stream=buf).sort_stats("cumulative")
    stats.print_stats(30)
    print(buf.getvalue(), file=sys.stderr)

    spark.sparkContext.setLogLevel("OFF")
    print(json.dumps({"sf_dir": sf_dir, "phases": results}))
    spark.stop()


if __name__ == "__main__":
    main()
