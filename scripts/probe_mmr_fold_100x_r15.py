#!/usr/bin/env python
"""100× probe of the r14 MMR fold + fused IVF-PQ training shapes
(VERDICT r14 'Next round' #9): confirm on the 200 k-vector replicated
fixture that the single-exchange MMR re-rank and the one-job-per-round
fused training hold at scale (no AQE surprise), and record wall times
plus the exchange count from the executed plan.

Usage: python scripts/probe_mmr_fold_100x_r15.py [SCALED_DIR]
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
    scaled = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, ".scratch", "sf10_docs"
    )
    from pyspark.sql import functions as F

    from kda_flink_app_timestream_spark.operators.ivfpq import (
        ivfpq_refined_topk,
    )
    from kda_flink_app_timestream_spark.operators.mmr import mmr_over_candidates
    from kda_flink_app_timestream_spark.session import build_spark, release_deferred

    spark = build_spark(app_name="probe-mmr-fold-100x-r15")
    e = spark.read.parquet(f"{scaled}/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 20)
    out: dict = {"corpus_rows": e.count()}

    # composed retrieval: trained IVF-PQ (fused training) -> MMR fold,
    # the sim_mmr_over_ivfpq shape at its swept knobs
    spark.sparkContext.setJobDescription("r15:100x:composed-retrieval")
    t0 = time.perf_counter()
    ann = ivfpq_refined_topk(e, q, k=20, nprobe=6, shortlist=200).select(
        "query_id", F.col("neighbor_id").alias("cand_id")
    )
    df = mmr_over_candidates(e, q, ann)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    out["plan_exchanges"] = plan.count("Exchange")
    out["plan_lines"] = len(plan.splitlines())
    with open(os.path.join(REPO, "plans", "r15", "mmr_over_ivfpq_100x.txt"), "w") as f:
        f.write(plan)
    df.write.format("noop").mode("overwrite").save()
    out["composed_wall_s"] = round(time.perf_counter() - t0, 2)
    release_deferred()
    spark.catalog.clearCache()

    # warm second run (steady-state band)
    t0 = time.perf_counter()
    ann = ivfpq_refined_topk(e, q, k=20, nprobe=6, shortlist=200).select(
        "query_id", F.col("neighbor_id").alias("cand_id")
    )
    mmr_over_candidates(e, q, ann).write.format("noop").mode("overwrite").save()
    out["composed_wall_s_warm"] = round(time.perf_counter() - t0, 2)
    release_deferred()
    spark.catalog.clearCache()

    spark.sparkContext.setLogLevel("OFF")
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
