"""100× dress rehearsal of the two dedup flagships (VERDICT r3 #5).

Runs against a `make_scaled_sf.py --tables=documents,embeddings`
replication (default K=100 of sf0.1 ⇒ 500 k docs / 200 k vectors,
"sf10" for these tables) and records, per flagship:

- wall time of the full plan (noop sink — measures the plan, not
  collect),
- the heaviest stage's task-time distribution from Spark's REST API:
  max-task share (max task duration / stage total) is the skew
  indicator — a share near 1/num_tasks is perfectly balanced; a share
  near 1.0 is a single-task bottleneck.

The n-gram Jaccard flagship runs AFTER the documented production
composition (SCALE.md r2 #4): exact-dedup collapse first — the K-copy
clique never reaches the near-dup stage; the collapse itself is timed
too. SemDeDup-scaled runs directly on the 200 k-vector corpus
(k ∝ corpus ⇒ ~780 clusters).

Usage:
    python scripts/make_scaled_sf.py 100 /root/testdata/sf0.1 \
        /root/repo/.scratch/sf10_docs --tables=documents,embeddings
    python scripts/rehearse_100x.py [/root/repo/.scratch/sf10_docs]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def _stage_metrics(spark, since_ms: float) -> dict:
    """Heaviest completed stage since `since_ms` (epoch millis):
    max-task share via the UI REST API."""
    try:
        base = spark.sparkContext.uiWebUrl
        app_id = spark.sparkContext.applicationId
        stages = json.loads(
            urllib.request.urlopen(
                f"{base}/api/v1/applications/{app_id}/stages?status=complete",
                timeout=10,
            ).read()
        )
        import datetime as dt

        def sub_ms(s):
            t = s.get("submissionTime")
            if not t:
                return 0
            return dt.datetime.strptime(
                t.replace("GMT", "+0000"), "%Y-%m-%dT%H:%M:%S.%f%z"
            ).timestamp() * 1000

        recent = [s for s in stages if sub_ms(s) >= since_ms]
        if not recent:
            return {}
        top = max(recent, key=lambda s: s.get("executorRunTime", 0))
        summary = json.loads(
            urllib.request.urlopen(
                f"{base}/api/v1/applications/{app_id}/stages/"
                f"{top['stageId']}/{top['attemptId']}/taskSummary"
                "?quantiles=0.0,0.5,1.0",
                timeout=10,
            ).read()
        )
        durs = summary.get("executorRunTime", [0, 0, 0])
        total = top.get("executorRunTime", 0) or 1
        return {
            "stage": top["stageId"],
            "num_tasks": top.get("numCompleteTasks"),
            "stage_total_ms": total,
            "task_ms_median": durs[1],
            "task_ms_max": durs[2],
            "max_task_share": round(durs[2] / total, 3),
        }
    except Exception as ex:  # UI disabled / format drift: report, don't fail
        return {"error": str(ex)[:200]}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scratch/sf10_docs"

    from kda_flink_app_timestream_spark.plans import load_all_plans
    from kda_flink_app_timestream_spark.session import build_spark

    registry = load_all_plans()
    # UI on: the REST API is the task-time-distribution source
    spark = build_spark(app_name="rehearse-100x", **{"spark.ui.enabled": "true"})
    results: dict[str, dict] = {}

    def run(name: str, fn) -> None:
        t0 = time.perf_counter()
        since = time.time() * 1000
        df = fn()
        df.write.format("noop").mode("overwrite").save()
        elapsed = round(time.perf_counter() - t0, 2)
        results[name] = {"sec": elapsed, **_stage_metrics(spark, since)}
        print(f"{name}: {results[name]}", flush=True)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()

    # production composition: exact collapse BEFORE near-dup — timed as
    # the parquet write itself (one execution; a separate noop-timed run
    # would execute the heaviest text shuffle twice)
    collapsed_dir = f"{sf_dir}/__collapsed"
    collapsed = docs.groupBy("text").agg(
        F.min("doc_id").alias("doc_id"),
        F.first("lang").alias("lang"),
        F.first("source").alias("source"),
        F.first("n_chars").alias("n_chars"),
    ).select("doc_id", "text", "lang", "source", "n_chars")
    t0 = time.perf_counter()
    since = time.time() * 1000
    collapsed.write.mode("overwrite").parquet(f"{collapsed_dir}/documents.parquet")
    results["exact_collapse"] = {
        "sec": round(time.perf_counter() - t0, 2),
        **_stage_metrics(spark, since),
    }
    print(f"exact_collapse: {results['exact_collapse']}", flush=True)
    n_unique = spark.read.parquet(f"{collapsed_dir}/documents.parquet").count()

    run(
        "dedup_ngram_jaccard_pairs(collapsed)",
        lambda: registry["dedup_ngram_jaccard_pairs"].fn(spark, collapsed_dir),
    )
    run(
        "dedup_semantic_prune_scaled",
        lambda: registry["dedup_semantic_prune_scaled"].fn(spark, sf_dir),
    )
    run(
        "dedup_semantic_prune_twolevel",
        lambda: registry["dedup_semantic_prune_twolevel"].fn(spark, sf_dir),
    )

    print(
        json.dumps(
            {
                "rehearsal": "100x-docs-embeddings",
                "sf_dir": sf_dir,
                "n_docs": n_docs,
                "n_unique_docs": n_unique,
                "n_vectors": spark.read.parquet(
                    f"{sf_dir}/embeddings.parquet"
                ).count(),
                "results": results,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
