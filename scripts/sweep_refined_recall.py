"""nprobe × shortlist sweep on the trained/refined IVF-PQ path
(VERDICT r13 #4): the composed retrieval's candidate recall@20 has a
thin per-query tail (mean 0.752, min 0.40 at sf0.01 — SCALE.md r13),
attributed to the nprobe=4/16 probe cap. This measures the knob
response: for each (nprobe, shortlist) in {4,6,8} × {100,200},
recall@MMR_N_CAND (mean AND min per query) against exact brute-force
truth, plus the QUERY-half wall time — training and encoding run ONCE
per corpus (they are config-independent: nprobe and shortlist are pure
search-time knobs), so the sweep isolates exactly what a deployed
stored index would re-pay per config.

Usage:
    python scripts/sweep_refined_recall.py recall /root/testdata/sf0.01
    python scripts/sweep_refined_recall.py recall /root/testdata/sf0.1
    python scripts/sweep_refined_recall.py cost /root/repo/.scratch/sf10_docs

`recall` reports the grid on a real (duplicate-free) fixture; `cost`
times the search half per config on the 200 k-vector replicated
fixture (recall there is meaningless — 100 identical copies per
vector — so only seconds are reported).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

N_QUERIES = 20
K = 20  # MMR_N_CAND — the candidate-stage width the composition consumes
GRID = [(np_, sl) for np_ in (4, 6, 8) for sl in (100, 200)]


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "recall"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

    from kda_flink_app_timestream_spark.operators.ivfpq import (
        ivfpq_refined_encode,
        ivfpq_refined_search,
        ivfpq_refined_train,
    )
    from kda_flink_app_timestream_spark.operators.similarity import brute_force_topk
    from kda_flink_app_timestream_spark.session import build_spark

    spark = build_spark(app_name="sweep-refined-recall")
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = e.count()
    probes = e.filter(F.col("vec_id") < N_QUERIES).cache()
    probes.count()

    # --- train + encode ONCE (config-independent halves) ---
    t0 = time.perf_counter()
    coarse, cbs = ivfpq_refined_train(e)
    encoded = ivfpq_refined_encode(e, coarse, cbs).cache()
    encoded.count()
    build_sec = round(time.perf_counter() - t0, 2)
    print(f"corpus={n} train+encode once: {build_sec}s", flush=True)

    truth: dict[int, set[int]] = {}
    if mode == "recall":
        for r in (
            brute_force_topk(e, probes, k=K)
            .select("query_id", "neighbor_id")
            .collect()
        ):
            truth.setdefault(r.query_id, set()).add(r.neighbor_id)

    results = []
    for nprobe, shortlist in GRID:
        df = ivfpq_refined_search(
            encoded, e, probes, coarse, cbs, k=K, nprobe=nprobe, shortlist=shortlist
        ).select("query_id", "neighbor_id")
        # min-of-2 on the query half: plan build + first-probe jitter
        secs = []
        rows = None
        for _ in range(2):
            t0 = time.perf_counter()
            rows = df.collect()
            secs.append(round(time.perf_counter() - t0, 2))
        entry = {
            "nprobe": nprobe,
            "shortlist": shortlist,
            "query_sec": min(secs),
            "query_sec_runs": secs,
        }
        if mode == "recall":
            got: dict[int, set[int]] = {}
            for r in rows:
                got.setdefault(r.query_id, set()).add(r.neighbor_id)
            recalls = [
                len(got.get(q, set()) & t) / len(t) for q, t in sorted(truth.items())
            ]
            entry.update(
                mean_recall=round(sum(recalls) / len(recalls), 3),
                min_recall=round(min(recalls), 3),
            )
        results.append(entry)
        print(json.dumps(entry), flush=True)

    print(json.dumps({"mode": mode, "sf_dir": sf_dir, "corpus": n,
                      "build_sec": build_sec, "grid": results}))


if __name__ == "__main__":
    main()
