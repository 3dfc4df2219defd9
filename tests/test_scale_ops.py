"""Plan-level assertions for the scale operators: bucketed joins must
not shuffle, salted joins must stay correct, and the headline queries'
plans must show pushdown/broadcast/codegen."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kda_flink_app_timestream_spark.operators.scale import (
    salted_join,
    sessionize_sliced,
    write_bucketed,
)
from kda_flink_app_timestream_spark.plans import load_all_plans
from kda_flink_app_timestream_spark.sources.batch import load_table

REGISTRY = load_all_plans()


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    write_bucketed(o, "b_orders", ["o_orderkey"], 8, sort_cols=["o_orderkey"])
    write_bucketed(
        li.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem",
        ["o_orderkey"],
        8,
        sort_cols=["o_orderkey"],
    )
    # at test scale the planner would broadcast instead (cheaper for tiny
    # tables, and it disables bucketing); force the SMJ path the bucketed
    # layout exists for — at 100 TB neither side broadcasts anyway
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("b_orders").join(spark.table("b_lineitem"), "o_orderkey")
        plan = _physical_plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
        plain = o.join(li, o.o_orderkey == li.l_orderkey).count()
        assert joined.count() == plain
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE b_orders")
        spark.sql("DROP TABLE b_lineitem")


def test_salted_join_matches_plain_join(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    plain = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("t"))
    )
    salted = (
        salted_join(
            o.withColumnRenamed("o_custkey", "k"),
            c.withColumnRenamed("c_custkey", "k"),
            "k",
            salt_buckets=4,
        )
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("t"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_rejects_right_preserving_joins(spark):
    """Replicating the right side once per salt would emit every
    UNMATCHED right row salt_buckets times under right/full outer —
    those join types must be refused, not silently corrupted."""
    l = spark.createDataFrame([(1, "a")], ["k", "v"])
    r = spark.createDataFrame([(2, "b")], ["k", "w"])
    for how in ("right", "right_outer", "full", "full_outer", "outer", "cross"):
        with pytest.raises(ValueError, match="left-preserving"):
            salted_join(l, r, "k", salt_buckets=4, how=how)
    # left-preserving forms still work
    assert salted_join(l, r, "k", salt_buckets=4, how="left").count() == 1
    assert salted_join(l, r, "k", salt_buckets=4, how="left_anti").count() == 1


@pytest.mark.parametrize(
    "name,expectations",
    [
        ("q1_pricing_summary", ["PushedFilters: [IsNotNull(l_shipdate)", "HashAggregate"]),
        ("q3_shipping_priority", ["BroadcastHashJoin", "TakeOrderedAndProject"]),
        ("q5_region_revenue", ["BroadcastHashJoin"]),
        ("sort_top10_orders", ["TakeOrderedAndProject"]),
        ("window_topk_orders_per_customer", ["Window", "row_number()"]),
        # r3 additions: the scale-critical shapes must stay in the plan
        ("text_bpe_pair_merges", ["TakeOrderedAndProject", "HashAggregate"]),
        # the RP matrix is inlined literals — no join, no exchange before the explode
        ("sim_random_projection", ["Generate", "Scan parquet"]),
        # posting-list jaccard: the index shuffles ONCE into the
        # collect_list aggregate; candidates explode from it (no index
        # self-join = no second Exchange of the index)
        ("dedup_ngram_jaccard_pairs", ["ObjectHashAggregate", "Generate"]),
        # skew-proof sessionization: phase-1 window must partition on
        # (user, slice) — the bound that keeps a hot user off one task
        ("batch_sessionization_sliced", ["Window", "__slice#"]),
        # r4 additions: OHLC must keep window + final agg in one
        # partitioning; funnel stages are hash aggregates over user_id
        ("timeseries_ohlc", ["Window", "HashAggregate"]),
        ("events_funnel_conversion", ["HashAggregate"]),
        # r5 additions: the typed-measure projection must stay a pure
        # scan-side projection (no Exchange anywhere), and the image
        # decode must be a shuffle-free chain of Arrow stages
        ("parse_typed_measures", ["Scan parquet", "Project"]),
        ("multimodal_image_decode", ["MapInPandas", "Scan parquet"]),
    ],
)
def test_headline_plans_have_expected_operators(spark, sf_dir, name, expectations):
    df = REGISTRY[name].fn(spark, sf_dir)
    plan = _physical_plan(df)
    for token in expectations:
        assert token in plan, f"{name}: expected {token!r} in plan:\n{plan[:2000]}"


def test_partitioned_write_prunes_partitions(spark, sf_dir, tmp_path):
    """Date-partitioned parquet layout: a day-filtered read must show
    PartitionFilters (whole directories skipped) — the dominant 100 TB
    time-series access pattern the sink's output layout exists for."""
    from kda_flink_app_timestream_spark.sources.batch import load_table

    out = str(tmp_path / "events_by_day")
    e = load_table(spark, sf_dir, "events")
    e.withColumn("day", F.to_date("ts")).write.partitionBy("day").parquet(out)

    back = spark.read.parquet(out).filter(F.col("day") == "2024-01-05")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(day" in plan, plan[:1500]
    assert "(day#" in plan and "= 2024-01-05)" in plan
    expected = e.filter(F.to_date("ts") == "2024-01-05").count()
    assert back.count() == expected > 0


def test_salted_join_spreads_hot_key(spark, sf_dir):
    """The reason salting exists: a hot key's rows must land on MANY
    reducers after salting, not one. events.event_type has 5 distinct
    values, so unsalted hash partitioning puts each key in exactly one
    partition; salted, each key must occupy > 1 (spread over up to
    salt_buckets)."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type")
    dim = ev.groupBy("event_type").agg(F.count("*").alias("n"))
    joined = salted_join(ev, dim.hint("shuffle_hash"), "event_type", salt_buckets=8)
    # AQE would re-coalesce this test-scale shuffle into one partition
    # and hide the spread being asserted (at 100 TB it has no reason to)
    prev = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        spread = (
            joined.withColumn("part", F.spark_partition_id())
            .groupBy("event_type")
            .agg(F.countDistinct("part").alias("n_parts"))
            .collect()
        )
    finally:
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", prev)
    assert spread, "no rows joined"
    for row in spread:
        assert row["n_parts"] > 1, f"hot key {row['event_type']} on one reducer"


def _naive_sessions(rows, gap_s=1800):
    """Reference sessionization: per user, sorted by (ts, event_id),
    split where the gap >= gap_s. Returns {(user, start, end, n)}."""
    by_user = {}
    for uid, ts, eid in rows:
        by_user.setdefault(uid, []).append((ts, eid))
    out = set()
    for uid, evts in by_user.items():
        evts.sort()
        start, last, n = evts[0][0], evts[0][0], 1
        for ts, _ in evts[1:]:
            if (ts - last).total_seconds() >= gap_s:
                out.add((uid, start, last, n))
                start, n = ts, 0
            last = ts
            n += 1
        out.add((uid, start, last, n))
    return out


def test_sessionize_sliced_matches_global_and_bounds_tasks(spark):
    """The r3 skew rehearsal's residual scale-killer, closed: an 80%-hot
    user must NOT concentrate into one window task. Asserts (a) exact
    session equivalence with a naive reference on a border-heavy
    fixture, and (b) the phase-1 shuffle key (user, hour-slice) bounds
    every group far below the hot user's total, while phase-2 input is
    per-session summaries, bounded by slices+sessions — not events."""
    from datetime import datetime, timedelta

    base = datetime(2024, 3, 1)
    rows = []
    # hot user 0: 8000 events over ~54 h, 20 s spacing with a >=30 min
    # jump every 500 events → sessions continuously cross hour borders
    t = base
    for i in range(8000):
        rows.append((0, t, i))
        t += timedelta(seconds=20 if (i + 1) % 500 else 2100)
    # cold users: a few events each, mixed gaps
    for u in range(1, 21):
        t = base + timedelta(minutes=u)
        for i in range(20):
            rows.append((u, t, 100_000 + u * 100 + i))
            t += timedelta(seconds=300 if i % 3 else 2400)
    # hand-placed border/precision cases
    rows += [
        # gap 90 s across an hour border → one session
        (100, base + timedelta(minutes=59), 1), (100, base + timedelta(minutes=60, seconds=30), 2),
        # gap 100 min with an empty middle slice → two sessions
        (101, base + timedelta(minutes=10), 3), (101, base + timedelta(minutes=110), 4),
        # exactly-at-gap and 1 µs inside the gap
        (103, base, 5),
        (103, base + timedelta(seconds=1799, microseconds=999_999), 6),  # merges
        (103, base + timedelta(seconds=1799 + 1800, microseconds=999_999), 7),  # diff == 1800 s → new
    ]
    df = spark.createDataFrame(
        [(u, ts, e) for u, ts, e in rows], "user_id long, ts timestamp, event_id long"
    )
    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in sessionize_sliced(df).collect()
    }
    assert got == _naive_sessions(rows)

    # per-task bound: the hot user's 8000 rows spread over its hour
    # slices — no (user, slice) group may approach the per-user total
    slice_sizes = (
        df.groupBy("user_id", F.expr("unix_micros(ts) div 3600000000").alias("s"))
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert slice_sizes <= 500, f"hot slice too large: {slice_sizes}"
    # phase-2 input is summaries: bounded by slices + sessions, << events
    n_hot_sessions = sum(1 for s in got if s[0] == 0)
    n_hot_slices = df.filter("user_id = 0").select(
        F.expr("unix_micros(ts) div 3600000000")
    ).distinct().count()
    assert n_hot_sessions + n_hot_slices < 100  # vs 8000 events


def test_runtime_bloom_filter_prunes_probe_side(spark, sf_dir):
    """Runtime semi-join reduction: a selective filter on the build side
    should inject a bloom filter into the probe side's scan stage, so
    at 100 TB the fact table drops non-qualifying rows BEFORE the join
    shuffle. Spark only injects when the probe side looks expensive
    (applicationSideScanSizeThreshold defaults to 10 GB), so the
    thresholds are pinned here to what a real deployment would see."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        li = load_table(spark, sf_dir, "lineitem")
        o = load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = li.join(o, li.l_orderkey == o.o_orderkey)
        optimized = j._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom" in optimized.lower(), optimized[:2000]
        expected = (
            load_table(spark, sf_dir, "lineitem")
            .join(
                load_table(spark, sf_dir, "orders").filter(
                    F.col("o_orderpriority") == "1-URGENT"
                ),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .count()
        )
        assert j.count() == expected > 0
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_ivf_partitioned_index_prunes_probe_scan(spark, sf_dir, tmp_path):
    """The IVF docstring's 100 TB claim, proven: persist the corpus
    partitioned by its IVF cell, probe with a cell filter, and the scan
    must read ONLY the probed partitions (partition pruning), not the
    whole index."""
    from pyspark.sql import functions as F

    from kda_flink_app_timestream_spark.operators.similarity import (
        _collect_centroids,
        _nearest_centroids,
        as_double,
        ivf_centroids,
        norm_unrolled,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = _collect_centroids(ivf_centroids(emb))
    c = emb.select(
        F.col("vec_id").alias("__vid"), as_double(F.col("embedding")).alias("cv")
    ).withColumn("cn", norm_unrolled("cv", 64))
    assigned = _nearest_centroids(c, cents, "cv", "cn", 1).select("__vid", "cv", "cid")

    out = str(tmp_path / "ivf_index")
    assigned.write.mode("overwrite").partitionBy("cid").parquet(out)

    n_cells = assigned.select("cid").distinct().count()
    assert n_cells > 2, "fixture degenerate: need >2 cells to prove pruning"

    probe_cells = [r["cid"] for r in assigned.select("cid").distinct().limit(2).collect()]
    probe = spark.read.parquet(out).filter(F.col("cid").isin(probe_cells))

    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cid" in plan, plan[:500]
    # the cell filter must be a PARTITION filter (directory pruning),
    # not a post-scan data filter over all files
    assert "PushedFilters: []" in plan or "cid" not in plan.split("PushedFilters")[-1][:80], plan[:800]
    expected = assigned.filter(F.col("cid").isin(probe_cells)).count()
    assert probe.count() == expected > 0


def test_scatter_bypasses_streaming_frames(spark):
    """BACKLOG r6 #7, generalized in r8: scatter() on a STREAMING frame
    must be the identity — its width probe (inputFiles) is meaningless
    on a streaming plan and the fallback repartition(defaultParallelism)
    would land ahead of the deliberately-small streaming state
    partitioning. Pinned here at the shared operator (not per call
    site), so any future operator calling scatter on a stream inherits
    the bypass."""
    from kda_flink_app_timestream_spark.sources.batch import scatter

    sdf = spark.readStream.format("rate").option("rowsPerSecond", 1).load()
    assert scatter(sdf) is sdf


def test_scatter_detects_small_file_bin_packing(spark, tmp_path):
    """ADVICE r3 #3: many SMALL files bin-pack into few FilePartitions,
    so a raw file-count probe can skip the repartition while real scan
    parallelism is far below target — scatter must see through the
    packing. 64 tiny files >= target 32 by count, but they pack into ~1
    partition by size, so scatter must still repartition; a genuinely
    wide input (estimate >= target) must be left alone."""
    from kda_flink_app_timestream_spark.sources.batch import (
        _packed_scan_width,
        scatter,
    )

    out = str(tmp_path / "tiny")
    spark.range(64).repartition(64).write.parquet(out)
    df = spark.read.parquet(out)
    n_files = len(df.inputFiles())
    assert n_files >= 32

    # the estimate's exact value depends on defaultParallelism (Spark's
    # maxSplitBytes formula divides by it), so assert the invariant that
    # holds in ANY environment — packing detected, far below file count —
    # and pick the scatter target RELATIVE to the estimate so the
    # repartition decision under test is deterministic
    est = _packed_scan_width(spark, df.inputFiles())
    assert est < n_files, f"packing-aware estimate should see packing, got {est}"

    target = max(est * 2, est + 4)
    assert n_files >= target  # the old count-only probe would skip here
    scattered = scatter(df, partitions=target)
    assert scattered.rdd.getNumPartitions() == target

    # fixture sanity: the 64 files really are tiny (packing is real)
    import os
    sizes = sum(os.path.getsize(os.path.join(out, f))
                for f in os.listdir(out) if f.endswith(".parquet"))
    assert sizes < 32 * 1024 * 1024


def test_model_inference_plan_is_shuffle_free(spark, sf_dir):
    """The inference query's whole claim is 'model scoring at scan
    speed': the physical plan must be a single scan-side projection —
    no Exchange, no Python evaluation node."""
    df = REGISTRY["text_model_inference"].fn(spark, sf_dir)
    plan = _physical_plan(df)
    assert "Exchange" not in plan, plan[:1500]
    assert "Scan parquet" in plan
    assert "Python" not in plan


def test_ohlc_reuses_one_partitioning(spark, sf_dir):
    """OHLC's window ranks and final aggregate share the same keys
    (series, bucket) — exactly ONE shuffle may appear in the plan."""
    df = REGISTRY["timeseries_ohlc"].fn(spark, sf_dir)
    plan = _physical_plan(df)
    assert plan.count("Exchange hashpartitioning") == 1, plan[:2000]


def test_connected_components_star_vs_truth_and_path_depth(spark):
    """The production CC is large-star/small-star (O(log n) rounds,
    Kiveris et al. SoCC'14). Three pins:

    1. exact agreement with driver-side union-find truth on a random
       graph, a hub star, self-loops, and multi-component inputs;
    2. the chained-path counter-example (VERDICT r4): a 40-node path
       with permuted ids — min-label propagation capped at 5 rounds
       RAISES (needs O(path length) rounds), while the star contraction
       converges within 8 (~log2 40 alternations) and is exact;
    3. both implementations agree where propagation converges.
    """
    import random

    from kda_flink_app_timestream_spark.operators.dedup import (
        connected_components,
        connected_components_propagation,
    )

    def truth(edges):
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            if a == b:
                continue
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        return {n: find(n) for n in parent}

    rng = random.Random(7)
    cases = {
        "two_components": [(1, 2), (2, 3), (10, 11)],
        "self_loop_mix": [(5, 5), (5, 6), (7, 8)],
        "random": [(rng.randrange(300), rng.randrange(300)) for _ in range(240)],
        "star_hub": [(0, i) for i in range(1, 60)],
    }
    for name, edges in cases.items():
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {
            r["node"]: r["cluster_rep"] for r in connected_components(df).collect()
        }
        assert got == truth(edges), name

    perm = list(range(1, 41))
    rng.shuffle(perm)
    path_edges = [(perm[i], perm[i + 1]) for i in range(len(perm) - 1)]
    pdf = spark.createDataFrame(path_edges, "src long, dst long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components_propagation(pdf, max_iter=5)
    star = {
        r["node"]: r["cluster_rep"]
        for r in connected_components(pdf, max_iter=8).collect()
    }
    assert star == truth(path_edges)

    small = spark.createDataFrame(cases["two_components"], "src long, dst long")
    prop = {
        r["node"]: r["cluster_rep"]
        for r in connected_components_propagation(small).collect()
    }
    assert prop == truth(cases["two_components"])


def test_aqe_skew_join_splits_hot_key_unsalted(spark):
    """Production guidance, measured (VERDICT r4 #8): for pure JOIN
    skew, AQE's skew-join handles a pathological hot key UNSALTED — the
    final adaptive plan carries SortMergeJoin(skew=true) with a skewed
    AQEShuffleRead, i.e. the hot partition was split at runtime without
    any manual salting — and the result matches the logical join. The
    skew thresholds here are scaled to test data volume (64KB where
    production defaults are 256MB; the *ratio* partition/median that
    triggers the split is the same mechanism). Manual salting
    (``salted_join``) remains the tool for the cases AQE cannot split:
    WINDOW/groupBy partitions and joins below its size thresholds."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        # one hot key carrying 200k of ~201k rows — the unsalted hash
        # partitioning sends it all to a single reducer
        big = spark.range(0, 200_000).select(
            (F.col("id") * 0).alias("k"), F.col("id").alias("v")
        ).union(
            spark.range(0, 800).select((F.col("id") % 8 + 1).alias("k"), F.col("id").alias("v"))
        )
        dim = spark.range(0, 9).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("w")
        )
        joined = big.join(dim, "k").select(
            F.sum(F.col("v") + F.col("w")).alias("s"), F.count("*").alias("n")
        )
        row = joined.collect()[0]
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, "AQE did not split the hot partition"
        assert "skewed" in plan, "no skewed AQEShuffleRead in the final plan"
        # correctness unchanged by the runtime split
        expected_n = 200_000 + 800
        expected_s = sum(range(200_000)) + 0 * 200_000 + sum(
            (i % 8 + 1) * 10 + i for i in range(800)
        )
        assert (row["n"], row["s"]) == (expected_n, expected_s)
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_typed_measures_and_decode_are_exchange_free(spark, sf_dir):
    """The two r5 projection-shaped queries must plan with ZERO
    key-based shuffles: typed measures is a scan-side CASE WHEN
    projection (no Exchange at all); image decode is mapInPandas
    chained on the scan — its only Exchange is ``scatter``'s deliberate
    round-robin that spreads the CPU-bound codec over cores (a
    REPARTITION_BY_NUM, never a hash partitioning)."""
    plan = _physical_plan(REGISTRY["parse_typed_measures"].fn(spark, sf_dir))
    assert "Exchange" not in plan, f"typed measures shuffles:\n{plan[:1500]}"

    plan = _physical_plan(REGISTRY["multimodal_image_decode"].fn(spark, sf_dir))
    assert "hashpartitioning" not in plan, f"decode hash-shuffles:\n{plan[:1500]}"
    assert plan.count("Exchange") == plan.count("RoundRobinPartitioning"), (
        f"decode has a non-scatter Exchange:\n{plan[:1500]}"
    )
