"""Layout-management properties SQL can't express (plans/layout.py):
partition-directory structure, pruned input files, file counts, and
disjoint per-file clustering ranges. The CONTENT side of both rewrites
is oracle-checked by the catalog queries; these tests pin the layout
side."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from kda_flink_app_timestream_spark.plans import load_all_plans
from kda_flink_app_timestream_spark.plans.layout import (
    staged_compacted_events,
    staged_partitioned_events,
)
from kda_flink_app_timestream_spark.sources.batch import load_table

load_all_plans()


def test_partitioned_write_one_file_per_partition_dir(spark, sf_dir):
    """The repartition-by-partition-cols discipline: every hive
    partition directory holds exactly ONE data file (without the
    upstream repartition, every task writes into every dir — the
    small-file explosion this operator exists to prevent)."""
    stage = staged_partitioned_events(spark, sf_dir)
    # the stage writes with maxRecordsPerFile=2M, so a partition only
    # legitimately splits past 2M rows — way above any test fixture;
    # compute the allowance instead of hardcoding 1 so a scaled fixture
    # doesn't turn the desired re-split behavior into a failure
    n_events = load_table(spark, sf_dir, "events").count()
    max_files = max(1, -(-n_events // 2_000_000))  # ceil
    dirs = 0
    for root, _dirs, files in os.walk(stage):
        parts = [f for f in files if f.endswith(".parquet")]
        if parts:
            assert "day=" in root and "event_type=" in root, root
            assert len(parts) <= max_files, f"{root} has {len(parts)} files"
            dirs += 1
    # 5 event types × ~30 days of data
    assert dirs >= 100, f"only {dirs} partition dirs"


def test_partition_pruned_scan_carries_partition_filters(spark, sf_dir):
    """Partition pruning is a physical-scan property (``inputFiles()``
    lists the whole relation regardless of filters): the scan node must
    carry BOTH predicates as PartitionFilters — directory pruning at
    file-listing time — rather than a post-scan Filter over all ~150
    files. The matched files inside the filter are confirmed by reading
    the purchase subtree directly: only day-dirs in range carry the
    week's rows."""
    stage = staged_partitioned_events(spark, sf_dir)
    part = spark.read.parquet(stage)
    pruned = part.filter(
        (F.col("event_type") == "purchase")
        & (F.col("day") >= F.lit("2024-01-08").cast("date"))
        & (F.col("day") < F.lit("2024-01-15").cast("date"))
    )
    # widen metadata truncation for the assertion: the filter list is
    # cut at spark.sql.maxMetadataStringLength chars (default 100), and
    # in a long-lived session growing expression ids push the day
    # bounds past the cut (the suite-order flake this conf fixes)
    prev = spark.conf.get("spark.sql.maxMetadataStringLength")
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    try:
        plan = pruned._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.maxMetadataStringLength", prev)
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf, plan
    filters = pf[0]
    assert "event_type" in filters and "purchase" in filters, filters
    assert "2024-01-08" in filters and "2024-01-15" in filters, filters
    # a per-row (non-partition) filter must NOT remain: all predicates
    # are on partition columns, so the data-filter list is empty
    assert "DataFilters: []" in filters, filters
    # directory-level ground truth: the week's rows live in exactly the
    # 7 pruned day-dirs of the purchase subtree
    week = spark.read.parquet(f"{stage}/event_type=purchase").filter(
        (F.col("day") >= F.lit("2024-01-08").cast("date"))
        & (F.col("day") < F.lit("2024-01-15").cast("date"))
    )
    opened = {f.rsplit("/", 2)[-2] for f in week.inputFiles()}
    assert len(opened) <= 31  # whole purchase subtree is one month
    assert pruned.count() == week.count()


def test_compaction_halves_files_and_clusters_disjoint_ranges(spark, sf_dir):
    """Compaction's layout contract: 4 fragmented input files become 2,
    and because the rewrite is range-clustered on ts, the two files
    cover DISJOINT ts ranges — the property that lets parquet min/max
    stats skip whole files for time predicates. (Content equality is
    the catalog query's oracle check, not re-proven here.)"""
    stage = staged_compacted_events(spark, sf_dir)
    files = [
        f for f in os.listdir(stage) if f.endswith(".parquet")
    ]
    assert len(files) == 2, files
    per_file = (
        spark.read.parquet(stage)
        .groupBy(F.input_file_name().alias("f"))
        .agg(F.min("ts").alias("lo"), F.max("ts").alias("hi"))
        .collect()
    )
    assert len(per_file) == 2
    a, b = sorted(per_file, key=lambda r: r["lo"])
    assert a["hi"] <= b["lo"], f"overlapping file ranges: {a} vs {b}"


def test_compaction_row_count_preserved(spark, sf_dir):
    """Pure layout rewrite: exactly the source rows, no dup, no drop."""
    n_src = load_table(spark, sf_dir, "events").count()
    n_out = spark.read.parquet(staged_compacted_events(spark, sf_dir)).count()
    assert n_out == n_src


def test_stream_ingest_fragments_then_compaction_repairs(spark, sf_dir):
    """The continuous-ingest loop's two layout states: the streaming
    parquet sink's per-micro-batch commits leave ≥4 files in every
    event_type partition dir (4 triggers × 1 committing task each),
    and the compacted rewrite is 2 range-clustered files. Content
    equality across the chain is the catalog query's oracle check."""
    from kda_flink_app_timestream_spark.plans.layout import (
        staged_stream_ingested_events,
    )

    stage = staged_stream_ingested_events(spark, sf_dir)
    type_dirs = [d for d in os.listdir(stage) if d.startswith("event_type=")]
    assert len(type_dirs) == 5, type_dirs
    for d in type_dirs:
        parts = [
            f
            for f in os.listdir(os.path.join(stage, d))
            if f.endswith(".parquet")
        ]
        assert len(parts) >= 4, f"{d}: only {len(parts)} files — expected one per micro-batch"


def test_retention_vacuum_removes_exactly_expired_days(spark, sf_dir):
    """The physical half of the retention contract: every surviving
    day-dir is >= the 7-day cutoff (anchored to max event time), at
    least one expired day was actually deleted (the fixture spans a
    month), and the survivors' row count equals the raw table filtered
    to the cutoff — nothing extra vacuumed."""
    from kda_flink_app_timestream_spark.plans.layout import staged_vacuumed_events

    stage = staged_vacuumed_events(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    cutoff = ev.agg(
        F.date_format(
            F.to_date(F.max("ts") - F.expr("INTERVAL 7 DAYS")), "yyyy-MM-dd"
        ).alias("c")
    ).collect()[0]["c"]
    day_dirs = [d for d in os.listdir(stage) if d.startswith("day=")]
    assert day_dirs, "vacuum deleted everything"
    assert all(d[len("day="):] >= cutoff for d in day_dirs), (cutoff, day_dirs)
    # the month-long fixture must actually have had expired days
    n_days_raw = ev.select(F.to_date("ts").alias("d")).distinct().count()
    assert len(day_dirs) < n_days_raw
    n_survivors = spark.read.parquet(stage).count()
    n_expected = ev.filter(F.to_date("ts") >= F.lit(cutoff).cast("date")).count()
    assert n_survivors == n_expected


def test_compact_files_auto_sizes_from_input_bytes(spark, tmp_path):
    """VERDICT r8 #4: with no explicit n_files, compact_files sizes the
    rewrite from input bytes / target_file_bytes — write parallelism
    scales with the data instead of being pinned by a test contract."""
    from kda_flink_app_timestream_spark.operators.layout import (
        compact_files,
        sized_n_files,
    )

    src = str(tmp_path / "src")
    spark.range(0, 20_000).repartition(8).write.parquet(src)
    df = spark.read.parquet(src)
    total = sum(
        f.stat().st_size for f in (tmp_path / "src").glob("*.parquet")
    )
    # pick a target that forces a deterministic multi-file count
    target = max(1, total // 3)
    expect = max(1, -(-total // target))
    assert sized_n_files(df, target_file_bytes=target) == expect
    out = str(tmp_path / "out")
    compact_files(df, out, range_col="id", target_file_bytes=target)
    files = [f for f in (tmp_path / "out").glob("*.parquet")]
    assert len(files) == expect
    back = spark.read.parquet(out)
    assert back.count() == 20_000
    # derived frames have no input files: explicit n_files is required
    import pytest as _pytest

    with _pytest.raises(ValueError, match="inputFiles"):
        sized_n_files(spark.range(10))


def test_sized_n_files_decodes_uri_paths(spark, tmp_path):
    """ADVICE r9: inputFiles() returns percent-encoded URIs — a local
    directory containing spaces (or any URI-encoded character) must
    still stat correctly, and non-file schemes must hit this function's
    own pass-n_files guidance rather than an opaque FileNotFoundError."""
    import pytest as _pytest

    from kda_flink_app_timestream_spark.operators.layout import sized_n_files

    src = str(tmp_path / "with space dir")
    spark.range(0, 1000).write.parquet(src)
    df = spark.read.parquet(src)
    assert any("%20" in f for f in df.inputFiles()), df.inputFiles()
    total = sum(
        f.stat().st_size for f in (tmp_path / "with space dir").glob("*.parquet")
    )
    assert sized_n_files(df, target_file_bytes=total + 1) == 1
    assert sized_n_files(df, target_file_bytes=max(1, total // 2)) >= 2
    # non-local scheme: explicit ValueError with guidance, not a stat error
    class _Fake:
        def inputFiles(self):
            return ["s3a://bucket/key.parquet"]

    with _pytest.raises(ValueError, match="n_files explicitly"):
        sized_n_files(_Fake())


def test_vacuum_skips_null_partition_by_default(tmp_path):
    """ADVICE r8: day=__HIVE_DEFAULT_PARTITION__ (null partition values)
    sorts above every ISO date — string comparison alone would retain it
    forever. The operator now handles it explicitly: skipped by default
    (null has no age), deleted with drop_null_partition=True."""
    import os

    from kda_flink_app_timestream_spark.operators.layout import (
        vacuum_partitions,
    )

    root = tmp_path / "t"
    for d in ("day=2024-01-01", "day=2024-02-01", "day=__HIVE_DEFAULT_PARTITION__"):
        os.makedirs(root / d)
        (root / d / "part-0.parquet").write_bytes(b"x")
    removed = vacuum_partitions(str(root), "day", "2024-02-01")
    assert removed == 1
    assert sorted(p.name for p in root.iterdir()) == [
        "day=2024-02-01",
        "day=__HIVE_DEFAULT_PARTITION__",
    ]
    removed = vacuum_partitions(
        str(root), "day", "2024-02-01", drop_null_partition=True
    )
    assert removed == 1
    assert [p.name for p in root.iterdir()] == ["day=2024-02-01"]


def test_zorder_files_form_tight_boxes_that_skip_the_query_box(spark, sf_dir):
    """The z-order layout contract: 8 range-clustered files on the
    Morton key, and the catalog query's 2-D box predicate (user_id
    16..47 × one week) is DISJOINT from the (user_id, day) min/max box
    of at least half the files — the statistic that lets parquet
    min/max skip whole files on BOTH dimensions at once. A ts-only
    clustering can never buy this for a user_id predicate. (Content
    equality is the catalog query's oracle check.)"""
    from datetime import date

    from kda_flink_app_timestream_spark.plans.layout import (
        ZORDER_FILES,
        staged_zordered_events,
    )

    stage = staged_zordered_events(spark, sf_dir)
    files = [f for f in os.listdir(stage) if f.endswith(".parquet")]
    assert len(files) == ZORDER_FILES, files
    boxes = (
        spark.read.parquet(stage)
        .groupBy(F.input_file_name().alias("f"))
        .agg(
            F.min("user_id").alias("u_lo"),
            F.max("user_id").alias("u_hi"),
            F.min("day").alias("d_lo"),
            F.max("day").alias("d_hi"),
        )
        .collect()
    )
    assert len(boxes) == ZORDER_FILES
    q_u_lo, q_u_hi = 16, 47
    q_d_lo, q_d_hi = date(2024, 1, 8), date(2024, 1, 15)  # inclusive box
    intersecting = [
        b
        for b in boxes
        if b["u_lo"] <= q_u_hi
        and b["u_hi"] >= q_u_lo
        and b["d_lo"] <= q_d_hi
        and b["d_hi"] >= q_d_lo
    ]
    assert len(intersecting) <= ZORDER_FILES // 2, [
        (b["u_lo"], b["u_hi"], str(b["d_lo"]), str(b["d_hi"])) for b in boxes
    ]


def test_zorder_key_matches_python_interleave(spark):
    """zorder_key's shift/mask/or expression equals the reference Morton
    interleave bit-for-bit over random coordinates (hypothesis draws
    both in-range values and ones beyond `bits`, which must alias, not
    error)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from kda_flink_app_timestream_spark.operators.layout import zorder_key

    def py_morton(x: int, y: int, bits: int = 16) -> int:
        z = 0
        for i in range(bits):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    @settings(max_examples=20, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=1 << 20),
                st.integers(min_value=0, max_value=1 << 20),
            ),
            min_size=1,
            max_size=8,
        )
    )
    def check(pairs):
        df = spark.createDataFrame(pairs, "x long, y long")
        got = {
            (r["x"], r["y"]): r["z"]
            for r in df.select(
                "x", "y", zorder_key(F.col("x"), F.col("y")).alias("z")
            ).collect()
        }
        for x, y in pairs:
            assert got[(x, y)] == py_morton(x, y), (x, y)

    check()


def test_zorder_key_orders_locality(spark):
    """Neighbor coordinates map to nearby keys: the key of (x, y) and
    (x, y+1) differ only in y-bits — monotone in each coordinate when
    the other is fixed (the property range-clustering relies on)."""
    from kda_flink_app_timestream_spark.operators.layout import zorder_key

    rows = [(x, y) for x in range(16) for y in range(16)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = (
        df.select("x", "y", zorder_key(F.col("x"), F.col("y")).alias("z"))
        .collect()
    )
    by_xy = {(r["x"], r["y"]): r["z"] for r in got}
    for x in range(16):
        col_keys = [by_xy[(x, y)] for y in range(16)]
        assert col_keys == sorted(col_keys)
    for y in range(16):
        row_keys = [by_xy[(x, y)] for x in range(16)]
        assert row_keys == sorted(row_keys)


def test_zorder_rewrite_preserves_full_content(spark, sf_dir):
    """The catalog query's oracle checks only the filtered box — this
    pins the WHOLE rewrite: the z-ordered stage holds exactly the raw
    events (count and id-sum over every row, not just the predicate's)."""
    from kda_flink_app_timestream_spark.plans.layout import staged_zordered_events

    raw = load_table(spark, sf_dir, "events")
    zed = spark.read.parquet(staged_zordered_events(spark, sf_dir))
    r = raw.agg(
        F.count("*").alias("n"), F.sum("event_id").alias("s")
    ).first()
    z = zed.agg(F.count("*").alias("n"), F.sum("event_id").alias("s")).first()
    assert (r["n"], r["s"]) == (z["n"], z["s"])
