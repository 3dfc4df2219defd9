"""JDBC sink integration: a REAL streaming query (file source →
pure-expression parser → foreachBatch JDBC writer) into embedded Derby,
with epoch-replay idempotence — the Spark rendition of the reference's
Kinesis → parse → Timestream pipeline against a SQL target."""

from __future__ import annotations

from pyspark.sql import functions as F

from kda_flink_app_timestream_spark.functions.parse import parse_service_logs
from kda_flink_app_timestream_spark.streaming.jdbc import (
    jdbc_point_sink,
    read_points_jdbc,
)


def _drop_blobs(spark, path: str, start: int, n: int) -> None:
    from kda_flink_app_timestream_spark.sources.generator import _render

    base = spark.range(start, start + n).select(
        F.col("id").alias("value"), F.current_timestamp().alias("timestamp")
    )
    _render(base, 0.0, 0).select("value").coalesce(1).write.mode("append").json(path)


def _run(spark, src: str, ckpt: str, sink) -> None:
    stream = spark.readStream.schema("value string").json(src)
    q = (
        parse_service_logs(stream)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), 'query did not terminate in 120s'


def test_streaming_into_jdbc_with_epoch_idempotence(spark, tmp_path):
    url = "jdbc:derby:memory:kda_test;create=true"
    table = "points"
    sink = jdbc_point_sink(url, table)
    src = str(tmp_path / "src")

    _drop_blobs(spark, src, 0, 30)
    _run(spark, src, str(tmp_path / "ck1"), sink)
    first = read_points_jdbc(spark, url, table)
    assert first.count() == 30
    row = first.first()
    assert row["measure_name"] == "latency"
    assert row["measure_value_type"] == "DOUBLE"
    assert float(row["measure_value"]) == row["measure_value_double"]

    # replay the SAME input with a fresh checkpoint → same epoch ids →
    # delete-then-insert keeps exactly 30 rows (no duplicates)
    _run(spark, src, str(tmp_path / "ck2"), sink)
    assert read_points_jdbc(spark, url, table).count() == 30

    # incremental continuation from the first checkpoint: only new files
    _drop_blobs(spark, src, 30, 12)
    _run(spark, src, str(tmp_path / "ck1"), sink)
    final = read_points_jdbc(spark, url, table)
    assert final.count() == 42
    accounts = [r["aws_account_id"] for r in final.collect()]
    assert len(set(accounts)) == 42  # generator offsets → unique ids, no dups


_COLLECT_CALLS: list = []


def test_continuous_rollup_upsert_into_jdbc(spark, tmp_path, monkeypatch):
    """Streaming 10-min windowed rollup maintained in Derby via keyed
    upserts (update output mode): after incremental file drops that
    REVISE existing windows, the JDBC table must equal the batch
    aggregate over all data — the continuous-aggregate contract."""
    from pyspark.sql import DataFrame as _DF

    from kda_flink_app_timestream_spark.streaming.jdbc import jdbc_upsert_sink

    _COLLECT_CALLS.clear()
    orig_collect = _DF.collect

    def spy(self):
        _COLLECT_CALLS.append("collect")
        return orig_collect(self)

    monkeypatch.setattr(_DF, "collect", spy)

    url = "jdbc:derby:memory:kda_rollup;create=true"
    table = "rollup_10min"
    src = str(tmp_path / "src")
    base_ms = 1_700_000_000_000

    def drop(values: list[tuple[int, float]]) -> None:
        spark.createDataFrame(
            [(f"Time={v} ms\nEndTime={base_ms + off_ms}",) for off_ms, v in values],
            ["value"],
        ).coalesce(1).write.mode("append").json(src)

    def run() -> None:
        points = parse_service_logs(
            spark.readStream.schema("value string").json(src)
        )
        agg = (
            points.groupBy(F.window("time", "10 minutes").start.alias("window_start"))
            .agg(
                F.count("*").alias("n"),
                F.round(F.sum("measure_value_double"), 2).alias("total"),
            )
        )
        q = (
            agg.writeStream.outputMode("update")
            .foreachBatch(jdbc_upsert_sink(url, table, ("window_start",)))
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120), 'query did not terminate in 120s'

    drop([(0, 1.5), (60_000, 2.5), (660_000, 10.0)])      # windows 0 and 1
    run()
    drop([(120_000, 4.0), (720_000, 20.0)])               # revises BOTH windows
    run()

    # the stale-key clear is set-based through a staging table: at no
    # point may the sink pull data rows to the driver
    assert _COLLECT_CALLS == []

    rows = (
        spark.read.format("jdbc")
        .option("url", url).option("dbtable", table)
        .option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
        .load()
        .collect()
    )
    got = {r["window_start"]: (r["n"], r["total"]) for r in rows}
    # exactly one row per window — a skipped stale-key delete would leave
    # the superseded aggregates behind (and a dict would mask them)
    assert len(rows) == 2
    assert len(got) == 2
    by_window = sorted(got.items())
    assert by_window[0][1] == (3, 8.0)    # 1.5 + 2.5 + 4.0
    assert by_window[1][1] == (2, 30.0)   # 10.0 + 20.0


def test_upsert_delete_failure_fails_the_batch(spark):
    """Only a MISSING TABLE may be tolerated by the stale-key delete;
    any other SQL failure (here: the key column doesn't exist in a
    pre-existing target) must propagate so the checkpoint retries the
    batch instead of silently keeping duplicates (ADVICE r1)."""
    import pytest

    from kda_flink_app_timestream_spark.streaming.jdbc import jdbc_upsert_sink

    url = "jdbc:derby:memory:kda_badtarget;create=true"
    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(url)
    stmt = conn.createStatement()
    stmt.executeUpdate('CREATE TABLE "wrongshape" ("other_col" INT)')
    stmt.close()
    conn.close()

    batch = spark.createDataFrame([(1, 2.0)], ["k", "v"])
    write = jdbc_upsert_sink(url, "wrongshape", ("k",))
    with pytest.raises(Exception, match="(?i)column|42X04"):
        write(batch, 0)


def test_jdbc_rejection_repair_poisoned_batch(spark):
    """The reference's per-record rejection repair
    (TimestreamSink.java:103-120) against a REAL writer: a Derby table
    with a NOT NULL constraint receives a poisoned batch — the k
    offending records are identified by the in-transaction probe,
    reported through on_rejected with their reason, and exactly n-k
    rows land; the happy path stays one atomic batch insert."""
    from kda_flink_app_timestream_spark.streaming.jdbc import (
        jdbc_rejecting_batch_writer,
    )
    from kda_flink_app_timestream_spark.streaming.sink import write_chunked

    url = "jdbc:derby:memory:kda_reject;create=true"
    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(url)
    stmt = conn.createStatement()
    stmt.executeUpdate(
        'CREATE TABLE "pts" ("measure_name" VARCHAR(64) NOT NULL, '
        '"measure_value" DOUBLE)'
    )
    stmt.close()
    conn.close()

    n, poisoned = 23, {3, 11, 12, 20}  # spread across 5-record chunks
    rows = [
        {
            "measure_name": None if i in poisoned else f"latency_{i}",
            "measure_value": float(i),
        }
        for i in range(n)
    ]
    rejected_reports = []

    def on_rejected(bad, rr):
        rejected_reports.append((bad, rr.reason))

    wb = jdbc_rejecting_batch_writer(spark, url, "pts", ("measure_name", "measure_value"))
    written, rejected = write_chunked(rows, wb, batch_size=5, on_rejected=on_rejected)

    assert (written, rejected) == (n - len(poisoned), len(poisoned))
    landed = (
        spark.read.format("jdbc")
        .option("url", url).option("dbtable", '"pts"')
        .option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
        .load()
        .collect()
    )
    assert len(landed) == n - len(poisoned)
    assert {r["measure_value"] for r in landed} == {
        float(i) for i in range(n) if i not in poisoned
    }
    # every rejection was reported with the SQL-state reason
    reported = [rec for bad, _ in rejected_reports for rec in bad]
    assert {r["measure_value"] for r in reported} == {float(i) for i in poisoned}
    assert all(reason == "23502" for _, reason in rejected_reports)  # NOT NULL


def test_jdbc_repair_sink_streaming_end_to_end(spark, tmp_path):
    """The full sink contract through a streaming foreachBatch: blobs
    missing EndTime parse to NULL time, violate the target's NOT NULL
    constraint, get repaired out per-record; the good records land."""
    from kda_flink_app_timestream_spark.streaming.jdbc import jdbc_repair_sink

    url = "jdbc:derby:memory:kda_repair_stream;create=true"
    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(url)
    stmt = conn.createStatement()
    stmt.executeUpdate(
        'CREATE TABLE "rpts" ("time" TIMESTAMP NOT NULL, '
        '"measure_value_double" DOUBLE)'
    )
    stmt.close()
    conn.close()

    src = str(tmp_path / "src")
    good = [f"Time={i}.5 ms\nEndTime={1_700_000_000_000 + i}" for i in range(20)]
    bad = ["Time=9.9 ms\nProgram=NoEndTime", "Time=8.8 ms\nEOE"]
    spark.createDataFrame([(v,) for v in good + bad], ["value"]).coalesce(
        1
    ).write.json(src)

    rejects = []
    sink = jdbc_repair_sink(
        url,
        "rpts",
        ("time", "measure_value_double"),
        batch_size=7,
        on_rejected=lambda bad_recs, rr: rejects.extend(bad_recs),
    )
    stream = spark.readStream.schema("value string").json(src)
    q = (
        parse_service_logs(stream)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), 'query did not terminate in 120s'

    landed = (
        spark.read.format("jdbc")
        .option("url", url).option("dbtable", '"rpts"')
        .option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
        .load()
    )
    assert landed.count() == 20
    assert len(rejects) == 2
    assert all(r["time"] is None for r in rejects)


def test_jdbc_transient_batch_error_is_not_a_rejection(spark):
    """A batch-wide TRANSIENT failure (lock timeout while another
    transaction holds the table) must FAIL the batch so the checkpoint
    retries it — not run the per-record probe into the same timeout for
    every record and 'reject' the whole chunk (silent data loss). Only
    SQLState classes 22/23 (bad record data) classify as rejections."""
    import pytest

    from kda_flink_app_timestream_spark.streaming.jdbc import (
        jdbc_rejecting_batch_writer,
    )
    from kda_flink_app_timestream_spark.streaming.sink import RejectedRecords

    url = "jdbc:derby:memory:kda_lock;create=true"
    jvm = spark._jvm
    setup = jvm.java.sql.DriverManager.getConnection(url)
    st = setup.createStatement()
    st.executeUpdate(
        'CREATE TABLE "pts" ("measure_name" VARCHAR(64) NOT NULL, '
        '"measure_value" DOUBLE)'
    )
    # fail lock waits fast so the test doesn't sit on Derby's default
    st.executeUpdate(
        "CALL SYSCS_UTIL.SYSCS_SET_DATABASE_PROPERTY"
        "('derby.locks.waitTimeout', '1')"
    )
    st.close()
    setup.close()

    rows = [{"measure_name": f"m{i}", "measure_value": float(i)} for i in range(4)]
    wb = jdbc_rejecting_batch_writer(
        spark, url, "pts", ("measure_name", "measure_value")
    )

    holder = jvm.java.sql.DriverManager.getConnection(url)
    holder.setAutoCommit(False)
    hst = holder.createStatement()
    hst.executeUpdate('LOCK TABLE "pts" IN EXCLUSIVE MODE')
    try:
        with pytest.raises(Exception) as excinfo:
            wb(rows)
        assert not isinstance(excinfo.value, RejectedRecords), (
            "transient lock timeout was misclassified as per-record "
            "rejections — the whole chunk would be silently dropped"
        )
    finally:
        holder.rollback()
        hst.close()
        holder.close()

    # lock released: the checkpoint's retry of the same batch lands all
    wb(rows)
    landed = (
        spark.read.format("jdbc")
        .option("url", url).option("dbtable", '"pts"')
        .option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
        .load()
        .collect()
    )
    assert {r["measure_value"] for r in landed} == {float(i) for i in range(4)}
