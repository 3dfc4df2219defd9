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
    q.awaitTermination(120)


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
