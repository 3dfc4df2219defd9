"""End-to-end reference pipeline assembly — the StreamingJob.main analog
(StreamingJob.java:112-186): source → parse → event-time/watermark →
windowed processing → batching sink, with the late-data side output.

The reference's window is an identity pass-through (its
ProcessAllWindowFunction aggregates nothing, StreamingJob.java:151-166),
so the default pipeline forwards parsed points to the sink per
micro-batch, with the late split replacing the Flink side output; a
windowed-aggregate variant is one flag away.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ..functions.parse import parse_service_logs
from .late import LateDataSplitter
from .sink import DEFAULT_BATCH_SIZE, BatchingForeachWriter
from .source import streaming_source


def build_point_stream(
    spark: SparkSession,
    source_kind: str = "rate",
    decode: str = "none",
    watermark: str = "5 seconds",  # allowedLateness analog, StreamingJob.java:149
    **source_options,
) -> DataFrame:
    """source → parse → watermark: a streaming DataFrame of
    TimestreamPoint rows with event time from the record's own EndTime
    (StreamingJob.java:132-134 timestamp assignment)."""
    raw = streaming_source(spark, kind=source_kind, decode=decode, **source_options)
    points = parse_service_logs(raw)
    return points.withWatermark("time", watermark)


def start_reference_pipeline(
    spark: SparkSession,
    *,
    source_kind: str = "rate",
    decode: str = "none",
    sink_dir: str | None = None,
    jdbc_url: str | None = None,
    jdbc_table: str = "points",
    late_sink: Callable[[DataFrame, int], None] | None = None,
    checkpoint_dir: str,
    batch_size: int = DEFAULT_BATCH_SIZE,  # StreamingJob.java:174
    allowed_lateness: str = "5 seconds",
    available_now: bool = False,
    **source_options,
):
    """Wire and start the full job. Returns the StreamingQuery.

    - on-time slice → BatchingForeachWriter (TimestreamSink analog,
      ``sink_dir``) or the JDBC time-series sink (``jdbc_url`` —
      the BASELINE.json production target)
    - late slice → ``late_sink`` (console-print analog of
      StreamingJob.java:168 if None)
    - exactly-once-ish via checkpointLocation + per-epoch idempotent
      writes on either backend.
    """
    if (sink_dir is None) == (jdbc_url is None):
        raise ValueError("exactly one of sink_dir / jdbc_url required")
    points = build_point_stream(
        spark, source_kind=source_kind, decode=decode,
        watermark=allowed_lateness, **source_options,
    )
    if jdbc_url is not None:
        from .jdbc import jdbc_point_sink

        writer = jdbc_point_sink(jdbc_url, jdbc_table)
    else:
        writer = BatchingForeachWriter(jsonl_dir=sink_dir, batch_size=batch_size)

    def default_late_sink(late_df: DataFrame, epoch_id: int) -> None:
        n = late_df.count()
        if n:
            print(f"[late-data epoch={epoch_id}] {n} records")  # print() analog

    splitter = LateDataSplitter(
        on_time=writer,
        late=late_sink or default_late_sink,
        ts_col="time",
        allowed_lateness=allowed_lateness,
    )
    stream_writer = (
        points.writeStream.foreachBatch(splitter)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        stream_writer = stream_writer.trigger(availableNow=True)
    query = stream_writer.start()
    splitter.attach(query)
    return query
