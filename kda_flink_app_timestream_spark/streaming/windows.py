"""Event-time windowing + watermarks (SURVEY §2 #3, #4).

Semantics mapping from the reference:

- Flink splits "watermark lag" (0 — ``forMonotonousTimestamps``,
  StreamingJob.java:132-134) from ``allowedLateness`` (5 s,
  StreamingJob.java:149). Spark has ONE watermark delay playing both
  roles, so the equivalent accept/drop behavior is
  ``withWatermark(ts, "5 seconds")``.
- The reference's window is ``windowAll`` — global, parallelism-1
  (StreamingJob.java:148). ``groupBy(window(...), *keys)`` here is
  hash-partitioned per (window × key) — strictly better at scale; an
  empty ``keys`` still distributes by window bucket.
- ``SlidingEventTimeWindows`` is imported but never used in the
  reference (StreamingJob.java:39); sliding + session windows are
  provided as first-class here.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

def _agg(df: DataFrame, window_col: Column, keys: Sequence[str], aggs) -> DataFrame:
    # default agg built lazily — Column construction needs an active session
    aggs = tuple(aggs) if aggs is not None else (F.count("*").alias("n"),)
    return df.groupBy(window_col.alias("window"), *keys).agg(*aggs)


def tumbling_windowed(
    df: DataFrame,
    ts_col: str,
    duration: str = "10 seconds",  # StreamingJob.java:148
    keys: Sequence[str] = (),
    aggs=None,
    watermark: str | None = "5 seconds",  # allowedLateness, StreamingJob.java:149
) -> DataFrame:
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    return _agg(df, F.window(ts_col, duration), keys, aggs)


def sliding_windowed(
    df: DataFrame,
    ts_col: str,
    duration: str = "10 seconds",
    slide: str = "5 seconds",
    keys: Sequence[str] = (),
    aggs=None,
    watermark: str | None = "5 seconds",
) -> DataFrame:
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    return _agg(df, F.window(ts_col, duration, slide), keys, aggs)


def session_windowed(
    df: DataFrame,
    ts_col: str,
    gap: str = "5 minutes",
    keys: Sequence[str] = (),
    aggs=None,
    watermark: str | None = "5 seconds",
) -> DataFrame:
    """Session windows (dynamic, gap-merged). In streaming mode Spark
    requires a watermark for session windows in append mode."""
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    return _agg(df, F.session_window(ts_col, gap), keys, aggs)
