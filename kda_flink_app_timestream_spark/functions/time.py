"""Physical-layout-robust timestamp helpers.

The driver's testdata has shipped ``events.ts`` under two different
physical parquet types across rounds — TIMESTAMP(NANOS) (surfaced as
epoch-nanos ``long`` via ``spark.sql.legacy.parquet.nanosAsLong``) and
``timestamp[us]`` without UTC adjustment (surfaced as TIMESTAMP_NTZ).
Spark's ``unix_millis``/``unix_micros``/``unix_seconds`` accept only
TIMESTAMP, so any plan calling them directly on a loaded column breaks
the moment the layout flips (this cost round 2 nine queries and the
bench — VERDICT.md r2 items 1-6).

Two layers of defense:

- :func:`normalize_ts_col` / the ``load_table`` loader convert every
  known physical layout to one logical TimestampType at the scan edge.
- ``epoch_seconds/millis/micros`` here cast-to-TIMESTAMP first, so even
  a plan handed a raw NTZ column cannot hit the AnalysisException. The
  session timezone is pinned UTC (session.py), so ``NTZ → TIMESTAMP``
  is value-preserving: both collect identically to the UTC-naive
  DuckDB oracle.

Event-time semantics match the reference: the record's own time field
drives windowing (StreamingJob.java:132-134).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _as_timestamp(col: Column | str) -> Column:
    """Cast to TIMESTAMP (no-op when already TIMESTAMP; value-preserving
    on TIMESTAMP_NTZ under the UTC session timezone; widens DATE)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("timestamp")


def epoch_seconds(col: Column | str) -> Column:
    """``unix_seconds`` that tolerates TIMESTAMP_NTZ / DATE inputs."""
    return F.unix_seconds(_as_timestamp(col))


def epoch_millis(col: Column | str) -> Column:
    """``unix_millis`` that tolerates TIMESTAMP_NTZ / DATE inputs."""
    return F.unix_millis(_as_timestamp(col))


def epoch_micros(col: Column | str) -> Column:
    """``unix_micros`` that tolerates TIMESTAMP_NTZ / DATE inputs."""
    return F.unix_micros(_as_timestamp(col))


def normalize_ts_col(df: DataFrame, name: str = "ts") -> DataFrame:
    """Normalize a time column to logical TimestampType whatever the
    physical parquet layout was:

    - ``long``            → epoch **nanoseconds** read via nanosAsLong
                            (round-1 testdata layout): integer ``div``
                            to micros (float division would lose
                            precision above 2^53 ns).
    - ``timestamp_ntz``   → value-preserving cast (UTC session tz;
                            round-2+ testdata layout, ``timestamp[us]``
                            with isAdjustedToUTC=false).
    - ``timestamp``       → already normalized, no-op.

    Anything else raises loudly rather than producing silently-shifted
    event time (the round-2 failure mode was a silent 1000× collapse).
    """
    if name not in df.columns:
        return df
    dtype = df.schema[name].dataType
    if isinstance(dtype, T.LongType):
        return df.withColumn(name, F.timestamp_micros(F.expr(f"{name} div 1000")))
    if isinstance(dtype, T.TimestampNTZType):
        return df.withColumn(name, F.col(name).cast("timestamp"))
    if isinstance(dtype, T.TimestampType):
        return df
    raise TypeError(
        f"column {name!r} has unsupported physical type {dtype}; "
        "extend functions/time.py:normalize_ts_col for the new testdata layout"
    )
