"""Synthetic service-log generator — the reference's Python data
generator (timestream_kinesis_data_gen.py) re-expressed as a Spark rate
source + pure expressions, so it scales to any records/sec without a
driver-side loop.

Value domains copied from the generator (timestream_kinesis_data_gen.py:
38-42, 67-72): operations, caller services, the five latency strings
(with " ms" suffix), random 12-digit account ids. Late-arrival injection
mirrors ``--percent-late``/``--late-time`` (:50-59): a deterministic
fraction of records carries ``now − late_time`` timestamps.

Draws are keyed off the rate-source's monotonically-increasing ``value``
(hash-mixed), so a given offset always renders the same record —
deterministic replay for tests, unlike the reference's random.choice.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.parse import build_service_log_text

# timestream_kinesis_data_gen.py:41-42, 67-72
OPERATIONS = ("GetTable", "CreateTable", "CreateNameSpace", "GetDatabase", "CreateDatabase")
CALLER_SERVICES = ("GLUE", "S3")
# timestream_kinesis_data_gen.py:40 — latency strings, " ms" appended at :30
LATENCIES = ("178.715432", "123.152632", "562.789562", "125.785214", "252.123568")


def _pick(options: tuple[str, ...], key: Column) -> Column:
    """Deterministic pseudo-random draw: hash-mix the offset then index."""
    idx = F.pmod(F.xxhash64(key, F.lit(len(options))), F.lit(len(options)))
    return F.element_at(F.array(*[F.lit(o) for o in options]), (idx + 1).cast("int"))


def service_log_rate_stream(
    spark: SparkSession,
    rows_per_second: int = 100,
    percent_late: float = 0.0,
    late_time_seconds: int = 600,
) -> DataFrame:
    """Streaming DataFrame of raw service-log blobs: columns
    ``value`` (the multi-line Key=Value text) and ``partition_key``
    (AwsAccountId — the reference's Kinesis partition key,
    timestream_kinesis_data_gen.py:77)."""
    rate = spark.readStream.format("rate").option("rowsPerSecond", rows_per_second).load()
    return _render(rate, percent_late, late_time_seconds)


def service_log_batch(
    spark: SparkSession,
    n_rows: int = 1000,
    percent_late: float = 0.0,
    late_time_seconds: int = 600,
) -> DataFrame:
    """Batch variant (spark.range) for fixtures and parser goldens."""
    df = spark.range(n_rows).select(
        F.col("id").alias("value"),
        F.current_timestamp().alias("timestamp"),
    )
    return _render(df, percent_late, late_time_seconds)


def _render(df: DataFrame, percent_late: float, late_time_seconds: int) -> DataFrame:
    key = F.col("value")  # rate-source monotonic offset
    # --percent-late / --late-time (timestream_kinesis_data_gen.py:50-59),
    # deterministic: offset-hash < percent_late of the hash space
    frac = F.pmod(F.xxhash64(key, F.lit(9999)), F.lit(10_000)) / 10_000.0
    event_ts = F.when(
        F.lit(percent_late > 0) & (frac < F.lit(percent_late / 100.0)),
        F.col("timestamp") - F.make_interval(secs=F.lit(late_time_seconds)),
    ).otherwise(F.col("timestamp"))
    account_id = F.lpad(
        F.pmod(F.xxhash64(key, F.lit(7)), F.lit(1_000_000_000_000)).cast("string"), 12, "0"
    )
    return df.select(
        build_service_log_text(
            operation=_pick(OPERATIONS, key),
            aws_account_id=account_id,
            latency=_pick(LATENCIES, key + 13),
            end_time_millis=F.unix_millis(event_ts),
            caller_service=_pick(CALLER_SERVICES, key + 29),
        ).alias("value"),
        account_id.alias("partition_key"),
    )
