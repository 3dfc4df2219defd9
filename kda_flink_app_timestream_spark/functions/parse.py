"""Service-log parsing — the reference's one transform operator
(LogsToTimestreamPayloadFn.java:15-96), re-expressed as pure Catalyst
expressions (no UDF, fully whole-stage-codegen'd).

The reference parses a multi-line ``Key=Value`` text blob per record
(template: timestream_kinesis_data_gen.py:25-36), keeps exactly five
keys — callerservice, operation, awsaccountid, endtime, time
(LogsToTimestreamPayloadFn.java:28-46) — and routes them into a
TimestreamPoint: EndTime→event time (epoch millis, :77-78), Time→the
``latency`` DOUBLE measure with non-numeric chars stripped (:44, :82-84),
the other three→dimensions (:86-89).

Deliberate divergence (SURVEY §2.3.1): the reference's ``metrics``
HashMap is an instance field never cleared between records
(LogsToTimestreamPayloadFn.java:18), so a record missing a key silently
inherits the previous record's value. The expression form here is
stateless by construction — missing keys parse to NULL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# The five keys the reference's switch keeps, lowercased
# (LogsToTimestreamPayloadFn.java:28-46 — keys are lowercased at :26-27).
KEPT_KEYS = ("callerservice", "operation", "awsaccountid", "endtime", "time")


def _split_lines(value: Column) -> Column:
    """'='-bearing lines of the blob (the dashed separator and 'EOE'
    drop out) — materialized once per record; every key lookup scans
    this small array."""
    return F.filter(F.split(value, "\n"), lambda l: l.contains("="))


def _kv_lookup(lines: Column, key: str) -> Column:
    """Value of the LAST line whose lowercased key matches — the
    reference's per-line ``HashMap.put`` (last duplicate wins,
    LogsToTimestreamPayloadFn.java:25-27) without building a map at all:
    a repeated key with a different value can never throw
    DUPLICATE_MAP_KEY and fail the micro-batch, and per-record cost is a
    filter over ~11 lines instead of k map rebuilds (the fold form
    benchmarked ~2× slower per record at the 10× scale rehearsal).

    Value is the SECOND '='-token, exactly like the reference's
    ``line.split("=") → parts[1]`` — a value containing '=' truncates at
    it, not joins."""
    matches = F.filter(
        lines,
        lambda l: F.lower(F.trim(F.split_part(l, F.lit("="), F.lit(1)))) == key,
    )
    last = F.try_element_at(matches, F.lit(-1))
    return F.trim(F.split_part(last, F.lit("="), F.lit(2)))


def parse_service_logs(df: DataFrame, value_col: str = "value") -> DataFrame:
    """Raw log blobs → TimestreamPoint rows (TIMESTREAM_POINT_SCHEMA).

    Output columns: ``time`` (TimestampType, from EndTime epoch millis),
    ``measure_name``='latency', ``measure_value`` (numeric chars of Time),
    ``measure_value_double``, ``measure_value_type``='DOUBLE',
    ``dimensions`` (map), plus hot-dimension projections
    ``caller_service``/``operation``/``aws_account_id`` as first-class
    columns (at 100 TB, map lookups defeat Parquet column pruning —
    SURVEY §1.4).
    """
    # Three-step projection: the line array is split ONCE per record,
    # then the five kept keys are extracted once each — inlining would
    # re-split the blob for every output column below.
    staged = df.select(_split_lines(F.col(value_col)).alias("__lines"))
    looked = staged.select(
        *[_kv_lookup(F.col("__lines"), k).alias(f"__{k}") for k in KEPT_KEYS]
    )
    m = {k: F.col(f"__{k}") for k in KEPT_KEYS}
    latency = F.regexp_replace(m["time"], r"[^0-9.]", "")  # LogsToTimestreamPayloadFn.java:44
    return looked.select(
        F.timestamp_millis(m["endtime"].cast("long")).alias("time"),
        F.lit("latency").alias("measure_name"),  # LogsToTimestreamPayloadFn.java:82
        latency.alias("measure_value"),
        latency.cast("double").alias("measure_value_double"),
        F.lit("DOUBLE").alias("measure_value_type"),  # LogsToTimestreamPayloadFn.java:84
        F.map_filter(
            F.create_map(
                F.lit("callerservice"), m["callerservice"],
                F.lit("operation"), m["operation"],
                F.lit("awsaccountid"), m["awsaccountid"],
            ),
            lambda _, v: v.isNotNull(),
        ).alias("dimensions"),
        m["callerservice"].alias("caller_service"),
        m["operation"].alias("operation"),
        m["awsaccountid"].alias("aws_account_id"),
    )


def build_service_log_text(
    operation: Column,
    aws_account_id: Column,
    latency: Column,
    end_time_millis: Column,
    caller_service: Column,
) -> Column:
    """Render the generator's exact record template
    (timestream_kinesis_data_gen.py:25-36) as a Column expression —
    the rate-source synthetic generator and test fixtures share this."""
    return F.concat_ws(
        "\n",
        F.lit("------------------------------------------------------------------------"),
        F.concat(F.lit("Operation="), operation),
        F.concat(F.lit("AwsAccountId="), aws_account_id),
        F.lit("HttpStatusCode=200"),
        F.concat(F.lit("CallerService="), caller_service),
        F.lit("Size=2"),
        F.concat(F.lit("Time="), latency, F.lit(" ms")),
        F.concat(F.lit("EndTime="), end_time_millis.cast("string")),
        F.concat(F.lit("StartTime="), end_time_millis.cast("string")),
        F.lit("Program=AmazonDataCatalog"),
        F.lit("EOE"),
    )
