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


# The full Timestream MeasureValueType enum surface the engine types
# (TimestreamPoint.java:27 — the AWS SDK enum; the reference only ever
# emits DOUBLE, LogsToTimestreamPayloadFn.java:84, but the data model
# commits to the enum via MeasureValueType.fromValue(s.toUpperCase()),
# TimestreamPoint.java:62).
MEASURE_VALUE_TYPES = ("DOUBLE", "BIGINT", "VARCHAR", "BOOLEAN")


def typed_measure_projection(
    df: DataFrame,
    value_col: str = "measure_value",
    type_col: str = "measure_value_type",
) -> DataFrame:
    """CASE WHEN typed projections for the full ``MeasureValueType``
    enum over a mixed-type point stream (SURVEY §1.4): each row's
    string ``measure_value`` is projected into exactly one of four
    typed columns (``measure_double``/``measure_bigint``/
    ``measure_varchar``/``measure_boolean``) selected by its type tag,
    NULL in the other three.

    Tag handling mirrors ``MeasureValueType.fromValue(s.toUpperCase())``
    (TimestreamPoint.java:62): tags are trimmed + uppercased before the
    dispatch (the normalized tag replaces ``type_col``), and a tag
    outside the enum yields ``measure_type_valid = false`` with all
    four projections NULL — the row survives for routing/repair instead
    of failing the batch (the sink's rejection path is where invalid
    records are reported, TimestreamSink.java:103-120).

    Value casts are ``try_cast``: a malformed value under its declared
    type degrades to NULL, never a batch abort (ANSI-safe). Pure
    Catalyst expressions — whole-stage-codegen'd, no shuffle, scales as
    a projection.
    """
    t = F.upper(F.trim(F.col(type_col)))
    v = F.col(value_col)
    return df.withColumns(
        {
            type_col: t,
            # coalesce: a NULL tag (upstream parse miss) must read as
            # INVALID, not NULL — a NULL here vanishes from BOTH sides
            # of a valid/~valid routing split and the row never reaches
            # the repair path
            "measure_type_valid": F.coalesce(
                t.isin(*MEASURE_VALUE_TYPES), F.lit(False)
            ),
            "measure_double": F.when(t == "DOUBLE", v.try_cast("double")),
            "measure_bigint": F.when(t == "BIGINT", v.try_cast("long")),
            "measure_varchar": F.when(t == "VARCHAR", v),
            "measure_boolean": F.when(t == "BOOLEAN", v.try_cast("boolean")),
        }
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
