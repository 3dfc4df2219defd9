"""Control-plane DDL bootstrap (TimestreamInitializer.java:17-58).

The reference idempotently creates a Timestream database and table
(ConflictException → skip) with retention 24 h memory store / 7 d
magnetic store (:12-13, 47-50), invoked eagerly from ``main`` before the
job starts (StreamingJob.java:176-178).

Spark-first: the namespace is the catalog — ``CREATE DATABASE/TABLE IF
NOT EXISTS`` (idempotence is declarative, no exception catching), with
retention recorded as table properties. A boto3 variant for a real
Timestream target mirrors the same contract.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

MEMORY_RETENTION_HOURS = 24  # TimestreamInitializer.java:12
MAGNETIC_RETENTION_DAYS = 7  # TimestreamInitializer.java:13


def create_database(spark: SparkSession, name: str) -> None:
    spark.sql(f"CREATE DATABASE IF NOT EXISTS `{name}`")


def create_table(
    spark: SparkSession,
    database: str,
    table: str,
    *,
    memory_retention_hours: int = MEMORY_RETENTION_HOURS,
    magnetic_retention_days: int = MAGNETIC_RETENTION_DAYS,
) -> None:
    """Idempotent point-table DDL. Schema is the TimestreamPoint model
    (schemas.TIMESTREAM_POINT_SCHEMA); Timestream itself is schemaless
    (TimestreamInitializer.java creates tables with no schema), but a
    Spark table needs columns — the dynamic part stays in the
    ``dimensions`` map."""
    spark.sql(
        f"""
        CREATE TABLE IF NOT EXISTS `{database}`.`{table}` (
            time TIMESTAMP,
            measure_name STRING,
            measure_value STRING,
            measure_value_double DOUBLE,
            measure_value_type STRING,
            dimensions MAP<STRING, STRING>
        )
        USING parquet
        TBLPROPERTIES (
            'retention.memory_store_hours' = '{memory_retention_hours}',
            'retention.magnetic_store_days' = '{magnetic_retention_days}'
        )
        """
    )


def initialize(spark: SparkSession, database: str, table: str) -> None:
    """createDatabase + createTable, the ``main``-time bootstrap sequence
    (StreamingJob.java:176-178)."""
    create_database(spark, database)
    create_table(spark, database, table)


def initialize_timestream_boto3(
    database: str,
    table: str,
    *,
    region: str = "us-east-1",
    endpoint_url: str | None = None,
    client_kwargs: dict | None = None,
    memory_retention_hours: int = MEMORY_RETENTION_HOURS,
    magnetic_retention_days: int = MAGNETIC_RETENTION_DAYS,
) -> None:
    """The boto3 control-plane bootstrap against a REAL Timestream
    endpoint (or LocalStack / the in-process
    ``timestream_fake.FakeTimestream``): exactly
    TimestreamInitializer.java:17-58 — create database then table,
    catching ``ConflictException`` for idempotence (:36-39, :53-56),
    with the reference's retention tiers (24 h memory / 7 d magnetic,
    :12-13, 47-50). The Spark-catalog variant above stays the default
    for SQL targets; this is the path a real Timestream deployment
    runs eagerly before starting the query (StreamingJob.java:176-178).
    """
    try:
        import boto3
    except ImportError as exc:  # pragma: no cover
        raise NotImplementedError("boto3 required for the Timestream bootstrap") from exc

    client = boto3.client(
        "timestream-write",
        region_name=region,
        endpoint_url=endpoint_url,
        **(client_kwargs or {}),
    )
    try:
        client.create_database(DatabaseName=database)
    except client.exceptions.ConflictException:
        pass  # TimestreamInitializer.java:36-39
    try:
        client.create_table(
            DatabaseName=database,
            TableName=table,
            RetentionProperties={
                "MemoryStoreRetentionPeriodInHours": memory_retention_hours,
                "MagneticStoreRetentionPeriodInDays": magnetic_retention_days,
            },
        )
    except client.exceptions.ConflictException:
        pass  # TimestreamInitializer.java:53-56
