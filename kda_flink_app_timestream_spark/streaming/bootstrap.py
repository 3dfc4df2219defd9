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
