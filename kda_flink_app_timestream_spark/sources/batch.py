"""Batch table access over the driver-generated parquet testdata.

Parquet is the engine's canonical batch format: columnar, with Catalyst
predicate pushdown, column pruning, and partition pruning all free. At
100 TB the same loaders work unchanged against a partitioned directory
tree — pushdown means a filtered two-column projection reads only the
needed row groups, never the whole table.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import TABLE_NAMES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table (TESTDATA.md: ``{sf_dir}/{name}.parquet``).

    ``events.ts`` is physically TIMESTAMP(NANOS); with
    ``spark.sql.legacy.parquet.nanosAsLong`` it surfaces as epoch-nanos
    long and is normalized here to a microsecond TimestampType (integer
    ``div`` — float division would lose precision above 2^53 ns). The
    DuckDB oracle applies the matching ``CAST(ts AS TIMESTAMP)``.
    """
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def scatter(df: DataFrame, partitions: int | None = None) -> DataFrame:
    """Repartition a coarsely-split input up to the session's parallelism
    before CPU-heavy per-row work (parsing, hashing, Python stages).

    A small parquet file (or one huge unsplittable gzip) arrives as ONE
    input split, so an expensive map runs single-threaded no matter how
    many cores exist; a cheap round-robin shuffle first buys full
    parallelism. No-op when the input is already split at least that
    wide (the 100 TB case — thousands of row groups)."""
    try:
        spark = df.sparkSession
        target = partitions or spark.sparkContext.defaultParallelism
        current = df.rdd.getNumPartitions()
    except Exception:
        # Spark Connect: no sparkContext/rdd — repartition unconditionally
        # (AQE coalesces again if it was already wide)
        return df.repartition(partitions or DEFAULT_SHUFFLE_PARTITIONS)
    return df.repartition(target) if current < target else df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str, prefix: str = "") -> None:
    """Register every testdata table as a temp view (for the SQL API path)."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(prefix + name)
