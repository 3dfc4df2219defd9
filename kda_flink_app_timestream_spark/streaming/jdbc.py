"""JDBC time-series sink — the driver contract's stated production
target ("Structured Streaming + Kinesis source + JDBC sink",
BASELINE.json) replacing the reference's Timestream client
(TimestreamSink.java:28-172) with Spark's JVM-side JDBC writer.

Exactly-once per micro-batch: every row carries its ``epoch_id``; the
sink DELETEs the epoch's rows before appending, so a replayed batch
(failure between write and checkpoint commit) overwrites instead of
duplicating — the same contract as the JSONL sink's per-(epoch,
partition) file overwrite.

Schema note: the TimestreamPoint ``dimensions`` MapType doesn't exist
in SQL targets, so points are written in hot-dimension-extracted form
(caller_service / operation / aws_account_id as first-class columns —
SURVEY §1.4's 100 TB recommendation, which the parser already emits).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"

POINT_COLUMNS = (
    "time",
    "measure_name",
    "measure_value",
    "measure_value_double",
    "measure_value_type",
    "caller_service",
    "operation",
    "aws_account_id",
)


def _delete_epoch(spark, url: str, table: str, epoch_id: int) -> None:
    """Row-level delete through the JVM's DriverManager (Spark's JDBC
    data source has no delete path). Silently ignores a missing table —
    the first append creates it."""
    try:
        jvm = spark._jvm
        conn = jvm.java.sql.DriverManager.getConnection(url)
        try:
            stmt = conn.createStatement()
            # Spark's JDBC writer creates QUOTED (case-sensitive) column
            # identifiers; try quoted/unquoted table spellings in order
            for tbl in (table, f'"{table}"'):
                try:
                    stmt.executeUpdate(
                        f'DELETE FROM {tbl} WHERE "epoch_id" = {int(epoch_id)}'
                    )
                    break
                except Exception:
                    continue
            stmt.close()
        finally:
            conn.close()
    except Exception:
        pass  # table doesn't exist yet / connect-mode session: append creates it


def jdbc_point_sink(
    url: str,
    table: str,
    driver: str = DERBY_DRIVER,
):
    """Build a ``foreachBatch`` callable writing TimestreamPoint rows to
    a JDBC table with per-epoch idempotence.

    The write itself is Spark's JDBC writer: executor-parallel, one
    connection per partition, batched inserts (``batchsize`` option —
    default 1000, the JDBC analog of the reference's 50-record buffer,
    StreamingJob.java:174)."""

    def write(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        out = batch_df.select(*[c for c in POINT_COLUMNS if c in batch_df.columns])
        out = out.withColumn("epoch_id", F.lit(int(epoch_id)).cast("long"))
        _delete_epoch(spark, url, table, epoch_id)
        (
            out.write.format("jdbc")
            .option("url", url)
            .option("dbtable", table)
            .option("driver", driver)
            .mode("append")
            .save()
        )

    return write


def read_points_jdbc(spark, url: str, table: str, driver: str = DERBY_DRIVER) -> DataFrame:
    return (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", driver)
        .load()
    )


def jdbc_upsert_sink(
    url: str,
    table: str,
    key_cols: tuple[str, ...],
    driver: str = DERBY_DRIVER,
):
    """Keyed upsert ``foreachBatch`` sink for CONTINUOUS AGGREGATES:
    each micro-batch (update output mode) carries only the windows whose
    aggregates changed; the sink deletes those keys and re-inserts —
    the JDBC table stays an exact materialization of the streaming
    aggregation (Timestream-style continuous rollup).

    The key set per batch is bounded by changed windows (watermark-
    bounded), so the driver-side key collection stays small by
    construction.
    """

    def write(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        keys = batch_df.select(*key_cols).distinct().collect()
        if not keys:
            return
        try:
            jvm = spark._jvm
            conn = jvm.java.sql.DriverManager.getConnection(url)
            try:
                stmt = conn.createStatement()
                for row in keys:
                    cond = " AND ".join(
                        f'"{c}" = ' + (
                            f"'{row[c]}'" if isinstance(row[c], str)
                            else f"TIMESTAMP('{row[c]}')" if hasattr(row[c], "isoformat")
                            else str(row[c])
                        )
                        for c in key_cols
                    )
                    for tbl in (table, f'"{table}"'):
                        try:
                            stmt.executeUpdate(f"DELETE FROM {tbl} WHERE {cond}")
                            break
                        except Exception:
                            continue
                stmt.close()
            finally:
                conn.close()
        except Exception:
            pass  # first batch: table not created yet
        (
            batch_df.write.format("jdbc")
            .option("url", url)
            .option("dbtable", table)
            .option("driver", driver)
            .mode("append")
            .save()
        )

    return write
