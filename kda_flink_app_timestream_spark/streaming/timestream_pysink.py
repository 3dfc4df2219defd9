"""The reference's Timestream batching sink as a REAL registered Spark
streaming SINK — ``df.writeStream.format("timestream_py")`` — via
Spark 4's public Python DataSource writer API.

The engine already proves the sink SEMANTICS (chunked writes, the
50-record batch trigger, per-record rejection repair, partial batches
always flush) through ``foreachBatch`` (``streaming/sink.py``,
mirroring TimestreamSink.java:28-172). What this module adds is the
ENGINE integration ``foreachBatch`` cannot express: a first-class sink
format with per-partition ``write → WriterCommitMessage`` and a
driver-side ``commit(messages, batchId)`` barrier — Spark's own
two-phase commit surface, the structural analog of the reference's
checkpointed sink state (TimestreamSink.java:150-172).

The write path REUSES the proven pieces end to end: executors build
their own boto3 timestream-write client (never pickled from the
driver), ``write_chunked`` applies the reference's batch-size trigger
and rejection-repair loop, and the wire protocol is exercised for real
against ``timestream_fake.FakeTimestream`` in tests and the catalog
round-trip query.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    WriterCommitMessage,
)


@dataclass
class TimestreamCommitMessage(WriterCommitMessage):
    """Per-partition outcome, aggregated at the driver commit barrier."""

    written: int
    rejected: int


class TimestreamStreamWriter(DataSourceStreamWriter):
    def __init__(self, options: dict):
        self._options = {k.lower(): v for k, v in dict(options).items()}
        if not self._options.get("database") or not self._options.get("table"):
            raise ValueError("timestream_py requires database and table options")

    def write(self, iterator: Iterator) -> TimestreamCommitMessage:
        """Executor-side: chunk this partition's rows into batch-size
        writes with rejection repair (the reference's publish loop,
        TimestreamSink.java:88-142 — partial batches always flush)."""
        from .sink import DEFAULT_BATCH_SIZE, timestream_backend_factory, write_chunked

        o = self._options
        client_kwargs = None
        if o.get("accesskeyid"):
            client_kwargs = {
                "aws_access_key_id": o["accesskeyid"],
                "aws_secret_access_key": o.get("secretaccesskey", ""),
            }
        factory = timestream_backend_factory(
            region=o.get("region", "us-east-1"),
            database=o["database"],
            table=o["table"],
            endpoint_url=o.get("endpointurl"),
            client_kwargs=client_kwargs,
        )
        written, rejected = write_chunked(
            iterator,
            factory(),
            batch_size=int(o.get("batchsize", DEFAULT_BATCH_SIZE)),
        )
        return TimestreamCommitMessage(written=written, rejected=rejected)

    def commit(self, messages, batchId: int) -> None:
        """Driver-side batch barrier: every partition reported in. The
        write itself is at-least-once per partition attempt (Timestream
        upserts on (dimensions, time, measure_name), which makes replay
        idempotent at the store — the reference relies on the same)."""

    def abort(self, messages, batchId: int) -> None:
        """Nothing to roll back: Timestream has no transaction to abort;
        replayed batches land idempotently (see commit)."""


class TimestreamPythonDataSource(DataSource):
    """``format("timestream_py")`` — register with
    ``spark.dataSource.register(TimestreamPythonDataSource)``. Options:
    ``database``, ``table`` (required), ``endpointUrl``, ``region``,
    ``batchSize`` (default 50 = TimestreamIngestBatchSize,
    StreamingJob.java:174), ``accessKeyId``/``secretAccessKey``."""

    @classmethod
    def name(cls) -> str:
        return "timestream_py"

    def streamWriter(self, schema, overwrite: bool) -> TimestreamStreamWriter:
        return TimestreamStreamWriter(self.options)
