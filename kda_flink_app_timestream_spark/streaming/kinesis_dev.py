"""Dev/test Kinesis consumer: a bounded boto3 snapshot read.

The production path is the Spark Kinesis connector
(``streaming_source(kind="kinesis")``, streaming/source.py) — but the
connector jar cannot be assumed in every environment, and the reference
itself validates end-to-end against a live stream (README.md:33-36).
This module is the jar-free twin: it drains each shard of a (real or
kinesalite/LocalStack/fake) Kinesis endpoint once via the public
GetShardIterator/GetRecords API and returns a **batch** DataFrame, so
produce→consume semantics — shard fan-in, ordering per shard, gzip
payload decode (SURVEY §2.3.3), record metadata — are testable anywhere
boto3 can reach an endpoint.

Scale note: this is a DRIVER-SIDE poll, deliberately — it exists for
dev loops, integration tests, and small backfills (the same role the
reference's generator+console pairing plays). A 100 TB ingest goes
through the connector path, where each executor owns shards; the two
paths share the decode step and output schema, so tests of this path
cover the downstream plumbing of both.

Consumer tuning mirrors StreamingJob.java:84-95: ``GetRecords`` asks
for up to 10000 records per call (SHARD_GETRECORDS_MAX).
"""

from __future__ import annotations

import datetime as _dt
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .source import decode_payload

SNAPSHOT_SCHEMA = (
    "value string, partition_key string, sequence_number string, "
    "shard_id string, arrival_ts timestamp"
)


def kinesis_snapshot_read(
    spark: SparkSession,
    stream_name: str,
    *,
    region: str = "us-east-1",
    endpoint_url: str | None = None,
    decode: str = "none",
    max_records_per_get: int = 10000,
    boto3_client: Any | None = None,
    client_kwargs: dict[str, Any] | None = None,
) -> DataFrame:
    """Drain every shard of ``stream_name`` from TRIM_HORIZON to its
    current tip and return the records as a batch DataFrame with schema
    ``SNAPSHOT_SCHEMA``. ``decode="gzip"`` gunzips payloads (the
    reference's producer gzips, its consumer forgot — SURVEY §2.3.3;
    here the decode is explicit). Pass ``boto3_client`` to reuse a
    preconfigured client (tests), else one is built from
    ``region``/``endpoint_url``/``client_kwargs``.
    """
    client = boto3_client
    if client is None:
        try:
            import boto3
        except ImportError as ex:  # pragma: no cover - boto3 is baked in here
            raise RuntimeError(
                "kinesis_snapshot_read needs boto3 (or pass boto3_client)"
            ) from ex
        client = boto3.client(
            "kinesis",
            region_name=region,
            endpoint_url=endpoint_url,
            **(client_kwargs or {}),
        )

    shards = []
    token = None
    while True:
        kwargs = {"StreamName": stream_name}
        if token:
            kwargs = {"NextToken": token}
        resp = client.list_shards(**kwargs)
        shards += [s["ShardId"] for s in resp["Shards"]]
        token = resp.get("NextToken")
        if not token:
            break

    rows = []
    for shard_id in shards:
        it = client.get_shard_iterator(
            StreamName=stream_name,
            ShardId=shard_id,
            ShardIteratorType="TRIM_HORIZON",
        )["ShardIterator"]
        stalled_polls = 0
        prev_behind = None
        while it:
            resp = client.get_records(ShardIterator=it, Limit=max_records_per_get)
            # Empty pages are NORMAL mid-drain (the iterator walks empty
            # head ranges of a retention window), so they never truncate
            # the read. Only a stall — consecutive empty pages with no
            # MillisBehindLatest progress — aborts, and LOUDLY: silently
            # returning a partial shard would corrupt downstream results.
            behind = resp.get("MillisBehindLatest", 0)
            if resp["Records"]:
                stalled_polls = 0
            else:
                if behind == 0:
                    break  # caught up to the tip: the snapshot is complete
                stalled_polls = (
                    stalled_polls + 1
                    if prev_behind is not None and behind >= prev_behind
                    else 0
                )
                if stalled_polls > 100:
                    raise RuntimeError(
                        f"kinesis_snapshot_read stalled on shard {shard_id}: "
                        f"{stalled_polls} consecutive empty GetRecords pages "
                        f"with no MillisBehindLatest progress (still "
                        f"{behind} ms behind) — endpoint throttling or "
                        "clock skew; refusing to return a partial shard"
                    )
            prev_behind = behind
            for rec in resp["Records"]:
                data = rec["Data"]
                if isinstance(data, (bytes, bytearray)):
                    if decode == "none":
                        # connector contract: CAST(data AS STRING) = UTF-8
                        value = bytes(data).decode("utf-8", errors="replace")
                    else:
                        # a binary decode step follows: latin-1 is
                        # byte-preserving, and the gzip UDF re-encodes
                        # latin-1, so raw bytes round-trip exactly
                        value = bytes(data).decode("latin-1")
                else:
                    value = str(data)
                ts = rec.get("ApproximateArrivalTimestamp")
                if isinstance(ts, (int, float)):
                    ts = _dt.datetime.fromtimestamp(ts, tz=_dt.timezone.utc)
                if ts is not None and ts.tzinfo is not None:
                    ts = ts.astimezone(_dt.timezone.utc).replace(tzinfo=None)
                rows.append(
                    (value, rec.get("PartitionKey"), rec["SequenceNumber"],
                     shard_id, ts)
                )
            it = resp.get("NextShardIterator")

    df = spark.createDataFrame(rows, SNAPSHOT_SCHEMA)
    if decode != "none":
        df = df.withColumn("value", decode_payload(F.col("value"), codec=decode))
    return df
