"""Kinesis source path (SURVEY §2 #1 — StreamingJob.java:74-110).

The sandbox has neither the Spark Kinesis connector jar nor a
kinesalite/LocalStack endpoint, so the full round-trip test is
skip-guarded behind ``KINESIS_ENDPOINT_URL`` — it exists so any
environment that DOES provide an endpoint exercises the last untested
reference operator path. What always runs is the factory-plumbing test:
the ``kinesis`` branch must march all the way to the connector lookup
(proving stream name/region/poll-tuning options are applied), failing
only at Spark's data-source resolution when the jar is absent.
"""

from __future__ import annotations

import os

import pytest

from kda_flink_app_timestream_spark.streaming.source import (
    KINESIS_DEFAULT_OPTIONS,
    streaming_source,
)

ENDPOINT = os.environ.get("KINESIS_ENDPOINT_URL") or os.environ.get(
    "AWS_ENDPOINT_URL"
)


def test_kinesis_branch_reaches_connector_lookup(spark):
    """Without the connector jar the branch must fail at Spark's
    DataSource lookup (mentioning the missing 'kinesis' source) — not
    earlier in our factory code."""
    with pytest.raises(Exception) as excinfo:
        streaming_source(
            spark, kind="kinesis", stream_name="svc-logs", region="us-east-1"
        )
    msg = str(excinfo.value).lower()
    assert "kinesis" in msg, f"failed before the connector lookup: {msg[:200]}"


def test_kinesis_default_options_mirror_reference_tuning():
    """The poll tuning must match StreamingJob.java:84-95
    (SHARD_GETRECORDS_INTERVAL_MILLIS=1000, SHARD_GETRECORDS_MAX=10000)."""
    assert KINESIS_DEFAULT_OPTIONS["kinesis.executor.maxFetchTimeInMs"] == "1000"
    assert (
        KINESIS_DEFAULT_OPTIONS["kinesis.executor.maxFetchRecordsPerShard"]
        == "10000"
    )


@pytest.mark.skipif(
    not ENDPOINT,
    reason="no kinesalite/LocalStack endpoint (set KINESIS_ENDPOINT_URL)",
)
def test_kinesis_roundtrip_against_local_endpoint(spark):
    """Full produce→consume round-trip against a local Kinesis clone.

    Requires: a reachable endpoint, boto3, and the spark-sql-kinesis
    connector on the session classpath — all environment-provided."""
    boto3 = pytest.importorskip("boto3")

    stream = "kda-spark-test-stream"
    client = boto3.client(
        "kinesis",
        endpoint_url=ENDPOINT,
        region_name="us-east-1",
        aws_access_key_id="test",
        aws_secret_access_key="test",
    )
    try:
        client.create_stream(StreamName=stream, ShardCount=1)
        client.get_waiter("stream_exists").wait(StreamName=stream)
    except client.exceptions.ResourceInUseException:
        pass
    payloads = [b"Operation=GetTable", b"Operation=CreateTable"]
    for i, data in enumerate(payloads):
        client.put_record(StreamName=stream, Data=data, PartitionKey=str(i))

    df = streaming_source(
        spark,
        kind="kinesis",
        stream_name=stream,
        region="us-east-1",
        options={"endpointUrl": ENDPOINT, "initialPosition": "TRIM_HORIZON"},
    )
    q = (
        df.writeStream.format("memory")
        .queryName("kinesis_roundtrip")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["value"] for r in spark.table("kinesis_roundtrip").collect()}
    assert {p.decode() for p in payloads} <= got
