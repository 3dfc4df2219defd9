"""Test-package shim: the in-process fake Kinesis endpoint moved into
the engine package (it backs the jar-free consumer surface, including
resharding — ``kda_flink_app_timestream_spark.streaming.kinesis_fake``).
Kept so existing test imports stay stable."""

from kda_flink_app_timestream_spark.streaming.kinesis_fake import (  # noqa: F401
    FakeKinesis,
    _ApiError,
)
