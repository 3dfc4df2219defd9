"""Tests beyond the oracle harness: sketch accuracy vs exact values,
stateful running counts vs the batch aggregate, config resolution
precedence, DDL bootstrap idempotence."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kda_flink_app_timestream_spark.plans import load_all_plans
from kda_flink_app_timestream_spark.session import resolve_config
from kda_flink_app_timestream_spark.sources.batch import load_table
from kda_flink_app_timestream_spark.streaming.bootstrap import initialize

REGISTRY = load_all_plans()


def test_approx_sketches_accuracy(spark, sf_dir):
    """The sketches must land inside their error bounds (the verdict
    booleans the oracle hash-checks), and the exact columns must agree
    with an independent computation — plus a tighter 10% accuracy check
    on the raw sketch values the query no longer exposes."""
    got = {r["l_returnflag"]: r for r in REGISTRY["approx_sketches"].fn(spark, sf_dir).collect()}
    li = load_table(spark, sf_dir, "lineitem")
    raw = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("parts"),
            F.approx_count_distinct("l_partkey").alias("approx_parts"),
            F.expr("percentile(l_extendedprice, 0.5D)").alias("median"),
            F.percentile_approx("l_extendedprice", 0.5).alias("approx_median"),
        )
        .collect()
    }
    assert got
    for flag, row in got.items():
        assert row["approx_parts_ok"] and row["approx_median_ok"], row
        assert row["exact_parts"] == raw[flag]["parts"]
        assert abs(raw[flag]["approx_parts"] - raw[flag]["parts"]) / raw[flag]["parts"] < 0.1
        assert abs(raw[flag]["approx_median"] - raw[flag]["median"]) / raw[flag]["median"] < 0.1


def test_stateful_running_counts_match_batch(spark, sf_dir):
    got = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in REGISTRY["stream_stateful_running_counts"].fn(spark, sf_dir).collect()
    }
    exact = {
        r["user_id"]: (r["n"], r["total"])
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .collect()
    }
    assert got == exact


def test_resolve_config_precedence():
    got = resolve_config(
        args=["--region", "us-west-2", "--batch=100", "--flag"],
        properties={"region": "eu-west-1", "stream": "s1"},
        defaults={"region": "us-east-1", "stream": "default", "db": "kda"},
    )
    assert got["region"] == "us-west-2"  # CLI wins (ParameterToolUtils.java:26-32)
    assert got["stream"] == "s1"  # properties beat defaults
    assert got["db"] == "kda"  # defaults survive
    assert got["batch"] == "100" and got["flag"] == "true"


def test_bootstrap_idempotent(spark):
    initialize(spark, "kda_test_db", "points")
    initialize(spark, "kda_test_db", "points")  # second run must not raise
    tables = [t.name for t in spark.catalog.listTables("kda_test_db")]
    assert "points" in tables
    props = spark.sql("SHOW TBLPROPERTIES kda_test_db.points").collect()
    kv = {r["key"]: r["value"] for r in props}
    assert kv["retention.memory_store_hours"] == "24"  # TimestreamInitializer.java:12
    assert kv["retention.magnetic_store_days"] == "7"  # TimestreamInitializer.java:13
    spark.sql("DROP TABLE kda_test_db.points")
    spark.sql("DROP DATABASE kda_test_db")


def test_udtf_char_ngrams_short_docs_yield_no_rows(spark, tmp_path):
    """Spark's sequence() throws when stop < start with a positive
    step, so a document shorter than one 4-char gram used to crash the
    whole query; the clamped form must instead contribute zero rows
    (DuckDB's range() semantics) while long docs are unaffected."""
    docs = spark.createDataFrame(
        [(1, "abc"), (2, ""), (3, "abcdefghijkl")],
        "doc_id long, text string",
    )
    docs.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = REGISTRY["udtf_char_ngrams"].fn(spark, str(tmp_path)).collect()
    assert {r["doc_id"] for r in out} == {3}
    grams = sorted((r["pos"], r["gram"]) for r in out)
    assert grams == [(1, "abcd"), (8, "hijk")]
