"""Drift guard for the driver-generated testdata's physical layout.

The r1→r2 testdata regeneration silently flipped ``events.ts`` from
TIMESTAMP(NANOS) (read as epoch-nanos long) to ``timestamp[us]``/
TIMESTAMP_NTZ; every plan that assumed the old layout broke — 9 queries,
the full pytest suite, and the bench (VERDICT r2). This test reads every
parquet footer and asserts the loaders normalize each physical type, so
the NEXT layout flip fails loudly here with a fix instruction instead of
producing silently-shifted results.

If this test fails: extend ``functions/time.py:normalize_ts_col`` (for
time columns) or ``sources/batch.py:load_table`` for the new physical
type, then update the expectations below and the layout notes in
TESTDATA.md.
"""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import types as T

from kda_flink_app_timestream_spark.sources.batch import load_table

GUARD_SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

# Physical (Arrow) types the engine's loaders are known to handle, per
# column pattern. Anything outside this map is an unvetted layout drift.
_ACCEPTED_ARROW = {
    "events.ts": {"timestamp[ns]", "timestamp[us]", "timestamp[ms]", "int64"},
    "lineitem.l_shipdate": {"timestamp[us]", "timestamp[ms]", "date32[day]"},
    "orders.o_orderdate": {"timestamp[us]", "timestamp[ms]", "date32[day]"},
    "embeddings.embedding": {"list<element: float>", "list<item: float>"},
}

# Logical Spark types every downstream plan may rely on after load_table.
_EXPECTED_SPARK = {
    ("events", "ts"): T.TimestampType,
}


def _tables() -> list[str]:
    return sorted(
        os.path.basename(p)[: -len(".parquet")]
        for p in glob.glob(f"{GUARD_SF_DIR}/*.parquet")
    )


def test_testdata_dir_present() -> None:
    assert _tables(), f"no parquet testdata found under {GUARD_SF_DIR}"


@pytest.mark.parametrize("table", _tables())
def test_footer_types_are_vetted(table: str) -> None:
    """Every time-ish / nested column's physical type must be one the
    loaders were written against."""
    schema = pq.read_schema(f"{GUARD_SF_DIR}/{table}.parquet")
    for name, typ in zip(schema.names, schema.types):
        key = f"{table}.{name}"
        ts = str(typ)
        if key in _ACCEPTED_ARROW:
            assert ts in _ACCEPTED_ARROW[key], (
                f"TESTDATA LAYOUT DRIFT: {key} is physically {ts!r}, which no "
                f"loader has been vetted for (accepted: {_ACCEPTED_ARROW[key]}). "
                "Extend functions/time.py:normalize_ts_col / sources/batch.py:"
                "load_table, then add the type here and note it in TESTDATA.md."
            )
        elif ts.startswith("timestamp") or ts.startswith("date"):
            # a NEW time column appeared — force a conscious vetting step
            raise AssertionError(
                f"TESTDATA LAYOUT DRIFT: new time-typed column {key} ({ts}); "
                "vet it against the loaders and register it in _ACCEPTED_ARROW."
            )


def test_loader_normalizes_events_ts(spark) -> None:
    """Whatever the physical layout, load_table must surface events.ts as
    logical TimestampType (the contract every plan compiles against)."""
    df = load_table(spark, GUARD_SF_DIR, "events")
    for (table, col), expected in _EXPECTED_SPARK.items():
        assert isinstance(df.schema[col].dataType, expected), (
            f"{table}.{col} surfaced as {df.schema[col].dataType} after "
            f"load_table; expected {expected.__name__}. normalize_ts_col "
            "does not cover this physical layout."
        )
    # and the values must be sane: the generator's event clock is
    # recent-era; a unit mix-up (ns read as us etc.) lands centuries away
    row = df.selectExpr("min(year(ts)) AS lo", "max(year(ts)) AS hi").first()
    assert 2000 <= row.lo <= row.hi <= 2100, (
        f"events.ts year range [{row.lo}, {row.hi}] is implausible — "
        "timestamp unit mis-normalized"
    )


def test_normalize_ts_col_all_layouts(spark):
    """Unit-pin every branch of the layout normalizer: today's testdata
    only exercises the NTZ path, but the nanos-as-long path must keep
    working in case the driver flips back (it already flipped once)."""
    import datetime

    from pyspark.sql import Row
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from kda_flink_app_timestream_spark.functions.time import normalize_ts_col

    base_us = 1_700_000_000_123_456  # 2023-11-14T22:13:20.123456 UTC

    # epoch-nanos long (r1 physical layout via nanosAsLong)
    long_df = spark.createDataFrame([Row(ts=base_us * 1000)], "ts long")
    got = normalize_ts_col(long_df).first()["ts"]
    assert got == datetime.datetime(2023, 11, 14, 22, 13, 20, 123456)

    # TIMESTAMP_NTZ (r2+ layout)
    ntz_df = spark.createDataFrame(
        [Row(ts=datetime.datetime(2023, 11, 14, 22, 13, 20, 123456))],
        T.StructType([T.StructField("ts", T.TimestampNTZType())]),
    )
    out = normalize_ts_col(ntz_df)
    assert isinstance(out.schema["ts"].dataType, T.TimestampType)
    assert out.first()["ts"] == datetime.datetime(2023, 11, 14, 22, 13, 20, 123456)

    # already-normalized TimestampType: no-op
    ts_df = spark.createDataFrame(
        [Row(ts=datetime.datetime(2023, 11, 14, 22, 13, 20, 123456))],
        T.StructType([T.StructField("ts", T.TimestampType())]),
    )
    assert normalize_ts_col(ts_df) is ts_df

    # absent column: pass-through; unknown type: loud failure
    assert normalize_ts_col(long_df, "nope") is long_df
    import pytest as _pytest

    with _pytest.raises(TypeError, match="unsupported physical type"):
        normalize_ts_col(spark.createDataFrame([Row(ts="x")], "ts string"))


def test_epoch_helpers_accept_ntz(spark):
    """epoch_seconds/millis/micros must not raise on TIMESTAMP_NTZ input
    (the r2 failure mode) and must agree with the UTC epoch."""
    import datetime

    from pyspark.sql import Row
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from kda_flink_app_timestream_spark.functions.time import (
        epoch_micros,
        epoch_millis,
        epoch_seconds,
    )

    ntz_df = spark.createDataFrame(
        [Row(ts=datetime.datetime(2023, 11, 14, 22, 13, 20, 123456))],
        T.StructType([T.StructField("ts", T.TimestampNTZType())]),
    )
    r = ntz_df.select(
        epoch_seconds("ts").alias("s"),
        epoch_millis("ts").alias("ms"),
        epoch_micros(F.col("ts")).alias("us"),
    ).first()
    assert r["s"] == 1_700_000_000
    assert r["ms"] == 1_700_000_000_123
    assert r["us"] == 1_700_000_000_123_456


def test_sketch_anchors_match_current_testdata():
    """Drift guard for the committed sketch-verification anchors
    (plans/advanced.py:_SKETCH_ANCHORS): if the driver ever regenerates
    the testdata with a different seed, `approx_sketches_fast` would
    emit NULL verdicts against an oracle pinning TRUE — this test makes
    that failure mode a named suite red instead of a mysterious driver
    hash mismatch. Recomputes the exact anchors with DuckDB at every
    available sf and compares value-for-value."""
    import os

    import duckdb

    from kda_flink_app_timestream_spark.plans.advanced import _SKETCH_ANCHORS

    checked = 0
    for sf in ("0.001", "0.01", "0.1"):
        path = f"/root/testdata/sf{sf}/lineitem.parquet"
        if not os.path.exists(path):
            continue
        con = duckdb.connect()
        rows = con.execute(
            f"""
            SELECT l_returnflag, count(*) AS n,
                   count(DISTINCT l_partkey) AS nd,
                   quantile_cont(l_extendedprice, 0.49) AS p49,
                   quantile_cont(l_extendedprice, 0.51) AS p51
            FROM read_parquet('{path}') GROUP BY 1
            """
        ).fetchall()
        con.close()
        for flag, n, nd, p49, p51 in rows:
            anchor = _SKETCH_ANCHORS.get((flag, n))
            assert anchor is not None, (
                f"sf{sf} {flag}: no committed anchor for n={n} — the "
                "testdata changed; recompute _SKETCH_ANCHORS"
            )
            a_nd, a_p49, a_p51 = anchor
            assert a_nd == nd, (sf, flag, nd, a_nd)
            assert abs(a_p49 - p49) < 1e-6, (sf, flag, p49, a_p49)
            assert abs(a_p51 - p51) < 1e-6, (sf, flag, p51, a_p51)
            checked += 1
    assert checked >= 3, "no testdata scale was available to check"
