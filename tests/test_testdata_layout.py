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
