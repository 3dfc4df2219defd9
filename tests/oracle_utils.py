"""Local replica of the driver's DuckDB-oracle comparison (t2): run the
PySpark query and the oracle SQL side-by-side, canonicalize (columns
sorted by name, rows sorted by stringified tuple), compare values.

Stricter than the driver can possibly be: exact equality on every cell
(floats included — queries are required to round on both sides).
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    key = df.apply(lambda row: repr(tuple(_canon_val(v) for v in row)), axis=1)
    df = df.loc[key.sort_values(kind="mergesort").index].reset_index(drop=True)
    return df


def _canon_val(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    if v is None or v is pd.NaT:
        return "None"
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    return repr(v)


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str) -> list[str]:
    """Return a list of mismatch descriptions (empty == pass)."""
    problems: list[str] = []
    if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
        problems.append(
            f"{name}: column mismatch spark={sorted(spark_pdf.columns)} "
            f"oracle={sorted(oracle_pdf.columns)}"
        )
        return problems
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"{name}: row count spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
        return problems
    s = canonicalize(spark_pdf)
    o = canonicalize(oracle_pdf)
    for col in s.columns:
        sv, ov = s[col].tolist(), o[col].tolist()
        bad = [
            (i, a, b)
            for i, (a, b) in enumerate(zip(sv, ov))
            if _canon_val(a) != _canon_val(b)
        ]
        if bad:
            i, a, b = bad[0]
            problems.append(
                f"{name}.{col}: {len(bad)}/{len(sv)} cells differ; "
                f"first at sorted-row {i}: spark={a!r} oracle={b!r}"
            )
    return problems
