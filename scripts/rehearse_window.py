"""Local rehearsal of the driver's correctness gate.

Runs the first N names of ``_ordered_names()`` (the exact set the
driver's 50-slot window will score next round) through the same
compare the driver performs: Spark result vs the registered DuckDB
oracle at sf0.01, columns sorted by name, rows sorted, floats
rounded, timestamps normalized. Prints one line per query and a
summary; exits non-zero on any mismatch so it can gate a commit.

Usage: python scripts/rehearse_window.py [N]
"""

from __future__ import annotations

import datetime
import decimal
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _norm(v):
    if isinstance(v, float):
        # duckdb's fetch_df maps SQL NULL floats to NaN; Spark collect
        # yields None — fold both to None so the compare matches the
        # driver's NULL semantics
        if v != v:
            return None
        return round(v, 9)
    if isinstance(v, (pd.Timestamp, datetime.datetime)):
        return str(pd.Timestamp(v))
    if isinstance(v, decimal.Decimal):
        return round(float(v), 9)
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def main() -> int:
    n_queries = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    sf = "/root/testdata/sf0.01"

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.master("local[8]").getOrCreate()

    import __spark_entry__ as e

    names = e._ordered_names()[:n_queries]
    qs, sqls = e.queries(), e.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf}/{t}.parquet')"
        )

    failures = []
    for name in names:
        t0 = time.time()
        try:
            df = qs[name](spark, sf)
            cols = sorted(df.columns)
            srows = sorted(
                repr(tuple(_norm(r[c]) for c in cols)) for r in df.collect()
            )
            if name not in sqls:
                print(f"{name}: rows-only ({len(srows)} rows, "
                      f"{time.time() - t0:.1f}s)")
                continue
            # fetchall(), not fetch_df(): pandas coerces nullable BIGINT
            # columns to float64 (5 -> 5.0) and NULL timestamps to NaT,
            # which false-positives every NULL-bearing query
            cur = con.execute(sqls[name])
            raw_cols = [d[0] for d in cur.description]
            raw = cur.fetchall()
            ocols = sorted(raw_cols)
            if ocols != cols:
                failures.append(name)
                print(f"{name}: SCHEMA MISMATCH spark={cols} oracle={ocols}")
                continue
            order = [raw_cols.index(c) for c in cols]
            orows = sorted(
                repr(tuple(_norm(row[i]) for i in order)) for row in raw
            )
            if srows == orows:
                print(f"{name}: OK ({len(srows)} rows, "
                      f"{time.time() - t0:.1f}s)")
            else:
                failures.append(name)
                only_s = [r for r in srows if r not in set(orows)][:2]
                only_o = [r for r in orows if r not in set(srows)][:2]
                print(f"{name}: VALUE MISMATCH "
                      f"(spark {len(srows)} vs oracle {len(orows)} rows)")
                for r in only_s:
                    print(f"  spark-only: {r[:200]}")
                for r in only_o:
                    print(f"  oracle-only: {r[:200]}")
        except Exception as exc:  # noqa: BLE001 — rehearsal must not abort
            failures.append(name)
            print(f"{name}: ERROR {type(exc).__name__}: {exc}")
        spark.catalog.clearCache()

    print(f"\n{len(names) - len(failures)}/{len(names)} green")
    if failures:
        print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
