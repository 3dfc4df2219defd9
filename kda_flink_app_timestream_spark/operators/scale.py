"""Scale-engineering operators: bucketed co-located joins and salted
skew joins — the two levers that matter most for 100 TB fact-fact joins
beyond what AQE does automatically.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int = 16,
    sort_cols: Sequence[str] | None = None,
) -> None:
    """Persist a table bucketed (and optionally sorted) on its join key.

    Two tables bucketed the same way join with NO shuffle on either side
    (and no sort, if sorted) — for a recurring 100 TB fact-fact join the
    one-time bucketed write amortizes across every later query.
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS `{table}`")
    # a crashed previous write can leave the managed location behind with
    # no catalog entry — saveAsTable then fails LOCATION_ALREADY_EXISTS
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    leftover = os.path.join(warehouse.removeprefix("file:"), table.lower())
    if os.path.isdir(leftover):
        shutil.rmtree(leftover, ignore_errors=True)
    writer = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with key salting for pathological skew.

    The skewed LEFT side gets a random-ish (hash-derived, deterministic)
    salt in [0, salt_buckets); the RIGHT side is replicated once per salt
    value via an explode — so one hot key's rows spread over
    ``salt_buckets`` reducers instead of one. Use when AQE's skew-join
    split isn't available (non-shuffle joins) or the skew is extreme;
    costs a ``salt_buckets``× blow-up of the right side.

    Only left-preserving joins are legal: an unmatched RIGHT row exists
    once per replica, so right/full outer (or right semi/anti) would
    emit it ``salt_buckets`` times.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "semi", "left_semi",
               "leftsemi", "anti", "left_anti", "leftanti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports only left-preserving joins {sorted(allowed)}; "
            f"got how={how!r} — the replicated right side would duplicate "
            "unmatched right rows"
        )
    salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_buckets))
    l_salted = left.withColumn("__salt", salt.cast("int"))
    r_salted = right.withColumn(
        "__salt",
        F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)])),
    )
    out = l_salted.join(r_salted, [key, "__salt"], how)
    return out.drop("__salt")
