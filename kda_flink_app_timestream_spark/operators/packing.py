"""Context-window packing (LLM-pipeline surface): assign documents to
token-budget packs by prefix-sum bucketing — pack = floor(preceding
running token sum / budget). (Not classic next-fit, which closes a pack
when ADDING would overflow; prefix bucketing closes when the cumulative
sum crosses a budget multiple. Both keep the guarantee that matters —
every pack's token total ≤ budget + one document — and prefix bucketing
is a single window expression, no per-row state.)

Two renditions of the same operator:

- ``pack_contexts(..., partition_local=False)`` — single global doc_id
  order. Deterministic and SQL-expressible (the catalog query
  ``text_context_packing`` uses it for oracle parity), but the ordered
  window has no PARTITION BY → Spark moves every row to ONE partition.
  Fine at oracle scale; a scale-killer at 100 TB.
- ``pack_contexts(..., partition_local=True)`` — the production path:
  the running sum is computed per input partition and the pack key is
  ``(partition_id, local_pack)``. No global order is ever materialized,
  no single-partition shuffle, and the packing guarantee that matters —
  every pack's token total stays ≤ budget + one document — holds per
  pack exactly as in the global form. Pack numbering (not membership
  quality) depends on the input split, which is why the oracle query
  pins the global form instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

DEFAULT_TOKEN_BUDGET = 2048


def pack_contexts(
    df: DataFrame,
    id_col: str = "doc_id",
    n_tokens_col: str = "n_tokens",
    budget: int = DEFAULT_TOKEN_BUDGET,
    partition_local: bool = True,
) -> DataFrame:
    """Add a ``pack_id`` column: prefix-sum bucketing by running token
    sum (see module docstring for the next-fit distinction).

    Partition-local packs are keyed ``"p<partition>_<pack>"`` (string);
    the global form keeps the plain long pack number (the shape the
    oracle-paired catalog query compares)."""
    if partition_local:
        # pin the partition id BEFORE the window's exchange — used
        # inline, spark_partition_id() would re-evaluate post-shuffle
        # and collapse distinct input partitions into one pack space
        staged = df.withColumn("__pid", F.spark_partition_id())
        w = (
            W.partitionBy("__pid").orderBy(id_col)
            .rowsBetween(W.unboundedPreceding, 0)
        )
        local = F.floor(
            (F.sum(n_tokens_col).over(w) - F.col(n_tokens_col)) / budget
        ).cast("long")
        pack = F.concat(
            F.lit("p"), F.col("__pid").cast("string"),
            F.lit("_"), local.cast("string"),
        )
        return staged.withColumn("pack_id", pack).drop("__pid")
    else:
        w = W.orderBy(id_col).rowsBetween(W.unboundedPreceding, 0)
        pack = F.floor(
            (F.sum(n_tokens_col).over(w) - F.col(n_tokens_col)) / budget
        ).cast("long")
    return df.withColumn("pack_id", pack)


def pack_summary(packed: DataFrame, id_col: str = "doc_id") -> DataFrame:
    return packed.groupBy("pack_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("pack_tokens"),
        F.min(id_col).cast("long").alias("first_doc"),
        F.max(id_col).cast("long").alias("last_doc"),
    )
