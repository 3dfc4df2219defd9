"""Python-boundary operator coverage (SURVEY §2.2 "UDF / UDAF / UDTF"):
grouped-map ``applyInPandas`` (UDAF-style per-group computation checked
against a pure-SQL oracle) and a table-function UDTF. The engine's rule
stands: Python only when semantics demand it — these exist to prove the
boundary works, with the native-expression equivalent alongside.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.batch import load_table
from .catalog import query


# ONE oracle for both z-score twins ("same oracle, same hash" is the
# twins' contract — a shared constant removes the silent-drift channel
# a future one-sided edit would open; this round's sign-of-zero pin was
# exactly such an edit)
_ZSCORE_ORACLE = """
    SELECT o_orderkey, o_custkey,
           CASE WHEN count(*) OVER w > 1
                THEN round((o_totalprice - avg(o_totalprice) OVER w)
                           / stddev_samp(o_totalprice) OVER w, 4) + 0.0
           END AS price_zscore
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey)
    """


@query(
    "applyinpandas_zscore",
    oracle=_ZSCORE_ORACLE,
    tags=("udf", "applyInPandas", "grouped-map", "test-config"),
)
def applyinpandas_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas CATEGORY PROOF: per-customer z-score of
    order prices, computed in pandas per group, oracle-checked against
    the SQL window formulation. Arrow moves each group as one batch;
    groups are hash-partitioned so skew in customer size is the only
    hot spot (mitigated upstream by AQE skew splitting on the shuffle).

    Tagged ``test-config`` (VERDICT r7 #2): the computation is fully
    expressible as native window aggregates — ``window_zscore_native``
    below is the production path (same oracle, ~10× cheaper at sf0.1) —
    so this variant exists only to prove the grouped-map boundary, and
    its Arrow/Python cost must never be read as the operator's."""
    o = load_table(spark, sf_dir, "orders")

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n > 1:
            mean = pdf["o_totalprice"].mean()
            std = pdf["o_totalprice"].std(ddof=1)
            z = ((pdf["o_totalprice"] - mean) / std).round(4) + 0.0
        else:
            z = pd.Series([None] * n, dtype="float64")
        return pd.DataFrame(
            {
                "o_orderkey": pdf["o_orderkey"],
                "o_custkey": pdf["o_custkey"],
                "price_zscore": z,
            }
        )

    return o.groupBy("o_custkey").applyInPandas(
        zscore, schema="o_orderkey long, o_custkey long, price_zscore double"
    )


@query(
    "window_zscore_native",
    oracle=_ZSCORE_ORACLE,
    tags=("window", "analytic", "native-twin"),
)
def window_zscore_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION twin of ``applyinpandas_zscore`` — the identical
    per-customer z-score as pure native window aggregates (whole-stage
    codegen, zero Python). One shuffle on o_custkey computes count, avg
    and stddev_samp over the same unbounded partition frame; rows never
    leave the JVM. This is the engine's "built-in beats UDF" rule
    demonstrated on its own slowest sweep query (VERDICT r7 #2): same
    oracle, same hash, no Arrow crossing.

    Scale: the window frame is the whole customer partition, so cost is
    one hash-partitioned sort per group — the same shuffle the grouped-
    map variant pays, minus the Arrow serde and Python workers; a skewed
    giant customer is handled by AQE's skew-split on the exchange."""
    o = load_table(spark, sf_dir, "orders")
    from pyspark.sql.window import Window

    w = Window.partitionBy("o_custkey")
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.when(
            F.count("*").over(w) > 1,
            # + 0.0 pins the IEEE sign of zero: a tiny-negative z rounds
            # to -0.0 in DuckDB/pandas but +0.0 in Spark's round (found
            # by the 10x rehearsal); x + 0.0 is +0.0 in all three
            F.round(
                (F.col("o_totalprice") - F.avg("o_totalprice").over(w))
                / F.stddev_samp("o_totalprice").over(w),
                4,
            )
            + F.lit(0.0),
        ).alias("price_zscore"),
    )


@query(
    "udaf_price_median",
    oracle="""
    SELECT o_orderpriority, median(o_totalprice) AS median_price
    FROM orders
    GROUP BY o_orderpriority
    """,
    tags=("udf", "udaf", "grouped-agg", "pandas"),
)
def udaf_price_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg pandas UDAF (series → scalar): exact median order
    price per priority class. Median is UDAF-worthy — no decomposable
    built-in computes it exactly — and parity-safe: both engines sort
    and interpolate ``(a + b) / 2`` on the same doubles, with no
    order-dependent summation anywhere.

    Scale note: a grouped-agg pandas UDF materializes each group as one
    Arrow batch on one worker — right for bounded group counts like the
    5 priority classes here, wrong for huge groups; at 100 TB use
    ``approx_percentile`` (t-digest, partial-aggregable) and accept the
    approximation, or a two-pass exact selection."""
    import numpy as np

    o = load_table(spark, sf_dir, "orders")

    @F.pandas_udf("double")
    def median_udaf(v: pd.Series) -> float:
        return float(np.median(v.to_numpy()))

    return o.groupBy("o_orderpriority").agg(
        median_udaf("o_totalprice").alias("median_price")
    )


@query(
    "udtf_char_ngrams",
    oracle="""
    SELECT doc_id,
           CAST(pos AS INT) AS pos,
           substr(text, CAST(pos AS INT), 4) AS gram
    FROM documents, unnest(range(1, length(text) - 2, 7)) AS t(pos)
    WHERE doc_id < 50
    """,
    tags=("udf", "udtf", "table-function"),
)
def udtf_char_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-function shape: one document row → many (pos, 4-char-gram)
    rows at stride 7. Implemented NATIVELY (posexplode-style
    sequence + transform — codegen'd, no Python) because the expansion
    is expressible; a Python UDTF would only add serde cost. The oracle
    pins the row-multiplying semantics a UDTF provides.

    Documents shorter than one gram (< 4 chars) contribute zero rows:
    Spark's ``sequence`` THROWS when stop < start with a positive step
    (DuckDB's ``range`` just yields nothing), so the stop is clamped
    and such docs are dropped by exploding an empty array — identical
    membership to the oracle on any corpus, not just one whose every
    doc happens to be long enough."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    positions = F.when(
        F.length("text") >= 4,
        F.sequence(F.lit(1), F.length("text") - 3, F.lit(7)),
    ).otherwise(F.array().cast("array<int>"))
    return d.select(
        "doc_id", "text", F.explode(positions).alias("pos")
    ).select(
        "doc_id",
        F.col("pos").cast("int").alias("pos"),
        F.substring(F.col("text"), F.col("pos"), F.lit(4)).alias("gram"),
    )


_TOKEN_POSITIONS_ORACLE = """
SELECT doc_id,
       CAST(s.pos AS INT) AS pos,
       s.tok AS token,
       list_contains(['the', 'a', 'of', 'and', 'is', 'to', 'in', 'it', 'on', 'for'],
                     s.tok) AS is_stop
FROM (
    SELECT doc_id,
           unnest(list_transform(str_split(text, ' '),
                  (x, i) -> struct_pack(pos := i, tok := x))) AS s
    FROM documents WHERE doc_id < 100
)
"""


@query(
    "udtf_token_positions",
    oracle=_TOKEN_POSITIONS_ORACLE,
    tags=("udtf", "python", "lateral"),
)
def udtf_token_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A REAL Python UDTF (the Spark 4 ``@udtf`` table-function API, not
    a native emulation like ``udtf_char_ngrams``): one input row fans
    out to one row per token with its 1-based position and a stopword
    flag — the general per-row multi-row expansion hook (parsers,
    tokenizers, record splitters) when the logic genuinely needs Python.

    Scale notes: ``useArrow=True`` batches rows over Arrow instead of
    pickling one at a time; the UDTF is applied via LATERAL join so it
    parallelizes per-partition with no shuffle. For anything this simple
    the native ``posexplode(split(...))`` is the right production call —
    this query exists to prove the extension point works end-to-end."""
    from pyspark.sql.functions import lit, udtf

    @udtf(returnType="pos int, token string, is_stop boolean", useArrow=True)
    class TokenPositions:
        def eval(self, text: str):
            stops = {"the", "a", "of", "and", "is", "to", "in", "it", "on", "for"}
            if text is None:
                return
            for i, tok in enumerate(text.split(" "), start=1):
                yield i, tok, tok in stops

    spark.udtf.register("token_positions", TokenPositions)
    d = load_table(spark, sf_dir, "documents")
    d.filter(F.col("doc_id") < 100).select("doc_id", "text").createOrReplaceTempView(
        "udtf_docs_tmp"
    )
    return spark.sql(
        """
        SELECT d.doc_id, t.pos, t.token, t.is_stop
        FROM udtf_docs_tmp d, LATERAL token_positions(d.text) t
        """
    )
