"""Vector math over ``array<float>`` embedding columns — pure Catalyst
expressions (zip_with + aggregate fold), no UDF, no Python.

Arithmetic is done in DOUBLE with a sequential left fold, which matches
DuckDB's ``list_dot_product``/``list_cosine_similarity`` over
``DOUBLE[]`` bit-for-bit on the same input order — that is what makes
similarity queries oracle-checkable. (Float32 accumulation or reordered
reduction would drift in the last bits.)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def dot_unrolled(a: str, b: str, dim: int) -> Column:
    """``dot`` over columns named ``a``/``b``, unrolled to a fixed-dim
    ``element_at`` sum built as ONE SQL string.

    Bit-identical to the fold: SQL ``+`` is left-associative, so
    ``(x1+x2)+x3…`` reproduces the fold's sequential order exactly
    (``0.0 + x1 == x1`` for every double), and each product is the same
    double op. The payoff is execution shape: higher-order functions
    are CodegenFallback (interpreted per row, lambda allocs per
    element), while an unrolled chain runs inside whole-stage codegen —
    ~an order of magnitude on pairwise hot paths. One parse per plan,
    not per-element py4j calls."""
    terms = " + ".join(
        f"(element_at({a}, {i}) * element_at({b}, {i}))" for i in range(1, dim + 1)
    )
    return F.expr(terms)


def norm_unrolled(a: str, dim: int) -> Column:
    return F.sqrt(dot_unrolled(a, a, dim))


def sql_cosine(a: str, b: str) -> str:
    """DuckDB twin (cast to DOUBLE[] first for identical arithmetic)."""
    return f"list_cosine_similarity({a}::DOUBLE[], {b}::DOUBLE[])"
