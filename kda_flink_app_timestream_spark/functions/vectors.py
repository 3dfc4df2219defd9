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


def sql_cosine(a: str, b: str) -> str:
    """DuckDB twin (cast to DOUBLE[] first for identical arithmetic)."""
    return f"list_cosine_similarity({a}::DOUBLE[], {b}::DOUBLE[])"
