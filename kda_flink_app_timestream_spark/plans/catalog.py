"""The named-query catalog — the engine's scored surface.

Every operator the engine implements registers here as a ``Query``:
a PySpark callable ``(spark, sf_dir) -> DataFrame`` paired with the
equivalent ANSI SQL the DuckDB oracle runs over the same parquet
tables. The driver hash-compares the two at sf0.01
(``__spark_entry__.py`` re-exports this registry).

Parity rules every query obeys (so the order-insensitive value-hash
matches):

- every computed/aggregate column is aliased identically on both sides;
- double-typed outputs are ``round()``-ed (2-6 decimals) on BOTH sides,
  because Spark's partial-aggregation order and DuckDB's differ in the
  last float bits;
- timestamps collect UTC-naive on both sides (session TZ pinned to UTC
  at call time);
- any LIMIT/top-k is totally ordered via a unique tie-break key.

Queries whose semantics are not SQL-expressible (streaming state,
approximate sketches) register with ``oracle=None`` → the driver
records a weaker rows-only check.
"""

from __future__ import annotations

import functools
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from ..session import configure_runtime, release_deferred


@dataclass(frozen=True)
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, Query] = {}


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Register a catalog query. The wrapped callable first applies the
    engine's runtime conf (UTC timezone etc.) to the driver-owned session."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        @functools.wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            configure_runtime(spark)
            # release the PREVIOUS query's deferred caches: its result
            # has been consumed by now (driver/bench/tests collect each
            # query before building the next), so nothing recomputes
            release_deferred()
            return fn(spark, sf_dir)

        REGISTRY[name] = Query(
            name=name, fn=wrapped, oracle=oracle, doc=(fn.__doc__ or "").strip(), tags=tags
        )
        return wrapped

    return deco


_LOADED = False


def load_all_plans() -> dict[str, Query]:
    """Import every plan module exactly once, populating REGISTRY."""
    global _LOADED
    if not _LOADED:
        from . import (  # noqa: F401
            advanced,
            clustering,
            curation,
            dedup,
            layout,
            multimodal,
            reference,
            relational,
            scale_queries,
            similarity,
            streaming_queries,
            tpch_shapes,
            text,
            timeseries,
            udf,
        )

        _LOADED = True
    return REGISTRY
