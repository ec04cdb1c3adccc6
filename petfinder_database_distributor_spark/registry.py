"""Query registry — the single source of truth behind ``__spark_entry__``.

Every implemented operator from SURVEY.md §2 (plus the north-star
generalization layer) registers here as a named query: a Spark callable
``(spark, sf_dir) -> DataFrame`` and, when SQL-expressible, the equivalent
DuckDB oracle SQL over the same parquet tables. The driver hash-compares the
two at sf0.01 (row-count + schema + order-insensitive value-hash), so both
sides alias computed columns identically.

Float discipline: any aggregate over DOUBLE columns is computed via
``CAST(... AS DECIMAL)`` → exact sum → ``CAST(... AS DOUBLE)`` in BOTH
engines, so results are bit-identical regardless of summation order
(summing doubles is order-dependent; decimal sums are exact).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None → driver does rows-only check
    doc: str = ""


QUERIES: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: add a query (and optionally its DuckDB oracle) to the registry."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = QuerySpec(fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every plan module (each registers its queries on import)."""
    from petfinder_database_distributor_spark.plans import (  # noqa: F401
        advanced_relational,
        extraction_plans,
        flagship,
        llm_pipeline,
        physical,
        reference_ops,
        relational,
        source_sink_plans,
        streaming_plans,
    )

    return QUERIES
