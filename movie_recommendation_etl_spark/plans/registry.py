"""Query registry: every operator from SURVEY.md §2 (and the training-data
extensions) lands here as a named (Spark callable, DuckDB oracle SQL) pair.

The driver's correctness gate (__spark_entry__.py contract) runs both sides at
sf0.01 and compares row-count + schema + order-insensitive value hash; queries
whose semantics are not SQL-expressible (LSH candidates, streaming state)
register with ``oracle=None`` and get the weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query; ``oracle`` is equivalent DuckDB ANSI SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco
