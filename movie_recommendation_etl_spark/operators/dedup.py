"""Deduplication operators.

The reference deduplicates with ``dropDuplicates(["id"])`` (reference
transform/execute.py:80) — arbitrary survivor, nondeterministic under
re-partitioning. Our engine's exact dedup picks a *deterministic* survivor via
row_number (SURVEY.md §2.5 A3), so goldens are stable across cluster sizes.
Near-duplicate detection (MinHash/SimHash) lives in operators/neardup.py.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def dedup_keep_first(
    df: DataFrame, keys: Sequence[str], order_by: Sequence[Column]
) -> DataFrame:
    """Keep exactly one row per key, chosen by the (total) ordering given.

    Single hash shuffle on ``keys``; AQE skew-join/partition-split keeps hot
    keys from stalling a 1000-executor run.
    """
    w = W.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def fingerprint(col: Column) -> Column:
    """Canonical content fingerprint: lowercase, collapse non-alphanumerics to
    single spaces, trim, md5. Identical SQL exists in DuckDB for the oracle."""
    norm = F.trim(F.regexp_replace(F.lower(col), r"[^a-z0-9]+", " "))
    return F.md5(norm)
