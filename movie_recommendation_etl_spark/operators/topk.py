"""Top-k operators (SURVEY.md §2.7, L1-L3).

``top_k`` compiles to TakeOrderedAndProject (no global sort, per-partition
heaps + driver merge) — the right physical shape at any scale. Ordering must
include a unique tiebreaker for deterministic results; callers pass fully
deterministic sort columns.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def top_k(df: DataFrame, order_by: Sequence[Column], k: int) -> DataFrame:
    return df.orderBy(*order_by).limit(k)


def grouped_top_k(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """Top-k rows per group via row_number — one shuffle on the group key;
    map-side AQE handles skewed groups."""
    w = W.partitionBy(*partition_by).orderBy(*order_by)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)
