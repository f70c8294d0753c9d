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
    """Top-k rows per group via row_number — one shuffle on the group key.

    Right when the group key is HIGH-cardinality (customers, documents):
    strata spread across reducers and no single task dominates. It is the
    WRONG shape for low-cardinality groups: a window partition cannot be
    split — AQE's skew handling only splits *join* partitions, row_number
    needs its whole stratum in one task — so a handful of languages over
    100 TB means one straggler reducer per language. Use
    ``grouped_top_k_two_stage`` there.
    """
    w = W.partitionBy(*partition_by).orderBy(*order_by)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)


def grouped_top_k_two_stage(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    *,
    salt_cols: Sequence[str | Column],
    n_salts: int = 64,
    rank_col: str = "rn",
) -> DataFrame:
    """Exact top-k per group for LOW-cardinality groups — the two-stage
    form that kills the one-reducer-per-stratum straggler.

    Stage 1 windows over ``(group, salt)`` where the salt is a
    deterministic hash of ``salt_cols`` into ``n_salts`` cells, so the
    full input shuffles into ``|groups| * n_salts`` parallel partitions
    and each cell keeps only its local top-k. Stage 2 re-windows over the
    group alone, but its input is now bounded at ``n_salts * k`` rows per
    group — metadata-sized however big the corpus is.

    EXACT for any data and any weights: every row in a group's true
    top-k is also in the top-k of its salt cell (a cell holds a subset of
    its competitors), so it always survives stage 1, and stage 2 computes
    the same ranks the single-window form would. Requires ``order_by`` to
    be a deterministic total order (the module-wide contract) and
    ``salt_cols`` to be deterministic row attributes — never
    ``spark_partition_id()``, which can change under task retry.

    Cost: one extra (tiny) shuffle of the stage-1 survivors vs
    ``grouped_top_k``; the win is that the big shuffle fans out over
    ``n_salts`` reducers per stratum instead of one. (Spark's rank-based
    WindowGroupLimit rewrite already prunes map-side to k rows per
    (group, map partition), bounding the naive form's shuffle VOLUME —
    but its reduce side still funnels every stratum into one task; the
    two-stage form parallelizes that reduce across ``n_salts`` cells.)
    """
    if n_salts < 1:
        raise ValueError(f"n_salts must be >= 1, got {n_salts}")
    salt = F.pmod(
        F.xxhash64(*[F.col(c) if isinstance(c, str) else c for c in salt_cols]),
        F.lit(n_salts),
    )
    w1 = W.partitionBy(*list(partition_by), "__tk_salt").orderBy(*order_by)
    survivors = (
        df.withColumn("__tk_salt", salt)
        .withColumn("__tk_rn1", F.row_number().over(w1))
        .filter(F.col("__tk_rn1") <= k)
        .drop("__tk_salt", "__tk_rn1")
    )
    return grouped_top_k(survivors, partition_by, order_by, k, rank_col=rank_col)
