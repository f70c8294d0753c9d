"""Join operators beyond Spark's built-in surface.

The reference implements no joins at all (SURVEY.md §2.4); equi/semi/anti/
broadcast joins are plain ``df.join`` and need no wrapper. What Spark lacks
natively (in the Scala/Python SQL API) is the as-of join, so we provide a
shuffle-efficient formulation here.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str] | None = None,
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right.right_ts <= left.left_ts`` sharing the join key(s).

    Scale-first formulation: instead of the naive range join + per-key
    row_number (which materializes |L|x|R| candidate pairs per key), union
    both sides tagged by origin, sort within key by time, and carry the last
    non-null right attributes forward with ``F.last(ignorenulls=True)``.
    One shuffle on the key, no pair blowup — the plan survives skewed keys and
    100x data (AQE splits skewed partitions; the window is a linear pass).

    Right-side rows sort before left-side rows at equal timestamps, giving
    inclusive (<=) as-of semantics, matching DuckDB's ``ASOF JOIN ... ON
    l.ts >= r.ts`` oracle.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in keys]
    left_cols = [c for c in left.columns if c not in keys]

    l_tagged = left.select(
        *keys,
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__is_left"),
        *[F.col(c) for c in left_cols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in right_cols],
    )
    r_tagged = right.select(
        *keys,
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
    )

    w = (
        W.partitionBy(*keys)
        .orderBy(F.col("__t"), F.col("__is_left"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = l_tagged.unionByName(r_tagged).select(
        *keys,
        "__t",
        "__is_left",
        *left_cols,
        *[F.last(f"__r_{c}", ignorenulls=True).over(w).alias(c) for c in right_cols],
    )
    return filled.filter(F.col("__is_left") == 1).drop("__is_left", "__t")
