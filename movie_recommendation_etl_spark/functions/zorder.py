"""Z-order (Morton) keys: multi-column data clustering for file pruning.

write_sorted_parquet (sources/writers.py) gives perfect pruning on ONE key;
a table queried by two independent dimensions (customer AND date, tenant
AND time) can't be sorted for both. Interleaving the bits of both columns
into one Morton key and range-sorting on THAT gives each output file a
small rectangle in (a, b) space — every file's min/max footer range is
tight on BOTH columns, so predicates on either dimension (or both) skip
most files. This is Delta/Iceberg's OPTIMIZE ZORDER BY, as a pure Catalyst
expression over the same sorted-write primitive.

The interleave is plan-time unrolled shift/mask terms (2*bits OR-terms of
whole-stage-codegen arithmetic) — no UDF, no shuffle beyond the range
exchange the sorted write already pays.

Inputs must be NON-NEGATIVE ints that fit ``bits`` bits; pre-bucket real
columns first (days since epoch, id mod N, quantile bucket). Rank-based
normalization is deliberately NOT built in: it would cost a window pass
over the full table, and coarse static bucketing prunes just as well.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton_key(a: Column | str, b: Column | str, *, bits: int = 21) -> Column:
    """Interleave the low ``bits`` bits of two non-negative int columns:
    bit i of ``a`` lands at position 2i, bit i of ``b`` at 2i+1. 21 bits
    per column (the max for two columns in a signed long) covers ~2M
    buckets per dimension — far finer than file-level pruning needs."""
    if not 1 <= bits <= 31:
        raise ValueError("bits must be in [1, 31]")
    ca = (F.col(a) if isinstance(a, str) else a).cast("long")
    cb = (F.col(b) if isinstance(b, str) else b).cast("long")
    key = F.lit(0).cast("long")
    for i in range(bits):
        key = key.bitwiseOR(
            F.shiftleft(F.shiftrightunsigned(ca, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(
                F.shiftrightunsigned(cb, i).bitwiseAND(F.lit(1)), 2 * i + 1
            )
        )
    return key


def write_zordered_parquet(
    df: DataFrame,
    path: str,
    zorder_cols: Sequence[str],
    *,
    num_files: int | None = None,
    bits: int = 21,
) -> None:
    """Range-sorted parquet on the Morton key of two pre-bucketed int
    columns: each output file covers a compact rectangle of the key space,
    so min/max footer pruning works for predicates on EITHER column
    (asserted from the footers in tests/test_zorder.py)."""
    from movie_recommendation_etl_spark.sources.writers import (
        write_sorted_parquet,
    )

    if len(zorder_cols) != 2:
        raise ValueError("z-order currently interleaves exactly 2 columns")
    a, b = zorder_cols
    keyed = df.withColumn("__zkey", morton_key(a, b, bits=bits))
    # the Morton key is derivable layout metadata, not data — drop it after
    # the sort so readers see exactly the input schema
    write_sorted_parquet(
        keyed, path, ["__zkey"], num_files=num_files, drop_cols=["__zkey"]
    )
