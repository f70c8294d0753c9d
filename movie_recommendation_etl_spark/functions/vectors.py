"""Vector expression library over ``array<float>`` embedding columns.

All math is Catalyst higher-order functions (zip_with + sequential aggregate
fold) — JVM codegen, no Python workers, no MLlib VectorUDT conversion. The
folds run in DOUBLE: each float*float product is exact in double (24+24
mantissa bits < 53), and a sequential left fold is what DuckDB's
``list_aggregate(..., 'sum')`` computes too, so oracle comparisons are
bit-identical (verified over the full embeddings table).

At 100 TB scale these expressions vectorize per-row inside the scan stage;
the expensive part of similarity search is pair enumeration, which the
operators in plans/dedup_similarity.py bound via blocking/LSH — never
all-pairs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _fold_sum(arr: Column) -> Column:
    """Sequential left fold sum in double (matches DuckDB list sum order)."""
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two float/double array columns, in double."""
    return _fold_sum(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    )


def norm2(a: Column | str) -> Column:
    """Euclidean (L2) norm."""
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity. Prefer precomputing norms per row before a pair
    join (see sql_norm2) so the join evaluates one fold, not three."""
    return dot(a, b) / (norm2(a) * norm2(b))


# --- DuckDB oracle SQL text forms (identical arithmetic) -------------------

def sql_dot(a: str, b: str) -> str:
    return (
        f"list_aggregate(list_transform(list_zip({a}, {b}), "
        f"s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)), 'sum')"
    )


def sql_norm2(a: str) -> str:
    return f"sqrt({sql_dot(a, a)})"
