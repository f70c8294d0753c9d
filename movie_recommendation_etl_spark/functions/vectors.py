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


# --- int8 quantization (embedding storage at scale) ------------------------

def quantize_int8(vec: Column | str) -> Column:
    """array<float> -> struct(scale: double, q: array<tinyint>).

    Symmetric per-vector quantization: scale = max(|x|)/127, q_i =
    round(x_i/scale). Cuts embedding storage/shuffle bytes 4x (the scan and
    network cost that dominates similarity search at 100 TB); cosine on
    dequantized vectors is within ~1% of exact for unit-norm embeddings
    (error bound tested in tests/test_neardup_similarity.py). Pure
    scan-stage codegen — no Python, no UDT.

    Degenerate all-zero vectors quantize to scale 0 and all-zero q, and
    dequantize back to exact zeros.
    """
    v = F.col(vec) if isinstance(vec, str) else vec
    absmax = F.array_max(F.transform(v, lambda x: F.abs(x))).cast("double")
    scale = absmax / F.lit(127.0)
    q = F.transform(
        v,
        lambda x: F.when(scale == 0.0, F.lit(0))
        .otherwise(F.round(x.cast("double") / scale))
        .cast("tinyint"),
    )
    return F.struct(scale.alias("scale"), q.alias("q"))


def dequantize_int8(qstruct: Column | str) -> Column:
    """struct(scale, q) -> array<double>: x_i ~= q_i * scale."""
    s = F.col(qstruct) if isinstance(qstruct, str) else qstruct
    return F.transform(
        s.getField("q"), lambda x: x.cast("double") * s.getField("scale")
    )


def cosine_quantized(qa: Column | str, qb: Column | str) -> Column:
    """Cosine over two quantized structs WITHOUT materializing the
    dequantized arrays: dot(qa.q, qb.q) in integer (exact — products are
    <= 127^2 and dims*127^2 stays far inside a long), then one scale
    multiply per side. The integer fold shuffles/compares 1-byte lanes, so
    a candidate-verify join over quantized embeddings moves 4x fewer bytes
    AND does integer arithmetic in the hot loop.
    """
    a = F.col(qa) if isinstance(qa, str) else qa
    b = F.col(qb) if isinstance(qb, str) else qb

    def idot(x: Column, y: Column) -> Column:
        return F.aggregate(
            F.zip_with(x, y, lambda p, q: p.cast("long") * q.cast("long")),
            F.lit(0).cast("long"),
            lambda acc, t: acc + t,
        )

    num = (
        idot(a.getField("q"), b.getField("q")).cast("double")
        * a.getField("scale")
        * b.getField("scale")
    )
    na = F.sqrt(
        idot(a.getField("q"), a.getField("q")).cast("double")
    ) * a.getField("scale")
    nb = F.sqrt(
        idot(b.getField("q"), b.getField("q")).cast("double")
    ) * b.getField("scale")
    # degenerate all-zero vectors (scale=0) have no defined cosine — return
    # NULL instead of a 0/0 NaN so downstream top-k orderings drop them
    return F.when(na * nb == 0.0, F.lit(None).cast("double")).otherwise(
        num / (na * nb)
    )
