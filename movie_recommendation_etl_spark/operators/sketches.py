"""Frequency sketches: Misra–Gries heavy hitters with an exact confirm.

The reference engine has no sketch tier at all (its whole core is a linear
ETL — extract/transform/load, see SURVEY.md §2); this module is part of the
100 TB extension surface next to the HLL gate (q44) and the quantile-sketch
gate (q45). The problem it solves: "every key with frequency > φ·N, with its
exact count" over a keyspace far too large to group-by directly — n-gram
vocabularies, URL hosts, user agents. A plain ``groupBy(key).count()``
shuffles one partial row per distinct key per map task; at 100 TB with a
billion-key vocabulary that shuffle IS the job. Misra–Gries bounds the
per-partition state to ``k`` counters and the shuffle to the candidate set.

Shape:

1. **Candidate generation** (one scan, bounded state): each partition keeps
   a Misra–Gries summary of at most ``k`` counters, built batch-by-batch
   with the mergeable-summaries merge (Agarwal et al., PODS'12): add the
   Arrow batch's exact ``value_counts`` to the running counters, and if more
   than ``k`` survive, subtract the (k+1)-th largest count from all and drop
   the non-positive ones. The classic theorem: any key with true partition
   frequency f_i keeps a counter once f_i > n_i/(k+1); summing over
   partitions, any key with GLOBAL frequency > N/(k+1) survives in at least
   one partition summary — with ``k ≥ 1/φ`` the union of candidates is a
   superset of every φ-heavy hitter, deterministically, for ANY partition
   layout. This is the module's one Python stage, and it is Arrow-batched
   and vectorized (pandas ``value_counts`` + index arithmetic per batch,
   never a per-row loop).
2. **Exact confirm** (one scan, tiny shuffle): the candidate set broadcasts
   back onto the input; non-candidates collapse into a single NULL bucket
   map-side (``groupBy(when(is_candidate, key))`` — partial aggregation
   folds the long tail into one row per task), so the exchange carries at
   most |candidates|+1 rows per task. The final filter ``count > φ·N`` uses
   the EXACT recount, so the output is bit-identical to the naive group-by
   answer — the sketch only ever bounds WHERE the memory and shuffle go,
   never what the answer is.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def mg_candidates(df: DataFrame, key_col: str, k: int) -> DataFrame:
    """Per-partition Misra–Gries candidate keys (at most ``k`` per
    partition), one column named ``key_col``. NULL keys are ignored — a
    NULL never counts toward any key's frequency. The output is a
    SUPERSET guarantee, not an estimate: every key with global frequency
    > N/(k+1) appears; extra low-frequency keys may also appear and are
    expected to be filtered by an exact recount."""
    field = df.schema[key_col]
    out_schema = f"`{field.name}` {field.dataType.simpleString()}"

    def summarize(batches: Iterator) -> Iterator:
        import pandas as pd

        counters = None
        for pdf in batches:
            bc = pdf[key_col].value_counts()  # exact, NULLs dropped
            merged = bc if counters is None else counters.add(
                bc, fill_value=0
            )
            if len(merged) > k:
                # mergeable-summaries truncation: subtract the (k+1)-th
                # largest count, keep strictly positive counters
                cut = merged.nlargest(k + 1).iloc[-1]
                merged = merged[merged > cut]
            counters = merged
        if counters is None or counters.empty:
            yield pd.DataFrame({key_col: pd.Series([], dtype=object)})
        else:
            yield pd.DataFrame({key_col: counters.index})

    return df.select(key_col).mapInPandas(summarize, out_schema)


def heavy_hitters(
    df: DataFrame,
    key: Column | str,
    *,
    phi: float,
    k: int | None = None,
    key_name: str = "key",
) -> DataFrame:
    """Exact φ-heavy hitters: every key with ``count > phi * N`` plus its
    exact count and N, computed with Misra–Gries-bounded state (see the
    module docstring for the plan shape and the 100 TB argument).

    ``key`` may be any expression (e.g. an exploded n-gram column);
    ``k`` defaults to ``ceil(1/phi)``, the smallest value with the
    no-false-negative guarantee. Larger ``k`` trades executor memory for a
    smaller false-positive trickle into the confirm shuffle. The candidate
    union is one small broadcast (≤ k keys per partition before
    dedup) — if a deployment's partition count makes that union large,
    re-merging the per-partition summaries down to k total (the same
    truncation, one reduce) restores a fixed bound without touching the
    guarantee.
    """
    if not 0.0 < phi < 1.0:
        raise ValueError(f"phi must be in (0, 1), got {phi}")
    k = math.ceil(1.0 / phi) if k is None else k
    if k < math.ceil(1.0 / phi):
        raise ValueError(
            f"k={k} breaks the Misra-Gries superset guarantee for "
            f"phi={phi} (need k >= {math.ceil(1.0 / phi)})"
        )
    keyed = df.select(
        (F.col(key) if isinstance(key, str) else key).alias(key_name)
    ).filter(F.col(key_name).isNotNull())
    cands = (
        mg_candidates(keyed, key_name, k)
        .distinct()
        .withColumn("__cand", F.lit(1))
    )
    # Non-candidates fold into ONE null-keyed row per map task during
    # partial aggregation — the exchange moves |candidates|+1 rows per
    # task however large the keyspace is. N comes out of the same pass as
    # the bucket sum, so the input is scanned exactly twice in total
    # (once for candidates, once here).
    buckets = (
        keyed.join(F.broadcast(cands), key_name, "left")
        .groupBy(
            F.when(F.col("__cand") == 1, F.col(key_name)).alias(key_name)
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    total = buckets.agg(F.sum("cnt").cast("long").alias("n_total"))
    return (
        buckets.crossJoin(F.broadcast(total))
        .filter(
            F.col(key_name).isNotNull()
            & (F.col("cnt") > F.col("n_total") * F.lit(phi))
        )
        .select(key_name, "cnt", "n_total")
    )
