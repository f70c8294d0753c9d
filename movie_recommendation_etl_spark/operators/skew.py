"""Skew-mitigation utilities: salted aggregation and salted broadcast-side
replication (SURVEY.md §4 / north-star scale requirements).

AQE's skew-join splitting handles most cases at runtime (session.py enables
it), but a pathologically hot aggregation key — the empty-string language,
the null user id, the bot account with 10^9 events — still funnels one
reducer. Salting fans the hot key across ``n_salts`` partial groups first,
then merges: two shuffles, both uniform, instead of one shuffle with a
straggler that dominates the stage at 100 TB.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Mergeable aggregates: (partial expr builder, final expr builder).
_MERGEABLE = {
    "count": (
        lambda c: F.count(F.lit(1)),
        lambda c: F.sum(c),
    ),
    "sum": (lambda c: F.sum(c), lambda c: F.sum(c)),
    "min": (lambda c: F.min(c), lambda c: F.min(c)),
    "max": (lambda c: F.max(c), lambda c: F.max(c)),
}


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    *,
    n_salts: int = 16,
    mix_partition_id: bool = False,
) -> DataFrame:
    """Two-stage skew-proof aggregation.

    ``aggs`` maps output column -> (input column, fn) with fn in
    count/sum/min/max (the algebraic, mergeable ones — avg decomposes into
    sum+count at the call site). The salt is a deterministic hash of the
    whole row (xxhash64), so retries reproduce the same partials.

    LIMITATION (r2 ADVICE): value-hash salting spreads a hot key only when
    its rows DIFFER somewhere — fully-identical duplicate rows (the classic
    replayed-event case) all hash to one salt bucket and the straggler
    remains. Set ``mix_partition_id=True`` to fold the input partition id
    into the salt: identical rows then spread by physical placement, at the
    cost of partials that are no longer bit-reproducible under task retry
    or a different input partitioning (the MERGED result is unchanged —
    count/sum/min/max are salt-allocation-invariant — so only consumers of
    the stage-1 partials care)."""
    salt_input: list = [F.col(c) for c in df.columns]
    if mix_partition_id:
        salt_input.append(F.spark_partition_id())
    salt = F.pmod(F.xxhash64(*salt_input), F.lit(n_salts)).alias("__salt")
    partials = []
    finals = []
    for out, (col, fn) in aggs.items():
        if fn not in _MERGEABLE:
            raise ValueError(f"non-mergeable aggregate: {fn}")
        partial_fn, final_fn = _MERGEABLE[fn]
        partials.append(partial_fn(F.col(col)).alias(f"__p_{out}"))
        finals.append(final_fn(F.col(f"__p_{out}")).alias(out))
    stage1 = df.withColumn("__salt", salt).groupBy(*keys, "__salt").agg(*partials)
    return stage1.groupBy(*keys).agg(*finals)


def replicate_for_salted_join(
    small: DataFrame, n_salts: int = 16, salt_col: str = "__salt"
) -> DataFrame:
    """Explode the small side once per salt value; the big side derives the
    matching salt with :func:`join_salt` so the hot key's rows spread over
    n_salts reducers. Only worthwhile when the small side is too big to
    broadcast outright yet the join key is skewed."""
    return small.withColumn(
        salt_col, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )


def join_salt(df: DataFrame, n_salts: int = 16) -> Column:
    """Deterministic uniform salt for the big side of a salted join."""
    return F.pmod(F.xxhash64(*df.columns), F.lit(n_salts))


def right_size_materialized(
    df: DataFrame, *, rows_per_partition: int = 50_000
) -> DataFrame:
    """Coalesce an already-materialized (persisted/localCheckpoint'd) small
    frame down to ~``rows_per_partition`` rows per partition.

    The inverse skew problem (r17, the adjudicated cause of q53's
    r14->r16 bench drift): an eager checkpoint/persist inherits the
    upstream partition count — e.g. a union of two 32-partition cached
    scans leaves 64 nearly-EMPTY partitions for a few thousand rows — and
    every consumer stage then pays one task-scheduling round per
    partition, a pure latency tax at interactive scale (~0.3-0.8 s per
    stage on local[32]; see the guard-cost notes in neardup.py).

    count() is ~free on materialized blocks; coalesce is narrow (no
    recompute, no shuffle) and NEVER increases the partition count, so at
    real scale (rows / rows_per_partition >= current partitions) this is
    an exact no-op — small-SF latency win, zero 100 TB cost. Call it only
    AFTER the frame is materialized, or the count pays a full compute.
    """
    n_rows = df.count()
    cur = df.rdd.getNumPartitions()
    target = max(1, min(cur, -(-n_rows // rows_per_partition)))
    return df.coalesce(target) if target < cur else df
