"""Streaming Misra–Gries heavy-hitter candidates: the ingestion-side twin
of the batch sketch (operators/sketches.py), for spotting hot keys —
trending n-grams, abusive senders, runaway URL hosts — WHILE a stream is
being ingested, without unbounded per-key state.

The built-in alternative (`stream.groupBy(key).count()` in update mode)
keeps one state row per DISTINCT key forever — on a 100 TB/day n-gram or
URL stream that state IS the job's memory footprint. Here the keyspace is
hash-partitioned into ``n_buckets`` groups and each group's state is one
bounded MG summary (≤ k counters), so total state is ≤ n_buckets·k rows
however many distinct keys the stream carries.

Guarantee (same theorem as the batch operator, applied per bucket): a key
hashes to exactly one bucket, so its bucket-local frequency IS its global
frequency; the bucket's MG(k) summary retains every key whose frequency
exceeds (bucket stream length)/(k+1) ≤ N/(k+1). The union of the bucket
summaries after ANY prefix of the stream is therefore a superset of every
key with frequency > N/(k+1) in that prefix, for any arrival order —
tested against the batch operator and the exact group-by in
tests/test_streaming_stateful.py. As in the batch twin, candidates are a
superset: exact counts come from a confirm pass over the stored corpus
(operators/sketches.py:heavy_hitters or plain SQL on the sink table).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from movie_recommendation_etl_spark.operators.sketches import _mg_merge

OUTPUT_SCHEMA = "bucket int, gram string, est double, n_seen long"
STATE_SCHEMA = "keys array<string>, counts array<double>, n_seen long"


def _mk_update(k: int):
    def update(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (bucket,) = key
        counters, n_seen = None, 0
        if state.exists:
            keys, counts, n_seen = state.get
            if keys:
                counters = pd.Series(counts, index=keys, dtype="float64")
        for pdf in pdfs:
            n_seen += len(pdf)
            counters = _mg_merge(counters, pdf["gram"].value_counts(), k)
        if counters is None:
            # Zero/empty chunks with no prior state (possible if a timeout
            # is ever configured): emit an empty summary instead of dying.
            counters = pd.Series(dtype="float64")
        state.update(
            (
                [str(i) for i in counters.index],
                [float(v) for v in counters.values],
                n_seen,
            )
        )
        yield pd.DataFrame(
            {
                "bucket": bucket,
                "gram": counters.index,
                "est": counters.values,
                "n_seen": n_seen,
            }
        )

    return update


def streaming_mg_candidates(
    stream: DataFrame,
    *,
    k: int,
    n_buckets: int = 16,
    gram_col: str = "gram",
) -> DataFrame:
    """Per-bucket MG summaries over a streaming key column. Emits each
    bucket's refreshed summary every trigger (output mode: update); the
    FINAL summary per bucket is the emission with that bucket's max
    ``n_seen``. ``k`` bounds state per bucket; pick ``k ≥ 1/phi`` exactly
    as in the batch operator."""
    bucketed = (
        stream.select(F.col(gram_col).alias("gram"))
        .filter(F.col("gram").isNotNull())
        .withColumn(
            "bucket",
            F.pmod(F.xxhash64("gram"), F.lit(n_buckets)).cast("int"),
        )
    )
    return bucketed.groupBy("bucket").applyInPandasWithState(
        _mk_update(k),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _upsert_final_emissions(
    held: dict[int, tuple[int, list[tuple]]], rows: list
) -> None:
    """Fold one micro-batch's update-mode emissions into ``held``, keeping
    ONLY each bucket's max-``n_seen`` emission (a bucket emits its whole
    refreshed summary — ≤ k rows sharing one n_seen — at most once per
    trigger; n_seen grows monotonically per bucket, so a newer emission
    supersedes everything the bucket emitted before). ``held`` is therefore
    bounded at n_buckets·k rows at EVERY point of the drain, however many
    micro-batches arrive — the r13 memory-sink form retained every
    emission, growing linearly with trigger count (r13 VERDICT #4)."""
    by_bucket: dict[int, list[tuple]] = {}
    for r in rows:
        by_bucket.setdefault(r[0], []).append(tuple(r))
    for b, rs in by_bucket.items():
        n = max(r[3] for r in rs)
        if b not in held or n >= held[b][0]:
            held[b] = (n, [r for r in rs if r[3] == n])


def drain_mg_candidates(
    spark,
    gram_stream: DataFrame,
    *,
    k: int,
    n_buckets: int = 16,
    gram_col: str = "gram",
    stats: dict | None = None,
) -> DataFrame:
    """Run ``streaming_mg_candidates`` over a STREAMING gram frame to
    exhaustion (availableNow trigger, update mode) and return the FINAL
    candidate summary as a bounded batch frame: each bucket's emission with
    that bucket's max ``n_seen`` — ≤ n_buckets·k rows by the state bound.
    The sink is a foreachBatch upsert into a driver-held per-bucket map
    (_upsert_final_emissions), so DRIVER retention is also ≤ n_buckets·k
    rows at every point of the drain — for any stream length, not just the
    3-trigger gate (r13 VERDICT #4; the prior memory sink kept every
    update-mode emission, linear in trigger count). This is the
    ingestion-side half of the q48 stream arm; exact counts come from
    operators/sketches.confirm_heavy_hitters over the stored corpus (the
    same plan the batch arm confirms with).

    ``stats`` (optional, test/ops introspection): records ``n_batches``
    and ``max_held_rows`` — the observed peak of the driver-held map.
    """
    held: dict[int, tuple[int, list[tuple]]] = {}
    probe = {"n_batches": 0, "max_held_rows": 0}

    def _fold(batch_df: DataFrame, _epoch_id: int) -> None:
        # bounded collect: update-mode emissions per trigger are at most
        # the state size (n_buckets buckets x k counters)
        _upsert_final_emissions(
            held, batch_df.select("bucket", "gram", "est", "n_seen").collect()
        )
        probe["n_batches"] += 1
        probe["max_held_rows"] = max(
            probe["max_held_rows"], sum(len(rs) for _, rs in held.values())
        )

    # State-partition right-sizing (r20, guide §5): the stateful shuffle
    # is keyed by `bucket`, which has at most n_buckets distinct values,
    # so every shuffle partition beyond n_buckets is PROVABLY empty at any
    # data scale — yet each one still pays a state-store open/commit plus
    # a task per micro-batch (state partition count is pinned by
    # spark.sql.shuffle.partitions at the first batch; AQE never coalesces
    # streaming state). Clamp to min(session setting, n_buckets) for the
    # drain — never raised above the session's configured parallelism, and
    # derived from the operator's own keyspace bound, not the local core
    # count. The conf is session-wide, so it is restored in a finally;
    # this drain is the only streaming query this module ever runs.
    conf_key = "spark.sql.shuffle.partitions"
    prev_parts = spark.conf.get(conf_key)
    try:
        spark.conf.set(
            conf_key, str(min(int(prev_parts), max(n_buckets, 1)))
        )
        q = (
            streaming_mg_candidates(
                gram_stream, k=k, n_buckets=n_buckets, gram_col=gram_col
            )
            .writeStream.foreachBatch(_fold)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set(conf_key, prev_parts)
    if stats is not None:
        stats.update(probe)
    final_rows = [r for _, rs in held.values() for r in rs]
    return spark.createDataFrame(final_rows, OUTPUT_SCHEMA)
