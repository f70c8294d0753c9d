"""Incremental ingestion: stream → merge/upsert into a parquet table.

The composition the reference's load stage is missing: its JDBC writer
appends blindly on every rerun (load/execute.py:91), so re-running the
pipeline duplicates rows. Here each micro-batch MERGEs into the target by
key (sources/writers.merge_upsert_parquet), which makes the sink
*idempotent* — and idempotence is exactly what turns Structured Streaming's
at-least-once foreachBatch replay into effectively-exactly-once delivery:
a replayed batch re-merges the same keys to the same values.

Scale shape: each micro-batch touches only the partitions its rows land in
(dynamic partition overwrite), so steady-state ingestion cost tracks batch
size, not table size. The checkpoint directory holds the source offsets;
the merge itself needs no transaction log because replays converge.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame

from movie_recommendation_etl_spark.sources.writers import (
    merge_upsert_parquet,
)


def stream_merge_upsert(
    stream: DataFrame,
    path: str,
    key_cols: Sequence[str],
    *,
    checkpoint_dir: str,
    order_col: str | None = None,
    partition_by: Sequence[str] | None = None,
) -> None:
    """Drain everything currently available from ``stream``, merging each
    micro-batch into the parquet table at ``path`` by ``key_cols``.

    Uses trigger(availableNow) — the batch-like drain used in tests and
    backfills; a production job drops the trigger and runs continuously
    with the same semantics.
    """

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.isEmpty():
            merge_upsert_parquet(
                batch_df.sparkSession,
                batch_df,
                path,
                key_cols,
                order_col=order_col,
                partition_by=partition_by,
            )

    q = (
        stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
