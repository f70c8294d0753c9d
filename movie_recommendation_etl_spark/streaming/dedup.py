"""Streaming deduplication: the ingestion-side twin of the batch exact
dedup (operators/dedup.py) for at-least-once sources.

A replayed/retried event (Kafka redelivery, producer retry) must not double
count downstream aggregates. ``dropDuplicatesWithinWatermark`` keeps one row
per key and holds the seen-key state only until the watermark passes the
event's time — unlike a plain streaming ``dropDuplicates``, whose state
grows without bound (the classic 100 TB/day failure mode).

Scale notes: state is hash-partitioned by key across executors and sized by
(keys arriving within one watermark span), not by stream history. Watermark
choice is the redelivery-horizon SLA: duplicates arriving later than the
watermark are NOT caught (they're indistinguishable from fresh data) — pick
it >= the source's max redelivery delay.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def deduped_events(
    events: DataFrame,
    *,
    key_cols: Sequence[str] = ("event_id",),
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Keep the first arrival per key; drop re-deliveries that land within
    ``watermark`` of the original's event time."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(key_cols)
    )
