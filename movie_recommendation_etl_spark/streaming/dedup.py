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


def neardup_gated_documents(
    docs: DataFrame,
    *,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming NEAR-dup ingestion gate: key the within-watermark dedup on
    a content fingerprint instead of a message id, so re-posted /
    trivially-reformatted copies of a document are dropped at ingestion
    before they reach the corpus.

    The fingerprint is the batch path's simhash16 over normalized tokens
    (operators/neardup.py:simhash16 — same Catalyst expression, so
    batch-established correctness transfers); collapsing to ONE 16-bit key
    per doc makes this an exact-state-key dedup Structured Streaming can
    run with bounded watermark state. It therefore catches only near-dups
    whose simhash collides exactly (identical or near-identical token
    multisets) — Hamming-radius matching needs the batch banded join
    (operators/neardup.py), which is where lower-similarity pairs are
    resolved offline. State is O(distinct fingerprints per watermark span).
    """
    from pyspark.sql import functions as F

    from movie_recommendation_etl_spark.operators.neardup import simhash16

    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    fingerprinted = docs.withColumn("__simhash", simhash16(toks))
    return (
        fingerprinted.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["__simhash"])
        .drop("__simhash")
    )
