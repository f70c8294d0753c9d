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
    """Streaming near-dup ingestion gate: key the within-watermark dedup on
    a NORMALIZED content fingerprint instead of a message id, so re-posted /
    reformatted copies of a document (case, whitespace, punctuation runs)
    are dropped at ingestion before they reach the corpus.

    The key is the batch exact-dedup fingerprint
    (operators/dedup.py:fingerprint — lowercase, collapse non-alphanumerics,
    md5): 128 bits, so unrelated documents never collide in practice. A
    16-bit simhash key was rejected here deliberately — at >300 distinct
    docs per watermark span the birthday bound makes silent false-positive
    drops of UNRELATED documents likely, and past 65k distinct fingerprints
    they are guaranteed. The price is semantics: this gate catches
    formatting-level duplicates only; token-level near-dups (a few words
    changed) are resolved by the offline banded pipeline
    (operators/neardup.py) or the incremental signature store
    (operators/incremental_dedup.py). State is O(distinct fingerprints per
    watermark span).
    """
    from pyspark.sql import functions as F

    from movie_recommendation_etl_spark.operators.dedup import fingerprint

    fingerprinted = docs.withColumn("__fp", fingerprint(F.col(text_col)))
    return (
        fingerprinted.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["__fp"])
        .drop("__fp")
    )
