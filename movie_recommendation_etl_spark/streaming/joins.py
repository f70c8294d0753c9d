"""Stream-stream joins: correlate two live event streams within a time
horizon (click → error attribution, impression → conversion, etc.).

The reference has no streaming at all (SURVEY.md §2.11); this is the last
piece of the engine's Structured Streaming surface after windows/session/
stateful/dedup. Spark buffers BOTH sides in the state store and emits a
match the moment the partner row arrives; the watermark + the interval
condition bound how long a row can wait, which is what makes the state
finite: without the time bound a stream-stream join is an unbounded
cross-product buffer.

Scale shape: state is hash-partitioned by the equi-key (user_id), so the
join parallelizes like any shuffled hash join; per-key state holds only the
rows inside the watermark horizon. At 100 TB/day the knobs that matter are
the watermark delay (state size ∝ delay × rate) and key skew (a bot user_id
concentrates state — the batch twin's salting pattern in operators/skew.py
applies to the PRE-aggregation, not the join, so feed pre-deduped streams).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str = "user_id",
    left_ts: str = "ts",
    right_ts: str = "ts",
    horizon: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Inner join rows sharing ``key`` where the right event lands in
    [left_ts, left_ts + horizon]. Works identically on streaming and batch
    frames (unified model): the streaming/batch equivalence test drains the
    streaming result and compares to the batch join row-for-row.

    Both inputs must carry event-time columns; on streaming frames the
    watermarks let Spark evict buffered state once no earlier match can
    arrive (left rows older than watermark+horizon, right rows older than
    watermark).
    """
    l = left.withColumnRenamed(left_ts, "l_ts").alias("l")
    r = right.withColumnRenamed(right_ts, "r_ts").alias("r")
    if left.isStreaming:
        l = l.withWatermark("l_ts", watermark)
    if right.isStreaming:
        r = r.withWatermark("r_ts", watermark)
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col("r.r_ts") >= F.col("l.l_ts"))
        & (F.col("r.r_ts") <= F.col("l.l_ts") + F.expr(f"interval {horizon}"))
    )
    return l.join(r, cond, "inner")


def click_error_attribution(
    clicks: DataFrame,
    errors: DataFrame,
    *,
    horizon: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Errors within ``horizon`` after a click by the same user — the
    stream-stream twin of the as-of pattern (q32 answers "nearest click
    BEFORE each error"; this answers "every error WITHIN the horizon AFTER
    each click", the shape used for live attribution alerting)."""
    c = clicks.select("user_id", "ts", F.col("event_id").alias("click_id"))
    e = errors.select(
        F.col("user_id").alias("e_user"),
        F.col("ts").alias("e_ts"),
        F.col("event_id").alias("error_id"),
        "value",
    )
    joined = interval_join(
        c.withColumnRenamed("user_id", "user_id"),
        e.withColumnRenamed("e_user", "user_id").withColumnRenamed(
            "e_ts", "ts"
        ),
        horizon=horizon,
        watermark=watermark,
    )
    return joined.select(
        F.col("l.user_id").alias("user_id"),
        F.col("l.l_ts").alias("click_ts"),
        "click_id",
        F.col("r.r_ts").alias("error_ts"),
        "error_id",
        F.col("r.value").alias("error_value"),
    )


def enrich_with_static(
    stream: DataFrame,
    dim: DataFrame,
    *,
    key: str = "user_id",
    how: str = "left",
    broadcast: bool = True,
) -> DataFrame:
    """Stream-static enrichment: join a live stream against a STATIC
    dimension snapshot (user profiles, product catalog, model scores) —
    the everyday lookup the stream-stream interval join above is overkill
    for. No watermark and no join state: Spark re-plans the static side
    per micro-batch, so the dimension may even be re-read from storage as
    it changes between triggers (snapshot semantics per batch).

    Scale shape: with ``broadcast=True`` (the default, right for lookup
    dims) the dimension is force-broadcast and the join stays map-side in
    every micro-batch — note a hint OVERRIDES autoBroadcastJoinThreshold,
    so a huge dim would be collected to the driver each trigger; pass
    ``broadcast=False`` for large dimensions and the planner picks by
    size (shuffled hash join of the BATCH against it, still bounded by
    the micro-batch size, never by stream history). Only left/inner make
    sense stream-side (right/full would need unbounded stream state) —
    guarded below."""
    if how not in ("left", "inner"):
        raise ValueError(
            f"stream-static join supports left/inner, got {how!r}"
        )
    right = F.broadcast(dim) if broadcast else dim
    return stream.join(right, key, how)
