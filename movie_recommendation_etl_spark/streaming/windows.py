"""Streaming windowed aggregations over an events stream.

The transformations are the SAME Catalyst expressions as the batch queries
q30/q31 (plans/events_stream.py), applied to a streaming DataFrame — Spark's
unified batch/streaming model means correctness established by the batch
oracles transfers directly; what streaming adds is incremental state +
watermark-based late-data eviction.

Scale notes: state is keyed by (window, event_type) / session key and lives
in the executor state store; the watermark bounds state size — without it a
100 TB/day stream would accumulate state forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(
    spark: SparkSession, path: str, *, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream with an explicit schema (streaming sources cannot
    infer; at scale this is a cloud-storage listing source or Kafka)."""
    reader = spark.readStream.schema(EVENTS_STREAM_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def windowed_counts(
    events: DataFrame,
    *,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window count/sum per event_type with late-data watermark —
    the streaming twin of q30_tumbling_window_agg."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sessionized_counts(
    events: DataFrame,
    *,
    gap: str = "4 hours",
    watermark: str = "8 hours",
) -> DataFrame:
    """Session windows per user (streaming twin of q31): merging session
    state is only final once the watermark passes the session end."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sw"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )


def run_available_now(
    stream: DataFrame, query_name: str, *, output_mode: str = "append"
) -> None:
    """Drain everything currently available through a memory sink and stop —
    the batch-like trigger used in tests; swap the sink for kafka/delta in
    production."""
    q = (
        stream.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
