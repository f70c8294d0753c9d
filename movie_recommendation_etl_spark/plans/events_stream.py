"""Event-stream-shaped batch queries (SURVEY.md §2.11 X1, §2.4 as-of): the
operations the reference never had but a general engine over an events table
needs — tumbling windows, session windows, and as-of joins.

Batch formulations here; the Structured Streaming twins (readStream +
watermark) live in movie_recommendation_etl_spark/streaming/. The batch and
streaming plans share the same F.window/session_window expressions, so
correctness established here transfers to the streaming path.

Scale notes: both window queries are one shuffle (groupBy on derived window +
key) with map-side partial aggregation; the as-of join is the union-sort
formulation from operators/joins.py — one shuffle on the key, no |L|x|R|
candidate blowup, AQE splits skewed users.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from movie_recommendation_etl_spark.functions.numeric import dsum, sql_dsum
from movie_recommendation_etl_spark.operators.dedup import dedup_keep_first
from movie_recommendation_etl_spark.operators.joins import asof_join
from movie_recommendation_etl_spark.plans.registry import query
from movie_recommendation_etl_spark.sources.catalog import load_table


@query(
    "q30_tumbling_window_agg",
    oracle=f"""
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           count(*) AS n_events,
           {sql_dsum("value")} AS sum_value
    FROM events
    GROUP BY date_trunc('hour', ts), event_type
    """,
)
def q30_tumbling_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregate over events (F.window). Epoch-aligned
    1h windows == date_trunc('hour'), which is the DuckDB oracle."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.window("ts", "1 hour").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@query(
    "q31_session_window_agg",
    oracle="""
    WITH marked AS (
        SELECT user_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w >= INTERVAL '4 hours'
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, 1)
    ),
    sessions AS (
        SELECT user_id, ts,
               sum(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts
                   ROWS UNBOUNDED PRECEDING) AS session_id
        FROM marked
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL '4 hours' AS session_end,
           count(*) AS n_events
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def q31_session_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based session windows (F.session_window, 4h inactivity gap). The
    DuckDB oracle is the classic gaps-and-islands rewrite: lag → new-session
    marker → running sum → group. Spark's session end = last event + gap."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.session_window("ts", "4 hours").alias("sw"), "user_id"
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )


@query(
    "q32_asof_click_to_error",
    oracle="""
    WITH errs_ranked AS (
        SELECT user_id, ts, event_id AS err_id, value AS err_value,
               row_number() OVER (
                   PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        FROM events WHERE event_type = 'error'
    ),
    errs AS (
        SELECT user_id, ts, err_id, err_value FROM errs_ranked WHERE rn = 1
    ),
    clicks AS (
        SELECT event_id, user_id, ts, value
        FROM events WHERE event_type = 'click'
    )
    SELECT c.event_id, c.user_id, c.value, c.ts, e.err_id, e.err_value
    FROM clicks c
    ASOF LEFT JOIN errs e
      ON c.user_id = e.user_id AND c.ts >= e.ts
    """,
)
def q32_asof_click_to_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (SURVEY.md §2.4/J5): attach to every click the most recent
    prior-or-simultaneous error of the same user; clicks with no prior error
    keep NULLs (left semantics). Right side deduped to unique (user_id, ts)
    first so both engines pick the same match. Oracle: DuckDB ASOF LEFT JOIN.
    """
    events = load_table(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    errors = events.filter(F.col("event_type") == "error").select(
        "user_id",
        "ts",
        F.col("event_id").alias("err_id"),
        F.col("value").alias("err_value"),
    )
    errors = dedup_keep_first(
        errors, ["user_id", "ts"], [F.col("err_id").desc()]
    )
    return asof_join(
        clicks, errors, on="user_id", left_ts="ts", right_ts="ts"
    )
