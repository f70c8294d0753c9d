"""Sliding windows, range joins, grouping sets — the last §2 gap-list
operators (SURVEY.md §2.4 J6, §2.5 grouping sets, §2.11 X1 sliding).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from movie_recommendation_etl_spark.functions.numeric import dsum, sql_dsum
from movie_recommendation_etl_spark.plans.registry import query
from movie_recommendation_etl_spark.sources.catalog import load_table


@query(
    "q45_sliding_window_agg",
    oracle=f"""
    WITH expanded AS (
        SELECT e.*, unnest([
            time_bucket(INTERVAL '30 minutes', ts),
            time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes'
        ]) AS window_start
        FROM events e
    )
    SELECT window_start, event_type,
           count(*) AS n_events,
           {sql_dsum("value")} AS sum_value
    FROM expanded
    WHERE ts >= window_start AND ts < window_start + INTERVAL '1 hour'
    GROUP BY window_start, event_type
    """,
)
def q45_sliding_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 1h windows every 30min (each event lands in 2 windows). The
    oracle expands each event into its candidate window starts and filters —
    exactly what Spark's window generator does physically."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type"
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
    "q46_range_band_join",
    oracle=f"""
    WITH bands AS (
        SELECT CAST(i AS INTEGER) AS band,
               i * 50.0 AS lo, (i + 1) * 50.0 AS hi
        FROM range(0, 10) t(i)
    )
    SELECT b.band, count(*) AS n_events,
           {sql_dsum("e.value")} AS sum_value
    FROM events e
    JOIN bands b ON e.value >= b.lo AND e.value < b.hi
    GROUP BY b.band
    """,
)
def q46_range_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6 range (non-equi) join: events banded by value against a tiny
    interval dimension. Catalyst executes this as a BroadcastNestedLoopJoin
    — correct for a 10-row dim; for large interval tables the play is
    binning both sides to an equi-key first (as q53 does with labels)."""
    events = load_table(spark, sf_dir, "events")
    bands = spark.range(0, 10).select(
        F.col("id").cast("int").alias("band"),
        (F.col("id") * 50.0).alias("lo"),
        ((F.col("id") + 1) * 50.0).alias("hi"),
    )
    return (
        events.join(
            F.broadcast(bands),
            (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi")),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("sum_value"),
        )
    )


@query(
    "q47_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n_orders,
           CAST(grouping(o_orderstatus) AS INTEGER) AS g_status,
           CAST(grouping(o_orderpriority) AS INTEGER) AS g_priority
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                            (o_orderstatus, o_orderpriority))
    """,
)
def q47_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (rollup/cube's general form — q03/q04 cover
    those) through the SQL entry point, with grouping() disambiguators."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n_orders,
               CAST(grouping(o_orderstatus) AS INTEGER) AS g_status,
               CAST(grouping(o_orderpriority) AS INTEGER) AS g_priority
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                                (o_orderstatus, o_orderpriority))
        """
    )
