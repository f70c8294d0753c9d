"""Range joins and grouping sets (SURVEY.md §2.4 J6, §2.5 grouping sets).
The sliding-window aggregate that used to live here (X1) is now the
``sliding`` arm of q30_window_agg_suite in plans/events_stream.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from movie_recommendation_etl_spark.functions.numeric import dsum, sql_dsum
from movie_recommendation_etl_spark.plans.registry import query
from movie_recommendation_etl_spark.sources.catalog import load_table


# Sliding window aggregation moved into the q30_window_agg_suite (r8
# consolidation) — see plans/events_stream.py:sliding_window_agg.


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
    """Explicit GROUPING SETS (rollup/cube's general form — the
    q03_multidim_agg_suite arms cover those) through the SQL entry point,
    with grouping() disambiguators."""
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
