"""Bucketed-table tests: the write produces one file per bucket, and a join
of two same-key bucketed tables runs with ZERO Exchange — the shuffle moved
into the write, which is the whole point at 100 TB (sources/bucketed.py)."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from movie_recommendation_etl_spark.sources.bucketed import (
    bucketed_join,
    read_bucketed,
    write_bucketed,
)
from movie_recommendation_etl_spark.sources.catalog import load_table

N_BUCKETS = 8


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"), "o_orderkey", "o_totalprice"
    )
    customer = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"), "c_name", "c_mktsegment"
    )
    write_bucketed(
        orders, "b_orders", str(base / "orders"), ["custkey"],
        num_buckets=N_BUCKETS,
    )
    write_bucketed(
        customer, "b_customer", str(base / "customer"), ["custkey"],
        num_buckets=N_BUCKETS,
    )
    yield {"base": base, "orders": orders, "customer": customer}
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")


def test_one_file_per_bucket(bucketed_tables):
    """The pre-repartition in write_bucketed must keep the layout at one
    file per bucket — without it, tasks x buckets files (the bucketed-write
    file explosion)."""
    files = glob.glob(str(bucketed_tables["base"] / "orders" / "*.parquet"))
    assert len(files) == N_BUCKETS


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # disable broadcast so the planner's only shuffle-free option IS the
        # bucket co-location (at sf0.001 customer would otherwise broadcast)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = bucketed_join(spark, "b_orders", "b_customer", ["custkey"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        # and it is not just a pretty plan: results match the plain join
        expected = (
            bucketed_tables["orders"]
            .join(bucketed_tables["customer"], "custkey")
            .count()
        )
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_groupby_has_no_exchange(spark, bucketed_tables):
    """Aggregation on the bucket key reuses the at-rest partitioning too."""
    agg = (
        read_bucketed(spark, "b_orders")
        .groupBy("custkey")
        .agg(F.sum("o_totalprice").alias("total"))
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert agg.count() == (
        bucketed_tables["orders"].select("custkey").distinct().count()
    )


def test_mismatched_bucket_counts_coalesce(spark, sf_dir, tmp_path):
    """8-bucket x 4-bucket join: coalesceBucketsInJoin reads the finer side
    two-buckets-per-task — still no Exchange."""
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"), "o_orderkey"
    )
    customer = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"), "c_name"
    )
    write_bucketed(
        orders, "b_orders8", str(tmp_path / "o8"), ["custkey"], num_buckets=8
    )
    write_bucketed(
        customer, "b_cust4", str(tmp_path / "c4"), ["custkey"], num_buckets=4
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = bucketed_join(spark, "b_orders8", "b_cust4", ["custkey"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        assert joined.count() == orders.join(customer, "custkey").count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders8")
        spark.sql("DROP TABLE IF EXISTS b_cust4")
