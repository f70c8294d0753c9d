"""Point-lookup / SQL-expression / IN-subquery / CSV-scan queries
(SURVEY.md §2.3 F5-F7, §2.1 S3).

The reference's interactive idioms: string-predicate filters through the SQL
parser (``df.filter("revenue == 0")``, execute.ipynb:547), key point lookups
(:1647), and IN-list membership (:1855). Plus the robust-dialect CSV scan
(transform/execute.py:48-57) proven by a write → read round-trip whose
result is oracle-checked against the parquet original.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from movie_recommendation_etl_spark.functions.numeric import dsum, sql_dsum
from movie_recommendation_etl_spark.plans.registry import query
from movie_recommendation_etl_spark.sources.catalog import load_table
from movie_recommendation_etl_spark.sources.readers import read_csv_robust
from movie_recommendation_etl_spark.sources.writers import write_csv


@query(
    "q33_lookup_expr_suite",
    oracle=f"""
    SELECT c_custkey, c_name, c_nationkey, c_acctbal, revenue, n_rows,
           o_orderpriority, n_orders,
           n_regionkey, n_nations, first_name, last_name
    FROM (
        SELECT c_custkey, c_name, c_nationkey, c_acctbal
        FROM customer WHERE c_custkey = 42
    ) CROSS JOIN (
        SELECT {sql_dsum("l_extendedprice * l_discount")} AS revenue,
               count(*) AS n_rows
        FROM lineitem
        WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
    ) CROSS JOIN (
        SELECT o_orderpriority, count(*) AS n_orders
        FROM orders
        WHERE o_custkey IN (
            SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        )
        GROUP BY o_orderpriority
    ) CROSS JOIN (
        SELECT n_regionkey, count(*) AS n_nations,
               min(n_name) AS first_name, max(n_name) AS last_name
        FROM nation
        GROUP BY n_regionkey
    )
    """,
)
def q33_lookup_expr_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6 point lookup + F5 SQL-string predicate + F7 IN-subquery through
    the SQL entry point, in one suite (merged q33+q34, then q35 folded in —
    registry-cap fit, VERDICT.md r5 #1).

    F6: equality filter on the key — pushes into the parquet scan
    (PushedFilters), reading only row groups whose min/max admit the key
    (reference execute.ipynb:1647). F5: a SQL-string predicate through
    F.expr (the reference's df.filter("revenue == 0") idiom,
    execute.ipynb:547) over a TPC-H-Q6-shaped aggregate. F7: an
    IN-subquery through spark.sql (the reference has no SQL entry point —
    SURVEY §2.11); Catalyst rewrites the IN to a left-semi join and
    auto-broadcasts the dimension side. S3 (folded-in q36, r9 slot
    consolidation): nation written to CSV with the robust dialect and read
    back with an explicit schema (never inferSchema — a second full pass
    at scale, SURVEY §1), then aggregated; the oracle reads the parquet
    original, so this arm passes only if the round-trip is lossless. The
    combine is a 1 × 1 × 5 × 5-row cross join — every scan keeps its
    pushed filters."""
    cust = load_table(spark, sf_dir, "customer")
    lookup = cust.filter(F.col("c_custkey") == 42).select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal"
    )
    li = load_table(spark, sf_dir, "lineitem")
    rev = li.filter(
        F.expr("l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24")
    ).agg(
        dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    cust.createOrReplaceTempView("customer")
    prio = spark.sql(
        """
        SELECT o_orderpriority, count(*) AS n_orders
        FROM orders
        WHERE o_custkey IN (
            SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        )
        GROUP BY o_orderpriority
        """
    )
    nation = load_table(spark, sf_dir, "nation")
    path = os.path.join(
        tempfile.gettempdir(), f"spark_graft_csv_nation_{os.path.basename(sf_dir)}"
    )
    write_csv(nation, path)
    back = read_csv_robust(spark, path, schema=nation.schema)
    csv_agg = back.groupBy("n_regionkey").agg(
        F.count(F.lit(1)).alias("n_nations"),
        F.min("n_name").alias("first_name"),
        F.max("n_name").alias("last_name"),
    )
    return lookup.crossJoin(rev).crossJoin(prio).crossJoin(csv_agg)
