"""Relational query suite (SURVEY.md §2.2-2.9 + the join/window/set-op surface
the reference lacks, §2.4/2.6/2.8). Every query here is a (DataFrame plan,
DuckDB oracle SQL) pair; aggregates use the decimal-exact dsum/davg helpers so
hashes match bit-for-bit regardless of partitioning.

Scale notes are inline per query: which side broadcasts, where the single
shuffle lands, why the plan survives 100x data.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from movie_recommendation_etl_spark.functions.numeric import davg, dsum, sql_davg, sql_dsum
from movie_recommendation_etl_spark.operators.dedup import dedup_keep_first
from movie_recommendation_etl_spark.operators.topk import grouped_top_k, top_k
from movie_recommendation_etl_spark.plans.registry import query
from movie_recommendation_etl_spark.sources.catalog import load_table


# --- q01: pricing summary (TPC-H Q1 shape) --------------------------------
# One hash-aggregate; partial (map-side) agg then a 6-group exchange. Filter
# and 7-column projection push into the parquet scan.
@query(
    "q01_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity')} AS sum_qty,
           {sql_dsum('l_extendedprice')} AS sum_base_price,
           {sql_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
           {sql_davg('l_quantity')} AS avg_qty,
           {sql_davg('l_extendedprice')} AS avg_price,
           {sql_davg('l_discount')} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(disc_price * (1 + F.col("l_tax"))).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --- q02: top revenue orders (TPC-H Q3 shape) ------------------------------
# customer is the small side -> broadcast hash join, no shuffle of lineitem
# for it; orders<->lineitem is the one shuffled join on l_orderkey.
@query(
    "q02_top_revenue_orders",
    oracle=f"""
    SELECT o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date,
           {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE c_mktsegment = 'BUILDING'
    GROUP BY o_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
)
def q02_top_revenue_orders(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    joined = li.join(
        orders, F.col("o_orderkey") == F.col("l_orderkey")
    ).join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
    agg = joined.groupBy("o_orderkey", "o_orderdate").agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
    )
    return top_k(
        agg.select(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            "revenue",
        ),
        [F.col("revenue").desc(), F.col("o_orderkey")],
        10,
    )


# --- q03: rollup over region/nation ---------------------------------------
# Dims are tiny: both joins broadcast; the rollup is one exchange on the
# grouping sets. Rollup nulls mark subtotal rows in both engines.
@query(
    "q03_region_nation_rollup",
    oracle=f"""
    SELECT r_name, n_name,
           COUNT(*) AS n_customers,
           {sql_dsum('c_acctbal')} AS sum_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def q03_region_nation_rollup(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    joined = cust.join(
        F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
    ).join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    return joined.rollup("r_name", "n_name").agg(
        F.count(F.lit(1)).alias("n_customers"),
        dsum("c_acctbal").alias("sum_acctbal"),
    )


# --- q04: cube ------------------------------------------------------------
@query(
    "q04_status_priority_cube",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           {sql_dsum('o_totalprice')} AS sum_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def q04_status_priority_cube(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice").alias("sum_price"),
    )


# --- q05/q06: semi & anti joins -------------------------------------------
@query(
    "q05_semi_join_customers_with_orders",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_customers
    FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders)
    GROUP BY c_mktsegment
    """,
)
def q05_semi_join(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@query(
    "q06_anti_join_customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_custkey IS NOT NULL)
    """,
)
def q06_anti_join(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    # NOT-IN oracle parity: left_anti KEEPS null-key left rows, NOT IN drops
    # them — filter nulls explicitly so a nullable-key schema change can't
    # silently diverge (TPC-H keys are non-null today; ADVICE.md round 1).
    return (
        cust.filter(F.col("c_custkey").isNotNull())
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
    )


# --- q07: grouped top-k via window ----------------------------------------
@query(
    "q07_top3_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def q07_top3_orders_per_customer(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    return grouped_top_k(
        orders.select("o_custkey", "o_orderkey", "o_totalprice"),
        ["o_custkey"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey")],
        3,
    ).select("o_custkey", "o_orderkey", "o_totalprice", F.col("rn").cast("int").alias("rn"))


# --- q08: running window aggregate ----------------------------------------
# Decimal-cast inside the window sum keeps the running total order-exact.
@query(
    "q08_running_total_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_spend
    FROM orders
    """,
)
def q08_running_total_per_customer(spark, sf_dir):
    from pyspark.sql import Window as W

    orders = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(38,6)"))
        .over(w)
        .cast("double")
        .alias("running_spend"),
    )


# --- q09: lag/lead analytics ----------------------------------------------
@query(
    "q09_order_gap_days",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(date_diff('day',
                LAG(o_orderdate) OVER (PARTITION BY o_custkey
                                       ORDER BY o_orderdate, o_orderkey),
                o_orderdate) AS INTEGER) AS days_since_prev
    FROM orders
    """,
)
def q09_order_gap_days(spark, sf_dir):
    from pyspark.sql import Window as W

    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(
            F.col("o_orderdate"), F.lag("o_orderdate").over(w)
        ).cast("int").alias("days_since_prev"),
    )


# --- q10/q11: set ops ------------------------------------------------------
@query(
    "q10_nations_customers_intersect_suppliers",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
)
def q10_intersect(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return cust.intersect(supp)


@query(
    "q11_nations_customers_except_suppliers",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey FROM supplier
    """,
)
def q11_except(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return cust.subtract(supp)  # EXCEPT (set semantics); exceptAll would keep dup counts


# --- q12: distinct aggregates ---------------------------------------------
@query(
    "q12_distinct_counts",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_suppkey) AS n_supp,
           COUNT(DISTINCT l_partkey) AS n_part,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q12_distinct_counts(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct("l_partkey").alias("n_part"),
        F.count(F.lit(1)).alias("n_rows"),
    )


# --- q13: case/when bucketing ---------------------------------------------
@query(
    "q13_acctbal_bands",
    oracle=f"""
    SELECT CASE WHEN c_acctbal < 0 THEN 'negative'
                WHEN c_acctbal < 5000 THEN 'low'
                WHEN c_acctbal < 9000 THEN 'mid'
                ELSE 'high' END AS band,
           COUNT(*) AS n,
           {sql_dsum('c_acctbal')} AS total_bal
    FROM customer
    GROUP BY 1
    """,
)
def q13_acctbal_bands(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    band = (
        F.when(F.col("c_acctbal") < 0, "negative")
        .when(F.col("c_acctbal") < 5000, "low")
        .when(F.col("c_acctbal") < 9000, "mid")
        .otherwise("high")
    )
    return cust.groupBy(band.alias("band")).agg(
        F.count(F.lit(1)).alias("n"), dsum("c_acctbal").alias("total_bal")
    )


# --- q14: IN-list + inequality filters (reference F5/F7/F8) ----------------
@query(
    "q14_priority_filter",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
      AND o_orderstatus <> 'F'
    GROUP BY o_orderpriority
    """,
)
def q14_priority_filter(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
            & (F.col("o_orderstatus") != "F")
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --- q15: string functions -------------------------------------------------
@query(
    "q15_string_funcs",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS up_name,
           CAST(length(p_name) AS INTEGER) AS name_len,
           substr(p_name, 1, 8) AS name_prefix,
           replace(p_brand, 'Brand', 'B') AS brand_short,
           CASE WHEN p_type LIKE '%OM%' THEN 1 ELSE 0 END AS is_om_type
    FROM part
    """,
)
def q15_string_funcs(spark, sf_dir):
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("up_name"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.regexp_replace("p_brand", "Brand", "B").alias("brand_short"),
        F.when(F.col("p_type").like("%OM%"), 1).otherwise(0).alias("is_om_type"),
    )


# --- q16: math functions (IEEE-safe subset) --------------------------------
@query(
    "q16_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           abs(l_extendedprice - 1000.0) AS abs_diff,
           CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
           CAST(ceil(l_discount * 100) AS BIGINT) AS disc_pct_ceil,
           sqrt(l_quantity) AS qty_sqrt,
           l_extendedprice * l_extendedprice AS price_sq
    FROM lineitem
    WHERE l_linenumber = 1 AND l_orderkey % 10 = 0
    """,
)
def q16_math_funcs(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter((F.col("l_linenumber") == 1) & (F.col("l_orderkey") % 10 == 0)).select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_extendedprice") - 1000.0).alias("abs_diff"),
        F.floor("l_extendedprice").alias("price_floor"),
        F.ceil(F.col("l_discount") * 100).alias("disc_pct_ceil"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        (F.col("l_extendedprice") * F.col("l_extendedprice")).alias("price_sq"),
    )


# --- q17: date functions ---------------------------------------------------
@query(
    "q17_date_funcs",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
           CAST(month(o_orderdate) AS INTEGER) AS order_month,
           CAST(quarter(o_orderdate) AS INTEGER) AS order_quarter,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY 1, 2, 3
    """,
)
def q17_date_funcs(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy(
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.quarter("o_orderdate").alias("order_quarter"),
    ).agg(F.count(F.lit(1)).alias("n_orders"))


# --- q18: deterministic dedup (reference A3 made reproducible) -------------
@query(
    "q18_first_order_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS first_order_date
    FROM (
      SELECT o_custkey, o_orderkey, o_orderdate,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS rn
      FROM orders
    ) WHERE rn = 1
    """,
)
def q18_first_order_per_customer(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    return dedup_keep_first(
        orders.select("o_custkey", "o_orderkey", "o_orderdate"),
        ["o_custkey"],
        [F.col("o_orderdate"), F.col("o_orderkey")],
    ).select(
        "o_custkey",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("first_order_date"),
    )


# --- q19: pivot ------------------------------------------------------------
@query(
    "q19_pivot_status_qty",
    oracle=f"""
    SELECT l_returnflag,
           {sql_dsum("CASE WHEN l_linestatus = 'O' THEN l_quantity END")} AS qty_open,
           {sql_dsum("CASE WHEN l_linestatus = 'F' THEN l_quantity END")} AS qty_filled
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q19_pivot_status_qty(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(dsum("l_quantity"))
        .withColumnRenamed("O", "qty_open")
        .withColumnRenamed("F", "qty_filled")
    )


# --- q20: multi-table union ------------------------------------------------
@query(
    "q20_table_stats_union",
    oracle="""
    SELECT 'customer' AS tbl, COUNT(*) AS n FROM customer
    UNION ALL SELECT 'orders', COUNT(*) FROM orders
    UNION ALL SELECT 'lineitem', COUNT(*) FROM lineitem
    """,
)
def q20_table_stats_union(spark, sf_dir):
    dfs = []
    for name in ("customer", "orders", "lineitem"):
        dfs.append(
            load_table(spark, sf_dir, name)
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.lit(name).alias("tbl"), "n")
        )
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out
