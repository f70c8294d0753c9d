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


# --- q03: rollup + cube in one suite ---------------------------------------
# Merged from the former q03 (rollup over region/nation) and q04 (cube over
# order status/priority) in r12 to free a driver registry slot for
# q48_heavy_hitters without losing either operator: both ROLLUP and CUBE
# grouping-set plans appear in this one union. Dims are tiny: both q03-arm
# joins broadcast; each arm is one exchange on its grouping sets. Grouping
# nulls mark subtotal rows identically in both engines; dsum's DOUBLE
# result keeps the union's value column type-stable across arms.
@query(
    "q03_multidim_agg_suite",
    oracle=f"""
    SELECT 'rollup' AS arm, r_name AS k1, n_name AS k2,
           COUNT(*) AS n_rows,
           {sql_dsum('c_acctbal')} AS sum_val
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    UNION ALL
    SELECT 'cube' AS arm, o_orderstatus AS k1, o_orderpriority AS k2,
           COUNT(*) AS n_rows,
           {sql_dsum('o_totalprice')} AS sum_val
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def q03_multidim_agg_suite(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    orders = load_table(spark, sf_dir, "orders")
    joined = cust.join(
        F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
    ).join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    rollup = joined.rollup("r_name", "n_name").agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum("c_acctbal").alias("sum_val"),
    ).select(
        F.lit("rollup").alias("arm"),
        F.col("r_name").alias("k1"),
        F.col("n_name").alias("k2"),
        "n_rows",
        "sum_val",
    )
    cube = orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum("o_totalprice").alias("sum_val"),
    ).select(
        F.lit("cube").alias("arm"),
        F.col("o_orderstatus").alias("k1"),
        F.col("o_orderpriority").alias("k2"),
        "n_rows",
        "sum_val",
    )
    return rollup.unionByName(cube)


# --- q05: semi, anti & full-outer joins in one suite ------------------------
# Consolidated from the former q05/q06 so the registry fits the driver's
# 50-query correctness cap (VERDICT.md r2 #1) without losing operator
# coverage: LeftSemi, LeftAnti, AND FullOuter appear in this one plan.
# The full-outer arm (r12) reconciles customer vs supplier presence per
# nation — the canonical full-outer use — with customers filtered to even
# nation keys so BOTH unmatched directions genuinely occur (sf0.001 also
# lacks suppliers in 15 of 25 nations).
@query(
    "q05_semi_anti_join_suite",
    oracle="""
    SELECT 'with_orders' AS op, c_mktsegment AS k, COUNT(*) AS n
    FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders)
    GROUP BY c_mktsegment
    UNION ALL
    SELECT 'without_orders' AS op, 'all' AS k, COUNT(*) AS n
    FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_custkey IS NOT NULL)
    UNION ALL
    SELECT 'full_outer' AS op,
           CAST(coalesce(c.nk, s.nk) AS VARCHAR) AS k,
           CAST(coalesce(c.n_c, 0) + coalesce(s.n_s, 0) AS BIGINT) AS n
    FROM (SELECT c_nationkey AS nk, COUNT(*) AS n_c FROM customer
          WHERE c_nationkey % 2 = 0 GROUP BY c_nationkey) c
    FULL OUTER JOIN
         (SELECT s_nationkey AS nk, COUNT(*) AS n_s FROM supplier
          GROUP BY s_nationkey) s
      ON c.nk = s.nk
    """,
)
def q05_semi_anti_join_suite(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    semi = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("with_orders").alias("op"), F.col("c_mktsegment").alias("k"), "n")
    )
    # NOT-IN oracle parity: left_anti KEEPS null-key left rows, NOT IN drops
    # them — filter nulls explicitly so a nullable-key schema change can't
    # silently diverge (TPC-H keys are non-null today; ADVICE.md round 1).
    anti = (
        cust.filter(F.col("c_custkey").isNotNull())
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("without_orders").alias("op"), F.lit("all").alias("k"), "n")
    )
    c_by_nation = (
        cust.filter(F.col("c_nationkey") % 2 == 0)
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_c"))
    )
    s_by_nation = supp.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_s")
    )
    full = (
        c_by_nation.join(
            s_by_nation,
            c_by_nation.c_nationkey == s_by_nation.s_nationkey,
            "full_outer",
        )
        .select(
            F.lit("full_outer").alias("op"),
            F.coalesce("c_nationkey", "s_nationkey")
            .cast("string")
            .alias("k"),
            (
                F.coalesce("n_c", F.lit(0)) + F.coalesce("n_s", F.lit(0))
            ).cast("long").alias("n"),
        )
    )
    return semi.unionByName(anti).unionByName(full)


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


# --- q10: set-op suite (SO2 intersect + SO3 except + SO1 union-all) --------
# Consolidated from the former q10/q11 (registry-cap fit, VERDICT.md r2 #1);
# the former q20_table_stats_union's multi-table UNION ALL folded in as
# 'count:<table>' rows (VERDICT.md r5 #1 — its A1 count coverage rides along).
@query(
    "q10_setop_suite",
    oracle="""
    SELECT 'intersect' AS op, CAST(nationkey AS BIGINT) AS val FROM (
        SELECT c_nationkey AS nationkey FROM customer
        INTERSECT
        SELECT s_nationkey FROM supplier
    )
    UNION ALL
    SELECT 'except' AS op, CAST(nationkey AS BIGINT) AS val FROM (
        SELECT c_nationkey AS nationkey FROM customer
        EXCEPT
        SELECT s_nationkey FROM supplier
    )
    UNION ALL SELECT 'count:customer' AS op, COUNT(*) AS val FROM customer
    UNION ALL SELECT 'count:orders', COUNT(*) FROM orders
    UNION ALL SELECT 'count:lineitem', COUNT(*) FROM lineitem
    """,
)
def q10_setop_suite(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    val = F.col("nationkey").cast("bigint").alias("val")
    inter = cust.intersect(supp).select(F.lit("intersect").alias("op"), val)
    # subtract == EXCEPT (set semantics); exceptAll would keep dup counts
    exc = cust.subtract(supp).select(F.lit("except").alias("op"), val)
    out = inter.unionByName(exc)
    for name in ("customer", "orders", "lineitem"):
        out = out.unionByName(
            load_table(spark, sf_dir, name)
            .agg(F.count(F.lit(1)).alias("val"))
            .select(F.lit(f"count:{name}").alias("op"), "val")
        )
    return out


# --- q12: distinct aggregates + pivot, joined on the grouping key ----------
# Consolidated from the former q12/q19 (registry-cap fit, VERDICT.md r2 #1):
# COUNT(DISTINCT) expansion AND groupBy().pivot() both appear, tied together
# by a 3-row self-join on l_returnflag (trivially broadcast).
@query(
    "q12_distinct_pivot_suite",
    oracle=f"""
    WITH d AS (
        SELECT l_returnflag,
               COUNT(DISTINCT l_suppkey) AS n_supp,
               COUNT(DISTINCT l_partkey) AS n_part,
               COUNT(*) AS n_rows
        FROM lineitem
        GROUP BY l_returnflag
    ),
    p AS (
        SELECT l_returnflag,
               {sql_dsum("CASE WHEN l_linestatus = 'O' THEN l_quantity END")} AS qty_open,
               {sql_dsum("CASE WHEN l_linestatus = 'F' THEN l_quantity END")} AS qty_filled
        FROM lineitem
        GROUP BY l_returnflag
    )
    SELECT d.l_returnflag, n_supp, n_part, n_rows, qty_open, qty_filled
    FROM d JOIN p ON d.l_returnflag = p.l_returnflag
    """,
)
def q12_distinct_pivot_suite(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    distinct_agg = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct("l_partkey").alias("n_part"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    pivoted = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(dsum("l_quantity"))
        .withColumnRenamed("O", "qty_open")
        .withColumnRenamed("F", "qty_filled")
    )
    return distinct_agg.join(F.broadcast(pivoted), "l_returnflag")


# --- q13: conditional-aggregation suite ------------------------------------
# Consolidated from the former q13/q14/q17 (registry-cap fit, VERDICT.md r2
# #1). One (suite, k, n, total) frame with three arms covering case/when
# banding, IN-list + inequality filters (reference F5/F7/F8), and the
# year/month/quarter date functions. Each arm is an independent partial-agg
# scan; the union is append-only (no extra shuffle beyond the three aggs).
@query(
    "q13_conditional_agg_suite",
    oracle=f"""
    SELECT 'acctbal_band' AS suite,
           CASE WHEN c_acctbal < 0 THEN 'negative'
                WHEN c_acctbal < 5000 THEN 'low'
                WHEN c_acctbal < 9000 THEN 'mid'
                ELSE 'high' END AS k,
           COUNT(*) AS n,
           {sql_dsum('c_acctbal')} AS total
    FROM customer
    GROUP BY 2
    UNION ALL
    SELECT 'priority' AS suite, o_orderpriority AS k, COUNT(*) AS n,
           CAST(NULL AS DOUBLE) AS total
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
      AND o_orderstatus <> 'F'
    GROUP BY 2
    UNION ALL
    SELECT 'order_ym' AS suite,
           CAST(CAST(year(o_orderdate) AS INTEGER) AS VARCHAR) || '-' ||
           CAST(CAST(month(o_orderdate) AS INTEGER) AS VARCHAR) || '-Q' ||
           CAST(CAST(quarter(o_orderdate) AS INTEGER) AS VARCHAR) AS k,
           COUNT(*) AS n,
           CAST(NULL AS DOUBLE) AS total
    FROM orders
    GROUP BY 2
    """,
)
def q13_conditional_agg_suite(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    band = (
        F.when(F.col("c_acctbal") < 0, "negative")
        .when(F.col("c_acctbal") < 5000, "low")
        .when(F.col("c_acctbal") < 9000, "mid")
        .otherwise("high")
    )
    bands = cust.groupBy(band.alias("k")).agg(
        F.count(F.lit(1)).alias("n"), dsum("c_acctbal").alias("total")
    ).select(F.lit("acctbal_band").alias("suite"), "k", "n", "total")
    null_total = F.lit(None).cast("double").alias("total")
    prio = (
        orders.filter(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
            & (F.col("o_orderstatus") != "F")
        )
        .groupBy(F.col("o_orderpriority").alias("k"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("priority").alias("suite"), "k", "n", null_total)
    )
    ym_key = F.concat(
        F.year("o_orderdate").cast("string"),
        F.lit("-"),
        F.month("o_orderdate").cast("string"),
        F.lit("-Q"),
        F.quarter("o_orderdate").cast("string"),
    )
    ym = (
        orders.groupBy(ym_key.alias("k"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("order_ym").alias("suite"), "k", "n", null_total)
    )
    return bands.unionByName(prio).unionByName(ym)


# --- q15: scalar-function suite (string + math, over a broadcast join) -----
# Consolidated from the former q15/q16 (registry-cap fit, VERDICT.md r2 #1):
# the string functions run on part columns, the IEEE-safe math subset on
# lineitem columns, tied by the natural l_partkey = p_partkey join. part is
# the small side at every SF ratio (lineitem ~30x larger) — broadcast while
# it fits the driver/executor budget; past that Catalyst falls back to a
# shuffled hash join on the same plan. sqrt/abs/floor/ceil and +-*/ are
# correctly-rounded IEEE ops, bit-identical across engines (transcendentals
# like ln are NOT and stay out of oracle-gated math).
@query(
    "q15_scalar_func_suite",
    oracle="""
    SELECT l_orderkey, p_partkey,
           upper(p_name) AS up_name,
           CAST(length(p_name) AS INTEGER) AS name_len,
           substr(p_name, 1, 8) AS name_prefix,
           replace(p_brand, 'Brand', 'B') AS brand_short,
           CASE WHEN p_type LIKE '%OM%' THEN 1 ELSE 0 END AS is_om_type,
           abs(l_extendedprice - 1000.0) AS abs_diff,
           CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
           CAST(ceil(l_discount * 100) AS BIGINT) AS disc_pct_ceil,
           sqrt(l_quantity) AS qty_sqrt,
           l_extendedprice * l_extendedprice AS price_sq
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_linenumber = 1 AND l_orderkey % 10 = 0
    """,
)
def q15_scalar_func_suite(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    return (
        li.filter((F.col("l_linenumber") == 1) & (F.col("l_orderkey") % 10 == 0))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            "l_orderkey",
            "p_partkey",
            F.upper("p_name").alias("up_name"),
            F.length("p_name").alias("name_len"),
            F.substring("p_name", 1, 8).alias("name_prefix"),
            F.regexp_replace("p_brand", "Brand", "B").alias("brand_short"),
            F.when(F.col("p_type").like("%OM%"), 1).otherwise(0).alias("is_om_type"),
            F.abs(F.col("l_extendedprice") - 1000.0).alias("abs_diff"),
            F.floor("l_extendedprice").alias("price_floor"),
            F.ceil(F.col("l_discount") * 100).alias("disc_pct_ceil"),
            F.sqrt("l_quantity").alias("qty_sqrt"),
            (F.col("l_extendedprice") * F.col("l_extendedprice")).alias("price_sq"),
        )
    )


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


# q20_table_stats_union folded into q10_setop_suite (VERDICT.md r5 #1).
