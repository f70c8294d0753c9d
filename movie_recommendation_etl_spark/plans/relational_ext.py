"""Extended relational coverage: map-typed JSON, the full ranking-window
family, exact percentiles, the relational formulation of the ML vocabulary
aggregations (SURVEY.md §2.5 A4/A5), and approximate distinct counting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from movie_recommendation_etl_spark.plans.registry import query
from movie_recommendation_etl_spark.sources.catalog import load_table


@query(
    "q37_props_map_explode",
    oracle="""
    SELECT k, count(*) AS n,
           CAST(sum(CAST(json_extract_string(props, '$.' || k) AS INTEGER))
                AS BIGINT) AS sum_v
    FROM (SELECT props, unnest(json_keys(props)) AS k FROM events)
    GROUP BY k
    """,
)
def q37_props_map_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType promotion of semi-structured JSON (SURVEY §1: the reference
    never uses maps — our engine adds them for events.props) + explode."""
    events = load_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,int>")
    return (
        events.select(F.explode(m).alias("k", "v"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("sum_v"))
    )


@query(
    "q38_rank_suite",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           rank()         OVER w_price AS price_rank,
           dense_rank()   OVER w_price AS price_dense_rank,
           percent_rank() OVER w_price AS price_pct_rank,
           ntile(4)       OVER w_full  AS quartile,
           lag(o_totalprice)  OVER w_full AS prev_price,
           lead(o_totalprice) OVER w_full AS next_price,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6)))
                OVER (w_date ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW)
                AS DOUBLE) AS running_spend,
           CAST(date_diff('day', lag(o_orderdate) OVER w_date, o_orderdate)
                AS INTEGER) AS days_since_prev
    FROM orders
    WINDOW
      w_price AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC),
      w_full  AS (PARTITION BY o_custkey
                  ORDER BY o_totalprice DESC, o_orderkey),
      w_date  AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def q38_rank_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ranking-window family the reference lacks (SURVEY §2.6): rank/
    dense_rank/percent_rank over value order (tie-stable by definition),
    ntile/lag/lead over a total order (unique tiebreaker → deterministic),
    plus the two date-ordered analytics folded in from the former q08/q09
    (registry-cap fit, VERDICT.md r5 #1): a running total with an explicit
    ROWS frame (W3 — decimal-cast inside the sum keeps it order-exact) and
    days-since-previous-order via lag+datediff (W2). All three specs share
    the o_custkey partition: one shuffle, three in-partition sorts."""
    orders = load_table(spark, sf_dir, "orders")
    w_price = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc())
    w_full = W.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    w_date = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.rank().over(w_price).alias("price_rank"),
        F.dense_rank().over(w_price).alias("price_dense_rank"),
        F.percent_rank().over(w_price).alias("price_pct_rank"),
        F.ntile(4).over(w_full).alias("quartile"),
        F.lag("o_totalprice").over(w_full).alias("prev_price"),
        F.lead("o_totalprice").over(w_full).alias("next_price"),
        F.sum(F.col("o_totalprice").cast("decimal(38,6)"))
        .over(w_date.rowsBetween(W.unboundedPreceding, W.currentRow))
        .cast("double")
        .alias("running_spend"),
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w_date))
        .cast("int")
        .alias("days_since_prev"),
    )


@query(
    "q39_exact_percentiles",
    oracle="""
    SELECT l_returnflag,
           count(*) AS n,
           quantile_cont(l_quantity, 0.25) AS q25,
           quantile_cont(l_quantity, 0.50) AS median_qty,
           quantile_cont(l_quantity, 0.75) AS q75,
           min(l_quantity) AS min_qty,
           max(l_quantity) AS max_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q39_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact (interpolating) percentiles per group — Spark ``percentile``
    and DuckDB ``quantile_cont`` share the continuous-interpolation
    definition, so exact values hash-match. Beware percentile_approx: its
    sketch is engine-specific (that operator is covered rows-only by q44)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("percentile(l_quantity, 0.25)").alias("q25"),
        F.expr("percentile(l_quantity, 0.50)").alias("median_qty"),
        F.expr("percentile(l_quantity, 0.75)").alias("q75"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
    )


@query(
    "q43_term_doc_frequency",
    oracle="""
    WITH terms AS (
        SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS term
        FROM documents
    ),
    df AS (
        SELECT term, count(*) AS doc_freq FROM terms GROUP BY term
    )
    SELECT term, doc_freq,
           CAST(row_number() OVER (ORDER BY doc_freq DESC, term) AS INTEGER)
               AS vocab_rank
    FROM df
    WHERE doc_freq >= 3
    """,
)
def q43_term_doc_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4/A5 relationally: what CountVectorizer.fit (minDF=3) and IDF.fit
    compute inside MLlib (reference transform/execute.py:243-250) as an
    explode → groupBy → filter → rank pipeline. Integer-only output —
    the idf *weights* involve ln(), whose last-ulp behavior is
    engine-specific; MLlib's own IDF is exercised end-to-end by q70."""
    docs = load_table(spark, sf_dir, "documents")
    terms = docs.select(
        "doc_id",
        F.explode(F.array_distinct(F.split("text", " "))).alias("term"),
    )
    df = terms.groupBy("term").agg(F.count(F.lit(1)).alias("doc_freq"))
    w = W.orderBy(F.col("doc_freq").desc(), F.col("term"))
    return (
        df.filter(F.col("doc_freq") >= 3)
        .select(
            "term",
            "doc_freq",
            F.row_number().over(w).alias("vocab_rank"),
        )
    )


@query(
    "q44_approx_count_distinct",
    oracle="""
    SELECT count(DISTINCT l_orderkey) AS exact_orders,
           count(DISTINCT l_partkey) AS exact_parts,
           1 AS orders_within_3rsd,
           1 AS parts_within_3rsd
    FROM lineitem
    """,
)
def q44_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct estimation, hash-gated on its CONTRACT
    (r11 upgrade from rows-only): the sketch VALUE is engine-specific —
    no SQL oracle can replicate Spark's HLL++ registers bit-for-bit — but
    the estimator's accuracy contract is checkable cross-engine. The
    oracle computes the exact distinct counts and asserts the
    within-bound booleans TRUE; the Spark side computes the booleans from
    its REAL approx_count_distinct output (|approx − exact| ≤ 3·rsd·exact,
    rsd 0.02 → 6%, a ≥3σ band for HLL++). A broken sketch flips a boolean
    and hash-fails the driver gate instead of hiding behind a rows-only
    check. Spark's HLL++ is deterministic for fixed data and rsd, so the
    gate is stable. At 100 TB this operator replaces exact
    COUNT(DISTINCT) — one pass, bounded memory, no giant shuffle; the
    exact twins computed here for the gate are the expensive thing the
    sketch exists to avoid."""
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.agg(
        F.count_distinct("l_orderkey").alias("exact_orders"),
        F.count_distinct("l_partkey").alias("exact_parts"),
        F.approx_count_distinct("l_orderkey", 0.02).alias("__approx_o"),
        F.approx_count_distinct("l_partkey", 0.02).alias("__approx_p"),
    )
    # INT 0/1, not BOOLEAN: the driver's comparator has hashed every
    # other registry column type for ten rounds, but never a boolean —
    # integers take the battle-tested path on both engines.
    return agg.select(
        "exact_orders",
        "exact_parts",
        (
            F.abs(F.col("__approx_o") - F.col("exact_orders"))
            <= F.col("exact_orders") * F.lit(0.06)
        ).cast("int").alias("orders_within_3rsd"),
        (
            F.abs(F.col("__approx_p") - F.col("exact_parts"))
            <= F.col("exact_parts") * F.lit(0.06)
        ).cast("int").alias("parts_within_3rsd"),
    )
