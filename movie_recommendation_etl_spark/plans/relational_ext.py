"""Extended relational coverage: map-typed JSON, the full ranking-window
family, exact percentiles, the relational formulation of the ML vocabulary
aggregations (SURVEY.md §2.5 A4/A5), and approximate distinct counting.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
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
           max(l_quantity) AS max_qty,
           1 AS p50_within_eps,
           1 AS p90_within_eps
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q39_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact (interpolating) percentiles per group, PLUS the
    quantile-SKETCH accuracy contract (r12, the q44-HLL gate pattern).

    Exact arm: Spark ``percentile`` and DuckDB ``quantile_cont`` share the
    continuous-interpolation definition, so exact values hash-match.

    Sketch arm: ``approx_percentile`` (Spark's Greenwald–Khanna summary —
    partial-mergeable, bounded memory; at 100 TB it replaces the full sort
    the exact arm needs) guarantees the returned element's RANK is within
    eps·n of the target rank, eps = 1/accuracy. No SQL engine can
    replicate the sketch's internals, so the gate checks the contract: a
    second pass counts how many values fall below/at the sketch's answer,
    and the boolean "the value's rank interval intersects
    [target − eps·n − 1, target + eps·n + 1]" must be TRUE (the oracle
    asserts the literal). A broken sketch flips the flag and hash-fails
    the driver gate. The flags are stable even though GK merge order can
    vary with scheduling — ANY merge order satisfies the bound."""
    li = load_table(spark, sf_dir, "lineitem")
    acc = 100  # eps = 1% of n — loose enough to be deterministic, tight
    # enough that a broken sketch (wrong column, wrong quantile
    # definition, off-by-10x rank) lands far outside the band
    g1 = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("percentile(l_quantity, 0.25)").alias("q25"),
        F.expr("percentile(l_quantity, 0.50)").alias("median_qty"),
        F.expr("percentile(l_quantity, 0.75)").alias("q75"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        F.expr(f"approx_percentile(l_quantity, 0.5, {acc})").alias("__a50"),
        F.expr(f"approx_percentile(l_quantity, 0.9, {acc})").alias("__a90"),
    )
    ranks = (
        li.select("l_returnflag", "l_quantity")
        .join(F.broadcast(g1), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.first("n").alias("n"),
            F.first("q25").alias("q25"),
            F.first("median_qty").alias("median_qty"),
            F.first("q75").alias("q75"),
            F.first("min_qty").alias("min_qty"),
            F.first("max_qty").alias("max_qty"),
            F.sum((F.col("l_quantity") < F.col("__a50")).cast("long"))
            .alias("__lt50"),
            F.sum((F.col("l_quantity") <= F.col("__a50")).cast("long"))
            .alias("__le50"),
            F.sum((F.col("l_quantity") < F.col("__a90")).cast("long"))
            .alias("__lt90"),
            F.sum((F.col("l_quantity") <= F.col("__a90")).cast("long"))
            .alias("__le90"),
        )
    )

    def within(q: float, lt: str, le: str) -> Column:
        # the value occupies ranks (lt, le]; the GK contract is that this
        # interval intersects target ± eps·n (±1 absorbs ceil-vs-floor
        # target conventions between the sketch and this check)
        target = F.ceil(F.col("n") * F.lit(q))
        band = F.col("n") * F.lit(1.0 / acc) + F.lit(1.0)
        return (
            (F.col(le) >= target - band) & (F.col(lt) + 1 <= target + band)
        ).cast("int")

    return ranks.select(
        "l_returnflag",
        "n",
        "q25",
        "median_qty",
        "q75",
        "min_qty",
        "max_qty",
        within(0.5, "__lt50", "__le50").alias("p50_within_eps"),
        within(0.9, "__lt90", "__le90").alias("p90_within_eps"),
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
    SELECT 'oneshot' AS arm,
           count(DISTINCT l_orderkey) AS exact_orders,
           count(DISTINCT l_partkey) AS exact_parts,
           1 AS orders_within_3rsd,
           1 AS parts_within_3rsd
    FROM lineitem
    UNION ALL
    SELECT 'store' AS arm,
           count(DISTINCT l_orderkey) AS exact_orders,
           count(DISTINCT l_partkey) AS exact_parts,
           1 AS orders_within_3rsd,
           1 AS parts_within_3rsd
    FROM lineitem
    """,
)
def q44_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct estimation, hash-gated on its CONTRACT
    (r11 upgrade from rows-only): the sketch VALUE is engine-specific —
    no SQL oracle can replicate the registers bit-for-bit — but the
    estimator's accuracy contract is checkable cross-engine. The oracle
    computes the exact distinct counts and asserts the within-bound
    booleans TRUE; the Spark side computes the booleans from its REAL
    sketch outputs. A broken sketch flips a boolean and hash-fails the
    driver gate instead of hiding behind a rows-only check. Both sketch
    paths are deterministic for fixed data, so the gate is stable. Arms:

    - ``oneshot``: approx_count_distinct (HLL++, rsd 0.02 → 6% 3-rsd
      band) against same-plan exact twins. At 100 TB this replaces exact
      COUNT(DISTINCT) — one pass, bounded memory, no giant shuffle; the
      exact twins computed here for the gate are the expensive thing the
      sketch exists to avoid.
    - ``store`` (r13): the INCREMENTAL path — lineitem split into two
      deterministic halves (l_linenumber parity, so the same l_orderkey
      appears in BOTH batches and cross-batch union-dedup is what's
      being gated, not just addition) admitted batch-at-a-time into the
      persisted HLL sketch store (operators/sketches.py:
      update_distinct_store, Datasketches HLL_4 at lg_k=14 → 2.5% 3-rsd
      band), then the lifetime estimate checked against the same exact
      twins. This is the driver-gated row for the admission-store tier —
      pytest pins the batch≡one-shot merge theorem, this arm pins the
      end product against the oracle.
    """
    li = load_table(spark, sf_dir, "lineitem")

    def _flags(arm: str, est_o, est_p, band: float) -> DataFrame:
        agg = li.agg(
            F.count_distinct("l_orderkey").alias("exact_orders"),
            F.count_distinct("l_partkey").alias("exact_parts"),
        )
        # INT 0/1, not BOOLEAN: the driver's comparator has hashed every
        # other registry column type for ten rounds, but never a boolean
        # — integers take the battle-tested path on both engines.
        return agg.select(
            F.lit(arm).alias("arm"),
            "exact_orders",
            "exact_parts",
            (
                F.abs(est_o - F.col("exact_orders"))
                <= F.col("exact_orders") * F.lit(band)
            ).cast("int").alias("orders_within_3rsd"),
            (
                F.abs(est_p - F.col("exact_parts"))
                <= F.col("exact_parts") * F.lit(band)
            ).cast("int").alias("parts_within_3rsd"),
        )

    oneshot = li.agg(
        F.count_distinct("l_orderkey").alias("exact_orders"),
        F.count_distinct("l_partkey").alias("exact_parts"),
        F.approx_count_distinct("l_orderkey", 0.02).alias("__approx_o"),
        F.approx_count_distinct("l_partkey", 0.02).alias("__approx_p"),
    ).select(
        F.lit("oneshot").alias("arm"),
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

    import shutil
    import tempfile

    from movie_recommendation_etl_spark.operators.sketches import (
        read_distinct_estimate,
        update_distinct_store,
    )

    d = tempfile.mkdtemp(prefix="spark_graft_q44_store_")
    try:
        for half in (0, 1):
            batch = li.filter(F.col("l_linenumber") % 2 == half)
            update_distinct_store(spark, f"{d}/orders", batch, "l_orderkey")
            update_distinct_store(spark, f"{d}/parts", batch, "l_partkey")
        est_o = read_distinct_estimate(spark, f"{d}/orders")["estimate"]
        est_p = read_distinct_estimate(spark, f"{d}/parts")["estimate"]
    finally:
        shutil.rmtree(d, ignore_errors=True)
    # 3-rsd band at lg_k=14: 3 * 1.04 / sqrt(2^14) ≈ 2.4% — rounded up
    store = _flags("store", F.lit(est_o), F.lit(est_p), 0.025)
    return oneshot.unionByName(store)
