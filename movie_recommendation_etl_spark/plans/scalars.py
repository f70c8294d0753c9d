"""Array / JSON / string scalar suite (SURVEY.md §2.9 T1-T9) and null
semantics (§2.3 F1-F4/F9, §2.5 A2) as oracle-checked queries.

These re-express the reference's entire cleaning stage Spark-first:
``from_json`` array promotion (reference transform/execute.py:103-109),
``split`` (:114-118), ``array`` wrap (:120-126), array ``concat``
(:128-167), the whitespace-stripping ``transform`` higher-order function
(:144-156 — a Catalyst lambda, NOT a Python UDF; zero Python workers in the
hot path), ``concat_ws`` (:180), sentinel-``"[]"`` filtering (:90),
``na.drop`` (:81-89), ``na.fill`` (:92-94), and the notebook's null-profiling
aggregate (transform/execute.ipynb:610-669).

Every expression here is a built-in Catalyst function, so the whole suite
runs inside whole-stage codegen and scales linearly with input splits — no
shuffle except the final aggregations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from movie_recommendation_etl_spark.plans.registry import query
from movie_recommendation_etl_spark.sources.catalog import load_table


@query(
    "q21_doc_scalar_suite",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           string_split(text, ' ')[1]  AS first_token,
           string_split(text, ' ')[-1] AS last_token,
           md5(array_to_string(string_split(text, ' '), '|')) AS rejoin_md5,
           len(arr) AS n_items,
           md5(array_to_string(
               list_transform(arr, x -> regexp_replace(lower(x), '[aeiou]', '', 'g')),
               ' ')) AS cleaned_md5
    FROM (
        SELECT doc_id, text,
               list_concat(list_concat([lang], [source]),
                           string_split(text, ' ')) AS arr
        FROM documents
    )
    """,
)
def q21_doc_scalar_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2 split / T6 concat_ws / T3 array-wrap / T4 array concat / T5
    transform-HOF / T8 regexp_replace in one per-doc projection (reference
    transform/execute.py:114-167; the whitespace-strip lambda at :144-156
    is a Catalyst higher-order function, NOT a Python UDF). One scan, no
    shuffle; the whole suite compiles into a single codegen stage.
    (Merged q21+q22 to fit the driver's 50-query correctness cap.)"""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    arr = F.concat(
        F.array(F.col("lang")), F.array(F.col("source")), F.split("text", " ")
    )
    cleaned = F.transform(
        arr, lambda x: F.regexp_replace(F.lower(x), "[aeiou]", "")
    )
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.element_at(toks, 1).alias("first_token"),
        F.element_at(toks, -1).alias("last_token"),
        F.md5(F.concat_ws("|", toks)).alias("rejoin_md5"),
        F.size(arr).alias("n_items"),
        F.md5(F.concat_ws(" ", cleaned)).alias("cleaned_md5"),
    )


@query(
    "q24_props_json_extract",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           min(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS k_min,
           max(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS k_max,
           avg(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS k_avg
    FROM events
    GROUP BY event_type
    """,
)
def q24_props_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction over the events stream table (SURVEY.md §2.9
    "not present" gap list — get_json_object). Filter/extraction is
    codegen'd; the only shuffle is the groupBy on event_type."""
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.min(k).alias("k_min"),
        F.max(k).alias("k_max"),
        F.avg(k).alias("k_avg"),
    )


@query(
    "q25_quality_profile",
    oracle="""
    WITH dirty AS (
        SELECT CASE WHEN event_id % 13 = 0 THEN '[]'
                    WHEN event_id % 17 = 0 THEN 'None'
                    WHEN event_id % 19 = 0 THEN NULL
                    ELSE props END AS props_d,
               CASE WHEN value < 0.5 THEN 'NaN'::DOUBLE ELSE value END AS value_d
        FROM events
    ),
    ev AS (
        SELECT count(*) AS n_rows,
               count(CASE WHEN contains(props_d, 'None') OR contains(props_d, 'NULL')
                           OR props_d = '' OR props_d = '[]' OR props_d IS NULL
                          THEN 1 END) AS props_bad,
               count(CASE WHEN value_d IS NULL OR isnan(value_d)
                          THEN 1 END) AS value_bad
        FROM dirty
    ),
    j AS (
        SELECT CASE WHEN doc_id % 7 = 0 THEN 'not json'
                    ELSE '["' || lang || '","' || source || '"]' END AS js
        FROM documents
    ),
    docp AS (
        SELECT count(*) AS n_docs,
               count(CASE WHEN NOT json_valid(js) THEN 1 END) AS n_malformed,
               CAST(sum(CASE WHEN json_valid(js)
                             THEN len(from_json(js, '["VARCHAR"]')) END) AS BIGINT)
                   AS n_tags_sum
        FROM j
    )
    SELECT * FROM ev CROSS JOIN docp
    """,
)
def q25_quality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2/F9 + T1 in one data-quality profile row: the notebook's
    null/sentinel profiling aggregate (reference transform/execute.ipynb:
    610-669 — contains/isNull/isnan/sentinel OR-predicates under conditional
    counts) over events, plus from_json malformed→NULL semantics (reference
    transform/execute.py:103-111) over documents. Both sides are map-side
    partial aggregates — single-pass scans at any scale — and the combine
    is a 1-row × 1-row cross join. (Merged q23+q25 to fit the driver's
    50-query correctness cap.)"""
    events = load_table(spark, sf_dir, "events")
    props_d = (
        F.when(F.col("event_id") % 13 == 0, F.lit("[]"))
        .when(F.col("event_id") % 17 == 0, F.lit("None"))
        .when(F.col("event_id") % 19 == 0, F.lit(None))
        .otherwise(F.col("props"))
    )
    value_d = F.when(F.col("value") < 0.5, F.lit(float("nan"))).otherwise(
        F.col("value")
    )
    d = events.select(props_d.alias("props_d"), value_d.alias("value_d"))
    props_bad = (
        F.col("props_d").contains("None")
        | F.col("props_d").contains("NULL")
        | (F.col("props_d") == "")
        | (F.col("props_d") == "[]")
        | F.col("props_d").isNull()
    )
    value_bad = F.col("value_d").isNull() | F.isnan("value_d")
    ev = d.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(props_bad, 1)).alias("props_bad"),
        F.count(F.when(value_bad, 1)).alias("value_bad"),
    )

    docs = load_table(spark, sf_dir, "documents")
    js = F.when(F.col("doc_id") % 7 == 0, F.lit("not json")).otherwise(
        F.concat(
            F.lit('["'), F.col("lang"), F.lit('","'), F.col("source"), F.lit('"]')
        )
    )
    tags = F.from_json(js, T.ArrayType(T.StringType()))
    docp = docs.select(tags.alias("tags")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count(F.when(F.col("tags").isNull(), 1)).alias("n_malformed"),
        F.sum(F.size("tags")).alias("n_tags_sum"),
    )
    return ev.crossJoin(docp)


@query(
    "q26_clean_drop_fill",
    oracle="""
    WITH d AS (
        SELECT doc_id, text,
               CASE WHEN doc_id % 5 = 0 THEN NULL ELSE lang END AS lang_n,
               CASE WHEN doc_id % 3 = 0 THEN '[]' ELSE source END AS src_n,
               CASE WHEN n_chars % 10 = 0 THEN NULL ELSE n_chars END AS val_n
        FROM documents
    )
    SELECT coalesce(lang_n, 'a') AS lang_f,
           count(*) AS n,
           CAST(sum(val_n) AS BIGINT) AS sum_chars
    FROM d
    WHERE NOT (src_n = '[]')
      AND val_n IS NOT NULL
      AND trim(text) <> ''
    GROUP BY coalesce(lang_n, 'a')
    """,
)
def q26_clean_drop_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's full cleaning contract in one query: sentinel-"[]"
    inequality filter (F1, transform/execute.py:90), na.drop (F2, :81-89),
    na.fill('a') (F3, :92-94 — 'a' later dies as a short token), non-blank
    trim filter (F4, :181). All predicates push into the parquet scan."""
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        "text",
        F.when(F.col("doc_id") % 5 == 0, F.lit(None))
        .otherwise(F.col("lang"))
        .alias("lang_n"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("[]"))
        .otherwise(F.col("source"))
        .alias("src_n"),
        F.when(F.col("n_chars") % 10 == 0, F.lit(None))
        .otherwise(F.col("n_chars"))
        .alias("val_n"),
    )
    cleaned = (
        d.filter(~(F.col("src_n") == "[]"))
        .na.drop(subset=["val_n"])
        .na.fill({"lang_n": "a"})
        .filter(F.trim(F.col("text")) != "")
    )
    return cleaned.groupBy(F.col("lang_n").alias("lang_f")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("val_n").alias("sum_chars"),
    )
