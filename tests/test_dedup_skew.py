"""The r16 exact-dedup rewrite: dedup_keep_first is a map-side-combinable
min_by aggregate, not a row_number window (VERDICT r15 #1 — a viral identical
document must not serialize into one window-sort task)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from movie_recommendation_etl_spark.operators.dedup import (
    SortSpec,
    asc_nulls_last,
    dedup_keep_first,
    desc,
    fingerprint,
)


def _window_reference(df, keys, sort_cols):
    """The pre-r16 implementation, used as the semantic oracle."""
    w = W.partitionBy(*keys).orderBy(*sort_cols)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def _rows_set(df):
    return {tuple(r) for r in df.collect()}


@pytest.fixture(scope="module")
def messy(spark):
    rng = random.Random(16)
    titles = ["alpha", "beta", None, "Gamma", "delta"]
    rows = [
        (
            rng.randrange(40),  # key with collisions (and a null below)
            rng.randrange(1000),  # unique-ish tiebreaker
            rng.choice(titles),
            float(rng.randrange(100)),
        )
        for _ in range(400)
    ]
    rows += [(None, i, "nullkey", float(i)) for i in range(5)]
    return spark.createDataFrame(
        rows, "k int, uid int, title string, score double"
    ).repartition(7)


def test_asc_nulls_first_matches_window(messy):
    got = dedup_keep_first(messy, ["k"], [F.col("uid")])
    ref = _window_reference(messy, ["k"], [F.col("uid").asc()])
    assert _rows_set(got) == _rows_set(ref)


def test_asc_nulls_last_total_order_matches_window(messy):
    # title has nulls and duplicates; uid makes the ordering total so both
    # implementations must pick the identical survivor.
    got = dedup_keep_first(
        messy, ["k"], [asc_nulls_last("title"), SortSpec("uid")]
    )
    ref = _window_reference(
        messy, ["k"], [F.col("title").asc_nulls_last(), F.col("uid").asc()]
    )
    assert _rows_set(got) == _rows_set(ref)


def test_desc_long_matches_window(messy):
    got = dedup_keep_first(messy, ["k"], [desc("uid")])
    ref = _window_reference(messy, ["k"], [F.col("uid").desc()])
    assert _rows_set(got) == _rows_set(ref)


def test_desc_double_and_multi_key_matches_window(messy):
    got = dedup_keep_first(messy, ["k", "title"], [desc("score"), "uid"])
    ref = _window_reference(
        messy,
        ["k", "title"],
        [F.col("score").desc(), F.col("uid").asc()],
    )
    assert _rows_set(got) == _rows_set(ref)


def test_desc_nulls_ordering(spark):
    # desc default places nulls LAST (SQL/window default); window agrees.
    df = spark.createDataFrame(
        [(1, None, "a"), (1, 5, "b"), (1, 9, "c"), (2, None, "only")],
        "k int, v int, tag string",
    )
    got = dedup_keep_first(df, ["k"], [desc("v")])
    ref = _window_reference(df, ["k"], [F.col("v").desc()])
    assert _rows_set(got) == _rows_set(ref)
    tags = {r["k"]: r["tag"] for r in got.collect()}
    assert tags == {1: "c", 2: "only"}


def test_desc_double_nan_ranks_first_like_window(spark):
    # r17 ADVICE fix: Spark orders NaN largest, so a DESC window ranks NaN
    # FIRST; -NaN is still NaN (largest), so without the NaN flag field the
    # agg form would rank it LAST. Both paths must pick the NaN row, and
    # nulls must still land last (desc default).
    nan = float("nan")
    df = spark.createDataFrame(
        [
            (1, 5.0, "five"),
            (1, nan, "nan"),
            (1, 9.0, "nine"),
            (2, None, "null-only"),
            (3, nan, "nan-a"),
            (3, nan, "nan-b"),
            (4, None, "null"),
            (4, 1.0, "one"),
        ],
        "k int, v double, tag string",
    )
    got = dedup_keep_first(df, ["k"], [desc("v"), "tag"])
    ref = _window_reference(
        df, ["k"], [F.col("v").desc(), F.col("tag").asc()]
    )

    def _norm(rows):  # NaN != NaN in python tuples; compare via repr
        return {tuple(repr(v) for v in r) for r in rows.collect()}

    assert _norm(got) == _norm(ref)
    tags = {r["k"]: r["tag"] for r in got.collect()}
    assert tags == {1: "nan", 2: "null-only", 3: "nan-a", 4: "one"}


def test_keys_only_frame(spark):
    df = spark.createDataFrame([(1,), (1,), (2,)], "k int")
    out = dedup_keep_first(df, ["k"], ["k"])
    assert sorted(r["k"] for r in out.collect()) == [1, 2]


def test_sort_order_column_rejected(messy):
    with pytest.raises(TypeError, match="sort-order Column"):
        dedup_keep_first(messy, ["k"], [F.col("uid").asc()])


def test_desc_string_rejected(messy):
    with pytest.raises(ValueError, match="no overflow-free inversion"):
        dedup_keep_first(messy, ["k"], [desc("title")])


def test_no_window_and_partial_agg_in_plan(messy):
    plan = dedup_keep_first(messy, ["k"], ["uid"])._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "partial_min_by" in plan  # map-side combine half is present


def test_viral_duplicate_stays_distributed(spark):
    # 10^5 copies of one document plus distinct tail: the hot fingerprint
    # must be pre-reduced map-side (no single-task window sort). We assert
    # the *plan* property (no Window, partial agg) and correctness.
    n = 100_000
    viral = spark.range(n).select(
        F.col("id").alias("doc_id"), F.lit("Same Boilerplate Page!").alias("text")
    )
    tail = spark.range(n, n + 500).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("unique "), F.col("id").cast("string")).alias("text"),
    )
    df = viral.unionByName(tail).withColumn("fp", fingerprint(F.col("text")))
    out = dedup_keep_first(df, ["fp"], ["doc_id"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "partial_min_by" in plan
    rows = out.collect()
    assert len(rows) == 501
    survivors = {r["text"]: r["doc_id"] for r in rows}
    assert survivors["Same Boilerplate Page!"] == 0
