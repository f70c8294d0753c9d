"""grouped_top_k_two_stage: exact equivalence to the single-window form
(any data, any n_salts), and the plan shape that kills the
one-reducer-per-stratum straggler (r13 VERDICT #1)."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from movie_recommendation_etl_spark.operators.topk import (
    grouped_top_k,
    grouped_top_k_two_stage,
)


def _frame(spark):
    # 3 low-cardinality groups, duplicate scores (ties broken by id),
    # one group smaller than k — every edge the equivalence must cover
    rows = [
        (i, ["en", "de", "fr"][i % 3] if i < 95 else "xx", (i * 37) % 11)
        for i in range(100)
    ]
    return spark.createDataFrame(rows, "id int, grp string, score int")


def _collect(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("n_salts", [1, 3, 64])
def test_two_stage_equals_single_window(spark, n_salts):
    df = _frame(spark)
    order = [F.col("score").desc(), F.col("id")]
    naive = grouped_top_k(df, ["grp"], order, 7)
    two = grouped_top_k_two_stage(
        df, ["grp"], order, 7, salt_cols=["id"], n_salts=n_salts
    )
    assert _collect(two) == _collect(naive)
    assert set(two.columns) == set(naive.columns)


def test_two_stage_small_groups_pass_whole(spark):
    # a group smaller than k keeps every row with correct ranks
    df = _frame(spark)
    order = [F.col("score").desc(), F.col("id")]
    out = grouped_top_k_two_stage(
        df, ["grp"], order, 50, salt_cols=["id"], n_salts=8
    )
    xx = {r["id"]: r["rn"] for r in out.filter(F.col("grp") == "xx").collect()}
    assert len(xx) == 5  # ids 95..99 all survive
    assert sorted(xx.values()) == [1, 2, 3, 4, 5]


def test_two_stage_rejects_bad_salts(spark):
    with pytest.raises(ValueError, match="n_salts"):
        grouped_top_k_two_stage(
            _frame(spark), ["grp"], [F.col("id")], 3, salt_cols=["id"], n_salts=0
        )


def test_two_stage_plan_shape(spark):
    """Two Windows, two Exchanges: the big one fans out over
    (grp, __tk_salt); the per-grp-only exchange sees just the stage-1
    survivors (the __tk_rn1 <= k filter sits between them)."""
    df = _frame(spark)
    out = grouped_top_k_two_stage(
        df, ["grp"], [F.col("score").desc(), F.col("id")], 7, salt_cols=["id"]
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"Window \[", plan)) == 2, plan
    assert plan.count("Exchange hashpartitioning") == 2, plan
    assert re.search(r"Exchange hashpartitioning\(grp#\d+, __tk_salt", plan)
    # the grp-only exchange exists exactly once and is fed by the stage-1
    # rank filter, i.e. its input is bounded at n_salts*k rows per group
    grp_only = re.findall(r"Exchange hashpartitioning\(grp#\d+, \d+\)", plan)
    assert len(grp_only) == 1, plan
    assert "__tk_rn1" in plan
