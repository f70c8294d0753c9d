"""Unit tests for the as-of join operator, incl. the NULL-payload case the
struct-packing design exists for: a matched right row whose *fields* are
NULL must be carried intact, never stitched with values from older rows."""

from __future__ import annotations

import datetime as dt

from movie_recommendation_etl_spark.operators.joins import asof_join


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute)


def test_asof_null_payload_carried_intact(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), "L1"), (1, _ts(30), "L2")],
        "k: long, ts: timestamp, lval: string",
    )
    right = spark.createDataFrame(
        [(1, _ts(5), "early", 100.0), (1, _ts(20), None, None)],
        "k: long, rts: timestamp, tag: string, amount: double",
    )
    rows = {
        r["lval"]: (r["tag"], r["amount"])
        for r in asof_join(left, right, on="k", left_ts="ts", right_ts="rts").collect()
    }
    assert rows["L1"] == ("early", 100.0)
    # the :20 row matched; its NULL fields must NOT be backfilled from :05
    assert rows["L2"] == (None, None)


def test_asof_inclusive_and_unmatched(spark):
    left = spark.createDataFrame(
        [(1, _ts(5), "before"), (1, _ts(10), "exact"), (2, _ts(50), "nokey")],
        "k: long, ts: timestamp, lval: string",
    )
    right = spark.createDataFrame(
        [(1, _ts(10), "r10")], "k: long, rts: timestamp, tag: string"
    )
    rows = {
        r["lval"]: r["tag"]
        for r in asof_join(left, right, on="k", left_ts="ts", right_ts="rts").collect()
    }
    assert rows["before"] is None  # no right row at or before :05
    assert rows["exact"] == "r10"  # <= is inclusive
    assert rows["nokey"] is None  # left join keeps unmatched keys


def test_asof_deterministic_tiebreak(spark):
    left = spark.createDataFrame(
        [(1, _ts(30), "L")], "k: long, ts: timestamp, lval: string"
    )
    right = spark.createDataFrame(
        [(1, _ts(20), "a", 1.0), (1, _ts(20), "b", 2.0)],
        "k: long, rts: timestamp, tag: string, amount: double",
    )
    outs = set()
    for _ in range(3):
        r = asof_join(
            left.repartition(4), right.repartition(3), on="k",
            left_ts="ts", right_ts="rts",
        ).collect()[0]
        outs.add((r["tag"], r["amount"]))
    # largest payload struct wins, regardless of partitioning
    assert outs == {("b", 2.0)}
