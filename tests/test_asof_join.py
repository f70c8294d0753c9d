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


def test_asof_map_payload_requires_compact_tiebreak(spark):
    """A MapType payload cannot order the equal-timestamp tiebreak: the
    default must raise up front (not fail deep in analysis), and a compact
    tiebreak column must make the same join work (r2 ADVICE)."""
    import pytest

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    left = spark.createDataFrame(
        [("k", t0, "L1")], "k string, ts timestamp, lv string"
    )
    right = spark.createDataFrame(
        [("k", t0, 1, {"a": "x"}), ("k", t0, 2, {"b": "y"})],
        "k string, ts timestamp, rid int, props map<string,string>",
    )
    with pytest.raises(ValueError, match="MapType"):
        asof_join(left, right, "k", "ts", "ts")
    out = asof_join(left, right, "k", "ts", "ts", tiebreak="rid").collect()
    assert len(out) == 1
    # highest rid at the equal instant wins under last-row-carried-forward
    assert out[0]["rid"] == 2 and out[0]["props"] == {"b": "y"}
