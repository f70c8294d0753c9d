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


def test_bucketed_extreme_ts_never_collides_with_null_sentinel(spark):
    """r17 ADVICE fix: floor(ts/width) with an extreme ts/width ratio
    overflows long and Spark clamps the cast — the NEGATIVE clamp is
    Long.MIN_VALUE, which is the NULL-ts sentinel bucket. The greatest()
    guard must keep real (huge-negative) timestamps in a real bucket so
    they still match, while genuine NULL-ts left rows stay unmatched."""
    left = spark.createDataFrame(
        [(1, -9.0e18, "deep-past"), (1, None, "null-ts"), (1, 100.0, "now")],
        "k: long, ts: double, lval: string",
    )
    right = spark.createDataFrame(
        [(1, -9.1e18, "ancient", 1.0), (1, 50.0, "recent", 2.0)],
        "k: long, rts: double, tag: string, amount: double",
    )
    kwargs = dict(on="k", left_ts="ts", right_ts="rts")
    single = {
        r["lval"]: (r["tag"], r["amount"])
        for r in asof_join(left, right, **kwargs).collect()
    }
    # width 0.5 puts |floor(-9e18 / 0.5)| = 1.8e19 > Long.MAX: the unguarded
    # floor would clamp the bucket onto the sentinel
    bucketed = {
        r["lval"]: (r["tag"], r["amount"])
        for r in asof_join(left, right, bucket_width=0.5, **kwargs).collect()
    }
    assert single == bucketed
    assert bucketed["deep-past"] == ("ancient", 1.0)
    assert bucketed["null-ts"] == (None, None)
    assert bucketed["now"] == ("recent", 2.0)


def test_auto_width_clamped_on_dense_same_instant_keys(spark):
    """r17 ADVICE fix: span/(n-1) on dense near-same-instant keys can derive
    a pathologically tiny auto width; the floor clamp keeps
    |floor(ts/width)| <= 2^40 so bucket ids stay far inside long range."""
    from movie_recommendation_etl_spark.operators.joins import (
        _auto_bucket_width,
    )

    # ts magnitude ~1e15 with spans of ~0.25: raw gap*target could still be
    # small relative to ts; the clamp guarantees width >= abs_max/2^40.
    rows = [(k, 1.0e15 + k + i * 0.125) for k in range(3) for i in range(3)]
    df = spark.createDataFrame(rows, "k: long, ts: double")
    width = _auto_bucket_width(df, df, ["k"], "ts", "ts", target_bucket_rows=2)
    assert width is not None
    assert width >= 1.0e15 / float(1 << 40)
    assert abs(1.0e15 / width) < float(1 << 41)
