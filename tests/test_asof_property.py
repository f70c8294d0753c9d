"""Property-based as-of join test: the union-sort formulation must agree
with an oracle-by-definition (per left row: the max-timestamp right row with
rts <= ts, ties broken by largest payload) on arbitrary generated inputs."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from movie_recommendation_etl_spark.operators.joins import asof_join

_BASE = dt.datetime(2024, 1, 1)

_key = st.integers(min_value=0, max_value=3)
_minute = st.integers(min_value=0, max_value=30)
_left_rows = st.lists(
    st.tuples(_key, _minute), min_size=1, max_size=12, unique=True
)
_right_rows = st.lists(
    st.tuples(_key, _minute, st.one_of(st.none(), st.integers(0, 99))),
    min_size=0,
    max_size=12,
    unique_by=lambda r: (r[0], r[1], r[2]),
)


def _reference_asof(left, right):
    out = {}
    for k, lm in left:
        candidates = [r for r in right if r[0] == k and r[1] <= lm]
        if not candidates:
            out[(k, lm)] = (None, None)
        else:
            best = max(candidates, key=lambda r: (r[1], (r[2] is not None, r[2])))
            out[(k, lm)] = (best[1], best[2])
    return out


_spark = None


def _get_spark():
    global _spark
    if _spark is None:
        from movie_recommendation_etl_spark.session import get_spark

        _spark = get_spark(app_name="asof_property")
    return _spark


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(left=_left_rows, right=_right_rows)
def test_asof_matches_definition(left, right):
    spark = _get_spark()
    ldf = spark.createDataFrame(
        [(k, _BASE + dt.timedelta(minutes=m)) for k, m in left],
        "k: long, ts: timestamp",
    )
    rdf = spark.createDataFrame(
        [
            (k, _BASE + dt.timedelta(minutes=m), v)
            for k, m, v in right
        ],
        "k: long, rts: timestamp, payload: int",
    )
    got = {}
    joined = asof_join(
        ldf, rdf, on="k", left_ts="ts", right_ts="rts",
        right_cols=["rts", "payload"],
    )
    for r in joined.collect():
        lm = int((r["ts"] - _BASE).total_seconds() // 60)
        rm = (
            None
            if r["rts"] is None
            else int((r["rts"] - _BASE).total_seconds() // 60)
        )
        got[(r["k"], lm)] = (rm, r["payload"])
    expected = _reference_asof(left, right)
    assert got == expected


# NULL keys and NULL timestamps included: the single-window plan groups NULL
# keys into their own window partition and orders NULL timestamps first
# (nulls-first asc), so the bucketed plan must reproduce both — r16 fix:
# sentinel bucket for NULL ts + null-safe stitch joins (ADVICE r15).
_key_n = st.one_of(st.none(), _key)
_minute_n = st.one_of(st.none(), _minute)
_left_rows_n = st.lists(
    st.tuples(_key_n, _minute_n), min_size=1, max_size=12, unique=True
)
_right_rows_n = st.lists(
    st.tuples(_key_n, _minute_n, st.one_of(st.none(), st.integers(0, 99))),
    min_size=0,
    max_size=12,
    unique_by=lambda r: (r[0], r[1], r[2]),
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(left=_left_rows_n, right=_right_rows_n)
def test_bucketed_asof_identical_to_single_window(left, right):
    """r15 skew path: bucket_width splits each key's timeline into time
    buckets (windows per (key, bucket) + a carry-in stitch) — the output
    must be IDENTICAL to the single-window plan for any input, including
    buckets with only left rows (carry-in crosses empty buckets),
    boundary-exact timestamps, NULL join keys, and NULL timestamps on
    either side. Width of 300 s = 5 min, so the 0-30 min domain spans ~7
    buckets and the generator hits every edge."""
    spark = _get_spark()

    def _ts(m):
        return None if m is None else _BASE + dt.timedelta(minutes=m)

    ldf = spark.createDataFrame(
        [(k, _ts(m)) for k, m in left],
        "k: long, ts: timestamp",
    )
    rdf = spark.createDataFrame(
        [(k, _ts(m), v) for k, m, v in right],
        "k: long, rts: timestamp, payload: int",
    )

    def _rows(df):
        return {
            (r["k"], r["ts"], r["rts"], r["payload"]) for r in df.collect()
        }

    plain = asof_join(
        ldf, rdf, on="k", left_ts="ts", right_ts="rts",
        right_cols=["rts", "payload"],
    )
    bucketed = asof_join(
        ldf, rdf, on="k", left_ts="ts", right_ts="rts",
        right_cols=["rts", "payload"], bucket_width=300.0,
    )
    assert _rows(bucketed) == _rows(plain)
    # r16 auto path: derived width (or the single-window fallback when no
    # key has a positive span) must also be output-identical. Tiny
    # target_bucket_rows forces real multi-bucket splits on dense keys.
    auto = asof_join(
        ldf, rdf, on="k", left_ts="ts", right_ts="rts",
        right_cols=["rts", "payload"], bucket_width="auto",
        target_bucket_rows=2,
    )
    assert _rows(auto) == _rows(plain)
