"""Misra–Gries heavy hitters: exactness under arbitrary layouts, the
candidate superset guarantee, and the bounded-state contract.

The operator's promise is strong — EXACT equality with the naive
``groupBy(key).count().filter(cnt > phi*N)`` for every input and every
partition layout, because the sketch only bounds where memory/shuffle go
while an exact recount produces the answer. That promise is what the
driver hash gate (q48) checks on real data; these tests attack it with
skewed synthetic streams and adversarial repartitions.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from movie_recommendation_etl_spark.operators.sketches import (
    heavy_hitters,
    mg_candidates,
)


def _exact(df, phi):
    agg = df.filter(F.col("k").isNotNull()).groupBy("k").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    n = agg.agg(F.sum("cnt")).first()[0]
    return {
        (r["k"], r["cnt"])
        for r in agg.filter(F.col("cnt") > n * phi).collect()
    }, n


def _zipf_stream(rng, n_rows, n_keys):
    # Zipf-ish: key i drawn with weight 1/(i+1) — a heavy head plus a
    # long tail, the regime Misra-Gries exists for
    weights = [1.0 / (i + 1) for i in range(n_keys)]
    keys = rng.choices(range(n_keys), weights=weights, k=n_rows)
    return [(f"key_{k}",) for k in keys]


@pytest.mark.parametrize("layout", [1, 7, 32])
def test_heavy_hitters_exact_under_any_layout(spark, layout):
    rng = random.Random(42)
    rows = _zipf_stream(rng, 20_000, 500)
    df = spark.createDataFrame(rows, "k string").repartition(layout)
    phi = 0.01
    expected, n = _exact(df, phi)
    got = {
        (r["k"], r["cnt"])
        for r in heavy_hitters(df, "k", phi=phi, key_name="k").collect()
    }
    assert got == expected
    assert all(cnt > phi * n for _, cnt in got)


def test_heavy_hitters_exact_with_minimal_k_and_nulls(spark):
    """k at its floor (ceil(1/phi)) — the tightest sketch the guarantee
    allows — and NULL keys mixed in (ignored, never counted toward N)."""
    rng = random.Random(7)
    rows = _zipf_stream(rng, 10_000, 2_000) + [(None,)] * 500
    df = spark.createDataFrame(rows, "k string").repartition(11)
    phi = 0.004
    expected, n = _exact(df, phi)
    out = heavy_hitters(df, "k", phi=phi, key_name="k")
    got = {(r["k"], r["cnt"]) for r in out.collect()}
    assert got == expected
    # NULLs excluded from the denominator too
    assert out.first() is None or out.first()["n_total"] == n


def test_mg_candidates_superset_and_bounded(spark):
    """Per-partition state bound (≤ k candidate rows per partition) and
    the theorem itself: every key with global frequency > N/(k+1) must
    appear in the candidate union, for an adversarial layout that splits
    each heavy key across partitions."""
    n_keys, k = 400, 50
    rows = []
    for i in range(n_keys):
        freq = 200 if i < 10 else 5  # 10 heavy keys, long tail
        rows += [(f"k{i}",)] * freq
    random.Random(3).shuffle(rows)
    df = spark.createDataFrame(rows, "k string").repartition(13)
    cands = mg_candidates(df, "k", k)
    per_part = (
        cands.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    assert per_part <= k
    cand_set = {r["k"] for r in cands.collect()}
    n = len(rows)
    exact = (
        df.groupBy("k").count().filter(F.col("count") > n / (k + 1)).collect()
    )
    assert {r["k"] for r in exact} <= cand_set


def test_heavy_hitters_parameter_validation(spark):
    df = spark.createDataFrame([("a",)], "k string")
    with pytest.raises(ValueError, match="phi"):
        heavy_hitters(df, "k", phi=1.5)
    with pytest.raises(ValueError, match="superset guarantee"):
        heavy_hitters(df, "k", phi=0.01, k=10)


def test_heavy_hitters_empty_and_all_null_input(spark):
    empty = spark.createDataFrame([], "k string")
    assert heavy_hitters(empty, "k", phi=0.1, key_name="k").count() == 0
    nulls = spark.createDataFrame([(None,)] * 10, "k string")
    assert heavy_hitters(nulls, "k", phi=0.1, key_name="k").count() == 0


def test_mg_merge_subtracts_cut_from_survivors():
    """The truncation must SUBTRACT the (k+1)-th largest count, not just
    drop the tail: in this three-batch stream (k=2, N=311, N/(k+1)≈103.7)
    key ``d`` has true frequency 110 and MUST survive. A drop-only
    truncation leaves a/b coasting on stale mass (100 each, true
    frequency 100 < N/(k+1)), inflates the cut to 60, and evicts d —
    silently breaking heavy_hitters' exactness."""
    import pandas as pd

    from movie_recommendation_etl_spark.operators.sketches import _mg_merge

    counters = None
    for batch in (
        pd.Series({"a": 100, "b": 100, "c": 1}),
        pd.Series({"d": 50}),
        pd.Series({"d": 60}),
    ):
        counters = _mg_merge(counters, batch, k=2)
    assert "d" in counters.index
    # residual counter is an undercount bounded by N/(k+1)
    assert 110 - counters["d"] <= 311 / 3


def test_heavy_hitters_remerge_exact_and_bounded(spark):
    """remerge=True must not change the (exact) answer, and the merged
    candidate summary is ≤ k rows TOTAL — the bounded-broadcast shape for
    scans with many partitions."""
    rng = random.Random(99)
    rows = _zipf_stream(rng, 15_000, 800)
    df = spark.createDataFrame(rows, "k string").repartition(24)
    phi = 0.008
    expected, _ = _exact(df, phi)
    got = {
        (r["k"], r["cnt"])
        for r in heavy_hitters(
            df, "k", phi=phi, key_name="k", remerge=True
        ).collect()
    }
    assert got == expected

    k = 125
    merged = mg_candidates(
        mg_candidates(df, "k", k).repartition(1),
        "k",
        k,
        weight_col="__mg_est",
    )
    assert merged.count() <= k


def test_heavy_hitter_store_incremental_matches_one_shot(spark, tmp_path):
    """Batch-at-a-time admission into the persisted MG store must give
    the SAME guarantee as one-shot: after admitting three batches, every
    key with lifetime frequency > N/(k+1) is in the store, the store
    stays ≤ k rows, n_seen tracks lifetime rows, and an exact confirm
    over the union reproduces heavy_hitters on the union."""
    from movie_recommendation_etl_spark.operators.sketches import (
        read_heavy_hitter_candidates,
        update_heavy_hitter_store,
    )

    store = str(tmp_path / "hh_store")
    rng = random.Random(11)
    k = 100
    batches = [
        spark.createDataFrame(
            _zipf_stream(rng, 6_000, 400), "k string"
        ).repartition(5)
        for _ in range(3)
    ]
    for i, b in enumerate(batches):
        stats = update_heavy_hitter_store(
            spark, store, b, "k", k=k, key_name="k"
        )
        assert stats["n_seen"] == 6_000 * (i + 1)
        assert stats["n_candidates"] <= k

    union = batches[0].unionByName(batches[1]).unionByName(batches[2])
    n = 18_000
    exact_heavy = {
        r["k"]
        for r in union.groupBy("k")
        .count()
        .filter(F.col("count") > n / (k + 1))
        .collect()
    }
    cand_rows = read_heavy_hitter_candidates(spark, store).collect()
    cands = {r["k"] for r in cand_rows}
    assert exact_heavy <= cands
    assert all(r["n_seen"] == n for r in cand_rows)

    # exact confirm over the union == the batch operator at phi = 1/k
    phi = 1.0 / k
    expected = {
        (r["k"], r["cnt"])
        for r in heavy_hitters(union, "k", phi=phi, key_name="k").collect()
    }
    confirm = {
        (r["k"], r["count"])
        for r in union.filter(F.col("k").isin(*cands))
        .groupBy("k")
        .count()
        .filter(F.col("count") > n * phi)
        .collect()
    }
    assert confirm == expected


def test_heavy_hitter_store_survives_crashed_write(spark, tmp_path):
    """r12 ADVICE: the old mode('overwrite') deleted the store before
    rewriting it — a crash mid-write lost the lifetime summary. The r13
    commit protocol (versioned v_<n> dirs, highest-with-_SUCCESS wins)
    must (a) keep admissions reading the LAST committed version when an
    uncommitted (crashed) version dir exists, (b) prune superseded
    versions after a successful commit, and (c) still read legacy
    flat-layout stores."""
    import os
    import shutil

    from movie_recommendation_etl_spark.operators.sketches import (
        read_heavy_hitter_candidates,
        update_heavy_hitter_store,
    )

    store = str(tmp_path / "hh_store")
    b1 = spark.createDataFrame([("a",)] * 50 + [("b",)] * 10, "k string")
    s1 = update_heavy_hitter_store(spark, store, b1, "k", k=5, key_name="k")
    assert s1["n_seen"] == 60

    # simulate a crash: a half-written NEWER version without _SUCCESS
    crashed = os.path.join(store, "v_99")
    shutil.copytree(os.path.join(store, "v_1"), crashed)
    os.remove(os.path.join(crashed, "_SUCCESS"))

    cands = {
        r["k"] for r in read_heavy_hitter_candidates(spark, store).collect()
    }
    assert "a" in cands  # reader ignored the uncommitted dir

    # next admission also ignores it, keeps the lifetime count, and
    # commits v_100 (above the crashed number — never a name collision)
    b2 = spark.createDataFrame([("a",)] * 30, "k string")
    s2 = update_heavy_hitter_store(spark, store, b2, "k", k=5, key_name="k")
    assert s2["n_seen"] == 90
    versions = sorted(
        d for d in os.listdir(store) if d.startswith("v_")
    )
    assert "v_100" in versions and "v_1" not in versions  # pruned

    # legacy flat layout (pre-versioning store) still reads
    legacy = str(tmp_path / "hh_legacy")
    spark.createDataFrame(
        [(None, 0.0, 40, 5), ("a", 30.0, 40, 5)],
        "k string, __mg_est double, n_seen long, __mg_k long",
    ).coalesce(1).write.parquet(legacy)
    got = read_heavy_hitter_candidates(spark, legacy).collect()
    assert [r["k"] for r in got] == ["a"]
    s3 = update_heavy_hitter_store(
        spark,
        legacy,
        spark.createDataFrame([("a",)] * 5, "k string"),
        "k",
        k=5,
        key_name="k",
    )
    assert s3["n_seen"] == 45  # lifetime carried over from the flat store

    # FIRST admission crashed (only an uncommitted v_1 exists): the read
    # names the failure mode instead of a schema-inference error, and a
    # retry bootstraps fresh, numbering past the wreckage
    import pytest

    fresh = str(tmp_path / "hh_crashed_first")
    os.makedirs(os.path.join(fresh, "v_1"))
    with open(os.path.join(fresh, "v_1", "part-0.parquet"), "wb") as f:
        f.write(b"half-written garbage")
    with pytest.raises(ValueError, match="no committed version"):
        read_heavy_hitter_candidates(spark, fresh).collect()
    s4 = update_heavy_hitter_store(spark, fresh, b2, "k", k=5, key_name="k")
    assert s4["n_seen"] == 30  # bootstrapped fresh, not mis-read
    assert sorted(os.listdir(fresh)) == ["v_2"]  # wreckage pruned


def test_distinct_store_incremental_matches_one_shot(spark, tmp_path):
    """Persisted HLL distinct-count store: batch-at-a-time admission must
    give the SAME estimate as one aggregate over the union (HLL unions
    are register-wise max — order- and split-independent), the estimate
    is exact at sub-sketch cardinalities, n_seen tracks lifetime rows,
    NULL keys don't count, and a mismatched lg_k admission is rejected
    with the precision-drift failure mode named."""
    import pytest

    from movie_recommendation_etl_spark.operators.sketches import (
        read_distinct_estimate,
        update_distinct_store,
    )

    store = str(tmp_path / "hll_store")
    # three overlapping batches: 0..399, 200..599, 400..799 (+ NULLs)
    batches = [
        spark.range(lo, lo + 400).selectExpr(
            "CASE WHEN id % 97 = 0 THEN NULL "
            "ELSE CAST(id AS STRING) END AS k"
        )
        for lo in (0, 200, 400)
    ]
    stats = None
    for b in batches:
        stats = update_distinct_store(spark, store, b, "k")
    true_distinct = spark.range(0, 800).filter("id % 97 != 0").count()
    n_non_null = sum(b.filter("k IS NOT NULL").count() for b in batches)
    assert stats["n_seen"] == n_non_null
    # lg_k=14 => rsd ~0.8%; at 792 distinct HLL_4 is exact in practice —
    # allow the documented 3-rsd band rather than pinning registers
    assert abs(stats["estimate"] - true_distinct) <= 3 * 0.0081 * true_distinct

    one_shot = update_distinct_store(
        spark,
        str(tmp_path / "hll_one_shot"),
        batches[0].unionByName(batches[1]).unionByName(batches[2]),
        "k",
    )
    assert one_shot["estimate"] == stats["estimate"]  # register-max merge

    got = read_distinct_estimate(spark, store)
    assert got["estimate"] == stats["estimate"]
    assert got["n_seen"] == n_non_null and got["lg_k"] == 14

    with pytest.raises(ValueError, match="lg_k=14"):
        update_distinct_store(spark, store, batches[0], "k", lg_k=12)

    # fresh store + empty batch: estimate 0, store still bootstraps
    empty = str(tmp_path / "hll_empty")
    s0 = update_distinct_store(
        spark, empty, spark.createDataFrame([], "k string"), "k"
    )
    assert s0 == {"n_seen": 0, "estimate": 0.0}
    s1 = update_distinct_store(spark, empty, batches[0], "k")
    assert s1["n_seen"] == batches[0].filter("k IS NOT NULL").count()


def test_mg_merge_superset_property_fuzzed():
    """Theorem-level fuzz (hypothesis): for ANY stream, ANY split into
    batches, and ANY k, chaining _mg_merge keeps every key whose true
    frequency exceeds n/(k+1), and the kept residuals undercount by at
    most n/(k+1). This is the property both heavy_hitters' exactness and
    the streaming/incremental twins rest on."""
    import pandas as pd
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from movie_recommendation_etl_spark.operators.sketches import _mg_merge

    @settings(max_examples=200, deadline=None)
    @given(
        data=st.lists(
            st.integers(min_value=0, max_value=30), min_size=1, max_size=400
        ),
        cuts=st.lists(
            st.integers(min_value=0, max_value=399), max_size=6
        ),
        k=st.integers(min_value=1, max_value=20),
    )
    def check(data, cuts, k):
        n = len(data)
        bounds = sorted({c for c in cuts if c < n} | {0, n})
        counters = None
        for lo, hi in zip(bounds, bounds[1:]):
            chunk = pd.Series([f"k{v}" for v in data[lo:hi]])
            if len(chunk):
                counters = _mg_merge(counters, chunk.value_counts(), k)
        true = pd.Series([f"k{v}" for v in data]).value_counts()
        bound = n / (k + 1)
        kept = counters if counters is not None else pd.Series(dtype=float)
        for key, freq in true.items():
            if freq > bound:
                assert key in kept.index, (key, freq, bound)
            if key in kept.index:
                assert kept[key] <= freq + 1e-9
                assert freq - kept[key] <= bound + 1e-9

    check()


def test_heavy_hitter_store_n_seen_survives_empty_summary(spark, tmp_path):
    """Review-found bug: a uniform batch with > k distinct keys cancels
    every MG counter, and a store holding only candidate rows would lose
    the lifetime n_seen with them. The NULL-key metadata row must carry
    it through, and the reader must hide that row."""
    from movie_recommendation_etl_spark.operators.sketches import (
        read_heavy_hitter_candidates,
        update_heavy_hitter_store,
    )

    store = str(tmp_path / "hh_store_empty")
    uniform = spark.createDataFrame(
        [(f"u{i}",) for i in range(10)], "k string"
    ).coalesce(1)
    s1 = update_heavy_hitter_store(spark, store, uniform, "k", k=3, key_name="k")
    assert s1 == {"n_seen": 10, "n_candidates": 0}
    assert read_heavy_hitter_candidates(spark, store).count() == 0

    skewed = spark.createDataFrame([("hot",)] * 5, "k string")
    s2 = update_heavy_hitter_store(spark, store, skewed, "k", k=3, key_name="k")
    assert s2["n_seen"] == 15  # lifetime count survived the empty store
    cands = read_heavy_hitter_candidates(spark, store).collect()
    assert {r["k"] for r in cands} == {"hot"}
    assert all(r["n_seen"] == 15 for r in cands)


def test_heavy_hitter_store_rejects_k_mismatch(spark, tmp_path):
    """The store persists its sketch width: admitting with a different k
    must fail loudly — a smaller k would truncate lifetime-heavy keys, a
    larger one would claim a tighter guarantee than the history supports."""
    from movie_recommendation_etl_spark.operators.sketches import (
        update_heavy_hitter_store,
    )

    store = str(tmp_path / "hh_store_k")
    batch = spark.createDataFrame([("a",)] * 5, "k string")
    update_heavy_hitter_store(spark, store, batch, "k", k=100, key_name="k")
    for bad_k in (10, 1000):
        with pytest.raises(ValueError, match="k=100"):
            update_heavy_hitter_store(
                spark, store, batch, "k", k=bad_k, key_name="k"
            )
