"""SemDeDup semantic dedup: planted paraphrase groups, transitivity,
deterministic survivors, plan shape."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from movie_recommendation_etl_spark.operators.semantic_dedup import (
    semantic_dedup,
    semantic_dup_groups,
)


def _corpus(spark):
    """60 well-separated random base vectors plus planted semantic dups:
    ids 100/101/102 are tiny perturbations of base 0 (a 3-clique at
    eps=0.95), ids 200/201 perturb base 1, and 300->301->302 is a CHAIN
    (301 between 300 and 302; cos(300,302) still > eps here but the CC
    closure is what groups them regardless). Perturbations are small
    enough that k-means cannot split them across cells."""
    rng = np.random.default_rng(7)
    base = rng.normal(size=(60, 32))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = [(int(i), base[i].tolist()) for i in range(60)]

    def near(b, scale, rid):
        v = b + rng.normal(size=32) * scale
        return (rid, (v / np.linalg.norm(v)).tolist())

    rows += [near(base[0], 1e-4, r) for r in (100, 101, 102)]
    rows += [near(base[1], 1e-4, r) for r in (200, 201)]
    rows += [near(base[2], 5e-3 * k, 300 + k) for k in (0, 1, 2)]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )


def test_planted_groups_resolve_to_min_id_survivors(spark):
    emb = _corpus(spark)
    stats: dict = {}
    groups = semantic_dup_groups(
        _cells(spark, emb), eps=0.95, stats=stats
    ).cache()
    got = {
        r["vec_id"]: (r["group_id"], r["is_kept"])
        for r in groups.collect()
    }
    assert len(got) == emb.count()
    # clique around base 0: survivor is base row 0 itself
    for rid in (100, 101, 102):
        assert got[rid] == (0, False)
    assert got[0] == (0, True)
    # pair around base 1
    assert got[200] == (1, False) and got[201] == (1, False)
    assert got[1] == (1, True)
    # chain around base 2 collapses transitively to one group
    assert {got[r][0] for r in (2, 300, 301, 302)} == {2}
    assert [got[r][1] for r in (300, 301, 302)] == [False] * 3
    # every other base row is its own group and kept
    for i in range(3, 60):
        assert got[i] == (i, True)
    # r17: small graphs resolve on the driver union-find fast path
    # (rounds == 0 + fast_path_edges); the result above proves the CC
    # semantics either way
    assert stats["rounds"] >= 1 or "fast_path_edges" in stats
    groups.unpersist()


def _cells(spark, emb):
    from movie_recommendation_etl_spark.ml.ivf import (
        assign_cells,
        fit_ivf_centroids,
    )

    model = fit_ivf_centroids(emb, n_centroids=4)
    return assign_cells(model, emb, "embedding")


def test_semantic_dedup_wrapper_keeps_survivors_only(spark):
    emb = _corpus(spark)
    out = semantic_dedup(emb, eps=0.95, n_centroids=4)
    kept = {r["vec_id"] for r in out.select("vec_id").collect()}
    assert kept == set(range(60))  # all 8 planted dups dropped
    assert out.columns == emb.columns  # original schema preserved


def test_zero_norm_vectors_never_flagged(spark):
    emb = spark.createDataFrame(
        [
            (1, [0.0] * 8),
            (2, [0.0] * 8),
            (3, [1.0] + [0.0] * 7),
            (4, [1.0] + [0.0] * 7),
        ],
        "vec_id long, embedding array<double>",
    )
    groups = semantic_dup_groups(
        emb.withColumn("cell", F.lit(0)), eps=0.9
    )
    got = {r["vec_id"]: (r["group_id"], r["is_kept"]) for r in groups.collect()}
    assert got[1] == (1, True) and got[2] == (2, True)  # undefined cosine
    assert got[3] == (3, True) and got[4] == (3, False)  # real dup pair


def test_pair_join_is_equi_on_cell_not_cartesian(spark):
    emb = _corpus(spark)
    cells = _cells(spark, emb)
    groups = semantic_dup_groups(cells, eps=0.95)
    plan = groups._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "PythonUDF" not in plan


def test_eps_monotonicity(spark):
    """Lower eps can only merge more: the kept set at eps=0.99 is a
    superset of the kept set at eps=0.8."""
    emb = _corpus(spark)
    cells = _cells(spark, emb).cache()
    kept_hi = {
        r["vec_id"]
        for r in semantic_dup_groups(cells, eps=0.99)
        .filter("is_kept")
        .collect()
    }
    kept_lo = {
        r["vec_id"]
        for r in semantic_dup_groups(cells, eps=0.8)
        .filter("is_kept")
        .collect()
    }
    cells.unpersist()
    assert kept_lo <= kept_hi
    assert 0 in kept_lo and 1 in kept_lo  # min-id survivors stable


def test_centroid_far_retention_policy(spark):
    """keep='centroid_far' keeps the group member with the LOWEST cosine
    to its cell centroid (the paper's diversity-retaining policy). The
    expected survivor is computed independently in numpy from the fitted
    centroid, so the test follows the geometry instead of hardcoding
    ids."""
    import numpy as np

    from movie_recommendation_etl_spark.ml.ivf import fit_ivf_centroids

    rng = np.random.default_rng(11)
    base = rng.normal(size=(13, 16))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    # rows 0-11 use base[1:]; the planted pair rides base[0], a direction
    # no base row shares, so the epsilon group is exactly {100, 101}
    v100 = base[0]
    v101 = base[0] + rng.normal(size=16) * 0.02
    v101 /= np.linalg.norm(v101)
    assert float(v100 @ v101) > 0.95
    rows = [(int(i), base[i + 1].tolist()) for i in range(12)]
    rows += [(100, v100.tolist()), (101, v101.tolist())]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    model = fit_ivf_centroids(emb, n_centroids=2)
    cents = np.asarray(model.clusterCenters())

    def cell_of(v):  # KMeans assigns by euclidean distance
        return int(((cents - v) ** 2).sum(1).argmin())

    assert cell_of(v100) == cell_of(v101)  # pair shares a block
    c = cents[cell_of(v100)]

    def csim(v):
        return float(v @ c) / (np.linalg.norm(v) * np.linalg.norm(c))

    expected = 100 if csim(v100) < csim(v101) else 101
    if abs(csim(v100) - csim(v101)) < 1e-9:
        expected = 100  # tie → min id

    out = semantic_dedup(
        emb, eps=0.95, model=model, keep="centroid_far"
    )
    kept = {r["vec_id"] for r in out.select("vec_id").collect()}
    assert expected in kept and {100, 101} - kept == {100, 101} - {expected}
    # non-duplicate rows all survive under either policy
    assert set(range(12)) <= kept

    with pytest.raises(ValueError):
        semantic_dedup(emb, keep="random")


def test_cell_size_guard_bounds_mass_duplicate_cell(spark):
    """r15: a mass-duplicated embedding cluster lands in ONE k-means cell
    regardless of n_centroids — cells over max_cell_size must hub-join
    (linear candidates) instead of self-joining quadratically, while
    still grouping the hub's epsilon-duplicates into one component.
    Cells under the cap keep their exact all-pairs semantics."""
    import numpy as np

    rng = np.random.default_rng(3)
    v = rng.normal(size=16)
    v /= np.linalg.norm(v)
    w = rng.normal(size=16)
    w -= w @ v * v  # orthogonal direction
    w /= np.linalg.norm(w)
    n_big = 500
    rows = []
    # one mega-cell of near-identical vectors (cell 0)
    for i in range(n_big):
        p = v + rng.normal(size=16) * 1e-4
        rows.append((i, 0, (p / np.linalg.norm(p)).tolist()))
    # a small exact-semantics cell (cell 1): a 3-group + 2 singletons
    for j, scale in ((1000, 0.0), (1001, 1e-4), (1002, 1e-4)):
        p = w + rng.normal(size=16) * scale
        rows.append((j, 1, (p / np.linalg.norm(p)).tolist()))
    u = rng.normal(size=16)
    u /= np.linalg.norm(u)
    rows.append((1003, 1, (-u).tolist()))
    rows.append((1004, 1, [0.0] * 16))  # zero norm
    cells = spark.createDataFrame(
        rows, "vec_id long, cell int, embedding array<double>"
    )
    stats: dict = {}
    out = semantic_dup_groups(
        cells, eps=0.95, max_cell_size=100, stats=stats
    ).collect()
    assert stats["overflow_cells"] == 1
    assert stats["max_cell_size_seen"] == n_big
    by_id = {r["vec_id"]: r for r in out}
    # the mega-cell resolves to ONE group keyed by its min id, hub kept
    assert {by_id[i]["group_id"] for i in range(n_big)} == {0}
    assert by_id[0]["is_kept"] and not by_id[1]["is_kept"]
    # small cell keeps exact semantics: 1000-1002 one group, rest alone
    assert (
        by_id[1000]["group_id"]
        == by_id[1001]["group_id"]
        == by_id[1002]["group_id"]
        == 1000
    )
    assert by_id[1003]["group_id"] == 1003 and by_id[1003]["is_kept"]
    assert by_id[1004]["group_id"] == 1004 and by_id[1004]["is_kept"]
