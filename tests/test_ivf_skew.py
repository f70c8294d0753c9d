"""IVF ANN recall vs brute force; salted aggregation/join equivalence."""

from __future__ import annotations

from pyspark.sql import functions as F

from movie_recommendation_etl_spark.ml.ivf import (
    fit_ivf_centroids,
    ivf_knn,
)
from movie_recommendation_etl_spark.operators.skew import (
    join_salt,
    replicate_for_salted_join,
    salted_agg,
)
from movie_recommendation_etl_spark.plans.registry import QUERIES
from movie_recommendation_etl_spark.sources.catalog import load_table
import movie_recommendation_etl_spark.plans.all  # noqa: F401


def test_ivf_knn_recall(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    model = fit_ivf_centroids(emb, n_centroids=8)
    queries = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    approx: dict[int, set] = {}
    for r in ivf_knn(
        model, emb, queries, top_k=5, n_probe=4
    ).collect():
        approx.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    exact: dict[int, set] = {}
    for r in QUERIES["q60_knn_bruteforce"](spark, sf_dir).collect():
        exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recalls = [
        len(exact[q] & approx.get(q, set())) / len(exact[q]) for q in exact
    ]
    # probing half the cells on clusterless random data: recall well above
    # the ~n_probe/n_centroids floor proves cell selection works
    assert sum(recalls) / len(recalls) >= 0.5


def test_ivf_index_roundtrip(spark, sf_dir, tmp_path):
    """Persisted IVF serving: save_ivf_index writes centroids + the
    cell-PARTITIONED corpus; a fresh load must answer ivf_knn_from_index
    bit-identically to the in-memory model path, and the on-disk layout
    must actually be hive-partitioned by cell (that directory pruning is
    the point of the persistence)."""
    from movie_recommendation_etl_spark.ml.ivf import (
        ivf_knn_from_index,
        load_ivf_index,
        save_ivf_index,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    model = fit_ivf_centroids(emb, n_centroids=8)
    queries = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    fresh = sorted(
        tuple(r)
        for r in ivf_knn(model, emb, queries, top_k=5, n_probe=4)
        .select("query_id", "neighbor_id", "rnk")
        .collect()
    )
    path = str(tmp_path / "ivf_index")
    save_ivf_index(model, emb, path)
    assert any(
        p.name.startswith("cell=") for p in (tmp_path / "ivf_index" / "cells").iterdir()
    )
    centroids, cells = load_ivf_index(spark, path)
    served = sorted(
        tuple(r)
        for r in ivf_knn_from_index(
            centroids, cells, queries, top_k=5, n_probe=4
        )
        .select("query_id", "neighbor_id", "rnk")
        .collect()
    )
    assert served == fresh and len(fresh) == 100


def test_ivf_recommend_prunes_partitions(spark, sf_dir, tmp_path):
    """Single-query serving (ivf_recommend): probed cells are chosen
    driver-side from the tiny centroid table and become a LITERAL IN-list,
    so the persisted index's parquet scan carries static PartitionFilters —
    only n_probe of n_centroids cell directories are read. Results must
    equal exact cosine top-k over the probed cells."""
    from movie_recommendation_etl_spark.ml.ivf import (
        ivf_recommend,
        load_ivf_index,
        save_ivf_index,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    model = fit_ivf_centroids(emb, n_centroids=8)
    path = str(tmp_path / "ivf_index")
    save_ivf_index(model, emb, path)
    centroids, cells = load_ivf_index(spark, path)

    q = emb.filter(F.col("vec_id") == 3).first()["embedding"]
    out = ivf_recommend(centroids, cells, list(q), top_k=5, n_probe=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan
    import re

    m = re.search(r"PartitionFilters: \[[^\]]*cell[^\]]*IN \(([^)]*)\)", plan)
    assert m and len(m.group(1).split(",")) == 3

    got = [(r["neighbor_id"], r["rnk"]) for r in out.collect()]
    # exact re-rank over the probed cells, python-side
    probed = {int(x) for x in m.group(1).split(",")}
    rows = [
        (r["vec_id"], r["embedding"])
        for r in cells.filter(F.col("cell").isin(*probed)).collect()
    ]

    def cos(a, b):
        d = sum(float(x) * float(y) for x, y in zip(a, b))
        na = sum(float(x) ** 2 for x in a) ** 0.5
        nb = sum(float(y) ** 2 for y in b) ** 0.5
        return d / (na * nb)

    want = sorted(((cos(q, e), -i) for i, e in rows), reverse=True)[:5]
    assert got == [(-i, rnk + 1) for rnk, (_, i) in enumerate(want)]


def test_ivf_recommend_quantized_rerank(spark, sf_dir, tmp_path):
    """SQ8 serving: the stage-1 candidate scan must read ONLY the int8
    column (ReadSchema free of the float embedding — the 4x IO saving)
    while keeping the static cell pruning, and the re-ranked final top-5
    must match the full-precision ivf_recommend answer on this data."""
    from movie_recommendation_etl_spark.ml.ivf import (
        _quantized_candidates,
        ivf_recommend,
        load_ivf_index,
        save_ivf_index,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    model = fit_ivf_centroids(emb, n_centroids=8)
    path = str(tmp_path / "ivf_q_index")
    save_ivf_index(model, emb, path, quantize=True)
    centroids, cells = load_ivf_index(spark, path)
    q = list(emb.filter(F.col("vec_id") == 3).first()["embedding"])

    cand = _quantized_candidates(
        cells, [0, 1, 2], q, id_col="vec_id", n_candidates=20
    )
    plan = cand._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    import re

    schemas = re.findall(r"ReadSchema: ([^\n]*)", plan)
    assert schemas and all("qvec" in s and "embedding" not in s for s in schemas)

    full = [
        (r["neighbor_id"], r["rnk"])
        for r in ivf_recommend(
            centroids, cells, q, top_k=5, n_probe=3
        ).collect()
    ]
    sq8 = [
        (r["neighbor_id"], r["rnk"])
        for r in ivf_recommend(
            centroids, cells, q, top_k=5, n_probe=3, use_quantized=True
        ).collect()
    ]
    assert sq8 == full


def test_quantize_query_mirrors_spark(spark):
    """_quantize_query (the driver-side literal for SQ8 serving) must be
    bit-identical to functions.vectors.quantize_int8 — a rounding-mode
    drift (python round is banker's, Spark F.round is half-up) would
    silently skew every quantized candidate score."""
    from movie_recommendation_etl_spark.functions.vectors import quantize_int8
    from movie_recommendation_etl_spark.ml.ivf import _quantize_query

    vecs = [
        [0.5, -0.5, 1.5, -1.5, 0.0315, -0.0315],
        [1.0, 0.0, -1.0, 0.25, -0.75, 0.125],
        [0.0, 0.0, 0.0, 0.0, 0.0, 0.0],
        [3.7e-3, -9.1e-4, 2.2e-2, -5.5e-5, 7.7e-1, -1.3e-1],
    ]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "i int, v array<float>",
    )
    rows = {
        r["i"]: r["qs"]
        for r in df.select("i", quantize_int8("v").alias("qs")).collect()
    }
    for i, v in enumerate(vecs):
        # mirror quantizes the same float32-widened values Spark reads
        v32 = [r for r in df.filter(F.col("i") == i).first()["v"]]
        scale, q = _quantize_query(v32)
        assert abs(rows[i]["scale"] - scale) < 1e-15, i
        assert list(rows[i]["q"]) == q, i


def test_ivf_fit_has_no_count_prepass(spark, sf_dir, monkeypatch):
    """The r3 fit paid a full corpus count() (plus a vector→string cast)
    before sampling; the fit must now bound its input with a fixed-modulus
    hash slice + limit instead — no counting job at all."""
    from pyspark.sql import DataFrame

    def _boom(self):
        raise AssertionError("fit_ivf_centroids must not count the corpus")

    emb = load_table(spark, sf_dir, "embeddings")
    monkeypatch.setattr(DataFrame, "count", _boom)
    model = fit_ivf_centroids(emb, id_col="vec_id", n_centroids=8)
    assert len(model.clusterCenters()) == 8


def test_ivf_fit_sampled_recall(spark, sf_dir):
    """With a hash-mod sample_fraction the fit sees only a slice of the
    corpus, yet the coarse quantizer must still deliver useful recall at
    driver scale — the 100 TB fit path, exercised end-to-end."""
    emb = load_table(spark, sf_dir, "embeddings")
    model = fit_ivf_centroids(
        emb, id_col="vec_id", n_centroids=8, sample_fraction=0.5
    )
    queries = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    approx: dict[int, set] = {}
    for r in ivf_knn(model, emb, queries, top_k=5, n_probe=4).collect():
        approx.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    exact: dict[int, set] = {}
    for r in QUERIES["q60_knn_bruteforce"](spark, sf_dir).collect():
        exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recalls = [
        len(exact[q] & approx.get(q, set())) / len(exact[q]) for q in exact
    ]
    assert sum(recalls) / len(recalls) >= 0.5


def test_salted_agg_matches_plain(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    got = {
        r["event_type"]: (r["n"], r["max_v"], r["min_v"])
        for r in salted_agg(
            events,
            ["event_type"],
            {"n": ("event_id", "count"), "max_v": ("value", "max"),
             "min_v": ("value", "min")},
            n_salts=8,
        ).collect()
    }
    exp = {
        r["event_type"]: (r["n"], r["max_v"], r["min_v"])
        for r in events.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.max("value").alias("max_v"),
            F.min("value").alias("min_v"),
        )
        .collect()
    }
    assert got == exp


def test_salted_join_matches_plain(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    n_salts = 8
    big = orders.withColumn("__salt", join_salt(orders, n_salts))
    small = replicate_for_salted_join(cust, n_salts)
    salted = big.join(
        small,
        (big.o_custkey == small.c_custkey) & (big["__salt"] == small["__salt"]),
    )
    plain = orders.join(cust, orders.o_custkey == cust.c_custkey)
    assert salted.count() == plain.count()
    got = {
        r["c_mktsegment"]: r["n"]
        for r in salted.groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    exp = {
        r["c_mktsegment"]: r["n"]
        for r in plain.groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == exp
