"""PCA embedding reduction (ml/pca.py): spectrum sanity, composition with
the engine's cosine top-k, recall of reduced-space search vs full-space
exact search, and a Python-free transform plan."""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from movie_recommendation_etl_spark.functions.vectors import dot, norm2
from movie_recommendation_etl_spark.ml.pca import fit_pca, reduce_embeddings
from movie_recommendation_etl_spark.sources.catalog import load_table


def _topk(df, vec_col, k=10, n_queries=15):
    e = df.select("vec_id", F.col(vec_col).alias("v")).select(
        "vec_id", "v", norm2("v").alias("nrm")
    )
    q = F.broadcast(
        e.filter(F.col("vec_id") < n_queries).select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("nrm").alias("qn"),
        )
    )
    pairs = q.join(e, F.col("vec_id") != F.col("query_id")).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        (dot("qv", "v") / (F.col("qn") * F.col("nrm"))).alias("sim"),
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id")
    )
    return (
        pairs.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id")
    )


def test_pca_spectrum_on_corpus(spark, sf_dir):
    """Spectrum sanity on the real embeddings table (near-isotropic by
    construction, so no variance-capture threshold here — that property is
    asserted on planted low-rank data below)."""
    emb = load_table(spark, sf_dir, "embeddings")
    model = fit_pca(emb, vec_col="embedding", k=16)
    ev = list(model.explainedVariance)
    assert len(ev) == 16
    assert all(a >= b - 1e-12 for a, b in zip(ev, ev[1:]))  # sorted spectrum

    reduced = reduce_embeddings(model, emb, vec_col="embedding")
    row = reduced.select(F.size("reduced").alias("d"), F.size("embedding").alias("d0")).first()
    assert row["d"] == 16 and row["d0"] == 64


def test_pca_recall_on_low_rank_data(spark):
    """The case PCA exists for: data living near a low-dim subspace. Plant
    rank-4 structure in 32 dims + small noise; an 8-component reduction
    must capture nearly all variance and preserve the exact top-10
    neighbors almost perfectly."""
    import math
    import random

    rng = random.Random(7)
    d, r, n = 32, 4, 400
    basis = [[rng.gauss(0, 1) for _ in range(d)] for _ in range(r)]
    rows = []
    for i in range(n):
        coef = [rng.gauss(0, 1) for _ in range(r)]
        v = [
            sum(c * b[j] for c, b in zip(coef, basis))
            + rng.gauss(0, 0.01)
            for j in range(d)
        ]
        rows.append((i, v))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    model = fit_pca(df, vec_col="embedding", k=8)
    assert sum(model.explainedVariance) > 0.99

    reduced = reduce_embeddings(model, df, vec_col="embedding")
    exact = {
        (r_["query_id"], r_["neighbor_id"])
        for r_ in _topk(df, "embedding").collect()
    }
    approx = {
        (r_["query_id"], r_["neighbor_id"])
        for r_ in _topk(reduced, "reduced").collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.95, recall


def test_pca_transform_plan_is_jvm_only(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    model = fit_pca(emb, vec_col="embedding", k=8)
    plan = (
        reduce_embeddings(model, emb)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan
    assert "Exchange" not in plan  # projection rides the scan


def test_pca_deterministic_across_partitioning(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    model = fit_pca(emb, vec_col="embedding", k=8)
    a = {
        r["vec_id"]: r["reduced"]
        for r in reduce_embeddings(model, emb).select(
            "vec_id", "reduced"
        ).collect()
    }
    b = {
        r["vec_id"]: r["reduced"]
        for r in reduce_embeddings(model, emb.repartition(13))
        .select("vec_id", "reduced")
        .collect()
    }
    assert a == b


def test_pca_composes_with_ivf_ann(spark):
    """The 100 TB ANN recipe end-to-end: PCA-reduce, fit IVF cells in the
    REDUCED space, probe-limited search there — recall vs full-space exact
    top-k stays high on low-rank data while every distance runs on 4x
    fewer dimensions."""
    import random

    from movie_recommendation_etl_spark.ml.ivf import (
        fit_ivf_centroids,
        ivf_knn,
    )

    rng = random.Random(11)
    d, r, n = 32, 4, 500
    basis = [[rng.gauss(0, 1) for _ in range(d)] for _ in range(r)]
    rows = []
    for i in range(n):
        coef = [rng.gauss(0, 1) for _ in range(r)]
        v = [
            sum(c * b[j] for c, b in zip(coef, basis)) + rng.gauss(0, 0.01)
            for j in range(d)
        ]
        rows.append((i, v))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    model = fit_pca(df, vec_col="embedding", k=8)
    reduced = reduce_embeddings(model, df, vec_col="embedding").select(
        "vec_id", F.col("reduced").alias("embedding")
    )
    km = fit_ivf_centroids(
        reduced, "embedding", id_col="vec_id", n_centroids=8
    )
    queries = reduced.filter(F.col("vec_id") < 15).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding"),
    )
    approx = ivf_knn(km, reduced, queries, top_k=10, n_probe=4)
    got = {
        (r_["query_id"], r_["neighbor_id"])
        for r_ in approx.select("query_id", "neighbor_id").collect()
    }
    exact = {
        (r_["query_id"], r_["neighbor_id"])
        for r_ in _topk(df, "embedding", k=10, n_queries=15).collect()
    }
    recall = len(got & exact) / len(exact)
    assert recall >= 0.8, recall
