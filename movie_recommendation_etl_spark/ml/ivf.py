"""IVF (inverted-file) approximate nearest neighbors: KMeans coarse
quantizer + probe-limited equi-join search.

The scale path for embedding similarity when LSH recall disappoints:
partition the corpus into centroids' Voronoi cells, then search only the
``n_probe`` cells nearest each query. Candidate enumeration is an EQUI-join
on cluster id — shuffle-friendly, prunable, never all-pairs (a cross join at
100 TB is the thing this module exists to avoid). Centroids are tiny and
broadcast; per-query cell selection is a broadcast nested-loop over
n_centroids rows.
"""

from __future__ import annotations

from pyspark.ml.clustering import KMeans, KMeansModel
from pyspark.ml.functions import array_to_vector
from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from movie_recommendation_etl_spark.functions.vectors import cosine

SEED = 42


def fit_ivf_centroids(
    emb: DataFrame,
    array_col: str = "embedding",
    *,
    n_centroids: int = 16,
    seed: int = SEED,
    max_fit_rows: int = 100_000,
) -> KMeansModel:
    """Fit the coarse quantizer on a bounded sample, never the full corpus.

    Standard IVF practice: centroid quality saturates at ~1000 training
    points per centroid, so the fit reads at most ``max_fit_rows`` rows
    (deterministic hash-mod sample — rerun-stable, unlike ``sample()``)
    however large the corpus is. The sample is also coalesced to a few
    partitions: KMeans runs one scheduling wave per pass per partition, so
    a small training set spread over the session's full parallelism spends
    its wall-clock on task dispatch, not arithmetic.
    """
    vecs = emb.select(array_to_vector(array_col).alias("__vec"))
    n = vecs.count()
    if n > max_fit_rows:
        # deterministic, uniform in expectation; keyed on the vector text
        vecs = vecs.filter(
            F.abs(F.xxhash64(F.col("__vec").cast("string"))) % n
            < max_fit_rows
        )
    rows_per_part = 25_000  # a pass over 25k 64-dim vectors is ~ms of CPU
    target_parts = max(1, min(n, max_fit_rows) // rows_per_part) or 1
    # random init + capped iterations: kmeans|| init costs ~2 extra jobs per
    # k-means round and each Spark job has fixed dispatch latency; a coarse
    # quantizer's cells only need to be roughly balanced (the n_probe search
    # re-ranks exactly), which 8 rounds from random init already delivers
    # (recall gate: tests/test_ivf_skew.py).
    km = KMeans(
        k=n_centroids,
        seed=seed,
        featuresCol="__vec",
        predictionCol="__cell",
        initMode="random",
        maxIter=8,
    )
    return km.fit(vecs.coalesce(int(target_parts)))


def assign_cells(
    model: KMeansModel, emb: DataFrame, array_col: str = "embedding"
) -> DataFrame:
    """Attach the coarse cell id to every row (scan-stage transform)."""
    with_vec = emb.withColumn("__vec", array_to_vector(array_col))
    return model.transform(with_vec).drop("__vec").withColumnRenamed(
        "__cell", "cell"
    )


def _centroids_df(model: KMeansModel, spark) -> DataFrame:
    rows = [
        (i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
    ]
    return spark.createDataFrame(rows, "cell: int, centroid: array<double>")


def ivf_knn(
    model: KMeansModel,
    dataset: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    array_col: str = "embedding",
    top_k: int = 5,
    n_probe: int = 4,
) -> DataFrame:
    """Probe-limited cosine top-k: (1) pick each query's n_probe nearest
    cells against the broadcast centroid table, (2) equi-join queries to
    dataset rows in those cells, (3) window top-k by cosine."""
    spark = dataset.sparkSession
    centroids = F.broadcast(_centroids_df(model, spark))

    q_cells = (
        queries.crossJoin(centroids)
        .withColumn(
            "__cdist", cosine(F.col(array_col), F.col("centroid"))
        )
        .withColumn(
            "__crank",
            F.row_number().over(
                W.partitionBy(query_id_col).orderBy(
                    F.col("__cdist").desc(), F.col("cell")
                )
            ),
        )
        .filter(F.col("__crank") <= n_probe)
        .select(query_id_col, F.col(array_col).alias("__q_emb"), "cell")
    )

    ds_cells = assign_cells(model, dataset, array_col)
    pairs = q_cells.join(ds_cells, "cell").select(
        query_id_col,
        F.col(id_col).alias("neighbor_id"),
        cosine(F.col("__q_emb"), F.col(array_col)).alias("cosine_sim"),
    )
    w = W.partitionBy(query_id_col).orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        pairs.filter(F.col("neighbor_id") != F.col(query_id_col))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= top_k)
    )
