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
) -> KMeansModel:
    km = KMeans(
        k=n_centroids, seed=seed, featuresCol="__vec", predictionCol="__cell"
    )
    return km.fit(emb.select(array_to_vector(array_col).alias("__vec")))


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
