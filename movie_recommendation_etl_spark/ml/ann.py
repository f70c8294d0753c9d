"""LSH approximate nearest neighbors (reference SURVEY.md §2.10 M11-M12).

The reference's only interactive query engine is ``get_recommendations``
(transform/execute.ipynb:1645-1670): point-lookup the query vector, LSH
``approxNearestNeighbors`` for k+1, drop self, limit k, collect ids. This
module reproduces that shape with a *seeded* BucketedRandomProjectionLSH
(the reference never seeds — its results are unstable across runs; SURVEY
§5.4 pins determinism) plus a batch variant built on approxSimilarityJoin
for many-query workloads (per-query driver loops don't scale; a single
hash-join over bucketed candidates does).
"""

from __future__ import annotations

from pyspark.ml.feature import (
    BucketedRandomProjectionLSH,
    BucketedRandomProjectionLSHModel,
    Normalizer,
)
from pyspark.ml.functions import array_to_vector, vector_to_array
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

# Reference LSH hyperparameters: transform/execute.py:266-267.
BUCKET_LENGTH = 1.95
NUM_HASH_TABLES = 14
SEED = 42


def fit_lsh(
    df: DataFrame,
    features_col: str = "norm_features",
    *,
    bucket_length: float = BUCKET_LENGTH,
    num_hash_tables: int = NUM_HASH_TABLES,
    seed: int = SEED,
) -> BucketedRandomProjectionLSHModel:
    lsh = BucketedRandomProjectionLSH(
        inputCol=features_col,
        outputCol="hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=seed,
    )
    return lsh.fit(df)


def prepare_index(
    model: BucketedRandomProjectionLSHModel, df: DataFrame
) -> DataFrame:
    """Precompute + cache the LSH hash column. approxNearestNeighbors
    re-transforms the whole dataset PER QUERY when the hashes column is
    missing — on a 604k-doc corpus that's ~60 s/query of avoidable work
    (measured); against a prepared index the same query is interactive.
    Call once after fit, pass the result as the dataset for every query."""
    hashed = model.transform(df)
    hashed = hashed.persist()
    hashed.count()
    return hashed


def recommend(
    model: BucketedRandomProjectionLSHModel,
    df: DataFrame,
    id_col: str,
    query_id,
    top_k: int = 5,
    features_col: str = "norm_features",
) -> DataFrame:
    """The reference's get_recommendations shape (execute.ipynb:1645-1670):
    point lookup → approxNearestNeighbors(k+1) → drop self → top-k.
    Returns (id, rank, dist), nearest first. Missing id → empty frame."""
    row = df.filter(F.col(id_col) == query_id).select(features_col).first()
    if row is None:
        return df.sparkSession.createDataFrame(
            [], f"{id_col} long, rank int, dist double"
        )
    neighbors = model.approxNearestNeighbors(
        df, row[features_col], top_k + 1, distCol="dist"
    )
    return (
        neighbors.filter(F.col(id_col) != query_id)
        .orderBy(F.col("dist").asc(), F.col(id_col).asc())
        .limit(top_k)
        .select(
            id_col,
            F.row_number()
            .over(W.orderBy(F.col("dist").asc(), F.col(id_col).asc()))
            .alias("rank"),
            "dist",
        )
    )


def _batch_lsh_pass(
    model: BucketedRandomProjectionLSHModel,
    qs: DataFrame,
    dataset: DataFrame,
    id_col: str,
    query_id_col: str,
    *,
    radius: float,
) -> DataFrame:
    """One LSH similarity-join pass of :func:`batch_ann` as a LAZY frame
    (query_id, neighbor_id, dist). Module-level so the plan-pin harness
    (scripts/pin_plans.py: batch_ann_pass1) captures EXACTLY the join the
    bench executes instead of a re-derived copy that could silently
    diverge (r18 review)."""
    return model.approxSimilarityJoin(
        qs, dataset, radius, distCol="dist"
    ).select(
        F.col(f"datasetA.{query_id_col}").alias("query_id"),
        F.col(f"datasetB.{id_col}").alias("neighbor_id"),
        "dist",
    )


def _batch_topk(pairs: DataFrame, top_k: int) -> DataFrame:
    """The per-query top-k window over a candidate-pair frame — lazy
    (batch_ann adds the eager localCheckpoint; the pin harness does
    not). Per-QUERY window: high-cardinality partitions, the
    single-window form's correct case (see operators/topk.py and
    ml/ivf.py's note)."""
    w = W.partitionBy("query_id").orderBy(
        F.col("dist").asc(), F.col("neighbor_id").asc()
    )
    return (
        pairs.filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= top_k)
    )


def batch_ann(
    model: BucketedRandomProjectionLSHModel,
    queries: DataFrame,
    dataset: DataFrame,
    id_col: str,
    query_id_col: str,
    *,
    top_k: int = 5,
    radius: float = 1.4,
    widen: float = 2.0,
    max_widen_rounds: int = 1,
    exact_fallback: bool = True,
) -> DataFrame:
    """Many-query ANN as ONE distributed job: approxSimilarityJoin inside
    ``radius`` (on L2-normalized vectors dist=sqrt(2-2cos), so radius 1.4 ≈
    cos >= 0.02), then window top-k per query. This is the 100 TB shape —
    the per-query approxNearestNeighbors loop in the reference runs a full
    scan per query from the driver.

    A fixed radius under-returns for queries in sparse neighborhoods (the
    r2 scale audit). Under-filled queries (< top_k neighbors) are re-run
    through ``max_widen_rounds`` progressively wider joins (radius x
    ``widen``), and — since approxSimilarityJoin can only ever see
    bucket-colliding pairs regardless of radius — any STILL-under-filled
    residual finishes with an exact brute-force pass. Each escalation
    touches only the residual queries, so the common case stays one join
    and the guarantee costs (residual x dataset), not (queries x dataset).

    Each pass's top-k is materialized via localCheckpoint: it is O(queries
    x top_k) rows, and the under-fill check would otherwise re-run the
    similarity join once per escalation decision.
    """
    def topk(pairs: DataFrame) -> DataFrame:
        return _batch_topk(pairs, top_k).localCheckpoint(eager=True)

    def lsh_pass(qs: DataFrame, r: float) -> DataFrame:
        return _batch_lsh_pass(
            model, qs, dataset, id_col, query_id_col, radius=r
        )

    def residual(result: DataFrame) -> DataFrame:
        filled = (
            result.groupBy("query_id")
            .count()
            .filter(F.col("count") >= top_k)
            .select("query_id")
        )
        return queries.join(
            filled,
            queries[query_id_col] == filled["query_id"],
            "left_anti",
        )

    def merge(result: DataFrame, redo: DataFrame) -> DataFrame:
        # redo replaces the under-filled queries' rows wholesale (their
        # earlier partial candidates are a subset of the wider pass's).
        return result.join(
            redo.select("query_id").distinct(), "query_id", "left_anti"
        ).unionByName(redo)

    result = topk(lsh_pass(queries, radius))
    r = radius
    for _ in range(max_widen_rounds):
        under = residual(result)
        if under.isEmpty():
            return result
        r *= widen
        result = merge(result, topk(lsh_pass(under, r)))
    if exact_fallback:
        under = residual(result)
        if not under.isEmpty():
            feat = model.getInputCol()
            qa = F.broadcast(
                under.select(
                    F.col(query_id_col).alias("query_id"),
                    vector_to_array(feat).alias("__qa"),
                )
            )
            da = dataset.select(
                F.col(id_col).alias("neighbor_id"),
                vector_to_array(feat).alias("__da"),
            )
            exact = qa.crossJoin(da).select(
                "query_id",
                "neighbor_id",
                F.sqrt(
                    F.aggregate(
                        F.zip_with(
                            "__qa", "__da", lambda x, y: (x - y) * (x - y)
                        ),
                        F.lit(0.0),
                        lambda acc, x: acc + x,
                    )
                ).alias("dist"),
            )
            result = merge(result, topk(exact))
    return result


def embeddings_as_vectors(
    spark: SparkSession, sf_dir: str, *, normalized: bool = True
) -> DataFrame:
    """embeddings table with the array<float> column promoted to VectorUDT
    (and L2-normalized so LSH Euclidean distance tracks cosine)."""
    from movie_recommendation_etl_spark.sources.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", array_to_vector("embedding").alias("vec")
    )
    if not normalized:
        return emb
    return Normalizer(inputCol="vec", outputCol="norm_vec", p=2.0).transform(
        emb
    )
