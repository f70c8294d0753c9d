"""Flagship ANN queries: the reference's recommend path over documents
(TF-IDF → LSH → approxNearestNeighbors, transform/execute.py:175-270 +
execute.ipynb:1645-1670) and the batch LSH ANN over embeddings.

Registered WITHOUT oracles: LSH candidate generation through MLlib's seeded
random projections is deterministic for a fixed seed but not expressible in
ANSI SQL, so the driver applies the rows-only check; exactness is covered by
pytest recall tests against the brute-force oracle (q60 / numpy)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from movie_recommendation_etl_spark.ml.ann import (
    batch_ann,
    embeddings_as_vectors,
    fit_lsh,
    recommend,
)
from movie_recommendation_etl_spark.ml.tfidf import fit_document_vectors
from movie_recommendation_etl_spark.plans.registry import query
from movie_recommendation_etl_spark.sources.catalog import load_table

FLAGSHIP_QUERY_DOC = 42
TOP_K = 5


@query("q61_knn_lsh_embeddings")
def q61_knn_lsh_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch ANN over embeddings: one approxSimilarityJoin for all 20
    queries (the scale path), window top-5 per query. Compare with
    q60_knn_bruteforce — the exact baseline it approximates."""
    emb = embeddings_as_vectors(spark, sf_dir)
    model = fit_lsh(emb, "norm_vec", bucket_length=0.5)
    queries = (
        emb.filter(F.col("vec_id") < 20)
        .select(F.col("vec_id").alias("query_id"), "norm_vec")
    )
    dataset = emb.select("vec_id", "norm_vec")
    return batch_ann(
        model, queries, dataset, "vec_id", "query_id", top_k=TOP_K
    ).select("query_id", "neighbor_id", "rnk", "dist")


@query("q62_knn_ivf_embeddings")
def q62_knn_ivf_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN (rows-only): KMeans coarse cells + probe-limited equi-join
    search — the alternative scale path to LSH when the corpus clusters.
    Recall vs q60 is asserted in tests/test_ivf_skew.py."""
    from movie_recommendation_etl_spark.ml.ivf import fit_ivf_centroids, ivf_knn

    emb = load_table(spark, sf_dir, "embeddings")
    model = fit_ivf_centroids(emb, n_centroids=8)
    queries = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return ivf_knn(model, emb, queries, top_k=TOP_K, n_probe=4).select(
        "query_id", "neighbor_id", "rnk", "cosine_sim"
    )


@query("q70_recommend_similar_docs")
def q70_recommend_similar_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE flagship: reference get_recommendations re-expressed Spark-first.

    documents → RegexTokenizer → StopWordsRemover → CountVectorizer(minDF=3)
    → IDF(minDocFreq=3) → Normalizer(p=2) → seeded BRP-LSH(1.95, 14 tables)
    → approxNearestNeighbors(k+1) → drop self → ordered top-5.

    The transformed corpus is cached between the LSH fit and the query —
    the reference's .py pipeline skipped this and recomputed its lineage
    once per sink (SURVEY §3.1 step 6), a 4x cost we don't copy."""
    docs = load_table(spark, sf_dir, "documents")
    _, vecs = fit_document_vectors(docs)
    # Cached: the LSH fit and every subsequent ANN query reuse the vectors
    # without re-running tokenize/TF-IDF (Spark evicts LRU if memory needs it).
    vecs = vecs.cache()
    lsh = fit_lsh(vecs)
    return recommend(lsh, vecs, "doc_id", FLAGSHIP_QUERY_DOC, top_k=TOP_K)
