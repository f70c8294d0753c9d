"""Flagship ANN queries: the reference's recommend path over documents
(TF-IDF → LSH → approxNearestNeighbors, transform/execute.py:175-270 +
execute.ipynb:1645-1670) and the batch LSH ANN over embeddings.

Registered WITHOUT oracles: LSH candidate generation through MLlib's seeded
random projections is deterministic for a fixed seed but not expressible in
ANSI SQL, so the driver applies the rows-only check; exactness is covered by
pytest recall tests against the brute-force oracle (q60 / numpy)."""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from movie_recommendation_etl_spark.ml.ann import (
    batch_ann,
    embeddings_as_vectors,
    fit_lsh,
    prepare_index,
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
    Recall vs q60 is asserted in tests/test_ivf_skew.py and recorded at
    bench scale in BENCH_r{N}.json (recall_at5, r11).

    n_probe=6 of 8 cells (r11; was 4): the synthetic embeddings table is
    near-uniform in the unit ball, so cells barely separate neighbors and
    recall scales with the PROBED FRACTION almost linearly (measured at
    sf0.1: 4/8 -> 0.77-0.82, 6/8 -> 0.94; finer cells make it worse —
    8/64 -> 0.60). On real clustered corpora the same operator earns its
    keep at n_probe << n_centroids; this query pins the honest setting
    for THIS data rather than advertising a probe ratio the data cannot
    support."""
    from movie_recommendation_etl_spark.ml.ivf import fit_ivf_centroids, ivf_knn

    emb = load_table(spark, sf_dir, "embeddings")
    model = fit_ivf_centroids(emb, id_col="vec_id", n_centroids=8)
    queries = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return ivf_knn(model, emb, queries, top_k=TOP_K, n_probe=6).select(
        "query_id", "neighbor_id", "rnk", "cosine_sim"
    )


# Shared stoplist for the RELATIONAL tf-idf twin (q71). Deliberately small
# and static so the DuckDB oracle can embed the identical list.
_STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "on", "for",
    "with", "as", "at", "by", "it", "its", "this", "that", "be", "are",
    "was", "were", "from",
)
_SQL_STOPLIST = ", ".join(f"'{s}'" for s in _STOPWORDS)


@query(
    "q71_tfidf_cosine_topk",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id,
               unnest(list_filter(regexp_split_to_array(lower(text), '\\W+'),
                                  x -> x <> '')) AS term
        FROM documents
    ),
    filt AS (SELECT * FROM toks WHERE term NOT IN ({_SQL_STOPLIST})),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM filt GROUP BY 1, 2),
    dfreq AS (
        SELECT term, COUNT(*) AS df FROM tf GROUP BY 1 HAVING COUNT(*) >= 3
    ),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    w AS (
        SELECT tf.doc_id, tf.term,
               CAST(tf.tf AS DOUBLE)
                   * ((n.n_docs + 1.0) / (dfreq.df + 1.0)) AS w
        FROM tf JOIN dfreq USING (term) CROSS JOIN n
    ),
    nrm AS (
        SELECT doc_id,
               sqrt(list_aggregate(list_sort(list(w * w)), 'sum')) AS nrm
        FROM w GROUP BY doc_id
    ),
    dots AS (
        SELECT q.doc_id AS query_id, d.doc_id AS neighbor_id,
               list_aggregate(list_sort(list(q.w * d.w)), 'sum') AS dotp
        FROM w q JOIN w d USING (term)
        WHERE q.doc_id < 5 AND d.doc_id <> q.doc_id
        GROUP BY 1, 2
    ),
    cosd AS (
        SELECT query_id, neighbor_id,
               dotp / (x.nrm * y.nrm) AS cosine_sim
        FROM dots
        JOIN nrm x ON x.doc_id = query_id
        JOIN nrm y ON y.doc_id = neighbor_id
    ),
    r AS (
        SELECT query_id, neighbor_id, cosine_sim,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cosine_sim DESC, neighbor_id)
                   AS rnk
        FROM cosd
    )
    SELECT query_id, neighbor_id, CAST(rnk AS INTEGER) AS rnk, cosine_sim
    FROM r WHERE rnk <= 5
    """,
)
def q71_tfidf_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship's SEMANTICS under the exact-match gate: tf-idf weighting
    + cosine top-5, expressed relationally (explode → tf → document
    frequency → weight → sparse dot via term equi-join) so DuckDB can replay
    it bit-for-bit — the oracle-checked complement to the MLlib q70 path,
    which the gate can only row-count.

    Cross-engine determinism choices (every one verified to hash-match):
    - idf is the SMOOTHED RATIO (n+1)/(df+1), not ln of it — IEEE division
      is correctly rounded in both engines, while ln diverges in the last
      ulp on ~6% of this domain (measured).
    - dot products and squared norms fold value-sorted lists sequentially
      (array_sort + double fold == DuckDB list_sort + list_aggregate),
      making the sums order-independent without decimal casts.
    - sqrt and the final division are correctly rounded per IEEE-754.

    Scale shape: tf/df are map-side-combined aggs; the sparse dot joins on
    term with the 5-query side broadcast, so the big side never shuffles;
    per-pair lists are bounded by per-doc vocabulary, not corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.lower(F.col("text")), r"\W+"), lambda x: x != F.lit("")
    )
    terms = docs.select("doc_id", F.explode(toks).alias("term")).filter(
        ~F.col("term").isin(*_STOPWORDS)
    )
    tf = terms.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df")).filter(
        F.col("df") >= 3
    )
    n = docs.agg(F.count("*").alias("n_docs"))
    w = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            (
                F.col("tf").cast("double")
                * ((F.col("n_docs") + F.lit(1.0)) / (F.col("df") + F.lit(1.0)))
            ).alias("w"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    fold_sum = lambda arr: F.aggregate(arr, F.lit(0.0), lambda a, x: a + x)  # noqa: E731
    nrm = (
        w.groupBy("doc_id")
        .agg(F.array_sort(F.collect_list(F.col("w") * F.col("w"))).alias("sq"))
        .select("doc_id", F.sqrt(fold_sum(F.col("sq"))).alias("nrm"))
    )
    qw = w.filter(F.col("doc_id") < 5).select(
        F.col("doc_id").alias("query_id"), "term", F.col("w").alias("wq")
    )
    dots = (
        F.broadcast(qw)
        .join(
            w.select(
                F.col("doc_id").alias("neighbor_id"),
                "term",
                F.col("w").alias("wd"),
            ),
            "term",
        )
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.array_sort(F.collect_list(F.col("wq") * F.col("wd"))).alias("ps"))
        .select("query_id", "neighbor_id", fold_sum(F.col("ps")).alias("dotp"))
    )
    nq = nrm.select(F.col("doc_id").alias("query_id"), F.col("nrm").alias("nrm_q"))
    nd = nrm.select(
        F.col("doc_id").alias("neighbor_id"), F.col("nrm").alias("nrm_d")
    )
    cosd = (
        dots.join(F.broadcast(nq), "query_id")
        .join(nd, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            (F.col("dotp") / (F.col("nrm_q") * F.col("nrm_d"))).alias(
                "cosine_sim"
            ),
        )
    )
    wnd = W.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        cosd.withColumn("rnk", F.row_number().over(wnd))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "neighbor_id", "rnk", "cosine_sim")
    )


@query("q70_recommend_similar_docs")
def q70_recommend_similar_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE flagship: reference get_recommendations re-expressed Spark-first.

    documents → RegexTokenizer → StopWordsRemover → CountVectorizer(minDF=3)
    → IDF(minDocFreq=3) → Normalizer(p=2) → seeded BRP-LSH(1.95, 14 tables)
    → approxNearestNeighbors(k+1) → drop self → ordered top-5.

    The transformed corpus is cached between the LSH fit and the query —
    the reference's .py pipeline skipped this and recomputed its lineage
    once per sink (SURVEY §3.1 step 6), a 4x cost we don't copy. The LSH
    hash column is ALSO precomputed via prepare_index: without it,
    approxNearestNeighbors re-transforms the whole corpus on every query
    (~60 s/query at 604k docs, measured) — this is the warm path bench.py
    measures and the shape any caller should copy."""
    docs = load_table(spark, sf_dir, "documents")
    _, vecs = fit_document_vectors(docs)
    # Cached: the LSH fit and every subsequent ANN query reuse the vectors
    # without re-running tokenize/TF-IDF (Spark evicts LRU if memory needs it).
    vecs = vecs.cache()
    lsh = fit_lsh(vecs)
    index = prepare_index(lsh, vecs)
    return recommend(lsh, index, "doc_id", FLAGSHIP_QUERY_DOC, top_k=TOP_K)
