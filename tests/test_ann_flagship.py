"""Flagship ANN tests (SURVEY.md §5.3-5.4): LSH recall against brute-force
cosine oracles, recommend() contract, model persistence round-trip."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from movie_recommendation_etl_spark.ml.ann import fit_lsh
from movie_recommendation_etl_spark.ml.tfidf import fit_document_vectors
from movie_recommendation_etl_spark.plans.registry import QUERIES
from movie_recommendation_etl_spark.sources.catalog import load_table
from movie_recommendation_etl_spark.sources.writers import (
    load_lsh_model,
    save_model,
)
import movie_recommendation_etl_spark.plans.all  # noqa: F401


def test_recommend_contract(spark, sf_dir):
    from movie_recommendation_etl_spark.plans.recommend import (
        flagship_neighbors,
    )

    rows = flagship_neighbors(spark, sf_dir).collect()
    assert len(rows) == 5
    assert [r["rank"] for r in rows] == [1, 2, 3, 4, 5]
    assert all(r["doc_id"] != 42 for r in rows)
    dists = [r["dist"] for r in rows]
    assert dists == sorted(dists)


def test_recommend_uses_prepared_index(spark, sf_dir):
    """q70 must query a prepare_index()'d corpus: the dataset passed to
    approxNearestNeighbors already carries the LSH `hashes` column (cached),
    so MLlib skips its per-query whole-corpus re-transform (~60 s/query at
    the reference's 604k docs). Asserts the structural property only (hashes
    column present + cached) — wall-clock bounds are machine-dependent and
    flake on contended hosts (r3 ADVICE)."""
    from movie_recommendation_etl_spark.ml.ann import (
        fit_lsh, prepare_index, recommend,
    )
    from movie_recommendation_etl_spark.ml.tfidf import fit_document_vectors
    from movie_recommendation_etl_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    _, vecs = fit_document_vectors(docs)
    vecs = vecs.cache()
    index = None
    try:
        lsh = fit_lsh(vecs)
        index = prepare_index(lsh, vecs)
        # the prepared index is what MLlib checks for: hashes column present
        assert "hashes" in index.columns
        assert index.storageLevel.useMemory  # cached, not recomputed per query
        first = recommend(lsh, index, "doc_id", 42, top_k=5).collect()
        second = recommend(lsh, index, "doc_id", 7, top_k=5).collect()
        assert len(first) == 5 and len(second) == 5
    finally:
        vecs.unpersist()
        if index is not None:
            index.unpersist()


def test_flagship_matches_exact_cosine(spark, sf_dir):
    """The LSH top-5 must substantially agree with exact cosine over the
    TF-IDF vectors (the reference's only 'tests' were retrieval spot checks,
    execute.ipynb cells 74-86 — this is the principled version)."""
    docs = load_table(spark, sf_dir, "documents")
    _, vecs = fit_document_vectors(docs)
    rows = vecs.select("doc_id", "norm_features").collect()
    ids = np.array([r["doc_id"] for r in rows])
    m = np.array([r["norm_features"].toArray() for r in rows])
    qi = int(np.where(ids == 42)[0][0])
    sims = m @ m[qi]
    exact5 = [int(ids[j]) for j in np.argsort(-sims) if ids[j] != 42][:5]
    from movie_recommendation_etl_spark.plans.recommend import (
        flagship_neighbors,
    )

    lsh5 = [r["doc_id"] for r in flagship_neighbors(spark, sf_dir).collect()]
    assert len(set(exact5) & set(lsh5)) >= 3


def test_en_stopwords_inline_matches_mllib(spark):
    """The inlined stop list (ml/en_stopwords.py) must be bit-identical to
    what the live JVM's StopWordsRemover actually applies — the q70 oracle
    embeds the inline copy, so drift here would silently desynchronize the
    vocab_size cross-check."""
    from pyspark.ml.feature import StopWordsRemover

    from movie_recommendation_etl_spark.ml.en_stopwords import EN_STOPWORDS

    assert list(EN_STOPWORDS) == StopWordsRemover.loadDefaultStopWords(
        "english"
    )


def test_flagship_exact_topk_matches_numpy(spark, sf_dir):
    """flagship_exact_topk's relational ln-idf space must equal the MLlib
    vector space: its top-5 set and ordering match numpy exact cosine over
    the ACTUAL fitted pipeline's vectors. This is the lemma that makes
    q70's recall_ok flag meaningful (the exact side shares no code with
    MLlib)."""
    from movie_recommendation_etl_spark.plans.recommend import (
        flagship_exact_topk,
    )

    docs = load_table(spark, sf_dir, "documents")
    _, vecs = fit_document_vectors(docs)
    rows = vecs.select("doc_id", "norm_features").collect()
    ids = np.array([r["doc_id"] for r in rows])
    m = np.array([r["norm_features"].toArray() for r in rows])
    qi = int(np.where(ids == 42)[0][0])
    sims = m @ m[qi]
    exact5 = [int(ids[j]) for j in np.argsort(-sims) if ids[j] != 42][:5]
    rel = [
        r["neighbor_id"]
        for r in sorted(
            flagship_exact_topk(spark, sf_dir).collect(),
            key=lambda r: r["rnk"],
        )
    ]
    assert rel == exact5


def test_q70_contract_query(spark, sf_dir):
    """The q70 contract gate (r11): one row, every structural flag and the
    recall flag TRUE, and the exact columns tied to the real corpus/model —
    n_docs equals the documents row count and vocab_size equals the fitted
    CountVectorizer's vocabulary (recomputed independently by the DuckDB
    oracle in the driver gate)."""
    rows = QUERIES["q70_recommend_similar_docs"](spark, sf_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["query_id"] == 42
    assert r["n_docs"] == load_table(spark, sf_dir, "documents").count()
    assert 0 < r["vocab_size"] <= 262144
    assert r["n_returned"] == 5
    assert r["self_excluded"] == 1
    assert r["neighbors_distinct"] == 1
    assert r["dist_ordered"] == 1
    assert r["recall_ok"] == 1


def test_batch_ann_recall_vs_bruteforce(spark, sf_dir):
    from movie_recommendation_etl_spark.plans.recommend import (
        lsh_knn_neighbors,
    )

    exact: dict[int, set] = {}
    for r in QUERIES["q60_knn_bruteforce"](spark, sf_dir).collect():
        exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    approx: dict[int, set] = {}
    for r in lsh_knn_neighbors(spark, sf_dir).collect():
        approx.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recalls = [
        len(exact[q] & approx.get(q, set())) / len(exact[q]) for q in exact
    ]
    assert sum(recalls) / len(recalls) >= 0.8


def test_ann_recall_at_driver_scale(spark):
    """Recall gate at sf0.01 — the driver's correctness scale (r3 VERDICT
    #5), measured on the neighbor-level ANN frames the q61/q62 contract
    gates wrap (r11: those registry slots now hash-assert the SAME floors
    cross-engine; this test keeps the exact measured values visible and
    guards the helpers directly). LSH batch ANN must hit recall@5 >= 0.8
    against the exact brute-force answer; IVF probes 6 of its 8 cells
    (r11 — on near-uniform synthetic embeddings recall tracks the probed
    fraction; see ivf_knn_neighbors' docstring) and must clear 0.5, the
    floor that proves cell selection works at any probe setting."""
    from movie_recommendation_etl_spark.plans.recommend import (
        ivf_knn_neighbors,
        lsh_knn_neighbors,
    )

    sf = "/root/testdata/sf0.01"
    exact: dict[int, set] = {}
    for r in QUERIES["q60_knn_bruteforce"](spark, sf).collect():
        exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    assert len(exact) == 20

    def recall(fn) -> float:
        approx: dict[int, set] = {}
        for r in fn(spark, sf).collect():
            approx.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return sum(
            len(exact[q] & approx.get(q, set())) / len(exact[q])
            for q in exact
        ) / len(exact)

    assert recall(lsh_knn_neighbors) >= 0.8
    assert recall(ivf_knn_neighbors) >= 0.5


def test_ann_contract_queries(spark, sf_dir):
    """The q61/q62 contract gates (r11): 20 rows each (one per exact-side
    query), every query filled to exactly top_k, the suite recall flag
    TRUE, and exact_top1_sim bit-identical to q60's rank-1 cosine — the
    column the DuckDB oracle recomputes independently."""
    top1 = {
        r["query_id"]: r["cosine_sim"]
        for r in QUERIES["q60_knn_bruteforce"](spark, sf_dir).collect()
        if r["rnk"] == 1
    }
    for qname in ("q61_knn_lsh_embeddings", "q62_knn_ivf_embeddings"):
        rows = QUERIES[qname](spark, sf_dir).collect()
        assert len(rows) == 20, qname
        assert all(r["n_returned"] == 5 for r in rows), qname
        assert all(r["suite_recall_ok"] == 1 for r in rows), qname
        assert {r["query_id"]: r["exact_top1_sim"] for r in rows} == top1


def test_lsh_model_roundtrip(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    _, vecs = fit_document_vectors(docs)
    vecs = vecs.cache()
    model = fit_lsh(vecs)
    path = str(tmp_path / "lsh_model")
    save_model(model, path)
    back = load_lsh_model(path)
    q = vecs.filter(F.col("doc_id") == 42).first()["norm_features"]
    a = [r["doc_id"] for r in model.approxNearestNeighbors(vecs, q, 6).collect()]
    b = [r["doc_id"] for r in back.approxNearestNeighbors(vecs, q, 6).collect()]
    assert a == b


def test_ann_index_roundtrip(spark, sf_dir, tmp_path):
    """Cold-start serving path: save_ann_index + load_ann_index must
    reconstruct the warm index — hashes column intact (so MLlib skips the
    per-query corpus re-transform), cached, and recommend() over the loaded
    index + loaded model returns exactly the fresh answer."""
    from movie_recommendation_etl_spark.ml.ann import (
        prepare_index,
        recommend,
    )
    from movie_recommendation_etl_spark.sources.writers import (
        load_ann_index,
        save_ann_index,
    )

    docs = load_table(spark, sf_dir, "documents")
    _, vecs = fit_document_vectors(docs)
    vecs = vecs.cache()
    model = fit_lsh(vecs)
    index = prepare_index(model, vecs)
    fresh = recommend(model, index, "doc_id", 42, top_k=5).collect()

    mpath, ipath = str(tmp_path / "lsh_model"), str(tmp_path / "ann_index")
    save_model(model, mpath)
    save_ann_index(index, ipath)
    model2, index2 = load_lsh_model(mpath), load_ann_index(spark, ipath)
    try:
        assert "hashes" in index2.columns
        assert index2.storageLevel.useMemory
        served = recommend(model2, index2, "doc_id", 42, top_k=5).collect()
        assert [tuple(r) for r in served] == [tuple(r) for r in fresh]
    finally:
        index2.unpersist()
        vecs.unpersist()
        index.unpersist()


def test_ann_index_incremental_append(spark, sf_dir, tmp_path):
    """Incremental ingest: vectorize ONLY a new batch through the frozen
    pipeline + LSH models and append to the persisted index. The merged
    index must equal transforming the full corpus with the same frozen
    models — O(batch) admission with byte-stable existing vectors."""
    from movie_recommendation_etl_spark.ml.ann import (
        prepare_index,
        recommend,
    )
    from movie_recommendation_etl_spark.ml.tfidf import (
        transform_document_vectors,
    )
    from movie_recommendation_etl_spark.sources.writers import (
        append_ann_index,
        load_ann_index,
        save_ann_index,
    )

    docs = load_table(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") < 400)
    new = docs.filter(F.col("doc_id") >= 400)
    model, vecs_old = fit_document_vectors(old)
    vecs_old = vecs_old.cache()
    lsh = fit_lsh(vecs_old)
    index = prepare_index(lsh, vecs_old)
    ipath = str(tmp_path / "ann_index")
    save_ann_index(index, ipath)
    append_ann_index(lsh, transform_document_vectors(model, new), ipath)
    loaded = load_ann_index(spark, ipath)
    try:
        assert loaded.count() == docs.count()
        full = lsh.transform(transform_document_vectors(model, docs))
        a = recommend(lsh, loaded, "doc_id", 42, top_k=5).collect()
        b = recommend(lsh, full, "doc_id", 42, top_k=5).collect()
        assert [tuple(r) for r in a] == [tuple(r) for r in b]
        assert len(a) == 5
    finally:
        loaded.unpersist()
        vecs_old.unpersist()
        index.unpersist()


def test_batch_ann_fills_underreturned_queries(spark, sf_dir):
    """A radius far too small for any neighborhood must still yield exactly
    top_k neighbors per query: the widening rounds find nothing new (LSH
    only sees bucket collisions), so the exact brute-force fallback fills
    the residual — and being exact, it must agree with q60's answer sets."""
    from movie_recommendation_etl_spark.ml.ann import (
        batch_ann,
        embeddings_as_vectors,
        fit_lsh,
    )

    emb = embeddings_as_vectors(spark, sf_dir)
    model = fit_lsh(emb, "norm_vec", bucket_length=0.5)
    queries = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), "norm_vec"
    )
    dataset = emb.select("vec_id", "norm_vec")
    got = batch_ann(
        model, queries, dataset, "vec_id", "query_id", top_k=5, radius=0.01
    ).collect()
    by_q: dict[int, set] = {}
    for r in got:
        by_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    assert len(by_q) == 20
    assert all(len(v) == 5 for v in by_q.values())
    exact: dict[int, set] = {}
    for r in QUERIES["q60_knn_bruteforce"](spark, sf_dir).collect():
        exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    assert by_q == exact
