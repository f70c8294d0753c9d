"""Semantic tests for near-dup / similarity operators (beyond the oracle
gate): LSH recall on planted twins, simhash locality, knn ordering."""

from __future__ import annotations

from pyspark.sql import functions as F

from movie_recommendation_etl_spark.plans.dedup_similarity import (
    _with_twins,
    q51_simhash_hamming,
    q60_knn_bruteforce,
)
from movie_recommendation_etl_spark.operators.neardup import (
    minhash_neardup_pairs,
)
from movie_recommendation_etl_spark.sources.catalog import load_table


def test_minhash_lsh_recovers_planted_twins(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    pairs = minhash_neardup_pairs(_with_twins(docs)).collect()
    twin_pairs = {
        (r["doc_a"], r["doc_b"]) for r in pairs if r["doc_b"] == r["doc_a"] + 1000000
    }
    # 4 bands x 3 rows at jaccard ~0.95 -> detection probability ~0.999.
    assert len(twin_pairs) >= 0.9 * n_docs
    assert all(r["jaccard"] >= 0.8 for r in pairs)


def test_simhash_twins_are_close(spark, sf_dir):
    rows = q51_simhash_hamming(spark, sf_dir).collect()
    assert rows
    close = sum(1 for r in rows if r["hamming"] <= 4)
    assert close >= 0.9 * len(rows)
    assert all(0 <= r["simhash_orig"] < 2**16 for r in rows)


def test_knn_bruteforce_shape(spark, sf_dir):
    rows = q60_knn_bruteforce(spark, sf_dir).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, nbrs in by_q.items():
        nbrs.sort(key=lambda r: r["rnk"])
        assert [r["rnk"] for r in nbrs] == list(range(1, len(nbrs) + 1))
        assert len(nbrs) <= 5
        assert all(r["neighbor_id"] != qid for r in nbrs)
        sims = [r["cosine_sim"] for r in nbrs]
        assert sims == sorted(sims, reverse=True)
