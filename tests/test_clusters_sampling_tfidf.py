"""Semantic tests for cluster resolution, deterministic sampling, and the
relational tf-idf cosine twin (oracle equality is covered by the gate; these
assert the algorithmic properties the gate can't see)."""

from __future__ import annotations

from movie_recommendation_etl_spark.operators.graph import connected_components
from movie_recommendation_etl_spark.plans.curation import q58_sampling_suite
from movie_recommendation_etl_spark.plans.dedup_similarity import (
    q54_neardup_clusters,
)
from movie_recommendation_etl_spark.plans.recommend import q71_tfidf_cosine_topk


def test_connected_components_transitive(spark):
    # Chain 1-2-3 plus isolated pair 10-11: transitivity must merge the
    # chain into one cluster labeled by its min node.
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "src long, dst long"
    )
    got = {
        (r["node"], r["cluster_id"])
        for r in connected_components(edges).collect()
    }
    assert got == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)}


def test_neardup_clusters_consistent_with_pairs(spark, sf_dir):
    from movie_recommendation_etl_spark.operators.neardup import (
        minhash_neardup_pairs,
    )
    from movie_recommendation_etl_spark.plans.dedup_similarity import _with_twins
    from movie_recommendation_etl_spark.sources.catalog import load_table

    rows = q54_neardup_clusters(spark, sf_dir).collect()
    assert rows
    label = {r["doc_id"]: r["cluster_id"] for r in rows}
    by_cluster: dict[int, list[int]] = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], []).append(r["doc_id"])
    for cid, members in by_cluster.items():
        assert cid == min(members)  # cluster id is the component min
        # every member's planted twin that got paired is in the SAME cluster
        assert len(members) >= 2
    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_neardup_pairs(_with_twins(docs)).collect()
    # the defining property: both endpoints of every verified pair share a
    # cluster label (transitively merged — two originals that are near-dups
    # of each other legitimately fuse their twin pairs into one cluster)
    for p in pairs:
        assert label[p["doc_a"]] == label[p["doc_b"]]


def test_hash_mod_sample_deterministic(spark, sf_dir):
    def hash_mod_ids():
        return sorted(
            r["doc_id"]
            for r in q58_sampling_suite(spark, sf_dir)
            .filter("method = 'hash_mod'")
            .collect()
        )

    a = hash_mod_ids()
    b = hash_mod_ids()
    assert a == b  # same sample on every run — the point of hash-mod
    assert a  # 2/16 of 500 docs ≈ 62: non-empty with huge margin


def test_embedding_outliers_shape(spark, sf_dir):
    from movie_recommendation_etl_spark.plans.dedup_similarity import (
        q63_embedding_outliers,
    )

    rows = q63_embedding_outliers(spark, sf_dir).collect()
    assert rows
    by_label: dict[int, list] = {}
    for r in rows:
        assert r["dist"] >= 0.0
        by_label.setdefault(r["label"], []).append(r)
    assert len(by_label) == 10  # every label produces outlier candidates
    for members in by_label.values():
        members.sort(key=lambda r: r["rnk"])
        assert [r["rnk"] for r in members] == list(range(1, len(members) + 1))
        dists = [r["dist"] for r in members]
        assert dists == sorted(dists, reverse=True)


def test_tfidf_cosine_topk_shape(spark, sf_dir):
    rows = q71_tfidf_cosine_topk(spark, sf_dir).collect()
    assert rows
    by_q: dict[int, list] = {}
    for r in rows:
        assert r["neighbor_id"] != r["query_id"]
        assert 0.0 <= r["cosine_sim"] <= 1.0 + 1e-12
        by_q.setdefault(r["query_id"], []).append(r)
    for nbrs in by_q.values():
        nbrs.sort(key=lambda r: r["rnk"])
        assert [r["rnk"] for r in nbrs] == list(range(1, len(nbrs) + 1))
        sims = [r["cosine_sim"] for r in nbrs]
        assert sims == sorted(sims, reverse=True)
