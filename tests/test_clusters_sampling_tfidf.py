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


def test_weighted_sample_tilts_toward_heavy_docs(spark, sf_dir):
    """The q58 ``weighted`` arm (Efraimidis-Spirakis priorities): exactly
    min(n, target) rows per stratum, rerun-stable, and the selection
    genuinely tilts by weight — on a constructed stratum where 25 docs
    carry ~all the mass, every heavy doc wins a slot; and a near-zero
    weight sends a doc's priority toward 0 (u^(1/w) -> u^inf), so the
    light tail is essentially never drawn over a heavy competitor."""
    from movie_recommendation_etl_spark.plans.curation import (
        STRATUM_TARGET,
        q58_sampling_suite,
    )

    out = [
        (r["lang"], r["doc_id"])
        for r in q58_sampling_suite(spark, sf_dir)
        .filter("method = 'weighted'")
        .collect()
    ]
    assert out and out == [
        (r["lang"], r["doc_id"])
        for r in q58_sampling_suite(spark, sf_dir)
        .filter("method = 'weighted'")
        .collect()
    ]  # deterministic across runs
    from movie_recommendation_etl_spark.sources.catalog import load_table

    per_lang: dict[str, int] = {}
    for lang, _ in out:
        per_lang[lang] = per_lang.get(lang, 0) + 1
    docs = load_table(spark, sf_dir, "documents")
    n_by_lang = {
        r["lang"]: r["count"]
        for r in docs.groupBy("lang").count().collect()
    }
    assert per_lang == {
        lang: min(n, STRATUM_TARGET) for lang, n in n_by_lang.items()
    }

    # constructed tilt: one synthetic stratum, 25 heavy docs (w=10^7)
    # among 500 light ones (w=1) -> u^(1/w) ~ 1 for heavy, = u for light;
    # a light doc outranking a heavy one needs u_light > u_heavy^(1e7),
    # i.e. u_heavy astronomically close to 1 AND u_light above it
    import tempfile

    from pyspark.sql import functions as SF

    with tempfile.TemporaryDirectory() as td:
        spark.range(0, 525).select(
            SF.col("id").alias("doc_id"),
            SF.lit("synthetic, non-empty").alias("text"),
            SF.lit("zz").alias("lang"),
            SF.lit("tilt").alias("source"),
            SF.when(SF.col("id") % 21 == 0, SF.lit(10_000_000))
            .otherwise(SF.lit(1))
            .cast("long")
            .alias("n_chars"),
        ).write.parquet(f"{td}/documents.parquet")
        heavy = {
            r["doc_id"]
            for r in spark.read.parquet(f"{td}/documents.parquet")
            .filter("n_chars > 1")
            .collect()
        }
        assert len(heavy) == 25
        got = {
            r["doc_id"]
            for r in q58_sampling_suite(spark, td)
            .filter("method = 'weighted'")
            .collect()
        }
        assert got == heavy  # all 25 slots go to the heavy docs


def test_weighted_sample_matches_python_reference_fuzzed(spark, tmp_path):
    """The weighted arm replayed in pure Python: same md5 uniforms, same
    u^(1/w) priorities, same (priority desc, doc_id) order — the Spark
    selection must equal the reference top-k per stratum on fuzzed
    weights. Guards the exact keying scheme (salt, hex8 parse, weight
    floor), not just the tilt direction. Seeded data; the rank-boundary
    priority gap is checked to be far above cross-libm pow error
    (~1 ulp), so the comparison can never flake on rounding."""
    import hashlib
    import random
    import tempfile

    from pyspark.sql import functions as SF

    from movie_recommendation_etl_spark.plans.curation import (
        STRATUM_TARGET,
        q58_sampling_suite,
    )

    rng = random.Random(1337)
    rows = [
        (i, rng.choice(["aa", "bb"]), rng.randint(1, 2000))
        for i in range(600)
    ]

    def unif(doc_id: int) -> float:
        h = hashlib.md5(f"ws:{doc_id}".encode()).hexdigest()[:8]
        return int(h, 16) / 4294967296.0

    expected: dict[str, list[int]] = {}
    for lang in ("aa", "bb"):
        scored = sorted(
            (
                (-(unif(i) ** (1.0 / max(w, 1))), i)
                for i, lg, w in rows
                if lg == lang
            ),
        )
        # rank-boundary gap: priorities at the cut must not be within
        # libm noise of each other (they aren't for this seed — pinned)
        cut = STRATUM_TARGET
        assert abs(scored[cut - 1][0] - scored[cut][0]) > 1e-9
        expected[lang] = sorted(i for _, i in scored[:cut])

    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(
            [(i, "x", lg, "src", w) for i, lg, w in rows],
            "doc_id long, text string, lang string, source string,"
            " n_chars long",
        ).write.parquet(f"{td}/documents.parquet")
        got: dict[str, list[int]] = {"aa": [], "bb": []}
        for r in (
            q58_sampling_suite(spark, td)
            .filter("method = 'weighted'")
            .collect()
        ):
            got[r["lang"]].append(r["doc_id"])
    assert {k: sorted(v) for k, v in got.items()} == expected


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
