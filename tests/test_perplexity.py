"""Unigram perplexity scoring/filtering (operators/perplexity.py):
hand-computable model values, separation of in-domain vs gibberish text,
band filtering, and a Python-free scoring plan."""

from __future__ import annotations

import math

import pytest

from movie_recommendation_etl_spark.operators.perplexity import (
    fit_unigram_model,
    perplexity_filter,
    score_perplexity,
)


def test_unigram_model_exact_values(spark):
    corpus = spark.createDataFrame(
        [(1, "a a a b")], "doc_id long, text string"
    )
    model, oov = fit_unigram_model(corpus)
    got = {r["token"]: r["log2p"] for r in model.collect()}
    # n=4 tokens, v=2 vocab, denom = 4+2+1 = 7; add-one counts: a->4, b->2
    assert got["a"] == pytest.approx(math.log2(4 / 7))
    assert got["b"] == pytest.approx(math.log2(2 / 7))
    assert oov == pytest.approx(math.log2(1 / 7))


def test_scoring_separates_gibberish(spark):
    trusted = spark.createDataFrame(
        [
            (i, "the cat sat on the mat and the dog slept by the door")
            for i in range(20)
        ],
        "doc_id long, text string",
    )
    targets = spark.createDataFrame(
        [
            (1, "the cat slept by the mat"),          # in-domain
            (2, "qz wv xj kp zz vv jj kk pp ww"),     # all OOV
            (3, "the dog sat on the door"),           # in-domain
        ],
        "doc_id long, text string",
    )
    model, oov = fit_unigram_model(trusted)
    rows = {
        r["doc_id"]: r for r in score_perplexity(targets, model, oov).collect()
    }
    assert rows[2]["n_oov"] == rows[2]["n_tokens"]
    assert rows[1]["n_oov"] == 0 and rows[3]["n_oov"] == 0
    assert rows[1]["perplexity"] < rows[2]["perplexity"]
    assert rows[3]["perplexity"] < rows[2]["perplexity"]
    # cross-entropy/perplexity invariants
    for r in rows.values():
        assert r["perplexity"] == pytest.approx(2 ** r["cross_entropy"])


def test_perplexity_filter_keeps_lowest_band(spark):
    trusted = spark.createDataFrame(
        [(i, "alpha beta gamma delta " * 5) for i in range(10)],
        "doc_id long, text string",
    )
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta") for i in range(8)]
        + [(100 + i, "xq zv wj kp") for i in range(2)],
        "doc_id long, text string",
    )
    kept = {
        r["doc_id"]
        for r in perplexity_filter(
            docs, trusted, keep_fraction=0.8
        ).collect()
    }
    assert kept == set(range(8))  # the two gibberish docs fall outside
    with pytest.raises(ValueError):
        perplexity_filter(docs, trusted, keep_fraction=None)
    with pytest.raises(ValueError):
        perplexity_filter(
            docs, trusted, max_perplexity=5.0, keep_fraction=0.5
        )


def test_scoring_plan_is_jvm_only(spark):
    trusted = spark.createDataFrame(
        [(1, "a b c d e")], "doc_id long, text string"
    )
    model, oov = fit_unigram_model(trusted)
    plan = (
        score_perplexity(trusted, model, oov)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan
    assert "BroadcastHashJoin" in plan


def test_shuffled_model_join_matches_broadcast(spark):
    """The degrade-to-shuffle path (broadcast_model=False, for vocabularies
    too large to broadcast) must produce bit-identical scores — same join,
    different physical strategy."""
    trusted = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon " * 4) for i in range(6)],
        "doc_id long, text string",
    )
    targets = spark.createDataFrame(
        [
            (1, "alpha beta gamma"),
            (2, "zz qq ww"),
            (3, "alpha zz delta epsilon beta"),
        ],
        "doc_id long, text string",
    )
    model, oov = fit_unigram_model(trusted)
    a = {
        r["doc_id"]: (r["n_tokens"], r["n_oov"], r["cross_entropy"])
        for r in score_perplexity(
            targets, model, oov, broadcast_model=True
        ).collect()
    }
    b = {
        r["doc_id"]: (r["n_tokens"], r["n_oov"], r["cross_entropy"])
        for r in score_perplexity(
            targets, model, oov, broadcast_model=False
        ).collect()
    }
    assert a == b  # exact, including the decimal-accumulated doubles


def test_perplexity_filter_max_threshold_path(spark):
    """The absolute-threshold arm (max_perplexity) keeps exactly the docs
    under the cut and passes through the input schema."""
    trusted = spark.createDataFrame(
        [(i, "alpha beta gamma delta " * 5) for i in range(10)],
        "doc_id long, text string",
    )
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta") for i in range(4)]
        + [(100, "xq zv wj kp")],
        "doc_id long, text string",
    )
    model, oov = fit_unigram_model(trusted)
    scored = {
        r["doc_id"]: r["perplexity"]
        for r in score_perplexity(docs, model, oov).collect()
    }
    cut = (max(p for i, p in scored.items() if i != 100) +
           scored[100]) / 2.0
    kept = perplexity_filter(docs, trusted, max_perplexity=cut,
                             keep_fraction=None)
    assert {r["doc_id"] for r in kept.collect()} == set(range(4))
    assert set(kept.columns) == {"doc_id", "text", "perplexity"}


def test_cross_entropy_partition_independent(spark):
    """Determinism policy: a repartition must never change a score (the
    decimal-accumulated sum is order-independent by construction)."""
    trusted = spark.createDataFrame(
        [(i, " ".join(f"w{j % 37}" for j in range(i, i + 60)))
         for i in range(20)],
        "doc_id long, text string",
    )
    docs = spark.createDataFrame(
        [(i, " ".join(f"w{(i * 7 + j) % 41}" for j in range(50)))
         for i in range(15)],
        "doc_id long, text string",
    )
    model, oov = fit_unigram_model(trusted)
    base = {
        r["doc_id"]: r["cross_entropy"]
        for r in score_perplexity(docs, model, oov).collect()
    }
    for parts in (1, 7):
        again = {
            r["doc_id"]: r["cross_entropy"]
            for r in score_perplexity(
                docs.repartition(parts), model.repartition(3), oov
            ).collect()
        }
        assert again == base  # bit-identical, not approx


def test_band_cache_lifecycle_and_uncached_equivalence(spark):
    """scores_out hands the caller the persisted score frame to unpersist
    (the long-lived-driver contract); storage_level=None produces the
    identical band with no cache at all."""
    from movie_recommendation_etl_spark.operators.perplexity import (
        perplexity_band,
    )

    trusted = spark.createDataFrame(
        [(i, "alpha beta gamma delta " * 5) for i in range(10)],
        "doc_id long, text string",
    )
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta") for i in range(8)]
        + [(100 + i, "xq zv wj kp") for i in range(2)],
        "doc_id long, text string",
    )
    handle: list = []
    cached = perplexity_band(
        docs, trusted, keep_fraction=0.8, scores_out=handle
    )
    kept_cached = {r["doc_id"] for r in cached.collect()}
    assert len(handle) == 1
    assert handle[0].storageLevel.useMemory  # actually persisted
    handle[0].unpersist()
    uncached = perplexity_band(
        docs, trusted, keep_fraction=0.8, storage_level=None
    )
    assert {r["doc_id"] for r in uncached.collect()} == kept_cached
    assert kept_cached == set(range(8))
