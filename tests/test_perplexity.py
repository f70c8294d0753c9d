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
