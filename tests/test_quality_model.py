"""Model-based quality filtering (operators/quality_model.py): the MLlib
fit separates planted good/bad docs, the Catalyst scoring path agrees with
MLlib's probability column, and scoring stays JVM-side."""

from __future__ import annotations

import pytest

from movie_recommendation_etl_spark.operators.quality_model import (
    fit_quality_classifier,
    score_documents,
    scoring_expr,
    with_quality_features,
)

_GOOD = (
    "the quick brown fox jumps over the lazy dog and then runs into the "
    "quiet forest where it finds a stream and drinks some water before "
    "continuing on its long journey home through the evening light"
)
_BAD_SPAM = "buy buy buy buy buy buy buy buy buy buy buy buy buy buy"
_BAD_GIBBER = "zx qv jk wp zz qq xj kv pz jx vq kz x q z j k v p w"


def _labeled(spark):
    rows = []
    for i in range(40):
        rows.append((i, f"{_GOOD} variant {i}", 1.0))
        bad = _BAD_SPAM if i % 2 == 0 else _BAD_GIBBER
        rows.append((1000 + i, f"{bad} {i}", 0.0))
    return spark.createDataFrame(
        rows, "doc_id long, text string, label double"
    )


def test_classifier_separates_planted_quality(spark):
    labeled = _labeled(spark)
    model = fit_quality_classifier(labeled)
    scored = score_documents(model, labeled).select(
        "doc_id", "label", "quality_score"
    )
    rows = scored.collect()
    good = [r["quality_score"] for r in rows if r["label"] == 1.0]
    bad = [r["quality_score"] for r in rows if r["label"] == 0.0]
    assert min(good) > 0.5
    assert max(bad) < 0.5
    # full margin: every good doc outscores every bad doc
    assert min(good) > max(bad)


def test_catalyst_scoring_matches_mllib(spark):
    labeled = _labeled(spark)
    model = fit_quality_classifier(labeled)
    prepared = with_quality_features(labeled)
    mllib = model.transform(prepared)
    from pyspark.ml.functions import vector_to_array

    both = mllib.select(
        "doc_id",
        vector_to_array("probability")[1].alias("p_mllib"),
        scoring_expr(model).alias("p_catalyst"),
    ).collect()
    for r in both:
        assert r["p_mllib"] == pytest.approx(r["p_catalyst"], abs=1e-12)


def test_catalyst_scoring_plan_is_jvm_only(spark):
    labeled = _labeled(spark)
    model = fit_quality_classifier(labeled)
    plan = (
        score_documents(model, labeled)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan
    assert "PythonUDF" not in plan
    assert "Exchange" not in plan  # pure scan-stage projection


def test_scoring_expr_rejects_foreign_model(spark):
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.linalg import Vectors

    df = spark.createDataFrame(
        [(Vectors.dense([1.0, 2.0]), 0.0), (Vectors.dense([2.0, 1.0]), 1.0)],
        ["features", "label"],
    )
    foreign = LogisticRegression(maxIter=5).fit(df)  # 2 coefficients
    with pytest.raises(ValueError):
        scoring_expr(foreign)
