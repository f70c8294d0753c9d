"""Model-based document quality filtering: the classifier stage of an LLM
training-data pipeline (the public FineWeb/RedPajama/Dolma recipes gate
documents on a lightweight linear classifier's score, complementing the
rule-based heuristics in functions/text.py).

Spark-first shape:
- FEATURES are the deterministic per-document text statistics the engine
  already computes JVM-side (stopword ratio, short-token ratio, mean token
  length, type-token ratio, length) — assembled into an MLlib vector with
  ``array_to_vector`` (no Python in the row path).
- TRAINING is MLlib LogisticRegression on a labeled (usually small,
  human-or-LLM-annotated) sample: a handful of distributed passes over the
  sample, coefficients land on the driver.
- SCORING has two paths with identical results:
  1. ``model.transform`` (MLlib, JVM) — convenient inside ML pipelines;
  2. ``scoring_expr`` — the SAME sigmoid(w·x + b) as a pure Catalyst
     column expression built from the fitted coefficients, so a curation
     scan can embed the quality gate as a pushdown-friendly filter with
     no MLlib dependency at serve time. At 100 TB this is the path that
     matters: the model is ~6 doubles, the score is scan-stage codegen.

The reference has no model-based filtering (its only quality gates are the
sentinel/null drops, transform/execute.py:100-130); this is a north-star
training-data extension.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from movie_recommendation_etl_spark.functions.text import (
    mean_token_len,
    short_token_ratio,
    stopword_ratio,
    ws_tokens,
)

#: Feature order is part of the model contract: scoring_expr and the MLlib
#: vector assembly must agree positionally.
FEATURE_NAMES: tuple[str, ...] = (
    "stop_ratio",
    "short_ratio",
    "mean_tok_len",
    "type_token_ratio",
    "log_n_tokens",
)


def quality_features(text_col: str = "text") -> list[Column]:
    """The five feature expressions, in FEATURE_NAMES order — every one a
    built-in Catalyst expression over one tokenization (scan-stage)."""
    toks = ws_tokens(text_col)
    n = F.size(toks)
    safe_n = F.greatest(n, F.lit(1)).cast("double")
    return [
        stopword_ratio(toks),
        short_token_ratio(toks),
        mean_token_len(toks),
        F.size(F.array_distinct(toks)).cast("double") / safe_n,
        F.log1p(n.cast("double")),
    ]


def with_quality_features(
    df: DataFrame, *, text_col: str = "text", output_col: str = "features"
) -> DataFrame:
    """Append an MLlib vector column of quality features (JVM-side:
    array_to_vector over built-in expressions, no Python worker)."""
    from pyspark.ml.functions import array_to_vector

    feats = quality_features(text_col)
    return df.withColumn(
        output_col,
        array_to_vector(F.array(*feats)),
    )


def fit_quality_classifier(
    labeled: DataFrame,
    *,
    text_col: str = "text",
    label_col: str = "label",
    max_iter: int = 50,
    reg_param: float = 0.0,
):
    """Fit LogisticRegression(quality features -> P(label=1)) on a labeled
    sample. Returns the fitted LogisticRegressionModel. Deterministic:
    L-BFGS on a convex objective from a fixed init — the same data yields
    the same coefficients on any partitioning."""
    from pyspark.ml.classification import LogisticRegression

    prepared = with_quality_features(labeled, text_col=text_col)
    lr = LogisticRegression(
        featuresCol="features",
        labelCol=label_col,
        maxIter=max_iter,
        regParam=reg_param,
    )
    return lr.fit(prepared)


def scoring_expr(model, text_col: str = "text") -> Column:
    """The fitted model's P(good) as a pure Catalyst expression:
    sigmoid(intercept + sum coef_i * feature_i). Bakes the ~6 doubles into
    the plan — no MLlib, no UDF, no shuffle; composes with any scan filter
    (e.g. ``curate`` keeps docs with score >= tau at scan speed)."""
    coefs = list(model.coefficients)
    if len(coefs) != len(FEATURE_NAMES):
        raise ValueError(
            f"model has {len(coefs)} coefficients, "
            f"expected {len(FEATURE_NAMES)} ({FEATURE_NAMES})"
        )
    z: Column = F.lit(float(model.intercept))
    for coef, feat in zip(coefs, quality_features(text_col)):
        z = z + F.lit(float(coef)) * feat
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def score_documents(
    model,
    docs: DataFrame,
    *,
    text_col: str = "text",
    score_col: str = "quality_score",
) -> DataFrame:
    """Append the classifier's P(good) via the Catalyst scoring path."""
    return docs.withColumn(score_col, scoring_expr(model, text_col))


def sigmoid(z: float) -> float:
    """Driver-side reference sigmoid (tests compare Catalyst vs MLlib vs
    this)."""
    return 1.0 / (1.0 + math.exp(-z))
