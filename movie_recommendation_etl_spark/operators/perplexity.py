"""Unigram language-model perplexity scoring: the CCNet/RedPajama-style
quality signal — score each document by how surprising its tokens are under
a language model trained on a trusted corpus, then keep the low-perplexity
band. The public recipe uses a KenLM n-gram model; the distributed-friendly
core is the same with a unigram model, which is exactly computable in two
aggregations and is the standard first cut before shipping a heavier LM to
executors.

Spark-first shape:
- MODEL = the trusted corpus's token frequencies: one explode + one hash
  aggregation (map-side combined; vocabulary-sized output, not corpus-
  sized). Add-one smoothing so OOV tokens get a finite penalty.
- SCORING = explode the target corpus's tokens, LEFT join the model table
  on the token (broadcast when the vocabulary fits — the usual case for a
  bounded vocab; a shuffled join on uniform token keys otherwise), and a
  per-document mean of log-probabilities. Two shuffles total at any scale,
  both on uniform keys.

The reference has no statistical quality filtering; north-star extension.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fit_unigram_model(
    corpus: DataFrame, *, text_col: str = "text"
) -> tuple[DataFrame, float]:
    """Token -> log2 P(token) over the trusted corpus, add-one smoothed.
    Returns (model_df[token, log2p], oov_log2p) where ``oov_log2p`` is the
    smoothed log-probability charged to tokens never seen in training.
    The model frame is vocabulary-sized — cache or broadcast it."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    counts = (
        corpus.select(F.explode(toks).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    totals = counts.agg(
        F.sum("cnt").alias("n"), F.count(F.lit(1)).alias("v")
    ).first()
    n, v = totals["n"], totals["v"]
    denom = float(n + v + 1)  # +1: the single shared OOV event
    model = counts.select(
        "token",
        (F.log2((F.col("cnt") + 1).cast("double") / F.lit(denom))).alias(
            "log2p"
        ),
    )
    oov_log2p = math.log2(1.0 / denom)
    return model, oov_log2p


def score_perplexity(
    docs: DataFrame,
    model: DataFrame,
    oov_log2p: float,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_model: bool = True,
) -> DataFrame:
    """Per-document unigram cross-entropy and perplexity under ``model``:
    (id_col, n_tokens, n_oov, cross_entropy, perplexity). Lower perplexity
    = more like the trusted corpus. Zero-token docs are dropped (they carry
    no evidence either way — gate them on length instead)."""
    m = F.broadcast(model) if broadcast_model else model
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    exploded = docs.select(
        F.col(id_col), F.explode(toks).alias("token")
    ).filter(F.col("token") != "")
    joined = exploded.join(m, "token", "left").select(
        id_col,
        F.coalesce(F.col("log2p"), F.lit(float(oov_log2p))).alias("log2p"),
        F.col("log2p").isNull().cast("int").alias("oov"),
    )
    agg = joined.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("oov").alias("n_oov"),
        (-F.avg("log2p")).alias("cross_entropy"),
    )
    return agg.withColumn("perplexity", F.pow(F.lit(2.0), "cross_entropy"))


def perplexity_filter(
    docs: DataFrame,
    trusted: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_perplexity: float | None = None,
    keep_fraction: float | None = 0.7,
) -> DataFrame:
    """Keep the docs most like ``trusted``: fit the unigram model on the
    trusted corpus, score ``docs``, and keep either everything under
    ``max_perplexity`` or the lowest-perplexity ``keep_fraction`` (the
    CCNet head/middle band; the threshold is computed exactly via
    percentile on the score frame — one extra tiny aggregation)."""
    if (max_perplexity is None) == (keep_fraction is None):
        raise ValueError(
            "pass exactly one of max_perplexity / keep_fraction"
        )
    model, oov = fit_unigram_model(trusted, text_col=text_col)
    scores = score_perplexity(
        docs, model, oov, id_col=id_col, text_col=text_col
    )
    if max_perplexity is None:
        cut = scores.agg(
            F.percentile("perplexity", F.lit(float(keep_fraction))).alias(
                "cut"
            )
        ).first()["cut"]
    else:
        cut = float(max_perplexity)
    kept = scores.filter(F.col("perplexity") <= cut).select(
        id_col, "perplexity"
    )
    return docs.join(kept, id_col)
