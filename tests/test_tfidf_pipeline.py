"""TF-IDF pipeline unit tests: stage semantics + the optional broadcast-map
lemmatizer (SURVEY.md §2.10 M4 — the one truly custom operator)."""

from __future__ import annotations

from pyspark.sql import functions as F

from movie_recommendation_etl_spark.ml.tfidf import (
    fit_document_vectors,
    lemmatize,
)
from movie_recommendation_etl_spark.sources.catalog import load_table


def test_lemmatize_broadcast_map(spark):
    df = spark.createDataFrame(
        [(["running", "dogs", "unknown", "ran"],)], "toks: array<string>"
    )
    lemmas = {"running": "run", "ran": "run", "dogs": "dog"}
    out = df.select(lemmatize(F.col("toks"), lemmas).alias("lem")).collect()[0]
    assert out["lem"] == ["run", "dog", "unknown", "run"]
    # empty map is the identity
    ident = df.select(lemmatize(F.col("toks"), {}).alias("lem")).collect()[0]
    assert ident["lem"] == ["running", "dogs", "unknown", "ran"]


def test_tfidf_vectors_are_l2_normalized(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(100)
    _, vecs = fit_document_vectors(docs)
    rows = vecs.select("norm_features").collect()
    for r in rows:
        n = float(sum(v * v for v in r["norm_features"].toArray()) ** 0.5)
        assert abs(n - 1.0) < 1e-9 or n == 0.0
    # intermediates dropped
    assert set(vecs.columns) == set(docs.columns) | {"norm_features"}


def test_min_df_prunes_rare_terms(spark):
    rows = [(i, "common words here") for i in range(10)] + [
        (99, "common rareterm here")
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    model, _ = fit_document_vectors(df, min_df=3, min_doc_freq=0)
    cv = model.stages[2]
    assert "rareterm" not in cv.vocabulary
    assert "common" in cv.vocabulary
