"""Incremental near-dup admission (operators/incremental_dedup.py):
cross-batch rejection against the signature store, within-batch
smallest-id-wins, replay idempotence, and store growth bounded to admitted
docs."""

from __future__ import annotations

from pyspark.sql import types as T

from movie_recommendation_etl_spark.operators.incremental_dedup import (
    admit_new_documents,
)

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)

BASE_A = (
    "the quick brown fox jumps over the lazy dog while the bright moon "
    "rises slowly above the quiet hills and the river bends gently south"
)
BASE_B = (
    "pack my box with five dozen liquor jugs before the long train departs "
    "from the old station near the harbor where gulls circle all morning"
)
FRESH = (
    "colorless green ideas sleep furiously under a sky of copper wires "
    "humming ancient songs that nobody alive remembers how to sing anymore"
)
# BASE_A with a few words changed: high shingle overlap, not identical
NEAR_A = (
    "the quick brown fox jumps over the lazy dog while the pale moon "
    "rises slowly above the quiet hills and the river bends gently south"
)


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_incremental_admission_lifecycle(spark, tmp_path):
    store = str(tmp_path / "sig_store")

    # batch 1: two distinct docs, plus a within-batch exact dup of BASE_A
    admitted1 = admit_new_documents(
        spark, _df(spark, [(1, BASE_A), (2, BASE_B), (3, BASE_A)]), store
    )
    ids1 = {r["doc_id"] for r in admitted1.collect()}
    assert ids1 == {1, 2}  # 3 rejected within-batch (smallest id wins)

    # batch 2: a near-dup of stored BASE_A, and a genuinely fresh doc
    admitted2 = admit_new_documents(
        spark, _df(spark, [(10, NEAR_A), (11, FRESH)]), store
    )
    ids2 = {r["doc_id"] for r in admitted2.collect()}
    assert ids2 == {11}  # 10 rejected against the store

    # store holds band rows ONLY for admitted docs
    stored_ids = {
        r["doc_id"]
        for r in spark.read.parquet(store).select("doc_id").distinct().collect()
    }
    assert stored_ids == {1, 2, 11}

    # replay of batch 2 (at-least-once delivery): the fresh doc matches
    # only ITSELF in the store, so it is re-admitted; store is unchanged
    admitted2b = admit_new_documents(
        spark, _df(spark, [(10, NEAR_A), (11, FRESH)]), store
    )
    assert {r["doc_id"] for r in admitted2b.collect()} == {11}
    again = {
        r["doc_id"]
        for r in spark.read.parquet(store).select("doc_id").distinct().collect()
    }
    assert again == {1, 2, 11}
    # idempotent row counts too (merge, not append)
    n_rows = spark.read.parquet(store).count()
    assert n_rows == 3 * 4  # 3 docs x 4 bands


def test_original_columns_pass_through(spark, tmp_path):
    store = str(tmp_path / "sig_store2")
    extra = T.StructType(
        list(SCHEMA.fields) + [T.StructField("source", T.StringType())]
    )
    docs = spark.createDataFrame([(1, BASE_A, "crawl")], extra)
    out = admit_new_documents(spark, docs, store)
    assert out.columns == ["doc_id", "text", "source"]
    assert out.collect()[0]["source"] == "crawl"


def test_incremental_embedding_admission(spark, tmp_path):
    import math

    from movie_recommendation_etl_spark.operators.incremental_dedup import (
        admit_new_embeddings,
    )

    store = str(tmp_path / "emb_store")
    DIM = 8

    def unit(vals):
        n = math.sqrt(sum(v * v for v in vals))
        return [float(v / n) for v in vals]

    base = unit([1, 2, 3, 4, 5, 6, 7, 8])
    near = unit([1.02, 2.01, 3.0, 4.03, 5.0, 6.02, 7.0, 8.01])  # cos ~ 1
    ortho = unit([8, -7, 6, -5, 4, -3, 2, -1])

    schema = "vec_id long, embedding array<double>"

    # batch 1: base + orthogonal, plus a within-batch near copy of base
    a1 = admit_new_embeddings(
        spark,
        spark.createDataFrame([(1, base), (2, ortho), (3, near)], schema),
        store,
        dim=DIM,
    )
    assert {r["vec_id"] for r in a1.collect()} == {1, 2}

    # batch 2: another near-copy (rejected vs store) + a fresh vector
    fresh = unit([0, 1, 0, -1, 0, 1, 0, -1])
    a2 = admit_new_embeddings(
        spark,
        spark.createDataFrame([(10, near), (11, fresh)], schema),
        store,
        dim=DIM,
    )
    assert {r["vec_id"] for r in a2.collect()} == {11}

    # replay converges (self-match excluded, merge idempotent)
    a2b = admit_new_embeddings(
        spark,
        spark.createDataFrame([(10, near), (11, fresh)], schema),
        store,
        dim=DIM,
    )
    assert {r["vec_id"] for r in a2b.collect()} == {11}
    stored = spark.read.parquet(store)
    assert stored.select("vec_id").distinct().count() == 3
    assert stored.count() == 3 * 12  # 96 bits / 8 per band
