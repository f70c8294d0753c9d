"""Incremental near-dup admission: dedup NEW batches against a persisted
signature store without ever re-reading the corpus.

The batch near-dup pipeline (operators/neardup.py) is O(corpus) per run —
right for a one-time sweep, wrong for ingestion, where each arriving batch
must be checked against everything admitted so far. This module keeps a
parquet SIGNATURE STORE — per admitted doc: its MinHash signature (12
longs) and LSH band hashes — so admission cost is O(batch + matching
band buckets), independent of corpus size. A 100 TB corpus's store is
~100 GB (3 orders smaller), and the probe is an equi-join on band hash:
shuffle-friendly, prunable, never all-pairs.

Similarity against stored docs is ESTIMATED from signature agreement
(fraction of equal minhash positions — an unbiased Jaccard estimator; with
12 hashes the std-err is ~0.13, so thresholds are coarse by design). The
store keeps no shingles, which is the point: exact-Jaccard verification of
store matches would mean keeping O(corpus tokens) around forever. Pipelines
needing exact verification run the batch pipeline offline on the admitted
corpus; this gate's job is cheap high-recall rejection at the front door.

Write path: admitted signatures merge into the store via
merge_upsert_parquet keyed (doc_id, band_idx) — idempotent, so replaying a
batch (at-least-once delivery) converges instead of duplicating store rows.
Self-matches are excluded on probe, so a replayed doc does not reject
itself. At scale, partition the store by a band-hash prefix for pruning and
compact it periodically (sources/compact.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from movie_recommendation_etl_spark.operators.neardup import (
    minhash_signature_cols,
    band_hashes,
    word_shingles,
)
from movie_recommendation_etl_spark.sources.writers import (
    merge_upsert_parquet,
)

NUM_HASHES = 12
ROWS_PER_BAND = 3


def _read_store(spark: SparkSession, store_path: str) -> DataFrame | None:
    """The store frame, or None when the store does not exist yet
    (bootstrap). ONLY the missing-path AnalysisException maps to None;
    every other failure propagates (see admit_new_documents)."""
    from pyspark.sql.utils import AnalysisException

    try:
        return spark.read.parquet(store_path)
    except AnalysisException as e:
        if "PATH_NOT_FOUND" in str(e) or "Path does not exist" in str(e):
            return None
        raise


def _band_rows(
    docs: DataFrame, id_col: str, text_col: str, k: int
) -> DataFrame:
    """(id, text) -> one row per (doc_id, band_idx): band_val + full
    signature. Docs with zero shingles pass through with no rows (they can
    never near-dup; callers admit them unconditionally)."""
    toks = F.split(F.col(text_col), " ")
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        word_shingles(toks, k).alias("sh"),
    ).filter(F.size("sh") > 0)
    sig = minhash_signature_cols(base, NUM_HASHES)
    sig_arr = F.array(*[F.col(f"mh{i}") for i in range(NUM_HASHES)])
    banded = sig.select(
        "doc_id",
        sig_arr.alias("sig"),
        band_hashes(
            [F.col(f"mh{i}").cast("string") for i in range(NUM_HASHES)],
            ROWS_PER_BAND,
        ).alias("bands"),
    )
    return banded.select(
        "doc_id",
        "sig",
        F.posexplode("bands").alias("band_idx", "band_val"),
    )


def _sig_agreement(a, b):
    """Fraction of equal minhash positions — the Jaccard estimate."""
    return (
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x == y).cast("int")),
            F.lit(0),
            lambda acc, v: acc + v,
        ).cast("double")
        / NUM_HASHES
    )


def admit_new_documents(
    spark: SparkSession,
    new_docs: DataFrame,
    store_path: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    sim_threshold: float = 0.7,
) -> DataFrame:
    """Admit the subset of ``new_docs`` that near-dups neither the stored
    corpus nor an earlier (smaller-id) doc of the same batch, and merge the
    admitted signatures into the store. Returns the admitted rows with
    their original columns. Deterministic: within a batch the smallest id
    of a duplicate group survives (matching dedup_keep_first's policy);
    across batches, first-admitted wins. ``id_col`` values must be globally
    unique across batches (replays of the same ids are the supported
    exception and converge idempotently).
    """
    bands = _band_rows(new_docs, id_col, text_col, k).localCheckpoint(
        eager=True
    )

    # -- within-batch rejection: any doc agreeing with a SMALLER id --------
    a, b = bands.alias("a"), bands.alias("b")
    intra = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") > F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_id"),
            _sig_agreement(F.col("a.sig"), F.col("b.sig")).alias("est"),
        )
        .filter(F.col("est") >= sim_threshold)
        .select("doc_id")
        .distinct()
    )

    # -- store rejection: any agreement with a different stored doc --------
    # Only a MISSING store is bootstrap (AnalysisException on the read,
    # caught narrowly around the read alone). Any other failure — corrupt
    # footer, permissions, schema drift — must raise: swallowing it would
    # silently disable cross-batch rejection and admit duplicates.
    store = _read_store(spark, store_path)
    if store is not None:
        hits = (
            bands.alias("n")
            .join(
                store.alias("s"),
                (F.col("n.band_idx") == F.col("s.band_idx"))
                & (F.col("n.band_val") == F.col("s.band_val"))
                & (F.col("n.doc_id") != F.col("s.doc_id")),
            )
            .select(
                F.col("n.doc_id").alias("doc_id"),
                _sig_agreement(F.col("n.sig"), F.col("s.sig")).alias("est"),
            )
            .filter(F.col("est") >= sim_threshold)
            .select("doc_id")
            .distinct()
        )
        rejected = intra.unionByName(hits).distinct()
    else:
        rejected = intra

    admitted = new_docs.join(
        rejected.withColumnRenamed("doc_id", id_col),
        id_col,
        "left_anti",
    ).localCheckpoint(eager=True)

    admitted_bands = bands.join(
        admitted.select(F.col(id_col).alias("doc_id")), "doc_id", "left_semi"
    )
    merge_upsert_parquet(
        spark,
        admitted_bands,
        store_path,
        key_cols=["doc_id", "band_idx"],
    )
    return admitted


# --- embedding twin: SRP bands + int8 signatures ----------------------------
#
# The same admission pattern for dense vectors: the store keeps, per
# admitted vector, its SRP LSH bands (operators/neardup.py:srp_bands — the
# deterministic expression form) and an int8-quantized copy
# (functions/vectors.py:quantize_int8, 4x smaller than float32), so probing
# estimates cosine against candidates with integer dot products and never
# needs the original embeddings. Store size ~ dim bytes/vector + 12 ints.

EMB_N_BITS = 96
EMB_ROWS_PER_BAND = 8
EMB_N_BANDS = EMB_N_BITS // EMB_ROWS_PER_BAND


def _embedding_band_rows(
    vecs: DataFrame, id_col: str, vec_col: str, dim: int
) -> DataFrame:
    from movie_recommendation_etl_spark.functions.vectors import quantize_int8
    from movie_recommendation_etl_spark.operators.neardup import srp_bands

    banded = vecs.select(
        F.col(id_col).alias("vec_id"),
        quantize_int8(F.col(vec_col)).alias("qvec"),
        srp_bands(
            vec_col,
            dim=dim,
            n_bits=EMB_N_BITS,
            rows_per_band=EMB_ROWS_PER_BAND,
        ).alias("bands"),
    )
    return banded.select(
        "vec_id", "qvec", F.posexplode("bands").alias("band_idx", "band_val")
    )


def admit_new_embeddings(
    spark: SparkSession,
    new_vecs: DataFrame,
    store_path: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int,
    cos_threshold: float = 0.92,
) -> DataFrame:
    """Vector twin of admit_new_documents: admit new embeddings that are
    not near-duplicates (quantized cosine >= ``cos_threshold``) of the
    stored corpus or of a smaller-id batch neighbor sharing an SRP band;
    merge admitted (band, int8 signature) rows into the store. Same
    determinism and replay-idempotence contract."""
    from movie_recommendation_etl_spark.functions.vectors import (
        cosine_quantized,
    )

    bands = _embedding_band_rows(new_vecs, id_col, vec_col, dim)
    bands = bands.localCheckpoint(eager=True)

    a, b = bands.alias("a"), bands.alias("b")
    intra = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.vec_id") > F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_id"),
            cosine_quantized(F.col("a.qvec"), F.col("b.qvec")).alias("cos"),
        )
        .filter(F.col("cos") >= cos_threshold)
        .select("vec_id")
        .distinct()
    )

    store = _read_store(spark, store_path)
    if store is not None:
        hits = (
            bands.alias("n")
            .join(
                store.alias("s"),
                (F.col("n.band_idx") == F.col("s.band_idx"))
                & (F.col("n.band_val") == F.col("s.band_val"))
                & (F.col("n.vec_id") != F.col("s.vec_id")),
            )
            .select(
                F.col("n.vec_id").alias("vec_id"),
                cosine_quantized(F.col("n.qvec"), F.col("s.qvec")).alias(
                    "cos"
                ),
            )
            .filter(F.col("cos") >= cos_threshold)
            .select("vec_id")
            .distinct()
        )
        rejected = intra.unionByName(hits).distinct()
    else:
        rejected = intra

    admitted = new_vecs.join(
        rejected.withColumnRenamed("vec_id", id_col), id_col, "left_anti"
    ).localCheckpoint(eager=True)

    admitted_bands = bands.join(
        admitted.select(F.col(id_col).alias("vec_id")), "vec_id", "left_semi"
    )
    merge_upsert_parquet(
        spark,
        admitted_bands,
        store_path,
        key_cols=["vec_id", "band_idx"],
    )
    return admitted
