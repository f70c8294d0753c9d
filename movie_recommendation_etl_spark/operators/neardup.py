"""Near-duplicate detection: MinHash+LSH, SimHash, n-gram Jaccard.

North-star training-data-pipeline operators (the reference has no dedup
beyond ``dropDuplicates(["id"])``, transform/execute.py:80). The designs are
the standard ones from the dedup literature (shingle → minhash → band →
bucket-join; simhash bit-vote), expressed as pure Catalyst expressions.

Cross-engine determinism: every hash in the family derives from md5, which
Spark and DuckDB implement identically, so the *entire* LSH candidate
generation — not just the final verify step — is reproducible in ANSI SQL.
That lets the correctness gate hash-compare an approximate algorithm exactly:
both engines miss the same (rare, deterministic) pairs.

Scale shape: per-doc signature work is embarrassingly parallel in the scan
stage; candidate generation is one explode (bands/doc = small constant) + one
shuffle on (band_idx, band_hash) whose keys are md5-uniform (no skew); the
verify join touches only candidate pairs. Nothing is ever all-pairs.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HEX_HIGH = ("8", "9", "a", "b", "c", "d", "e", "f")


def word_shingles(tokens: Column, k: int = 3) -> Column:
    """Distinct k-word shingles of a token array (the Jaccard ground set)."""
    n = F.size(tokens) - F.lit(k - 1)
    idx = F.when(n >= 1, F.sequence(F.lit(1), n)).otherwise(
        F.array().cast("array<int>")
    )
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(tokens, i, k)))
    )


SLICES_PER_MD5 = 4  # 32 hex chars -> 4 independent 8-hex (32-bit) slices


def minhash_hash_arrays(shingles: Column, num_hashes: int = 12) -> list[Column]:
    """Per-shingle md5 arrays for the hash family: group g hashes every
    shingle once as md5(f"{g}:" + s); each md5 then yields FOUR independent
    uniform 32-bit hex slices, so 12 hash functions cost 3 md5 passes.
    Materialize these as named columns (minhash_neardup_pairs persists them)
    — expression-level reuse is NOT guaranteed to collapse the duplicated
    md5 subtrees (measured 4x slower when inlined).
    """
    # NB: per-element lambdas must be UNARY — pyspark dispatches on lambda
    # arity, and a second parameter (even with a default) receives the array
    # index Column instead of the intended closure value.
    def _hasher(g: int):
        return lambda s: F.md5(F.concat(F.lit(f"{g}:"), s))

    n_groups = -(-num_hashes // SLICES_PER_MD5)
    return [
        F.transform(shingles, _hasher(g)).alias(f"__h{g}")
        for g in range(n_groups)
    ]


def minhash_signature(
    hashed_cols: list[Column], num_hashes: int = 12
) -> list[Column]:
    """MinHash signature from the materialized hash arrays: function i uses
    md5 group i//4, hex slice i%4. Fixed-width lowercase hex compares
    bytewise identically in the JVM and DuckDB, so the min *string* is a
    valid min *hash* and the whole family replays in ANSI SQL."""

    def _slicer(j: int):
        return lambda h: h.substr(F.lit(1 + 8 * j), F.lit(8))

    sig: list[Column] = []
    for i in range(num_hashes):
        g, j = divmod(i, SLICES_PER_MD5)
        sig.append(
            F.array_min(F.transform(hashed_cols[g], _slicer(j))).alias(f"mh{i}")
        )
    return sig


def band_hashes(sig: list[Column], rows_per_band: int = 3) -> Column:
    """LSH banding: hash each consecutive group of ``rows_per_band``
    signature entries; docs sharing any band hash become candidates."""
    bands = [
        F.md5(F.concat_ws("|", *sig[j : j + rows_per_band]))
        for j in range(0, len(sig), rows_per_band)
    ]
    return F.array(*bands)


def jaccard(shingles_a: Column, shingles_b: Column) -> Column:
    """Exact Jaccard over two distinct-element arrays."""
    inter = F.size(F.array_intersect(shingles_a, shingles_b))
    union = F.size(shingles_a) + F.size(shingles_b) - inter
    return inter.cast("double") / union.cast("double")


def minhash_neardup_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    k: int = 3,
    num_hashes: int = 12,
    rows_per_band: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: shingle → signature → band →
    bucket self-join → exact-Jaccard verify. Returns (doc_a, doc_b, jaccard)
    with doc_a < doc_b and jaccard >= threshold."""
    toks = F.split(F.col(text_col), " ")
    sh = word_shingles(toks, k)
    base = docs.select(F.col(id_col).alias("doc_id"), sh.alias("sh"))
    # Persist the per-shingle hash arrays: without a materialization barrier
    # Catalyst inlines the md5 expression trees into every consumer (both
    # sides of the self-join, both verify joins), recomputing each md5 pass
    # up to 12x (measured 30x slower at sf0.1). MEMORY_AND_DISK so a 100 TB
    # corpus spills instead of evicting.
    hashed = base.select(
        "doc_id", "sh", *minhash_hash_arrays(F.col("sh"), num_hashes)
    ).persist(StorageLevel.MEMORY_AND_DISK)
    n_groups = -(-num_hashes // SLICES_PER_MD5)
    sig_cols = minhash_signature(
        [F.col(f"__h{g}") for g in range(n_groups)], num_hashes
    )
    # Second materialization level: the final (id, shingles, 4 band hashes)
    # rows. Building it reads the hashed cache once (3 md5 passes total);
    # the self-join and verify consumers then read bands/shingles for free.
    sig = hashed.select(
        "doc_id", "sh", band_hashes(sig_cols, rows_per_band).alias("bands")
    ).persist(StorageLevel.MEMORY_AND_DISK)

    exploded = sig.select(
        "doc_id", F.posexplode("bands").alias("band_idx", "band_hash")
    )
    a, b = exploded.alias("a"), exploded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    shingle_sets = sig.select("doc_id", "sh")
    verified = (
        pairs.join(
            shingle_sets.withColumnRenamed("sh", "sh_a").withColumnRenamed(
                "doc_id", "doc_a"
            ),
            "doc_a",
        )
        .join(
            shingle_sets.withColumnRenamed("sh", "sh_b").withColumnRenamed(
                "doc_id", "doc_b"
            ),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            jaccard(F.col("sh_a"), F.col("sh_b")).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return verified


def simhash16(tokens: Column) -> Column:
    """16-bit SimHash: bit b votes +1/-1 per token by the high bit of hex
    digit b of md5(token); the bit is set when the vote sum is positive.
    Tokens carry multiplicity (standard simhash weighting by term count)."""
    bits = F.transform(
        F.sequence(F.lit(1), F.lit(16)),
        lambda b: F.aggregate(
            tokens,
            F.lit(0),
            lambda acc, t: acc
            + F.when(F.md5(t).substr(b, F.lit(1)).isin(*HEX_HIGH), 1).otherwise(-1),
        ),
    )
    return F.aggregate(
        bits,
        F.lit(0),
        lambda acc, x: acc * 2 + F.when(x > 0, 1).otherwise(0),
    )


def hamming16(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))
