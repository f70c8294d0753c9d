"""Benchmark decontamination: flag training documents that overlap an
evaluation set by shared word n-grams.

Every serious LLM training pipeline runs this gate before training — a
benchmark document leaking into the training set invalidates the eval. The
standard public recipe (n-gram overlap against the eval corpus, as used by
the open Dolma/RedPajama/FineWeb pipelines and the GPT-3 appendix) is:
tokenize both sides, take each training document's distinct word n-grams,
count how many also occur anywhere in the eval set, and flag documents whose
overlap ratio clears a threshold.

Scale shape (the reason this is Spark-first):
- The EVAL side is small by construction (benchmarks are thousands of
  documents, not billions) — its distinct n-gram set broadcasts, so the
  contamination check is a broadcast hash join that rides the training
  scan. No shuffle of the 100 TB side ever happens on the gram key.
- The TRAINING side is one scan: shingle (scan-stage codegen, see
  operators/neardup.py:word_shingles), explode, broadcast-join, and a
  partial-aggregable count per doc — exactly one Exchange, on the doc id.
- For eval sets too large to broadcast (unusual), drop the broadcast hint:
  the same plan degrades to a shuffled join without any code change.
- For eval sets large enough that even the degraded shuffled join hurts
  (shuffling every training gram at 100 TB is the single biggest exchange
  a decontamination pass can emit), ``ngram_contamination_bloom`` replaces
  the broadcast gram SET with a broadcast Bloom BITMAP (10 bits/gram
  instead of the gram strings: a 100M-gram eval side becomes a ~128 MB
  exact set vs a ~12 MB filter) and shuffles only the candidate grams that
  pass it — the true overlaps plus the bounded false-positive trickle. An
  exact confirm join scrubs the false positives, so results are
  IDENTICAL to ``ngram_contamination`` (asserted row-for-row in
  tests/test_curate_pipeline.py), never probabilistic.

The reference pipeline has no decontamination stage (its corpus IS the
serving corpus — transform/execute.py stops at dedup); this is a
north-star training-data extension, not a parity port.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from movie_recommendation_etl_spark.operators.neardup import word_shingles


def ngram_contamination(
    train: DataFrame,
    eval_set: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    ratio_threshold: float = 0.05,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Per-training-document n-gram overlap against ``eval_set``.

    Returns one row per training document:
      (id_col, n_grams, n_overlap, overlap_ratio, is_contaminated)
    where ``n_grams`` is the document's distinct word n-gram count,
    ``n_overlap`` how many of those occur anywhere in the eval set, and
    ``is_contaminated`` = overlap_ratio >= ratio_threshold. Documents too
    short to produce a single n-gram report n_grams = 0, ratio 0.0.

    Deterministic and engine-exact: integer counts plus one double
    division — the DuckDB oracle (plans/text_analysis.py:q76) hash-matches
    bit-for-bit.
    """
    ev_grams = _eval_grams(eval_set, text_col, n).withColumn(
        "hit", F.lit(1)
    )
    if broadcast_eval:
        ev_grams = F.broadcast(ev_grams)

    grams = word_shingles(F.split(text_col, " "), n)
    # One training scan, and the shingle expression evaluates ONCE per row:
    # the per-doc gram count is recovered in the aggregate as count(gram)
    # (explode_outer emits a single NULL gram for zero-gram docs, which
    # count() skips) instead of carrying F.size(grams) through the explode —
    # Catalyst re-inlines a projected array into both Project and Generate,
    # doubling the shingle work.
    exploded = train.select(
        F.col(id_col), F.explode_outer(grams).alias("gram")
    )
    joined = exploded.join(ev_grams, "gram", "left")
    agg = joined.groupBy(id_col).agg(
        F.count("gram").cast("int").alias("n_grams"),
        F.coalesce(F.sum("hit"), F.lit(0)).cast("long").alias("n_overlap"),
    )
    return _finish(agg, id_col, ratio_threshold)


def _eval_grams(eval_set: DataFrame, text_col: str, n: int) -> DataFrame:
    return eval_set.select(
        F.explode(word_shingles(F.split(text_col, " "), n)).alias("gram")
    ).distinct()


def _finish(agg: DataFrame, id_col: str, ratio_threshold: float) -> DataFrame:
    ratio = F.when(
        F.col("n_grams") > 0,
        F.col("n_overlap").cast("double") / F.col("n_grams").cast("double"),
    ).otherwise(F.lit(0.0))
    return agg.select(
        id_col,
        "n_grams",
        "n_overlap",
        ratio.alias("overlap_ratio"),
        (ratio >= F.lit(ratio_threshold)).alias("is_contaminated"),
    )


def _bit_masks() -> Column:
    """The 64 single-bit long masks as one literal array (element_at is
    1-indexed). Shift-by-a-COLUMN doesn't exist in the Column API (only
    literal shift amounts), and 1<<63 overflows a Java long as a positive
    literal — so bit 63 is written as the negative two's-complement value."""
    return F.array(
        *[
            F.lit((1 << i) if i < 63 else -(1 << 63)).cast("long")
            for i in range(64)
        ]
    )


def _bloom_positions(gram: Column, seed: Column | int, num_bits: int) -> Column:
    s = F.lit(seed) if isinstance(seed, int) else seed
    return F.pmod(F.xxhash64(gram, s), F.lit(num_bits))


def bloom_might_contain(
    gram: Column, bitmap: Column, *, num_bits: int, num_hashes: int
) -> Column:
    """Pure-Catalyst Bloom probe: all ``num_hashes`` bits set. Word index is
    a literal shift (pos >> 6), bit mask a literal-array lookup — no Python,
    no shift-by-column. NULL grams probe NULL: xxhash64 SKIPS null inputs
    (hashing just the seed, a fixed non-null value), so without the guard a
    NULL gram would alias whatever bits the bare seeds address — same
    definite answer for every NULL."""
    cond = None
    for s in range(num_hashes):
        pos = _bloom_positions(gram, s, num_bits)
        word = F.element_at(bitmap, F.shiftright(pos, 6).cast("int") + 1)
        mask = F.element_at(
            _bit_masks(), pos.bitwiseAND(F.lit(63)).cast("int") + 1
        )
        hit = word.bitwiseAND(mask) != F.lit(0).cast("long")
        cond = hit if cond is None else cond & hit
    return F.when(gram.isNotNull(), cond)


def build_gram_bloom(
    eval_set: DataFrame,
    *,
    text_col: str = "text",
    n: int = 5,
    num_bits: int = 1 << 23,
    num_hashes: int = 5,
) -> list[int]:
    """Distributed Bloom build over the eval set's distinct n-grams.

    Fan each gram out to its ``num_hashes`` bit positions
    (``pmod(xxhash64(gram, seed), num_bits)``), OR the bits per 64-bit word
    with ``bit_or`` (partial-aggregable — the map side combines before the
    single exchange on word index), and collect the dense word array. The
    bitmap is bounded METADATA by construction — ``num_bits/8`` bytes
    regardless of eval size (the default 2^23 bits = 1 MB holds ~800k grams
    at ~1% false-positive rate with 5 hashes; size up bits/gram ~10 for
    bigger eval sets) — the same collect class as the IVF centroid table.
    """
    if num_bits % 64 != 0:
        raise ValueError("num_bits must be a multiple of 64")
    pos = _bloom_positions(F.col("gram"), F.col("seed"), num_bits)
    words = (
        _eval_grams(eval_set, text_col, n)
        .select(
            "gram",
            F.explode(
                F.array(*[F.lit(s) for s in range(num_hashes)])
            ).alias("seed"),
        )
        .select(
            F.shiftright(pos, 6).cast("int").alias("w"),
            F.element_at(
                _bit_masks(), pos.bitwiseAND(F.lit(63)).cast("int") + 1
            ).alias("m"),
        )
        .groupBy("w")
        .agg(F.bit_or("m").alias("bits"))
        .collect()
    )
    bitmap = [0] * (num_bits // 64)
    for r in words:
        bitmap[r["w"]] = r["bits"]
    return bitmap


def ngram_contamination_bloom(
    train: DataFrame,
    eval_set: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    ratio_threshold: float = 0.05,
    num_bits: int = 1 << 23,
    num_hashes: int = 5,
) -> DataFrame:
    """``ngram_contamination`` for eval sets too large to broadcast as an
    exact gram set: broadcast a Bloom bitmap instead, shuffle only the
    grams that pass it.

    Same output schema and IDENTICAL values as the exact operator — the
    Bloom filter has no false negatives (every eval gram's bits are set),
    and the confirm join against the real eval grams removes the false
    positives, so the filter only ever changes WHICH rows reach the
    shuffle, never the answer.

    Plan shape, in execution order:
    1. ONE training scan: shingle → explode → per-doc aggregate (a single
       Exchange on the doc id) producing ``n_grams`` plus the per-doc
       Bloom-candidate gram list (``collect_list`` of probe survivors —
       bounded by true overlaps + the FP rate, not by the doc's gram
       count). The bitmap rides in via a broadcast single-row cross join
       (one ~``num_bits/8``-byte row, the plans/lookup.py pattern), so the
       probe is scan-stage JVM codegen.
    2. The candidate grams re-explode (eval-overlap-sized, tiny) and
       confirm against the true eval gram set in a SHUFFLED equi-join —
       the exchange the broadcast variant avoids, but here it moves only
       candidates, never the corpus' gram stream.
    3. A left join folds confirmed counts back onto the per-doc frame
       (both sides already doc-keyed aggregates).
    """
    spark = train.sparkSession
    bitmap = build_gram_bloom(
        eval_set,
        text_col=text_col,
        n=n,
        num_bits=num_bits,
        num_hashes=num_hashes,
    )
    bm_df = spark.createDataFrame([(bitmap,)], "bm: array<long>")
    return bloom_contamination_verdicts(
        train,
        bm_df,
        _eval_grams(eval_set, text_col, n),
        id_col=id_col,
        text_col=text_col,
        n=n,
        ratio_threshold=ratio_threshold,
        num_bits=num_bits,
        num_hashes=num_hashes,
    )


def bloom_contamination_verdicts(
    train: DataFrame,
    bm_df: DataFrame,
    eval_grams: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    ratio_threshold: float = 0.05,
    num_bits: int = 1 << 23,
    num_hashes: int = 5,
) -> DataFrame:
    """The Bloom-tier verdict plan given a PREBUILT bitmap frame (one
    ``bm: array<long>`` row from :func:`build_gram_bloom`) and the exact
    eval-gram frame. Factored out of :func:`ngram_contamination_bloom` so
    the streaming gate (streaming/decontaminate.bloom_gated_stream) runs
    the byte-identical plan per micro-batch — the two tiers cannot drift.
    ``num_bits``/``num_hashes`` MUST match the bitmap's build parameters
    (a mismatch silently probes wrong bits; the caller owns that pairing).
    """
    grams = word_shingles(F.split(text_col, " "), n)
    exploded = train.select(
        F.col(id_col), F.explode_outer(grams).alias("gram")
    ).crossJoin(F.broadcast(bm_df))
    probe = bloom_might_contain(
        F.col("gram"), F.col("bm"), num_bits=num_bits, num_hashes=num_hashes
    )
    per_doc = exploded.groupBy(id_col).agg(
        F.count("gram").cast("int").alias("n_grams"),
        F.collect_list(F.when(probe, F.col("gram"))).alias("__cand"),
    )
    # Both downstream branches (the n_grams carrier and the candidate
    # re-explode) read per_doc, and their differing column pruning makes
    # the two aggregate exchanges non-identical — exchange reuse does NOT
    # fire (verified empirically), so without a barrier the training side
    # is scanned and shingled TWICE. A lazy localCheckpoint materializes
    # the doc-keyed aggregate once (far smaller than the gram stream) and
    # both branches share it; executor-local blocks suffice for a batch
    # operator (the graph ops' reliable-checkpoint escape hatch pattern
    # applies if this ever runs inside a fault-critical pipeline).
    per_doc = per_doc.localCheckpoint(eager=False)
    confirmed = (
        per_doc.select(F.col(id_col), F.explode("__cand").alias("gram"))
        .join(eval_grams, "gram")
        .groupBy(id_col)
        .agg(F.count("*").cast("long").alias("__n_confirmed"))
    )
    agg = (
        per_doc.drop("__cand")
        .join(confirmed, id_col, "left")
        .select(
            id_col,
            "n_grams",
            F.coalesce(F.col("__n_confirmed"), F.lit(0))
            .cast("long")
            .alias("n_overlap"),
        )
    )
    return _finish(agg, id_col, ratio_threshold)
