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
    ev_grams = (
        eval_set.select(
            F.explode(word_shingles(F.split(text_col, " "), n)).alias("gram")
        )
        .distinct()
        .withColumn("hit", F.lit(1))
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
