"""Streaming ingestion-time benchmark decontamination: the streaming twin
of operators/decontaminate.py — drop incoming documents whose word n-gram
overlap with a held-out eval set clears a threshold, BEFORE they land in
the corpus.

Why not the batch plan (explode -> broadcast join -> groupBy doc)? The
per-doc overlap COUNT is an aggregation, and a streaming aggregation keyed
by doc id is stateful (watermark + update mode + state store) for what is
semantically a STATELESS per-row decision — each document's verdict depends
only on its own text and the static eval set. The streaming-idiomatic form
is therefore a per-row check against a broadcast of the eval gram set:

- the eval set is collected ONCE on the driver (benchmarks are small by
  construction — thousands of docs, bounded gram count) and shipped to
  executors as a Spark broadcast variable;
- the overlap count is an Arrow-batched pandas_udf probing that broadcast
  set — a hash probe per gram, no shuffle, no state, append-mode safe.
  This is one of the sanctioned pandas-UDF gaps (SURVEY §2.11): built-in
  Catalyst expressions cannot probe a driver-side set without a join, and
  a join would force the stateful aggregation this design avoids.

Batch/stream parity: gram extraction reuses operators/neardup.py
word_shingles (the same expression the batch operator and the q76 oracle
use), and tests/test_streaming.py asserts the gate's keep/drop decisions
match operators/decontaminate.py:ngram_contamination on the same corpus.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from movie_recommendation_etl_spark.operators.neardup import word_shingles


def eval_gram_set(
    eval_set: DataFrame,
    *,
    text_col: str = "text",
    n: int = 5,
    max_grams: int = 10_000_000,
) -> set[str]:
    """Distinct word n-grams of the eval corpus, driver-side. Bounded by
    the benchmark's size (NOT the training corpus) — but that bound is
    enforced, not assumed: the collect is capped at ``max_grams`` + 1 and
    raises when a mis-pointed "eval set" (e.g. the training corpus itself)
    would flood the driver."""
    grams = eval_set.select(
        F.explode(word_shingles(F.split(text_col, " "), n)).alias("gram")
    ).distinct()
    rows = grams.limit(max_grams + 1).collect()
    if len(rows) > max_grams:
        raise ValueError(
            f"eval corpus yields more than max_grams={max_grams} distinct "
            f"{n}-grams — is this really the (small) benchmark side?"
        )
    return {r["gram"] for r in rows}


def contamination_verdicts(
    docs: DataFrame,
    grams: "set[str] | object",
    *,
    text_col: str = "text",
    n: int = 5,
    ratio_threshold: float = 0.05,
) -> DataFrame:
    """Append the batch operator's per-document verdict columns —
    ``(n_grams int, n_overlap long, overlap_ratio double, is_contaminated
    boolean)``, value- and type-identical to
    operators/decontaminate.ngram_contamination — to a (streaming or
    batch) document frame. Stateless per row: works in append mode with no
    watermark and no state store, so the verdict stream can land straight
    in a files sink (the 100 TB shape — per-document output must never be
    driver-held). The q76 ``stream`` arm hash-gates this against the same
    DuckDB oracle as the batch arm.

    ``grams`` is either a plain set (a Spark broadcast is created for this
    frame) or an existing ``Broadcast`` of a frozenset. A long-lived
    driver that rebuilds the gate on eval-set refresh should create the
    broadcast itself (``sc.broadcast(frozenset(grams))``), pass the handle
    here, and ``unpersist()`` the old one after the previous query stops —
    per-call broadcasts are never auto-unpersisted (each live gated stream
    still references its own) and would otherwise accumulate for the
    session lifetime."""
    from pyspark.broadcast import Broadcast

    if isinstance(grams, Broadcast):
        bc = grams
    else:
        sc = docs.sparkSession.sparkContext
        bc = sc.broadcast(frozenset(grams))

    @F.pandas_udf(T.IntegerType())
    def _overlap(gram_arrays: pd.Series) -> pd.Series:
        ev = bc.value
        return gram_arrays.map(
            lambda arr: sum(1 for g in arr if g in ev) if arr is not None else 0
        ).astype("int32")

    doc_grams: Column = word_shingles(F.split(text_col, " "), n)
    # n_grams mirrors the batch aggregate's count(gram)-after-explode_outer:
    # 0 for a doc too short for a single n-gram OR a NULL text (F.size of a
    # NULL array is NULL under default sizeOfNull semantics — coalesce it)
    with_counts = docs.withColumn("__grams", doc_grams).select(
        "*",
        F.coalesce(F.size("__grams"), F.lit(0)).cast("int").alias("n_grams"),
        _overlap(F.col("__grams")).cast("long").alias("n_overlap"),
    )
    ratio = F.when(
        F.col("n_grams") > 0,
        F.col("n_overlap").cast("double") / F.col("n_grams").cast("double"),
    ).otherwise(F.lit(0.0))
    return with_counts.select(
        "*",
        ratio.alias("overlap_ratio"),
        (ratio >= F.lit(ratio_threshold)).alias("is_contaminated"),
    ).drop("__grams")


def contamination_gated_documents(
    docs: DataFrame,
    grams: "set[str] | object",
    *,
    text_col: str = "text",
    n: int = 5,
    ratio_threshold: float = 0.05,
) -> DataFrame:
    """Filter a (streaming or batch) document frame down to rows whose
    n-gram overlap ratio with ``grams`` is BELOW ``ratio_threshold`` — the
    ingestion gate, a select over ``contamination_verdicts`` (see its
    docstring for the broadcast-lifecycle contract of ``grams``)."""
    verdicts = contamination_verdicts(
        docs,
        grams,
        text_col=text_col,
        n=n,
        ratio_threshold=ratio_threshold,
    )
    return verdicts.filter(~F.col("is_contaminated")).drop(
        "n_grams", "n_overlap", "overlap_ratio", "is_contaminated"
    )


def bloom_gated_stream(
    docs_stream: DataFrame,
    eval_set: DataFrame,
    sink_path: str,
    checkpoint_dir: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    ratio_threshold: float = 0.05,
    num_bits: int = 1 << 23,
    num_hashes: int = 5,
    keep_verdicts: bool = False,
    available_now: bool = True,
):
    """The streaming ingestion gate WITHOUT the driver-held gram set (r14
    VERDICT #5): Bloom-tier decontamination over a document stream, exact
    answers, no size ceiling on the eval corpus.

    The stateless gate (:func:`contamination_gated_documents`) collects the
    eval grams to the driver — bounded at ``eval_gram_set``'s ``max_grams``
    cap. Above that cap the per-doc confirm count is unavoidably a JOIN +
    per-doc aggregation, and a streaming aggregation would drag in
    watermarks/update-mode/state stores for what is semantically a
    row-local verdict. The Spark-idiomatic escape is ``foreachBatch``:
    every micro-batch is a bounded DataFrame, so each batch runs the exact
    BATCH Bloom plan (operators/decontaminate.bloom_contamination_verdicts
    — scan-stage bitmap probe, candidates-only shuffle, exact confirm join
    against the distributed eval-gram frame) and lands its survivors in
    the files sink. Nothing is driver- or executor-memory-bound: the only
    driver artifact is the ~``num_bits/8``-byte bitmap (bounded METADATA,
    built once, broadcast to every batch), and the eval grams stay a
    persisted distributed frame.

    Verdict parity with the batch operator is structural (same core
    function), and tests/test_streaming.py asserts the keep/drop sets
    match ngram_contamination on the same corpus — including an eval set
    OVER the exact gate's gram cap.

    Exactly-once: each micro-batch OVERWRITES its own
    ``ingest_batch=<id>`` partition directory, so a replayed batch (sink
    written, commit log not yet advanced) converges instead of
    duplicating files; read the sink root and ``ingest_batch`` surfaces
    as an ordinary partition column. Returns the started StreamingQuery
    (caller awaits termination / manages lifecycle). The eval-gram frame
    is persisted for the query's lifetime; the query's ``stop()``/
    termination does not auto-unpersist it — a long-lived driver that
    rebuilds the gate on eval refresh should call
    ``spark.catalog.clearCache()`` or track and unpersist it (same
    lifecycle contract as contamination_verdicts' broadcast)."""
    from movie_recommendation_etl_spark.operators.decontaminate import (
        bloom_contamination_verdicts,
        build_gram_bloom,
    )
    from movie_recommendation_etl_spark.operators.neardup import (
        word_shingles as _ws,
    )

    spark = docs_stream.sparkSession
    bitmap = build_gram_bloom(
        eval_set, text_col=text_col, n=n, num_bits=num_bits,
        num_hashes=num_hashes,
    )
    bm_df = spark.createDataFrame([(bitmap,)], "bm: array<long>")
    eval_grams = (
        eval_set.select(
            F.explode(_ws(F.split(text_col, " "), n)).alias("gram")
        )
        .distinct()
        .persist()
    )
    verdict_cols = ["n_grams", "n_overlap", "overlap_ratio", "is_contaminated"]

    def _gate_batch(batch_df: DataFrame, batch_id: int) -> None:
        verdicts = bloom_contamination_verdicts(
            batch_df,
            bm_df,
            eval_grams,
            id_col=id_col,
            text_col=text_col,
            n=n,
            ratio_threshold=ratio_threshold,
            num_bits=num_bits,
            num_hashes=num_hashes,
        )
        kept = batch_df.join(
            verdicts.filter(~F.col("is_contaminated")), id_col
        )
        if not keep_verdicts:
            kept = kept.drop(*verdict_cols)
        kept.write.mode("overwrite").parquet(
            f"{sink_path}/ingest_batch={batch_id}"
        )

    writer = docs_stream.writeStream.foreachBatch(_gate_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
