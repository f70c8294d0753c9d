"""Exact substring deduplication: remove long token spans that repeat
across documents — the "exact substring dedup" stage of the public
Lee-et-al.-2021 / RefinedWeb recipes (boilerplate headers, licence blocks,
templated passages recur verbatim in thousands of pages; document-level
dedup never catches them because the surrounding text differs).

The published implementation builds a corpus-wide suffix array — inherently
sequential and memory-resident. The distributed-native equivalent works at
n-gram-span granularity, entirely in Catalyst:

1. SPAN CANDIDATES: every ``n``-token window of every document, with its
   start position — a scan-stage explode (rows ∝ corpus tokens).
2. DUPLICATED GRAMS: hash-aggregate the windows by their text, keep those
   appearing in ≥ ``min_docs`` DISTINCT documents. A viral gram (shared
   boilerplate) IS a hot key — it stays bounded only because
   count_distinct plans as a two-phase aggregate (partial dedup of
   (gram, doc) on the map side, then a final count per gram), so each
   input partition forwards at most its distinct pairs, never the raw
   copy stream.
3. SPAN MERGE: per document, overlapping/adjacent duplicated windows fuse
   into maximal spans via the gaps-and-islands window pattern (order by
   start; a window opens an island when it starts beyond the running max
   end). Spans per doc are few, so the per-doc window is cheap.
4. REBUILD: one array filter drops the tokens covered by any merged span
   (two-arg HOF lambda over token positions — no Python).

Consecutive repeats inside ONE document are q57's repetition metrics' job;
this operator targets cross-document repeats, so gram counting is by
distinct doc. A window shorter than ``n`` tokens can't match — n sets the
"long enough to be boilerplate, not idiom" bar (the paper uses 50 BPE
tokens; default here is 20 whitespace tokens).

The reference has no substring-level anything; north-star extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def remove_duplicate_spans(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 20,
    min_docs: int = 2,
) -> DataFrame:
    """Remove every maximal token span covered by ``n``-gram windows that
    occur in at least ``min_docs`` distinct documents. Removal applies to
    ALL copies (the Lee et al. policy — any surviving copy re-teaches the
    memorized passage). Returns one row per input document:

      (id_col, clean_text, n_tokens, n_tokens_removed, n_spans)

    Deterministic and partition-independent: every step is a pure function
    of (corpus content, n, min_docs).
    """
    if n < 2:
        raise ValueError("n must be >= 2 (a 1-gram span bar dedups words)")
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    base = docs.select(
        F.col(id_col),
        F.filter(toks, lambda t: t != "").alias("__toks"),
    )

    # 1. candidate windows with start positions (0-based).
    # (word_shingles dedups grams WITHIN the doc; positions need the raw
    # windows, so enumerate starts and slice — posexplode over the
    # (sz - n + 1) starts keeps the gram text and its position together)
    sz = F.size("__toks")
    starts = F.when(
        sz >= n, F.sequence(F.lit(0), sz - n)
    ).otherwise(F.array().cast("array<int>"))
    windows = base.select(
        id_col,
        F.posexplode(starts).alias("__i", "__start"),
        F.concat_ws(
            " ", F.slice("__toks", F.col("__start") + 1, n)
        ).alias("__gram"),
    ).select(id_col, "__start", "__gram")

    # 2. grams in >= min_docs distinct docs (md5 the gram so the shuffle
    # key is fixed-width instead of n tokens of text)
    keyed = windows.select(
        id_col, "__start", F.md5("__gram").alias("__g")
    )
    dup_grams = (
        keyed.groupBy("__g")
        .agg(F.count_distinct(F.col(id_col)).alias("__nd"))
        .filter(F.col("__nd") >= min_docs)
        .select("__g")
    )
    dup_windows = keyed.join(dup_grams, "__g").select(
        id_col, "__start", (F.col("__start") + n).alias("__end")
    )

    # 3. gaps-and-islands merge per doc
    w_order = W.partitionBy(id_col).orderBy("__start")
    with_prev_max = dup_windows.withColumn(
        "__prev_max_end",
        F.max("__end").over(
            w_order.rowsBetween(W.unboundedPreceding, -1)
        ),
    )
    islands = with_prev_max.withColumn(
        "__new_island",
        (
            F.col("__prev_max_end").isNull()
            | (F.col("__start") > F.col("__prev_max_end"))
        ).cast("int"),
    ).withColumn(
        "__island",
        F.sum("__new_island").over(
            w_order.rowsBetween(W.unboundedPreceding, 0)
        ),
    )
    spans = islands.groupBy(id_col, "__island").agg(
        F.min("__start").alias("s"), F.max("__end").alias("e")
    )
    per_doc = spans.groupBy(id_col).agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("s"), F.col("e")))
        ).alias("__spans")
    )

    # 4. rebuild: drop covered token positions (two-arg filter lambda)
    joined = base.join(per_doc, id_col, "left").withColumn(
        "__spans",
        F.coalesce(
            "__spans",
            F.array().cast("array<struct<s:int,e:int>>"),
        ),
    )
    covered = lambda t, i: F.exists(  # noqa: E731
        F.col("__spans"), lambda sp: (i >= sp["s"]) & (i < sp["e"])
    )
    kept = F.filter("__toks", lambda t, i: ~covered(t, i))
    # stage the surviving-token array: clean_text and n_tokens_removed
    # both consume it, and the O(tokens x spans) filter/exists HOF chain
    # would otherwise evaluate once per reference (CodegenFallback, no
    # subexpression elimination — r19, the curate/chunker find)
    joined = joined.select(
        id_col, "__toks", "__spans", kept.alias("__kept")
    )
    return joined.select(
        id_col,
        F.concat_ws(" ", "__kept").alias("clean_text"),
        F.size("__toks").alias("n_tokens"),
        (F.size("__toks") - F.size("__kept")).alias("n_tokens_removed"),
        F.size("__spans").alias("n_spans"),
    )
