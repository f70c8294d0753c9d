"""One-call document curation pipeline: the composition a training-data
ingest actually runs, assembled from the individually-oracle-checked pieces.

Order matters and is fixed by cost: all scan-stage filters first (language,
quality, repetition — pure codegen projections, no shuffle), then PII
redaction (still scan-stage), then the one shuffle (content dedup), then the
optional deterministic sample (scan-stage again, applied last so sampling
rates compose with dedup rates predictably). At 100 TB the pre-shuffle
filters are what make the dedup shuffle affordable: a 60% scan-stage kill
rate is 60% less data on the wire.

Pieces: lang/quality scoring from functions/text.py (q40/q41 oracles),
repetition metrics in the scan-stage form of q57, PII patterns from
plans/curation.py (q56 oracle), deterministic-survivor dedup from
operators/dedup.py (q18/q42 oracles), hash-mod sampling in the q55 pattern.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from movie_recommendation_etl_spark.functions.text import (
    lang_guess_from_stats,
    quality_score_from_stats,
    token_stats,
    ws_tokens,
)
from movie_recommendation_etl_spark.operators.dedup import (
    dedup_keep_first,
    fingerprint,
)

_SAMPLE_MOD = 1 << 20

# Real-text PII patterns. Deliberately NOT the q56 oracle patterns
# (plans/curation.py), which are lowercase-only because that synthetic
# corpus plants lowercase PII: real documents carry mixed case, +, _, -
# in addresses, and various phone shapes — a lowercase-only pattern would
# silently leak those through the "redacted" output.
EMAIL_RE = r"(?i)[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
PHONE_RE = r"(?:\+?1[-. ])?\(?[0-9]{3}\)?[-. ][0-9]{3}[-. ][0-9]{4}"


def curate_documents(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    langs: tuple[str, ...] | None = ("en",),
    min_quality: float = 0.5,
    max_dup_token_frac: float = 0.6,
    max_dup_2gram_frac: float = 0.8,
    redact_pii: bool = True,
    dedup: bool = True,
    sample_fraction: float | None = None,
    sample_unif: Column | None = None,
    extra_filter: Column | None = None,
) -> DataFrame:
    """Filter → redact → dedup → sample. Returns surviving rows with the
    (possibly redacted) text plus the computed ``lang``, ``quality`` and
    ``n_tokens`` columns kept for downstream routing. Every stage is
    deterministic, so reruns produce byte-identical corpora (the property
    the merge sink and goldens rely on).

    ``extra_filter`` composes an additional boolean column into the
    scan-stage filter block — the intended hook for a model-based quality
    gate (operators/quality_model.py:scoring_expr(model) >= tau bakes the
    fitted classifier into the same codegen stage as the heuristics; no
    MLlib at serve time) or any bespoke predicate. It runs after the
    heuristic filters and before redaction/dedup/sampling.

    ``sample_unif`` optionally supplies the uniform-[0,1) variate the sample
    stage thresholds (``sample_unif < sample_fraction``) instead of the
    default xxhash64 form — e.g. the md5-hex form (q55/q58 pattern) when the
    run must be replayable in an engine without xxhash64 (the DuckDB
    correctness oracle). The default stays xxhash64: one 8-byte hash per row
    beats an md5 + hex parse in the 100 TB scan stage.
    """
    # r19 rewrite of the filter/metric stage (optimization guide §1.2 /
    # §4.4 — measured on the q72 plan): the old withColumn-then-filter
    # chain let predicate pushdown substitute the FULL lang/quality/dup
    # expression trees below the metric projection, so every scanned row
    # evaluated the suite once in the pushed Filter and every survivor
    # AGAIN in the Project — and HOFs (filter/aggregate/transform over the
    # token array) are CodegenFallback, excluded from subexpression
    # elimination, so split(text) re-ran once per HOF occurrence (~14x per
    # row in the pushed filter). Worse, the 2-gram construction referenced
    # the OUTER token array via element_at inside its transform lambda —
    # re-tokenizing the whole document once per token position (O(n^2)
    # chars per doc; operators/neardup.py's word_ngrams had the zip_with
    # fix since r2, this inline copy never got it).
    #
    # New shape, bit-identical outputs (q72/q80 hashes + pytest gate):
    # - ONE keep-decision expression: a single token_stats fold whose
    #   finish lambda computes the entire filter boolean, referencing the
    #   distinct-count and 2-gram subtrees exactly once each — the pushed
    #   scan filter now walks the token array once, the distinct set once,
    #   and the zip_with grams once per row.
    # - Survivor metrics (n_tokens, lang, quality) derive from a staged
    #   __st struct computed once per surviving row (CollapseProject keeps
    #   multi-referenced non-cheap aliases staged).
    # - 2-grams via word_ngrams(toks, 2) — the zip_with form, identical
    #   strings, O(n) instead of O(n^2).
    from movie_recommendation_etl_spark.operators.neardup import word_ngrams

    toks = ws_tokens(F.col(text_col))
    n_uniq = F.size(F.array_distinct(toks))
    gd = F.size(F.array_distinct(word_ngrams(toks, 2, distinct=False)))

    def _keep(st: Column) -> Column:
        keep = st["n"] > 0
        if langs is not None:
            keep = keep & lang_guess_from_stats(st).isin(list(langs))
        keep = keep & (quality_score_from_stats(st) >= min_quality)
        dup_tok = 1.0 - n_uniq.cast("double") / st["n"].cast("double")
        keep = keep & (dup_tok <= max_dup_token_frac)
        dup_2gram = F.when(
            st["n"] > 1,
            1.0 - gd.cast("double") / (st["n"] - 1),
        ).otherwise(F.lit(0.0))
        return keep & (dup_2gram <= max_dup_2gram_frac)

    # Staging-name guard (r20, ADVICE r19): select("*", ...) appends the
    # temp column literally, so an input frame already carrying __st would
    # produce a duplicate-name frame and ambiguous field reads below —
    # same convention as the other __-temp collisions this module rejects.
    if "__st" in docs.columns:
        raise ValueError(
            "curate_documents: input frame already has a '__st' column "
            "(reserved as this operator's staging name); rename it first"
        )
    out = docs.filter(token_stats(toks, finish=_keep))
    # staged projection: __st evaluates once per survivor; the metric
    # columns above it are cheap field reads + scalar arithmetic.
    # withColumn-equivalent column placement: an input column named
    # n_tokens/lang/quality is REPLACED in place (the old chain's
    # semantics), new names append in the same order as before.
    st = F.col("__st")
    metric_cols = {
        "n_tokens": st["n"],
        "lang": lang_guess_from_stats(st),
        "quality": quality_score_from_stats(st),
    }
    sel = [
        metric_cols.pop(c).alias(c) if c in metric_cols else F.col(c)
        for c in docs.columns
    ]
    sel += [expr.alias(name) for name, expr in metric_cols.items()]
    out = out.select("*", token_stats(toks).alias("__st")).select(*sel)

    if extra_filter is not None:
        out = out.filter(extra_filter)

    if redact_pii:
        out = out.withColumn(
            text_col,
            F.regexp_replace(
                F.regexp_replace(F.col(text_col), EMAIL_RE, "[EMAIL]"),
                PHONE_RE,
                "[PHONE]",
            ),
        )

    if dedup:
        out = out.withColumn("__fp", fingerprint(F.col(text_col)))
        out = dedup_keep_first(
            out, ["__fp"], [F.col(id_col)]
        ).drop("__fp")

    if sample_fraction is not None:
        if sample_unif is not None:
            out = out.filter(sample_unif < F.lit(float(sample_fraction)))
        else:
            out = out.filter(
                F.pmod(F.xxhash64(F.col(id_col)), F.lit(_SAMPLE_MOD))
                < int(_SAMPLE_MOD * sample_fraction)
            )
    return out
