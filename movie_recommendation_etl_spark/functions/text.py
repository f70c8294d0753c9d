"""Text-analysis expression library: tokenization, language-ID heuristic,
quality scoring, document fingerprints (north-star training-data ops; the
reference's only text handling is the NLP pipeline, transform/execute.py:175-236).

Everything here is a Catalyst expression builder returning ``Column`` — no
Python UDFs, so the whole suite runs inside whole-stage codegen, scales
linearly with input splits, and needs zero shuffles until an aggregate
consumes it.

Determinism policy for oracle parity: per-row arithmetic only (+ - * /),
no transcendentals (exp/log implementations differ across engines in the
last ulp), integer sums via HOFs so token-length statistics are exact.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny English stopword list for the lang-ID heuristic. Must stay in sync
# with SQL_STOPWORDS below (the DuckDB oracle's copy).
STOPWORDS: tuple[str, ...] = ("a", "an", "the", "of", "and", "to", "in", "is", "on", "for", "it")
SQL_STOPWORDS = ", ".join(f"'{w}'" for w in STOPWORDS)

# BPE-ish word pattern: alnum runs (the synthetic corpus is lowercase alnum;
# on real text extend with punctuation classes).
TOKEN_RE = "[a-z0-9]+"


def ws_token_array(col: Column | str) -> Column:
    """Whitespace token array with empty tokens dropped — THE chunking
    tokenization convention (split("") yields [""], size 1, so the filter
    is what keeps an empty doc producing zero chunks). Shared by
    chunk_documents and chunk_documents_by_budget so the two chunkers'
    token streams can never desynchronize."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.trim(c), r"\s+"), lambda t: t != "")


def ws_tokens(col: Column | str) -> Column:
    """Whitespace tokenization (split on single space, like the reference's
    concat_ws(' ') round-trip at transform/execute.py:180)."""
    return F.split(col, " ")


def re_token_count(col: Column | str, pattern: str = TOKEN_RE) -> Column:
    """Regex token count (BPE-ish): number of pattern matches over the
    LOWERCASED text — always equal to ``F.size(re_tokens(col, pattern))``
    (the two share one case-folding convention so budgets computed from
    counts agree with chunk boundaries computed from the token stream;
    without the fold, 'HeLLo' would count 2 [a-z0-9]+ runs but tokenize
    to one)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(F.lower(c), F.lit(pattern))


def re_tokens(col: Column | str, pattern: str = TOKEN_RE) -> Column:
    """Regex tokenization (BPE-ish): the array of pattern matches over the
    lowercased text — the token stream behind re_token_count. Tokens never
    contain whitespace, so concat_ws(' ') round-trips them (the contract
    operators/training_prep.py chunking/materialization relies on when this
    is passed as the ``tokenizer``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(F.lower(c), F.lit(pattern), 0)


def stopword_count(tokens: Column) -> Column:
    """Number of tokens (with multiplicity) that are stopwords."""
    return F.size(F.filter(tokens, lambda x: x.isin(*STOPWORDS)))


def stopword_ratio(tokens: Column) -> Column:
    return stopword_count(tokens).cast("double") / F.size(tokens).cast("double")


def short_token_ratio(tokens: Column, max_len: int = 2) -> Column:
    """Fraction of tokens of length <= max_len (junk-text indicator)."""
    short = F.size(F.filter(tokens, lambda x: F.length(x) <= max_len))
    return short.cast("double") / F.size(tokens).cast("double")


def mean_token_len(tokens: Column) -> Column:
    """Mean token length; the sum is integer (exact), one final division."""
    total = F.aggregate(
        F.transform(tokens, lambda x: F.length(x)),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return total.cast("double") / F.size(tokens).cast("double")


def lang_guess(tokens: Column, threshold: float = 0.15) -> Column:
    """Heuristic language ID: stopword density >= threshold → 'en'.

    At 100 TB this is exactly the kind of cheap first-pass filter that runs
    in the scan stage before any expensive model-based lang-ID."""
    return F.when(stopword_ratio(tokens) >= threshold, F.lit("en")).otherwise(
        F.lit("other")
    )


def quality_score(tokens: Column) -> Column:
    """Composite [0,1] quality score: rewards reasonable length, low
    stopword density, and longer tokens. Pure rational arithmetic — the
    identical formula in SQL produces bit-identical doubles."""
    n = F.size(tokens).cast("double")
    len_term = F.least(n, F.lit(100.0)) / F.lit(100.0)
    stop_term = F.lit(1.0) - stopword_ratio(tokens)
    tok_term = F.least(mean_token_len(tokens), F.lit(10.0)) / F.lit(10.0)
    return (
        F.lit(0.3) * len_term + F.lit(0.4) * stop_term + F.lit(0.3) * tok_term
    )


def token_stats(tokens: Column, finish=None) -> Column:
    """ONE-pass integer stats struct (n, stop, len_sum) over a token
    array — the fused form of ``F.size``, :func:`stopword_count` and
    :func:`mean_token_len`'s length sum (r19, optimization guide §1.2
    "per-task work"). Higher-order functions are CodegenFallback and
    excluded from Spark's subexpression elimination (their trees contain
    LambdaVariables), so every occurrence of filter()/aggregate() in a
    projection or a pushed-down filter re-walks the array AND re-evaluates
    its split() child; folding the three counters into one traversal makes
    metric suites pay one walk instead of one per metric per reference.

    Bit-identical by construction: all three fields use the SAME integer
    arithmetic as the originals (int init, int increments — identical
    values and overflow semantics), so
    :func:`lang_guess_from_stats` / :func:`quality_score_from_stats`
    reproduce :func:`lang_guess` / :func:`quality_score` exactly
    (hash-gated via q72/q80).

    ``finish`` (optional) is passed as the aggregate's finish lambda so a
    caller can compute a whole derived expression — e.g. a composite
    keep/drop decision — INSIDE the single traversal's expression tree,
    referencing the accumulated struct for free instead of re-evaluating
    the fold once per reference."""
    return F.aggregate(
        tokens,
        F.struct(
            F.lit(0).alias("n"),
            F.lit(0).alias("stop"),
            F.lit(0).alias("len_sum"),
        ),
        lambda acc, x: F.struct(
            (acc["n"] + F.lit(1)).alias("n"),
            (
                acc["stop"]
                + F.when(x.isin(*STOPWORDS), F.lit(1)).otherwise(F.lit(0))
            ).alias("stop"),
            (acc["len_sum"] + F.length(x)).alias("len_sum"),
        ),
        finish if finish is not None else (lambda acc: acc),
    )


def lang_guess_from_stats(st: Column, threshold: float = 0.15) -> Column:
    """:func:`lang_guess` recomputed from a :func:`token_stats` struct —
    the identical when/ratio expression over the identical integers, so
    the result is bit-identical to the token-array form."""
    ratio = st["stop"].cast("double") / st["n"].cast("double")
    return F.when(ratio >= threshold, F.lit("en")).otherwise(F.lit("other"))


def quality_score_from_stats(st: Column) -> Column:
    """:func:`quality_score` recomputed from a :func:`token_stats` struct
    — identical formula, identical association order, identical casts, so
    the doubles are bit-identical to the token-array form."""
    n = st["n"].cast("double")
    len_term = F.least(n, F.lit(100.0)) / F.lit(100.0)
    stop_term = F.lit(1.0) - st["stop"].cast("double") / n
    tok_term = (
        F.least(st["len_sum"].cast("double") / n, F.lit(10.0)) / F.lit(10.0)
    )
    return (
        F.lit(0.3) * len_term + F.lit(0.4) * stop_term + F.lit(0.3) * tok_term
    )


def prefix_fingerprint(tokens: Column, k: int = 8) -> Column:
    """md5 of the first k tokens — a cheap near-head fingerprint for
    prefix-duplicate detection (mirrors shingle fingerprinting)."""
    return F.md5(F.concat_ws(" ", F.slice(tokens, 1, k)))
