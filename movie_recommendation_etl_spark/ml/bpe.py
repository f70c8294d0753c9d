"""Byte-pair-encoding tokenizer: bounded-sample training, Arrow-batched
distributed encode.

Token BUDGETS drive every training-data decision this engine makes
(chunking, packing, shard sizing), and the ws/regex counters in
functions/text.py are approximations of what a real trainer's tokenizer
would charge. This module adds the real thing — the classic subword BPE of
Sennrich et al. 2016 ("Neural Machine Translation of Rare Words with
Subword Units", the public GPT-2/SentencePiece recipe): train merge rules
from word frequencies, then encode any text as subword tokens whose count
IS the budget unit.

Spark-first split of the work:
- TRAINING is two bounded steps. (1) The word-frequency table is computed
  DISTRIBUTED — one scan of a hash-mod + ``limit``-capped document sample
  (the fit_ivf_centroids sampling discipline), explode to ws tokens, one
  count aggregate, and a deterministic top-``max_vocab_words`` collect
  (count desc, token asc — rerun-stable). (2) The merge loop itself runs
  driver-side in pure Python over that bounded frequency dict: each
  iteration needs the GLOBAL argmax pair count, which on a cluster would
  be one full aggregate job per merge (thousands of jobs for a real
  vocab) — the public implementations all train driver/single-node from a
  frequency table for exactly this reason; the corpus-scale cost is only
  the one counting scan.
- ENCODE is an Arrow ``pandas_udf`` with a per-batch word cache (word ->
  encoding memo: natural text repeats words heavily, so each distinct
  word pays the merge walk once per batch). The sanctioned pandas
  boundary: the rank-min merge walk is a per-word dynamic loop Catalyst
  cannot express. Merge ranks ride the serialized closure to executors.

Tokens use the classic end-of-word marker (``</w>`` appended as its own
symbol and fused by merges) and never contain whitespace, so they satisfy
the chunker's token contract (operators/training_prep.py). The model
persists as a plain parquet of (rank, left, right) — engine-portable, no
pickle.

The reference has no tokenizer beyond Spark-NLP's word tokenizer
(transform/execute.py:224-238 normalizer/lemmatizer chain); this is a
north-star training-data extension.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SAMPLE_MOD = 1 << 20
EOW = "</w>"


@dataclass(frozen=True, eq=False)
class BPEModel:
    """Ordered merge rules; rank = list position (lower merges first)."""

    merges: tuple  # tuple[tuple[str, str], ...]

    @property
    def ranks(self) -> dict:
        return {pair: i for i, pair in enumerate(self.merges)}


def _merge_word(word: tuple, pair: tuple) -> tuple:
    out = []
    i = 0
    while i < len(word):
        if i + 1 < len(word) and (word[i], word[i + 1]) == pair:
            out.append(word[i] + word[i + 1])
            i += 2
        else:
            out.append(word[i])
            i += 1
    return tuple(out)


def train_bpe(
    docs: DataFrame,
    text_col: str = "text",
    *,
    num_merges: int = 200,
    id_col: str | None = None,
    max_fit_rows: int = 100_000,
    sample_fraction: float | None = None,
    max_vocab_words: int = 100_000,
) -> BPEModel:
    """Learn ``num_merges`` merge rules from a bounded corpus sample.

    Deterministic given a fixed input layout: the sampling slice is
    hash-mod (rerun-stable), the collected frequency table is ordered
    (count desc, token asc), and merge ties break lexicographically on
    the pair. When the (sampled) corpus fits under ``max_fit_rows`` the
    model is byte-identical across runs regardless of layout; above the
    cap the unordered ``limit`` keeps whichever rows the scan reaches
    first, so byte-identity additionally requires the same partition
    layout (pick ``sample_fraction`` so the hash slice alone fits under
    the cap when strict reproducibility matters — the same caveat as
    ``fit_pq``/``fit_ivf_centroids``).
    """
    if sample_fraction is not None:
        key = F.col(id_col) if id_col else F.col(text_col)
        docs = docs.filter(
            F.pmod(F.xxhash64(key), F.lit(_SAMPLE_MOD))
            < int(_SAMPLE_MOD * sample_fraction)
        )
    freq_rows = (
        docs.select(text_col)
        .limit(max_fit_rows)
        .select(F.explode(F.split(text_col, r"\s+")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .count()
        .orderBy(F.col("count").desc(), F.col("w"))
        .limit(max_vocab_words)
        .collect()
    )
    vocab: dict[tuple, int] = {}
    for r in freq_rows:
        sym = tuple(r["w"]) + (EOW,)
        vocab[sym] = vocab.get(sym, 0) + int(r["count"])

    # Incremental merge loop (the Sennrich reference shape): pair counts
    # and a pair -> word-index occurrence map are maintained across
    # iterations, and each merge touches ONLY the words containing the
    # merged pair. The naive recount-everything loop is
    # O(num_merges x vocab x word_len) — at the CLI defaults (2000
    # merges, 100k words) that is billions of driver-side dict ops for a
    # job whose distributed part finishes in seconds.
    syms: list[tuple] = list(vocab.keys())
    freqs: list[int] = [vocab[w] for w in syms]
    pair_counts: dict[tuple, int] = {}
    where: dict[tuple, set] = {}

    def _add(i: int, sign: int) -> None:
        w, f = syms[i], freqs[i] * sign
        for p in zip(w, w[1:]):
            c = pair_counts.get(p, 0) + f
            if c:
                pair_counts[p] = c
            else:
                pair_counts.pop(p, None)
            if sign > 0:
                where.setdefault(p, set()).add(i)
            # stale occurrence entries are filtered at use — a word may
            # still contain the pair elsewhere after one removal

    for i in range(len(syms)):
        _add(i, +1)

    merges: list[tuple] = []
    for _ in range(num_merges):
        if not pair_counts:
            break
        best = max(pair_counts.items(), key=lambda kv: (kv[1], kv[0]))[0]
        merges.append(best)
        for i in sorted(where.pop(best, ())):
            w = syms[i]
            if best not in zip(w, w[1:]):  # stale index
                continue
            _add(i, -1)
            syms[i] = _merge_word(w, best)
            _add(i, +1)
    return BPEModel(merges=tuple(merges))


def encode_word(word: str, ranks: dict) -> list[str]:
    """Pure-Python single-word encode (the reference the UDF and tests
    share): greedy lowest-rank merge walk over chars + the EOW marker."""
    sym = list(word) + [EOW]
    while len(sym) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def bpe_tokens(model: BPEModel, text: Column | str) -> Column:
    """text -> array<string> of subword tokens (whole document). Arrow-
    batched; per-batch word memo."""
    ranks = model.ranks

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _enc(texts):
        import pandas as pd

        memo: dict[str, list[str]] = {}

        def enc_text(t):
            if t is None:
                return []
            out: list[str] = []
            for w in t.split():
                got = memo.get(w)
                if got is None:
                    got = memo[w] = encode_word(w, ranks)
                out.extend(got)
            return out

        return pd.Series([enc_text(t) for t in texts])

    c = F.col(text) if isinstance(text, str) else text
    return _enc(c)


def bpe_token_count(model: BPEModel, text: Column | str) -> Column:
    """Per-document subword token count (the budget a real trainer
    charges)."""
    return F.size(bpe_tokens(model, text))


def bpe_costs_array(model: BPEModel):
    """Factory for operators/training_prep.py:chunk_documents_by_budget's
    ``costs_array_fn`` hook: maps the ws-token ARRAY column to the
    per-token subword costs in one Arrow batch (word memo shared across
    the batch), so budget chunking charges real tokenizer units while
    still shipping the original text."""
    ranks = model.ranks

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _costs(tok_arrays):
        import pandas as pd

        memo: dict[str, int] = {}

        def cost(w):
            got = memo.get(w)
            if got is None:
                got = memo[w] = len(encode_word(w, ranks))
            return got

        return pd.Series(
            [
                [cost(w) for w in arr] if arr is not None else []
                for arr in tok_arrays
            ]
        )

    return lambda toks_col: _costs(
        F.col(toks_col) if isinstance(toks_col, str) else toks_col
    )


def save_bpe_model(spark, model: BPEModel, path: str) -> None:
    from movie_recommendation_etl_spark.sources.writers import (
        write_local_rows_parquet,
    )

    rows = [(i, a, b) for i, (a, b) in enumerate(model.merges)]
    # single-slice local write, not coalesce(1) — see write_local_rows_parquet
    write_local_rows_parquet(
        spark,
        rows,
        "rank: int, left: string, right: string",
        path,
        mode="overwrite",
    )


def load_bpe_model(spark, path: str) -> BPEModel:
    rows = spark.read.parquet(path).orderBy("rank").collect()
    return BPEModel(
        merges=tuple((r["left"], r["right"]) for r in rows)
    )
