"""BPE tokenizer: deterministic training, encode parity with the pure
reference, round-trip, model persistence, and budget-chunker integration."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from movie_recommendation_etl_spark.ml.bpe import (
    EOW,
    bpe_costs_array,
    bpe_token_count,
    bpe_tokens,
    encode_word,
    load_bpe_model,
    save_bpe_model,
    train_bpe,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (i, "the thin thatch there " * 10 + f"rare{i} token{i}")
        for i in range(40)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def model(corpus):
    return train_bpe(corpus, num_merges=60)


def test_training_is_deterministic_and_matches_python_replay(corpus, model):
    """Re-training yields byte-identical merges, and the first merge is
    the globally most frequent symbol pair of the word-frequency table —
    replayed independently in Python from the same corpus."""
    again = train_bpe(corpus, num_merges=60)
    assert again.merges == model.merges

    freq: dict[str, int] = {}
    for _, text in corpus.collect():
        for w in text.split():
            freq[w] = freq.get(w, 0) + 1
    pairs: dict[tuple, int] = {}
    for w, f in freq.items():
        sym = tuple(w) + (EOW,)
        for a, b in zip(sym, sym[1:]):
            pairs[(a, b)] = pairs.get((a, b), 0) + f
    best = max(pairs.items(), key=lambda kv: (kv[1], kv[0]))[0]
    assert model.merges[0] == best
    # 'the' dominates the corpus: with 60 merges it encodes as ONE token
    assert encode_word("the", model.ranks) == ["the" + EOW]


def test_udf_encode_matches_reference_and_round_trips(spark, model):
    words = ["the", "thatch", "thither", "zzz", "a", "token7", "rare33"]
    df = spark.createDataFrame(
        [(w,) for w in words], "text string"
    ).withColumn("toks", bpe_tokens(model, "text"))
    got = {r["text"]: list(r["toks"]) for r in df.collect()}
    for w in words:
        assert got[w] == encode_word(w, model.ranks)
        # lossless: tokens concatenate back to the word + EOW marker
        assert "".join(got[w]) == w + EOW
    # multi-word text = concatenation of per-word encodings
    two = spark.createDataFrame(
        [("the thatch",)], "text string"
    ).select(bpe_tokens(model, "text").alias("t")).first()["t"]
    assert list(two) == encode_word("the", model.ranks) + encode_word(
        "thatch", model.ranks
    )


def test_token_count_column(spark, model):
    df = spark.createDataFrame(
        [(1, "the thatch zzz"), (2, ""), (3, None)],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["n"]
        for r in df.select(
            "doc_id", bpe_token_count(model, "text").alias("n")
        ).collect()
    }
    expect1 = sum(
        len(encode_word(w, model.ranks)) for w in "the thatch zzz".split()
    )
    assert got[1] == expect1 and got[2] == 0 and got[3] == 0


def test_model_parquet_roundtrip(spark, model, tmp_path):
    path = str(tmp_path / "bpe_model")
    save_bpe_model(spark, model, path)
    assert load_bpe_model(spark, path).merges == model.merges


def test_budget_chunking_by_bpe_cost(spark, corpus, model):
    """chunk_documents_by_budget(costs_array_fn=bpe_costs_array(model)):
    boundaries replayed by a pure-Python greedy over the same per-word
    BPE costs; original text preserved; no shuffle added by the Arrow
    costing stage."""
    from movie_recommendation_etl_spark.operators.training_prep import (
        chunk_documents_by_budget,
    )

    budget = 16
    out = chunk_documents_by_budget(
        corpus,
        budget=budget,
        costs_array_fn=bpe_costs_array(model),
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # still a pure scan-stage fold

    got = {}
    for r in out.collect():
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["chunk_text"], r["budget_cost"])
        )
    for doc_id, text in corpus.collect():
        toks = text.split()
        costs = [len(encode_word(w, model.ranks)) for w in toks]
        # python greedy replay
        chunks, acc = [], None
        for w, c in zip(toks, costs):
            if acc is None or acc + c > budget:
                chunks.append(([w], c))
                acc = c
            else:
                chunks[-1][0].append(w)
                chunks[-1] = (chunks[-1][0], chunks[-1][1] + c)
                acc += c
        expect = [
            (i, " ".join(ws), cost) for i, (ws, cost) in enumerate(chunks)
        ]
        assert sorted(got[doc_id]) == expect, doc_id
        # conservation: chunk texts concatenate to the ws-token stream
        joined = " ".join(t for _, t, _ in sorted(got[doc_id]))
        assert joined.split() == toks


def test_cost_fn_and_costs_array_fn_are_exclusive(spark, corpus, model):
    from movie_recommendation_etl_spark.operators.training_prep import (
        chunk_documents_by_budget,
    )

    with pytest.raises(ValueError):
        chunk_documents_by_budget(
            corpus,
            budget=8,
            cost_fn=lambda t: F.length(t),
            costs_array_fn=bpe_costs_array(model),
        )


# --- property tests (pure-python encode core; no Spark per example) --------

from hypothesis import given, settings
from hypothesis import strategies as st

_WORD = st.text(
    alphabet=st.characters(
        blacklist_categories=("Zs", "Zl", "Zp", "Cc", "Cs")
    ),
    min_size=1,
    max_size=24,
)


@settings(max_examples=200, deadline=None)
@given(word=_WORD)
def test_encode_round_trips_any_word(word):
    # a small static rank table exercises the merge walk including
    # multi-char merges (fixtures can't feed @given)
    ranks = {
        ("t", "h"): 0,
        ("th", "e"): 1,
        ("e", EOW): 2,
        ("the", EOW): 3,
    }
    toks = encode_word(word, ranks)
    assert "".join(toks) == word + EOW
    assert all(tok for tok in toks)


@settings(max_examples=100, deadline=None)
@given(words=st.lists(_WORD, min_size=1, max_size=8))
def test_text_cost_is_sum_of_word_costs(words):
    ranks = {("a", "b"): 0, ("ab", EOW): 1, ("c", "d"): 2}
    total = sum(len(encode_word(w, ranks)) for w in words)
    # the engine's text-level count is definitionally the per-word sum —
    # pin it so a future text-level shortcut can't drift
    assert total >= len(words)
    for w in words:
        assert len(encode_word(w, ranks)) <= len(w) + 1
