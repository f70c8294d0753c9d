"""Exact substring dedup (operators/substring_dedup.py): planted shared
passages are removed from every copy, unique text survives, overlapping
windows merge into maximal spans, and the result is partition-independent."""

from __future__ import annotations

import pytest

from movie_recommendation_etl_spark.operators.substring_dedup import (
    remove_duplicate_spans,
)


def _uniq(tag: str, k: int) -> str:
    return " ".join(f"{tag}tok{j}" for j in range(k))


BOILER = " ".join(f"boiler{j}" for j in range(12))  # the shared passage


def _corpus(spark):
    rows = [
        # docs 0-2 share the 12-token boilerplate, embedded differently
        (0, f"{_uniq('a', 10)} {BOILER} {_uniq('b', 10)}"),
        (1, f"{BOILER} {_uniq('c', 15)}"),
        (2, f"{_uniq('d', 7)} {BOILER}"),
        # doc 3 is entirely unique
        (3, _uniq("e", 30)),
        # doc 4 too short to ever match an 8-gram window
        (4, "tiny doc here"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_shared_passage_removed_from_all_copies(spark):
    docs = _corpus(spark)
    out = {
        r["doc_id"]: r
        for r in remove_duplicate_spans(docs, n=8, min_docs=2).collect()
    }
    assert len(out) == 5
    for d in (0, 1, 2):
        assert "boiler0" not in out[d]["clean_text"]
        assert out[d]["n_spans"] == 1  # overlapping windows merged
        # the full 12-token passage went, not just one 8-gram window
        assert out[d]["n_tokens_removed"] == 12
    # unique content is untouched
    assert out[0]["clean_text"] == f"{_uniq('a', 10)} {_uniq('b', 10)}"
    assert out[3]["clean_text"] == _uniq("e", 30)
    assert out[3]["n_tokens_removed"] == 0
    assert out[4]["clean_text"] == "tiny doc here"
    assert out[4]["n_spans"] == 0


def test_within_doc_repeat_not_removed(spark):
    # the same passage twice in ONE doc only: distinct-doc count is 1,
    # so cross-doc substring dedup leaves it alone (q57's territory)
    docs = spark.createDataFrame(
        [(1, f"{BOILER} {BOILER}"), (2, _uniq("z", 30))],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in remove_duplicate_spans(docs, n=8, min_docs=2).collect()
    }
    assert out[1]["n_tokens_removed"] == 0


def test_partition_independent(spark):
    docs = _corpus(spark)
    a = sorted(
        map(tuple, remove_duplicate_spans(docs, n=8).collect())
    )
    b = sorted(
        map(
            tuple,
            remove_duplicate_spans(docs.repartition(7), n=8).collect(),
        )
    )
    assert a == b


def test_rejects_degenerate_n(spark):
    docs = _corpus(spark)
    with pytest.raises(ValueError):
        remove_duplicate_spans(docs, n=1)


def test_plan_has_no_python_or_cartesian(spark):
    docs = _corpus(spark)
    plan = (
        remove_duplicate_spans(docs, n=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_property_unique_corpora_untouched(spark):
    """Property: when no n-gram repeats across docs, every document passes
    through byte-identical (whitespace-normalized)."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=6, deadline=None)
    @given(
        sizes=st.lists(
            st.integers(min_value=0, max_value=40), min_size=1, max_size=12
        ),
        n=st.integers(min_value=2, max_value=10),
    )
    def _check(sizes, n):
        rows = [
            (i, " ".join(f"u{i}q{j}" for j in range(k)))
            for i, k in enumerate(sizes)
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        out = {
            r["doc_id"]: r
            for r in remove_duplicate_spans(docs, n=n).collect()
        }
        assert len(out) == len(rows)
        for i, k in enumerate(sizes):
            assert out[i]["n_tokens_removed"] == 0
            assert out[i]["n_spans"] == 0
            assert out[i]["clean_text"] == rows[i][1]

    _check()
