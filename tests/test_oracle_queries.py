"""Differential test: every registered query with an oracle must match DuckDB
on the small sf dir — the same check the driver runs at sf0.01."""

from __future__ import annotations

import pytest

import movie_recommendation_etl_spark.plans.all  # noqa: F401  (registers queries)
from movie_recommendation_etl_spark.plans.registry import ORACLE, QUERIES
from tests.oracle_harness import compare


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_query_matches_oracle(name, spark, sf_dir, oracle_con):
    df = QUERIES[name](spark, sf_dir)
    result = compare(df, oracle_con, ORACLE[name])
    assert result["ok"], f"{name}: {result}"


def test_every_query_is_oracled():
    """Since r11 every registered query carries an oracle (the ANN/HLL
    paths via contract gates) — the rows-only fallback set must stay
    empty. If a future query genuinely can't be oracled, parametrize a
    rows-only runner again like pre-r11 revisions did."""
    assert sorted(set(QUERIES) - set(ORACLE)) == []
