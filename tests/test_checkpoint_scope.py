"""reliable_checkpoint_scope restore semantics (operators/_checkpoint.py,
r5 ADVICE): scopes must restore the checkpoint BASE dir (not the
uuid-suffixed run dir — naive restore nests one uuid level per scope),
unset the dir when none existed before, and clean the run's files up even
when the scope body raises."""

from __future__ import annotations

import glob

import pytest

from movie_recommendation_etl_spark.operators._checkpoint import (
    reliable_checkpoint_scope,
)


def _ckpt_dir(spark) -> str | None:
    opt = spark.sparkContext._jsc.sc().getCheckpointDir()
    return opt.get() if opt.isDefined() else None


def _strip_scheme(p: str) -> str:
    return p.split(":", 1)[1] if p.startswith("file:") else p


def test_unset_restored_when_no_prior_dir(spark, tmp_path):
    base = str(tmp_path / "base")
    assert _ckpt_dir(spark) is None
    with reliable_checkpoint_scope(spark, base) as ckpt:
        inside = _ckpt_dir(spark)
        assert inside is not None and base in inside
        df = ckpt(spark.range(5))
        assert df.count() == 5
    # not left pointing at the (deleted) run dir
    assert _ckpt_dir(spark) is None
    assert not glob.glob(base + "/*")


def test_nested_scopes_restore_base_not_run_dir(spark, tmp_path):
    import os

    outer = str(tmp_path / "outer")
    inner = str(tmp_path / "inner")
    with reliable_checkpoint_scope(spark, outer) as ck_o:
        run_outer_1 = _strip_scheme(_ckpt_dir(spark))
        assert os.path.dirname(run_outer_1) == outer
        with reliable_checkpoint_scope(spark, inner) as ck_i:
            assert inner in _ckpt_dir(spark)
            ck_i(spark.range(3)).count()
        # restored to a fresh run dir DIRECTLY under the outer base —
        # the naive getCheckpointDir restore would nest under run_outer_1
        run_outer_2 = _strip_scheme(_ckpt_dir(spark))
        assert os.path.dirname(run_outer_2) == outer
        ck_o(spark.range(4)).count()
    assert _ckpt_dir(spark) is None
    assert not glob.glob(outer + "/*") and not glob.glob(inner + "/*")


def test_run_files_cleaned_on_exception(spark, tmp_path):
    base = str(tmp_path / "boom")
    with pytest.raises(RuntimeError, match="boom"):
        with reliable_checkpoint_scope(spark, base) as ckpt:
            ckpt(spark.range(10)).count()
            raise RuntimeError("boom")
    assert not glob.glob(base + "/*")
    assert _ckpt_dir(spark) is None


def test_multiple_nested_scopes_leak_no_intermediate_run_dirs(spark, tmp_path):
    """Each nested-scope exit mints a fresh run dir under the outer base;
    with TWO nested scopes the middle dir is neither the outer's entry-time
    nor exit-time dir — only the minted-dir ledger catches it (r7 review)."""
    import os

    outer = str(tmp_path / "outer")
    inner_a = str(tmp_path / "inner_a")
    inner_b = str(tmp_path / "inner_b")
    with reliable_checkpoint_scope(spark, outer) as ck_o:
        with reliable_checkpoint_scope(spark, inner_a) as ck_a:
            ck_a(spark.range(2)).count()
        # outer checkpoints land in minted run dir #2
        ck_o(spark.range(3)).count()
        mid = _strip_scheme(_ckpt_dir(spark))
        assert os.path.dirname(mid) == outer
        with reliable_checkpoint_scope(spark, inner_b) as ck_b:
            ck_b(spark.range(4)).count()
        # ...and now in minted run dir #3
        ck_o(spark.range(5)).count()
    assert _ckpt_dir(spark) is None
    for base in (outer, inner_a, inner_b):
        assert not glob.glob(base + "/*"), base
