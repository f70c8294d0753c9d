"""Crash-safety of merge_upsert_parquet's staged commit (r13 VERDICT #2):
a crash at ANY point either leaves the table byte-identical (before the
journal commit point) or replays to the fully-merged state (after it) —
never a half-rewritten store. The admission stores (q74/q75) hold lifetime
dedup history, so a lossy merge silently re-admits duplicates."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F  # noqa: F401 (parity with siblings)

from movie_recommendation_etl_spark.sources import writers
from movie_recommendation_etl_spark.sources.writers import (
    merge_upsert_parquet,
    recover_pending_merge,
)

SCHEMA = "id int, lang string, ver int, payload string"
B1 = [(1, "en", 1, "a"), (2, "de", 1, "b"), (3, "en", 1, "c")]
B2 = [(2, "de", 2, "B2"), (4, "fr", 2, "d")]
AFTER_B1 = sorted(B1)
AFTER_B2 = sorted([(1, "en", 1, "a"), (2, "de", 2, "B2"), (3, "en", 1, "c"), (4, "fr", 2, "d")])


def _rows(spark, path):
    # partition columns read back last — normalize via asDict
    return sorted(
        (r["id"], r["lang"], r["ver"], r["payload"])
        for r in spark.read.parquet(path).collect()
    )


def _merge(spark, path, rows):
    merge_upsert_parquet(
        spark,
        spark.createDataFrame(rows, SCHEMA),
        path,
        ["id"],
        order_col="ver",
        partition_by=["lang"],
    )


@pytest.fixture
def store(spark, tmp_path):
    path = str(tmp_path / "t")
    _merge(spark, path, B1)
    return path


def _no_merge_dirs(path):
    return not os.path.exists(f"{path}/_merge_staging") and not os.path.exists(
        f"{path}/_merge_journal"
    )


def test_clean_merge_leaves_no_scaffolding(spark, store):
    _merge(spark, store, B2)
    assert _rows(spark, store) == AFTER_B2
    assert _no_merge_dirs(store)


def test_crash_before_commit_leaves_table_intact(spark, store):
    # simulate a crash mid-staging-write: partial staging + an UNCOMMITTED
    # journal dir (no _SUCCESS) — the table proper was never touched
    os.makedirs(f"{store}/_merge_staging/s_1/lang=xx")
    with open(f"{store}/_merge_staging/s_1/lang=xx/part-0-junk.parquet", "wb") as f:
        f.write(b"not parquet")
    os.makedirs(f"{store}/_merge_journal/v_1")
    with open(f"{store}/_merge_journal/v_1/part-0.parquet", "wb") as f:
        f.write(b"not parquet")

    # a plain reader (and read-path recovery) sees the pre-crash state and
    # must NOT delete a possibly-live writer's staging
    assert recover_pending_merge(spark, store) is False
    assert _rows(spark, store) == AFTER_B1
    assert os.path.exists(f"{store}/_merge_staging")

    # the retrying merge purges the garbage and converges
    _merge(spark, store, B2)
    assert _rows(spark, store) == AFTER_B2
    assert _no_merge_dirs(store)


def _crash_with(monkeypatch, fn):
    monkeypatch.setattr(writers, "_apply_merge_journal", fn)


def test_crash_at_commit_point_replays(spark, store, monkeypatch):
    # journal committed (with _SUCCESS), apply never started
    def boom(*a, **k):
        raise RuntimeError("simulated crash")

    _crash_with(monkeypatch, boom)
    with pytest.raises(RuntimeError, match="simulated crash"):
        _merge(spark, store, B2)
    monkeypatch.undo()

    # plain readers still see the OLD state — old files untouched
    assert _rows(spark, store) == AFTER_B1
    # recovery replays to the merged state; second call finds nothing
    assert recover_pending_merge(spark, store) is True
    assert _rows(spark, store) == AFTER_B2
    assert _no_merge_dirs(store)
    assert recover_pending_merge(spark, store) is False
    assert _rows(spark, store) == AFTER_B2


@pytest.mark.parametrize("n_moves", [0, 1])
def test_crash_mid_apply_converges(spark, store, monkeypatch, n_moves):
    """Crash DURING the apply — deletes done, 0 or 1 moves done: the
    admission-store read path (_read_store) auto-replays to the merged
    state (idempotent: re-deletes no-op, completed moves are skipped)."""

    def partial(spark_, path_, entries):
        jvm, fs, _root = writers._hadoop_fs(spark_, path_)
        P = jvm.org.apache.hadoop.fs.Path
        for op, src, _dst in entries:
            if op == "delete":
                fs.delete(P(src), True)
        done = 0
        for op, src, dst in entries:
            if op == "move" and done < n_moves:
                fs.mkdirs(P(dst).getParent())
                assert fs.rename(P(src), P(dst))
                done += 1
        raise RuntimeError("simulated crash mid-apply")

    _crash_with(monkeypatch, partial)
    with pytest.raises(RuntimeError, match="mid-apply"):
        _merge(spark, store, B2)
    monkeypatch.undo()

    from movie_recommendation_etl_spark.operators.incremental_dedup import (
        _read_store,
    )

    got = sorted(
        (r["id"], r["lang"], r["ver"], r["payload"])
        for r in _read_store(spark, store).collect()
    )
    assert got == AFTER_B2
    assert _no_merge_dirs(store)


def test_crash_then_compaction_recovers_first(spark, store, monkeypatch):
    """compact_parquet on a crashed table must apply the pending merge
    BEFORE rewriting files, or the replay would resurrect superseded rows."""

    def boom(*a, **k):
        raise RuntimeError("simulated crash")

    _crash_with(monkeypatch, boom)
    with pytest.raises(RuntimeError):
        _merge(spark, store, B2)
    monkeypatch.undo()

    from movie_recommendation_etl_spark.sources.compact import compact_parquet

    compact_parquet(spark, store)  # healthy store: nothing to compact
    assert _rows(spark, store) == AFTER_B2
    assert _no_merge_dirs(store)


def test_null_partition_value_merges_losslessly(spark, tmp_path):
    """A NULL partition value lands in __HIVE_DEFAULT_PARTITION__; the
    pruning predicate and the delete set must both cover it (isin/== never
    match NULL — with the r14 file-level delete set that mistake would be
    data loss, not just a stale row)."""
    path = str(tmp_path / "t")
    _merge(spark, path, [(1, None, 1, "a"), (2, "de", 1, "b")])
    _merge(spark, path, [(3, None, 1, "c")])
    assert _rows(spark, path) == sorted(
        [(1, None, 1, "a"), (2, "de", 1, "b"), (3, None, 1, "c")]
    )
    # update INSIDE the null partition: old row replaced, not duplicated
    _merge(spark, path, [(1, None, 2, "A2")])
    assert _rows(spark, path) == sorted(
        [(1, None, 2, "A2"), (2, "de", 1, "b"), (3, None, 1, "c")]
    )


def test_unpartitioned_crash_at_commit_point(spark, tmp_path):
    path = str(tmp_path / "t")

    def m(rows):
        merge_upsert_parquet(
            spark, spark.createDataFrame(rows, SCHEMA), path, ["id"], order_col="ver"
        )

    m(B1)

    def boom(*a, **k):
        raise RuntimeError("simulated crash")

    import pytest as _pt

    mp = _pt.MonkeyPatch()
    mp.setattr(writers, "_apply_merge_journal", boom)
    with pytest.raises(RuntimeError):
        m(B2)
    mp.undo()

    assert _rows(spark, path) == AFTER_B1
    assert recover_pending_merge(spark, path) is True
    assert _rows(spark, path) == AFTER_B2
    assert _no_merge_dirs(path)


def test_apply_crash_point_sweep(spark, tmp_path):
    """Exhaustive crash-point sweep at the FS level: interrupt the journal
    apply after EVERY prefix of its delete+move operations, then replay
    via recover_pending_merge — the table must converge to exactly the
    staged state from every interruption point (the disjointness argument
    in _apply_merge_journal's docstring, tested rather than asserted)."""
    import json

    from movie_recommendation_etl_spark.sources.writers import (
        _apply_merge_journal,
        _hadoop_fs,
    )

    def build(root):
        # table with 2 old files; staging with 2 replacement files
        os.makedirs(f"{root}/p=a"), os.makedirs(f"{root}/p=b")
        open(f"{root}/p=a/old1.parquet", "w").write("OLD1")
        open(f"{root}/p=b/old2.parquet", "w").write("OLD2")
        os.makedirs(f"{root}/_merge_staging/s_1/p=a")
        os.makedirs(f"{root}/_merge_staging/s_1/p=c")
        open(f"{root}/_merge_staging/s_1/p=a/new1.parquet", "w").write("NEW1")
        open(f"{root}/_merge_staging/s_1/p=c/new2.parquet", "w").write("NEW2")
        entries = [
            ("delete", f"file:{root}/p=a/old1.parquet", None),
            ("delete", f"file:{root}/p=b/old2.parquet", None),
            ("move", f"file:{root}/_merge_staging/s_1/p=a/new1.parquet",
             f"file:{root}/p=a/new1.parquet"),
            ("move", f"file:{root}/_merge_staging/s_1/p=c/new2.parquet",
             f"file:{root}/p=c/new2.parquet"),
        ]
        os.makedirs(f"{root}/_merge_journal/v_1")
        with open(f"{root}/_merge_journal/v_1/journal.json", "w") as f:
            json.dump(entries, f)
        open(f"{root}/_merge_journal/v_1/_SUCCESS", "w").close()
        return entries

    def state(root):
        out = {}
        for dirpath, _dirs, files in os.walk(root):
            for fn in files:
                p = os.path.join(dirpath, fn)
                out[os.path.relpath(p, root)] = open(p).read()
        return out

    # the fully-applied reference state
    ref_root = str(tmp_path / "ref")
    entries = build(ref_root)
    _apply_merge_journal(spark, ref_root, entries)
    want = state(ref_root)
    assert want == {"p=a/new1.parquet": "NEW1", "p=c/new2.parquet": "NEW2"}

    jvm, fs, _ = _hadoop_fs(spark, ref_root)
    P = jvm.org.apache.hadoop.fs.Path
    for k in range(len(entries) + 1):
        root = str(tmp_path / f"k{k}")
        entries_k = build(root)
        # perform the first k operations exactly as the apply would
        for op, src, dst in entries_k[:k]:
            if op == "delete":
                fs.delete(P(src), True)
            else:
                fs.mkdirs(P(dst).getParent())
                assert fs.rename(P(src), P(dst))
        # ...crash... then the read-path recovery replays to convergence
        assert recover_pending_merge(spark, root) is True
        assert state(root) == want, k
