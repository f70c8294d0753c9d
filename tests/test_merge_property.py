"""Property-based merge/upsert test: a sequence of merges into a parquet
table must agree with a dict-model fold (order_col authoritative when
given, updates-beat-existing otherwise), for arbitrary generated batches
— including duplicate keys within a batch and null payloads."""

from __future__ import annotations

import uuid

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from movie_recommendation_etl_spark.sources.writers import (
    merge_upsert_parquet,
)

_key = st.integers(min_value=0, max_value=4)
_ver = st.integers(min_value=0, max_value=9)
_payload = st.one_of(st.none(), st.text(alphabet="abc", max_size=2))
_batch = st.lists(
    st.tuples(_key, _ver, _payload), min_size=1, max_size=6
)
_batches = st.lists(_batch, min_size=1, max_size=3)


def _model_merge(batches):
    """Fold the batches the way merge_upsert_parquet defines the survivor:
    per key, (ver, is_update, fingerprint) ranks greatest-first; each merge
    pits the incoming batch (is_update=1) against the table (is_update=0)."""
    import hashlib

    def fp(row):
        k, v, p = row
        parts = [str(k), str(v), "\x00" if p is None else p]
        return hashlib.md5("\x1f".join(parts).encode()).hexdigest()

    table = {}
    for batch in batches:
        contenders = {}
        for row in batch:
            contenders.setdefault(row[0], []).append((row, 1))
        for k, row in table.items():
            contenders.setdefault(k, []).append((row, 0))
        # rank: greatest ver, then updates over existing, then SMALLEST
        # fingerprint (the engine's row_number orders the md5 ascending)
        table = {
            k: min(cands, key=lambda t: (-t[0][1], -t[1], fp(t[0])))[0]
            for k, cands in contenders.items()
        }
    return {(k, v, p) for k, v, p in table.values()}


def test_merge_schema_evolution_adds_column(spark, tmp_path_factory):
    """Mid-stream schema evolution (r3 VERDICT #4): a batch that ADDS a
    column merges align-by-name — pre-evolution rows read the new column
    as NULL; a later batch that OMITS the column keeps it on untouched
    rows but nulls it on rows it replaces (row-level replacement)."""
    out = str(tmp_path_factory.mktemp("merge_evo") / f"t_{uuid.uuid4().hex}")
    b1 = spark.createDataFrame(
        [(1, 1, "a"), (2, 1, "b")], "id: long, ver: long, payload: string"
    )
    merge_upsert_parquet(spark, b1, out, ["id"], order_col="ver")

    # batch 2 adds 'extra' and updates id=2
    b2 = spark.createDataFrame(
        [(2, 2, "b2", "X"), (3, 1, "c", "Y")],
        "id: long, ver: long, payload: string, extra: string",
    )
    merge_upsert_parquet(spark, b2, out, ["id"], order_col="ver")
    got = {
        r["id"]: (r["ver"], r["payload"], r["extra"])
        for r in spark.read.parquet(out).collect()
    }
    assert got == {1: (1, "a", None), 2: (2, "b2", "X"), 3: (1, "c", "Y")}

    # batch 3 omits 'extra' again and replaces id=3: untouched rows keep
    # their extra, the replaced row's extra is NULL (not carried over)
    b3 = spark.createDataFrame(
        [(3, 3, "c3")], "id: long, ver: long, payload: string"
    )
    merge_upsert_parquet(spark, b3, out, ["id"], order_col="ver")
    got = {
        r["id"]: (r["ver"], r["payload"], r["extra"])
        for r in spark.read.parquet(out).collect()
    }
    assert got == {1: (1, "a", None), 2: (2, "b2", "X"), 3: (3, "c3", None)}


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(batches=_batches)
def test_merge_sequence_matches_model(spark, tmp_path_factory, batches):
    out = str(tmp_path_factory.mktemp("merge") / f"t_{uuid.uuid4().hex}")
    for batch in batches:
        df = spark.createDataFrame(
            batch, "id: long, ver: long, payload: string"
        )
        merge_upsert_parquet(spark, df, out, ["id"], order_col="ver")
    got = {tuple(r) for r in spark.read.parquet(out).collect()}
    assert got == _model_merge(batches)


def test_append_only_merges_skip_journal(spark, tmp_path_factory):
    """Empty-delete-set fast path (r14 VERDICT nit): bootstrap and
    brand-new-partition merges supersede no file, so they must write
    DIRECTLY (no _merge_journal version, no _merge_staging leftovers),
    while a superseding merge still takes the journaled path — and the
    resulting table is identical to what the model fold expects."""
    import os

    from movie_recommendation_etl_spark.sources.writers import (
        _MERGE_STAGING_DIR,
    )

    path = str(tmp_path_factory.mktemp("fastpath") / "t")

    def journal_versions():
        d = os.path.join(path, "_merge_journal")
        return sorted(os.listdir(d)) if os.path.isdir(d) else []

    rows1 = [(1, "a", "p1"), (2, "b", "p1")]
    df1 = spark.createDataFrame(rows1, "k long, v string, part string")
    merge_upsert_parquet(
        spark, df1, path, ["k"], partition_by=["part"]
    )
    assert journal_versions() == []  # bootstrap: append-only
    # new partition, untouched existing one: still append-only
    df2 = spark.createDataFrame([(3, "c", "p2")], df1.schema)
    merge_upsert_parquet(
        spark, df2, path, ["k"], partition_by=["part"]
    )
    assert journal_versions() == []
    assert not os.path.isdir(os.path.join(path, _MERGE_STAGING_DIR))
    # superseding merge (k=1 exists in p1): journaled path — p1's old
    # data files are in the delete set and must be REPLACED, not kept
    # beside appended ones (journal dirs retire after apply, so the old
    # file names vanishing is the observable)
    def p1_files():
        d = os.path.join(path, "part=p1")
        return {f for f in os.listdir(d) if not f.startswith(("_", "."))}

    before = p1_files()
    df3 = spark.createDataFrame([(1, "A", "p1")], df1.schema)
    merge_upsert_parquet(
        spark, df3, path, ["k"], partition_by=["part"]
    )
    after = p1_files()
    assert before and after and not (before & after)
    assert journal_versions() == []  # retired after apply
    got = {
        (r["k"], r["v"], r["part"])
        for r in spark.read.parquet(path).collect()
    }
    assert got == {(1, "A", "p1"), (2, "b", "p1"), (3, "c", "p2")}
