"""Incremental near-dup admission (operators/incremental_dedup.py):
cross-batch rejection against the signature store, within-batch
smallest-id-wins, greedy chain semantics, replay idempotence, store growth
bounded to admitted docs, partition-pruned probes, and the reliable
checkpoint path."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F
from pyspark.sql import types as T

from movie_recommendation_etl_spark.operators.incremental_dedup import (
    NUM_HASHES,
    ROWS_PER_BAND,
    admit_new_documents,
)
from movie_recommendation_etl_spark.operators.neardup import CW_P, cw_coeffs

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)

BASE_A = (
    "the quick brown fox jumps over the lazy dog while the bright moon "
    "rises slowly above the quiet hills and the river bends gently south"
)
BASE_B = (
    "pack my box with five dozen liquor jugs before the long train departs "
    "from the old station near the harbor where gulls circle all morning"
)
FRESH = (
    "colorless green ideas sleep furiously under a sky of copper wires "
    "humming ancient songs that nobody alive remembers how to sing anymore"
)
# BASE_A with a few words changed: high shingle overlap, not identical
NEAR_A = (
    "the quick brown fox jumps over the lazy dog while the pale moon "
    "rises slowly above the quiet hills and the river bends gently south"
)


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_incremental_admission_lifecycle(spark, tmp_path):
    store = str(tmp_path / "sig_store")

    # batch 1: two distinct docs, plus a within-batch exact dup of BASE_A
    admitted1 = admit_new_documents(
        spark, _df(spark, [(1, BASE_A), (2, BASE_B), (3, BASE_A)]), store
    )
    ids1 = {r["doc_id"] for r in admitted1.collect()}
    assert ids1 == {1, 2}  # 3 rejected within-batch (smallest id wins)

    # batch 2: a near-dup of stored BASE_A, and a genuinely fresh doc
    admitted2 = admit_new_documents(
        spark, _df(spark, [(10, NEAR_A), (11, FRESH)]), store
    )
    ids2 = {r["doc_id"] for r in admitted2.collect()}
    assert ids2 == {11}  # 10 rejected against the store

    # store holds band rows ONLY for admitted docs
    stored_ids = {
        r["doc_id"]
        for r in spark.read.parquet(store).select("doc_id").distinct().collect()
    }
    assert stored_ids == {1, 2, 11}

    # replay of batch 2 (at-least-once delivery): the fresh doc matches
    # only ITSELF in the store, so it is re-admitted; store is unchanged
    admitted2b = admit_new_documents(
        spark, _df(spark, [(10, NEAR_A), (11, FRESH)]), store
    )
    assert {r["doc_id"] for r in admitted2b.collect()} == {11}
    again = {
        r["doc_id"]
        for r in spark.read.parquet(store).select("doc_id").distinct().collect()
    }
    assert again == {1, 2, 11}
    # idempotent row counts too (merge, not append)
    n_rows = spark.read.parquet(store).count()
    assert n_rows == 3 * 4  # 3 docs x 4 bands


def test_original_columns_pass_through(spark, tmp_path):
    store = str(tmp_path / "sig_store2")
    extra = T.StructType(
        list(SCHEMA.fields) + [T.StructField("source", T.StringType())]
    )
    docs = spark.createDataFrame([(1, BASE_A, "crawl")], extra)
    out = admit_new_documents(spark, docs, store)
    assert out.columns == ["doc_id", "text", "source"]
    assert out.collect()[0]["source"] == "crawl"


def test_incremental_embedding_admission(spark, tmp_path):
    import math

    from movie_recommendation_etl_spark.operators.incremental_dedup import (
        admit_new_embeddings,
    )

    store = str(tmp_path / "emb_store")
    DIM = 8

    def unit(vals):
        n = math.sqrt(sum(v * v for v in vals))
        return [float(v / n) for v in vals]

    base = unit([1, 2, 3, 4, 5, 6, 7, 8])
    near = unit([1.02, 2.01, 3.0, 4.03, 5.0, 6.02, 7.0, 8.01])  # cos ~ 1
    ortho = unit([8, -7, 6, -5, 4, -3, 2, -1])

    schema = "vec_id long, embedding array<double>"

    # batch 1: base + orthogonal, plus a within-batch near copy of base
    a1 = admit_new_embeddings(
        spark,
        spark.createDataFrame([(1, base), (2, ortho), (3, near)], schema),
        store,
        dim=DIM,
    )
    assert {r["vec_id"] for r in a1.collect()} == {1, 2}

    # batch 2: another near-copy (rejected vs store) + a fresh vector
    fresh = unit([0, 1, 0, -1, 0, 1, 0, -1])
    a2 = admit_new_embeddings(
        spark,
        spark.createDataFrame([(10, near), (11, fresh)], schema),
        store,
        dim=DIM,
    )
    assert {r["vec_id"] for r in a2.collect()} == {11}

    # replay converges (self-match excluded, merge idempotent)
    a2b = admit_new_embeddings(
        spark,
        spark.createDataFrame([(10, near), (11, fresh)], schema),
        store,
        dim=DIM,
    )
    assert {r["vec_id"] for r in a2b.collect()} == {11}
    stored = spark.read.parquet(store)
    assert stored.select("vec_id").distinct().count() == 3
    assert stored.count() == 3 * 12  # 96 bits / 8 per band


# --- pure-Python replica of the signature family (hashlib.md5 == F.md5) ----


def _py_sig(text: str, k: int = 3) -> list[int]:
    toks = text.split(" ")
    sh = {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}
    ws = []
    for s in sorted(sh):
        h = hashlib.md5(s.encode()).hexdigest()
        ws.append((int(h[:8], 16), int(h[8:16], 16)))
    return [
        min((a * w1 + b * w2 + c) % CW_P for w1, w2 in ws)
        for a, b, c in cw_coeffs(NUM_HASHES)
    ]


def _py_est(sa: list[int], sb: list[int]) -> float:
    return sum(x == y for x, y in zip(sa, sb)) / NUM_HASHES


def _py_shares_band(sa: list[int], sb: list[int]) -> bool:
    return any(
        sa[j : j + ROWS_PER_BAND] == sb[j : j + ROWS_PER_BAND]
        for j in range(0, NUM_HASHES, ROWS_PER_BAND)
    )


def _py_edge(sa, sb, thr=0.7) -> bool:
    """True iff the operator would consider (a, b) an above-threshold
    band-matching pair — the exact rejection predicate."""
    return _py_shares_band(sa, sb) and _py_est(sa, sb) >= thr


def test_chain_rejection_greedy_by_id(spark, tmp_path):
    """Pin the documented greedy-by-id chain semantics: for A≈B≈C with
    C≉A, C is rejected against B even though B was itself rejected.
    Preconditions are PROVEN in-test with the pure-Python replica of the
    md5 Carter-Wegman family, so the triple genuinely is a chain."""
    common = " ".join(f"base{i}" for i in range(40))
    found = None
    for salt in range(200):
        # sliding 10-token tails overlapping 5: A~B and B~C share half a
        # tail (J≈0.75 — likely edges), A~C share none (J≈0.66 — likely
        # below the 0.7 estimate)
        tail = lambda lo, hi: " ".join(  # noqa: E731
            f"x{salt}t{i}" for i in range(lo, hi)
        )
        a = common + " " + tail(0, 10)
        b = common + " " + tail(5, 15)
        c = common + " " + tail(10, 20)
        sa, sb, sc = _py_sig(a), _py_sig(b), _py_sig(c)
        if _py_edge(sa, sb) and _py_edge(sb, sc) and not _py_edge(sa, sc):
            found = (a, b, c)
            break
    assert found, "no chain triple found in the deterministic search space"
    a, b, c = found
    store = str(tmp_path / "chain_store")
    admitted = admit_new_documents(
        spark, _df(spark, [(1, a), (2, b), (3, c)]), store
    )
    # B dies against A; C dies against the REJECTED B (greedy, not
    # admitted-prefix probing); C's non-edge to A does not save it
    assert {r["doc_id"] for r in admitted.collect()} == {1}


def test_vee_graph_admits_both_roots(spark, tmp_path):
    """The other side of greedy-by-id (module docstring): edges A–C and
    B–C only (no A–B edge) admit BOTH A and B — cluster resolution would
    keep only A. Preconditions proven with the Python replica."""
    found = None
    for salt in range(200):
        shared = " ".join(f"s{salt}w{i}" for i in range(30))
        a = shared + " " + " ".join(f"a{salt}t{i}" for i in range(10))
        b = shared + " " + " ".join(f"b{salt}t{i}" for i in range(10))
        cc = a + " " + " ".join(f"b{salt}t{i}" for i in range(10))
        sa, sb, sc = _py_sig(a), _py_sig(b), _py_sig(cc)
        if _py_edge(sa, sc) and _py_edge(sb, sc) and not _py_edge(sa, sb):
            found = (a, b, cc)
            break
    assert found, "no vee triple found in the deterministic search space"
    a, b, cc = found
    store = str(tmp_path / "vee_store")
    admitted = admit_new_documents(
        spark, _df(spark, [(1, a), (2, b), (3, cc)]), store
    )
    assert {r["doc_id"] for r in admitted.collect()} == {1, 2}


def test_store_partition_pruned_probe(spark, tmp_path):
    """The store is written partitioned by band_pfx and the probe's store
    scan carries a literal IN partition filter over the batch's own
    prefixes — the layout+plan contract that keeps a small batch from
    scanning a 100 TB store."""
    import os
    import re

    from movie_recommendation_etl_spark.operators.incremental_dedup import (
        _band_rows,
        _doc_band_pfx,
        _probe_store,
        _pruned_store,
        _sig_agreement,
        _with_band_pfx,
    )

    store = str(tmp_path / "pfx_store")
    docs = _df(
        spark,
        [(i, " ".join(f"d{i}w{j}" for j in range(25))) for i in range(1, 30)],
    )
    admit_new_documents(spark, docs, store)
    # layout: hive-style band_pfx directories
    pfx_dirs = [d for d in os.listdir(store) if d.startswith("band_pfx=")]
    assert len(pfx_dirs) >= 2

    probe = _df(spark, [(100, " ".join(f"d1w{j}" for j in range(25)))])
    bands = _band_rows(probe, "doc_id", "text", 3).localCheckpoint(eager=True)
    pruned = _pruned_store(
        _with_band_pfx(spark.read.parquet(store), _doc_band_pfx), bands
    )
    plan = (
        _probe_store(
            bands, pruned, key="doc_id",
            sim=lambda l, r: _sig_agreement(
                F.col(f"{l}.sig"), F.col(f"{r}.sig")
            ),
            threshold=0.7,
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    m = re.search(r"PartitionFilters: \[[^\]]*band_pfx[^\]]*IN \(", plan)
    assert m, plan[:2000]
    # and the probe still rejects the planted exact dup
    out = admit_new_documents(spark, probe, store)
    assert out.count() == 0


def test_reliable_checkpoint_dual_path(spark, tmp_path):
    """checkpoint_dir switches the admission barriers to reliable
    checkpoint(); admitted sets and store contents must be identical to
    the localCheckpoint default, the run's reliable files must be cleaned
    up, and the session checkpoint dir must not be hijacked."""
    import glob

    rows1 = [(1, BASE_A), (2, BASE_B), (3, BASE_A)]
    rows2 = [(10, NEAR_A), (11, FRESH)]

    s_default = str(tmp_path / "store_default")
    admit_new_documents(spark, _df(spark, rows1), s_default)
    d2 = admit_new_documents(spark, _df(spark, rows2), s_default)

    ckpt = str(tmp_path / "ckpt")
    s_rel = str(tmp_path / "store_rel")
    admit_new_documents(
        spark, _df(spark, rows1), s_rel, checkpoint_dir=ckpt
    )
    r2 = admit_new_documents(
        spark, _df(spark, rows2), s_rel, checkpoint_dir=ckpt
    )
    assert sorted(map(tuple, d2.collect())) == sorted(map(tuple, r2.collect()))
    stored = lambda p: sorted(  # noqa: E731
        map(tuple, spark.read.parquet(p).drop("band_pfx").collect())
    )
    assert stored(s_default) == stored(s_rel)
    # reliable files cleaned up; session checkpoint dir not hijacked
    assert not glob.glob(ckpt + "/*")
    jsc = spark.sparkContext._jsc.sc()
    assert not jsc.getCheckpointDir().isDefined()


def test_embedding_reliable_checkpoint_dual_path(spark, tmp_path):
    import math

    from movie_recommendation_etl_spark.operators.incremental_dedup import (
        admit_new_embeddings,
    )

    def unit(vals):
        n = math.sqrt(sum(v * v for v in vals))
        return [float(v / n) for v in vals]

    rows = [
        (1, unit([1, 2, 3, 4, 5, 6, 7, 8])),
        (2, unit([8, -7, 6, -5, 4, -3, 2, -1])),
        (3, unit([1.02, 2.01, 3.0, 4.03, 5.0, 6.02, 7.0, 8.01])),
    ]
    schema = "vec_id long, embedding array<double>"
    out_d = admit_new_embeddings(
        spark,
        spark.createDataFrame(rows, schema),
        str(tmp_path / "emb_d"),
        dim=8,
    )
    out_r = admit_new_embeddings(
        spark,
        spark.createDataFrame(rows, schema),
        str(tmp_path / "emb_r"),
        dim=8,
        checkpoint_dir=str(tmp_path / "emb_ckpt"),
    )
    assert {r["vec_id"] for r in out_d.collect()} == {
        r["vec_id"] for r in out_r.collect()
    }


def test_legacy_unpartitioned_store_compat(spark, tmp_path):
    """Stores written before the band_pfx layout (plain parquet, no
    partition dirs, no band_pfx column) still probe correctly — the prefix
    is derived on read."""
    part_store = str(tmp_path / "part_store")
    legacy_store = str(tmp_path / "legacy_store")
    admit_new_documents(spark, _df(spark, [(1, BASE_A), (2, BASE_B)]), part_store)
    # rewrite as the old layout: flat parquet without band_pfx
    spark.read.parquet(part_store).drop("band_pfx").write.parquet(legacy_store)

    out = admit_new_documents(spark, _df(spark, [(10, NEAR_A), (11, FRESH)]), legacy_store)
    assert {r["doc_id"] for r in out.collect()} == {11}
    # the merge kept the store PURE legacy — writing band_pfx into a flat
    # store would null-fill pre-existing rows and a half-populated prefix
    # poisons the pruned probe (NULLs escape the IN filter and the join)
    merged = spark.read.parquet(legacy_store)
    assert "band_pfx" not in merged.columns
    assert merged.select("doc_id").distinct().count() == 3
    replay = admit_new_documents(
        spark, _df(spark, [(10, NEAR_A), (11, FRESH)]), legacy_store
    )
    assert {r["doc_id"] for r in replay.collect()} == {11}


def test_store_compaction_preserves_admission_semantics(spark, tmp_path):
    """Two contracts in one: (1) the admission merge keeps the store
    CONTINUOUSLY compact (out_files_per_partition=1), so OPTIMIZE finds
    nothing to do after any number of small batches; (2) when an external
    writer DOES fragment the store (plain partitioned parquet — any tool
    can append), sources/compact.py restores the layout and the pruned
    probe still rejects the same duplicates afterwards."""
    import os
    import re

    from movie_recommendation_etl_spark.operators.incremental_dedup import (
        _band_rows,
        _doc_band_pfx,
        _probe_store,
        _pruned_store,
        _sig_agreement,
        _with_band_pfx,
    )
    from movie_recommendation_etl_spark.sources.compact import (
        compact_parquet,
    )

    store = str(tmp_path / "frag_store")
    # 6 small batches fragment every band_pfx partition
    for b in range(6):
        batch = _df(
            spark,
            [
                (b * 100 + i, " ".join(f"b{b}d{i}w{j}" for j in range(25)))
                for i in range(1, 6)
            ],
        )
        admit_new_documents(spark, batch, store)

    def store_files():
        out = []
        for root, _dirs, files in os.walk(store):
            out += [f for f in files if f.endswith(".parquet")]
        return out

    # (1) the merge's bounded per-partition file count IS continuous
    # compaction: nothing for OPTIMIZE to do on a healthy store
    assert compact_parquet(spark, store, target_file_bytes=1 << 30) == []

    # (2) fragment externally: append a partitioned re-write of existing
    # rows (any engine can do this to a plain parquet table), then compact
    frag = spark.read.parquet(store)
    frag.limit(20).write.mode("append").partitionBy("band_pfx").parquet(
        store
    )
    before_files = len(store_files())
    before_rows = spark.read.parquet(store).count()
    plans = compact_parquet(spark, store, target_file_bytes=1 << 30)
    assert plans  # the appended files fragmented at least one partition
    assert len(store_files()) < before_files
    assert spark.read.parquet(store).count() == before_rows
    # hive layout intact
    assert any(d.startswith("band_pfx=") for d in os.listdir(store))

    # replay a known duplicate: still rejected, probe still pruned
    dup = _df(spark, [(999, " ".join(f"b0d1w{j}" for j in range(25)))])
    bands = _band_rows(dup, "doc_id", "text", 3).localCheckpoint(eager=True)
    pruned = _pruned_store(
        _with_band_pfx(spark.read.parquet(store), _doc_band_pfx), bands
    )
    plan = (
        _probe_store(
            bands, pruned, key="doc_id",
            sim=lambda l, r: _sig_agreement(
                F.col(f"{l}.sig"), F.col(f"{r}.sig")
            ),
            threshold=0.7,
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert re.search(r"PartitionFilters: \[[^\]]*band_pfx", plan)
    assert admit_new_documents(spark, dup, store).count() == 0


def test_embedding_admission_excludes_degenerate_vectors(spark, tmp_path):
    """NULL / wrong-dim / zero vectors are neither admitted nor stored:
    their SRP bits all fold to zero (one hub bucket per band, probe
    fan-out grows per batch) and their quantized cosine is NULL, so they
    could never be rejected — the invalid-input policy mirrors the doc
    path's zero-shingle drop."""
    from movie_recommendation_etl_spark.operators.incremental_dedup import (
        admit_new_embeddings,
    )

    dim = 8

    def vec(seed):
        return [float((seed * 31 + k * 7) % 13 - 6) for k in range(dim)]

    rows = [
        (1, vec(1)),
        (2, vec(2)),
        (3, [0.0] * dim),          # zero vector
        (4, vec(4)[: dim - 2]),    # wrong length
        (5, None),                 # NULL vector
    ]
    batch = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    store = str(tmp_path / "emb_store")
    admitted = {
        r["vec_id"]
        for r in admit_new_embeddings(
            spark, batch, store, dim=dim
        ).collect()
    }
    assert admitted == {1, 2}
    stored = {
        r["vec_id"] for r in spark.read.parquet(store).collect()
    }
    assert stored == {1, 2}  # no degenerate signatures in the store


def test_bucket_candidate_cap_bounds_viral_batch(spark, tmp_path):
    """max_bucket_candidates (r15, opt-in): a viral near-identical
    cluster shares band values, so the uncapped intra/probe joins are
    quadratic in cluster size. With the cap, every incoming cluster
    member still rejects (the cap keeps the SMALLEST-id candidates,
    which the greedy-by-id policy makes the matching ones), distinct
    docs still admit, and on a clean corpus the capped and uncapped
    admitted sets are identical."""
    from movie_recommendation_etl_spark.operators.incremental_dedup import (
        admit_new_documents,
    )

    template = " ".join(f"v{j}" for j in range(20))
    viral = [(i, f"{template} u{i % 7}") for i in range(300)]
    fresh = [
        (1000 + i, " ".join(f"d{i}x{j}" for j in range(15)))
        for i in range(5)
    ]
    batch = spark.createDataFrame(
        viral + fresh, "doc_id long, text string"
    )
    store = str(tmp_path / "viral_store")
    admitted = admit_new_documents(
        spark, batch, store, sim_threshold=0.5, max_bucket_candidates=4
    )
    ids = {r["doc_id"] for r in admitted.collect()}
    # the viral cluster collapses to its 7 distinct-suffix variants at
    # most (greedy smallest-id survivors); every fresh doc admits
    assert {1000 + i for i in range(5)} <= ids
    assert len(ids & set(range(300))) <= 7
    # a second viral wave rejects against the capped STORE probe too
    wave2 = spark.createDataFrame(
        [(5000 + i, f"{template} u{i % 7}") for i in range(50)],
        "doc_id long, text string",
    )
    admitted2 = admit_new_documents(
        spark, wave2, store, sim_threshold=0.5, max_bucket_candidates=4
    )
    assert admitted2.count() == 0

    # clean-corpus parity: capped == uncapped admitted sets
    clean = spark.createDataFrame(
        [
            (i, " ".join(f"c{i}w{j}" for j in range(12)))
            for i in range(30)
        ]
        + [(100, " ".join(f"c3w{j}" for j in range(12)))],  # dup of 3
        "doc_id long, text string",
    )
    s1, s2 = str(tmp_path / "cap_s1"), str(tmp_path / "cap_s2")
    got_capped = {
        r["doc_id"]
        for r in admit_new_documents(
            spark, clean, s1, sim_threshold=0.5, max_bucket_candidates=8
        ).collect()
    }
    got_exact = {
        r["doc_id"]
        for r in admit_new_documents(
            spark, clean, s2, sim_threshold=0.5
        ).collect()
    }
    assert got_capped == got_exact
    assert 100 not in got_exact  # the planted dup rejected in both

    # cap=0 must be a loud error, not a silent uncapped no-op (r15 ADVICE)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="max_bucket_candidates"):
        admit_new_documents(
            spark, clean, s2, sim_threshold=0.5, max_bucket_candidates=0
        )
