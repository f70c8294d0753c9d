"""Training-prep tests: chunk boundaries/overlap reconstruct the document,
the shuffle is deterministic and seed-sensitive, shards are hash-ordered."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F
from pyspark.sql import types as T

from movie_recommendation_etl_spark.operators.training_prep import (
    chunk_documents,
    write_training_shards,
)

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)


def _doc(n_tokens: int) -> str:
    return " ".join(f"t{i}" for i in range(n_tokens))


def test_chunking_covers_document_with_overlap(spark):
    docs = spark.createDataFrame(
        [(1, _doc(25)), (2, _doc(10)), (3, _doc(0)), (4, _doc(1))], SCHEMA
    )
    out = chunk_documents(
        docs, chunk_tokens=10, overlap_tokens=3
    ).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)

    # doc 3 (empty) yields nothing; doc 2/4 fit in one chunk
    assert set(by_doc) == {1, 2, 4}
    assert len(by_doc[2]) == 1 and by_doc[2][0]["chunk_text"] == _doc(10)
    assert len(by_doc[4]) == 1 and by_doc[4][0]["chunk_text"] == "t0"

    # doc 1: starts 0,7,14,21 -> 4 chunks, consecutive chunks share 3 tokens
    chunks = sorted(by_doc[1], key=lambda r: r["chunk_idx"])
    assert len(chunks) == 4
    toks = [c["chunk_text"].split() for c in chunks]
    assert toks[0] == [f"t{i}" for i in range(10)]
    for prev, cur in zip(toks, toks[1:]):
        assert prev[-3:] == cur[:3]  # overlap
    # the union of chunks reconstructs the document exactly
    seen = toks[0]
    for cur in toks[1:]:
        seen += cur[3:]
    assert seen == _doc(25).split()
    # last chunk is short, n_tokens reports its real size
    assert chunks[-1]["n_tokens"] == 4


def test_no_trailing_all_overlap_chunk(spark):
    # 13 tokens, chunk 10 / overlap 3 -> starts 0, 7; a start at 14 never
    # exists, and a start at 10 (if stepping wrongly) would add tokens —
    # verify the exact boundary: 10 tokens + overlap==remaining
    docs = spark.createDataFrame([(1, _doc(10 + 3))], SCHEMA)
    out = chunk_documents(docs, chunk_tokens=10, overlap_tokens=3).collect()
    assert [r["chunk_idx"] for r in sorted(out, key=lambda r: r["chunk_idx"])] == [0, 1]


def test_sharded_shuffle_deterministic(spark, tmp_path):
    docs = spark.createDataFrame(
        [(i, f"doc number {i}") for i in range(500)], SCHEMA
    )
    p1, p2, p3 = (str(tmp_path / n) for n in ("s1", "s2", "s3"))
    write_training_shards(docs, p1, seed=7, num_shards=4)
    write_training_shards(docs, p2, seed=7, num_shards=4)
    write_training_shards(docs, p3, seed=8, num_shards=4)

    assert len(glob.glob(f"{p1}/*.parquet")) == 4

    def order(p):
        return [
            r["doc_id"]
            for r in spark.read.parquet(p)
            .orderBy("__shuffle_key", "doc_id")
            .collect()
        ]

    a, b, c = order(p1), order(p2), order(p3)
    assert a == b  # same seed -> identical order
    assert a != c  # new seed -> reshuffled
    assert sorted(a) == sorted(c) == list(range(500))  # nothing lost


def test_end_to_end_training_pipeline(spark, sf_dir, tmp_path):
    """The full last mile over real testdata: curate -> chunk -> shuffle ->
    shards; every surviving chunk is traceable to a curated doc."""
    import glob as _glob

    from movie_recommendation_etl_spark.operators.curate import (
        curate_documents,
    )
    from movie_recommendation_etl_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    curated = curate_documents(docs, langs=None, min_quality=0.0)
    chunks = chunk_documents(
        curated, chunk_tokens=32, overlap_tokens=8
    )
    out = str(tmp_path / "shards")
    write_training_shards(chunks, out, id_col="doc_id", seed=3, num_shards=4)

    back = spark.read.parquet(out)
    assert back.count() == chunks.count() > 0
    assert len(_glob.glob(f"{out}/*.parquet")) == 4
    # all chunk doc_ids come from the curated set
    curated_ids = {r["doc_id"] for r in curated.select("doc_id").collect()}
    chunk_ids = {r["doc_id"] for r in back.select("doc_id").distinct().collect()}
    assert chunk_ids <= curated_ids


def test_chunking_property(spark):
    """Property: for any (n_tokens, chunk, overlap), chunks reconstruct the
    document exactly, never exceed chunk_tokens, and indexes are contiguous
    from 0."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=12, deadline=None)
    @given(
        n=st.integers(min_value=0, max_value=120),
        chunk=st.integers(min_value=2, max_value=40),
        overlap=st.integers(min_value=0, max_value=39),
    )
    def _check(n, chunk, overlap):
        if overlap >= chunk:
            return
        docs = spark.createDataFrame([(1, _doc(n))], SCHEMA)
        rows = sorted(
            chunk_documents(
                docs, chunk_tokens=chunk, overlap_tokens=overlap
            ).collect(),
            key=lambda r: r["chunk_idx"],
        )
        if n == 0:
            assert rows == []
            return
        assert [r["chunk_idx"] for r in rows] == list(range(len(rows)))
        toks = [r["chunk_text"].split() for r in rows]
        assert all(len(t) <= chunk for t in toks)
        assert all(r["n_tokens"] == len(t) for r, t in zip(rows, toks))
        seen = list(toks[0])
        for cur in toks[1:]:
            assert seen[-overlap:] == cur[:overlap] if overlap else True
            seen += cur[overlap:]
        assert seen == _doc(n).split()

    _check()


def test_pack_sequences_invariants(spark):
    from movie_recommendation_etl_spark.operators.training_prep import (
        pack_sequences,
    )

    df = spark.createDataFrame(
        [(i, (i * 37) % 95 + 1) for i in range(200)],
        "doc_id long, n_tokens long",
    )
    L = 64
    rows = pack_sequences(
        df, seq_len=L, num_shards=4, seed=7
    ).collect()
    # per-doc reconstruction: contributed slices tile the doc exactly
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    n_by_id = {i: (i * 37) % 95 + 1 for i in range(200)}
    for doc, parts in by_doc.items():
        parts.sort(key=lambda r: r["slice_start"])
        assert parts[0]["slice_start"] == 0
        pos = 0
        for p in parts:
            assert p["slice_start"] == pos
            pos += p["n_tokens_in_seq"]
        assert pos == n_by_id[doc]
    assert set(by_doc) == set(n_by_id)  # every non-empty doc packed
    # per-sequence: every sequence except each shard's last is exactly full,
    # and parts within a sequence tile it contiguously from offset 0
    by_seq: dict[tuple, list] = {}
    for r in rows:
        by_seq.setdefault((r["shard"], r["seq_idx"]), []).append(r)
    last_seq = {}
    for (shard, seq), _ in by_seq.items():
        last_seq[shard] = max(last_seq.get(shard, -1), seq)
    for (shard, seq), parts in by_seq.items():
        parts.sort(key=lambda r: r["offset_in_seq"])
        pos = 0
        for p in parts:
            assert p["offset_in_seq"] == pos
            pos += p["n_tokens_in_seq"]
        if seq < last_seq[shard]:
            assert pos == L, (shard, seq, pos)
        else:
            assert 0 < pos <= L
    # shards cover 0..num_shards-1 and sequences are dense per shard
    for shard in last_seq:
        seqs = sorted(s for (sh, s) in by_seq if sh == shard)
        assert seqs == list(range(last_seq[shard] + 1))


def test_pack_sequences_partitioning_invariant(spark):
    """Same seed => byte-identical packing regardless of input layout (the
    determinism policy: a repartition must never change results)."""
    from movie_recommendation_etl_spark.operators.training_prep import (
        pack_sequences,
    )

    df = spark.createDataFrame(
        [(i, i % 50 + 1) for i in range(300)], "doc_id long, n_tokens long"
    )
    a = sorted(
        map(tuple, pack_sequences(df, seq_len=32, num_shards=8).collect())
    )
    b = sorted(
        map(
            tuple,
            pack_sequences(
                df.repartition(13), seq_len=32, num_shards=8
            ).collect(),
        )
    )
    assert a == b


def test_pack_sequences_rejects_bad_args(spark):
    import pytest as _pytest

    from movie_recommendation_etl_spark.operators.training_prep import (
        pack_sequences,
    )

    df = spark.createDataFrame([(1, 5)], "doc_id long, n_tokens long")
    with _pytest.raises(ValueError):
        pack_sequences(df, seq_len=0)
    with _pytest.raises(ValueError):
        pack_sequences(df, num_shards=0)


def test_shard_manifest_roundtrip_and_tamper_detection(spark, tmp_path):
    from movie_recommendation_etl_spark.operators.training_prep import (
        read_shard_manifest,
        verify_shard_manifest,
        write_shard_manifest,
        write_training_shards,
    )

    df = spark.createDataFrame(
        [(i, f"doc {i} text", (i % 7) + 1) for i in range(100)],
        "doc_id long, text string, n_tokens long",
    )
    path = str(tmp_path / "shards")
    write_training_shards(df, path, num_shards=4)
    manifest = write_shard_manifest(spark, path, count_col="n_tokens")
    assert manifest["n_rows"] == 100
    assert manifest["n_files"] == 4
    assert manifest["n_tokens"] == sum((i % 7) + 1 for i in range(100))
    assert read_shard_manifest(spark, path) == manifest
    # clean verify passes and returns the recorded manifest
    assert verify_shard_manifest(spark, path) == manifest

    # tamper: delete one shard file -> verify must name it
    import glob
    import os

    victim = sorted(glob.glob(f"{path}/*.parquet"))[0]
    os.remove(victim)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="missing file"):
        verify_shard_manifest(spark, path)


def test_shard_manifest_missing_raises(spark, tmp_path):
    import pytest as _pytest

    from movie_recommendation_etl_spark.operators.training_prep import (
        read_shard_manifest,
    )

    path = str(tmp_path / "noshards")
    spark.range(3).write.parquet(path)
    with _pytest.raises(ValueError, match="no _MANIFEST"):
        read_shard_manifest(spark, path)


def test_pack_sequences_chunked_input_deterministic(spark):
    """chunk_col makes (id, chunk) the unique sort key: chunked corpora
    pack deterministically, chunks of a doc stay contiguous and in order
    in the shard's token stream, and the chunk id survives in the map."""
    from movie_recommendation_etl_spark.operators.training_prep import (
        pack_sequences,
    )

    rows = []
    for doc in range(60):
        for chunk in range((doc % 4) + 1):
            rows.append((doc, chunk, (doc + chunk) % 30 + 1))
    df = spark.createDataFrame(
        rows, "doc_id long, chunk_idx long, n_tokens long"
    )
    a = sorted(
        map(
            tuple,
            pack_sequences(
                df, chunk_col="chunk_idx", seq_len=48, num_shards=4
            ).collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            pack_sequences(
                df.repartition(11),
                chunk_col="chunk_idx",
                seq_len=48,
                num_shards=4,
            ).collect(),
        )
    )
    assert a == b
    out = pack_sequences(
        df, chunk_col="chunk_idx", seq_len=48, num_shards=4
    ).collect()
    assert "chunk_idx" in out[0].asDict()
    # contiguity: within a doc, chunk k+1 starts exactly where chunk k ends
    # in the global stream — recover stream offsets per (doc, chunk)
    start_of = {}
    for r in out:
        key = (r["doc_id"], r["chunk_idx"])
        pos = r["seq_idx"] * 48 + r["offset_in_seq"] - r["slice_start"]
        start_of.setdefault(key, (r["shard"], pos))
    n_of = {(d, c): n for d, c, n in rows}
    for (doc, chunk), (shard, pos) in start_of.items():
        nxt = (doc, chunk + 1)
        if nxt in start_of:
            assert start_of[nxt] == (shard, pos + n_of[(doc, chunk)])


def test_pack_sequences_property(spark):
    """Property: for any token-count multiset and (seq_len, num_shards),
    the packing map tiles every doc exactly, every non-final sequence per
    shard is exactly full, and the total packed token count is conserved."""
    from hypothesis import given, settings, strategies as st

    from movie_recommendation_etl_spark.operators.training_prep import (
        pack_sequences,
    )

    @settings(max_examples=8, deadline=None)
    @given(
        counts=st.lists(
            st.integers(min_value=0, max_value=50), min_size=1, max_size=60
        ),
        seq_len=st.integers(min_value=1, max_value=64),
        shards=st.integers(min_value=1, max_value=6),
    )
    def _check(counts, seq_len, shards):
        df = spark.createDataFrame(
            list(enumerate(counts)), "doc_id long, n_tokens long"
        )
        rows = pack_sequences(
            df, seq_len=seq_len, num_shards=shards
        ).collect()
        total = sum(r["n_tokens_in_seq"] for r in rows)
        assert total == sum(counts)  # conservation incl. zero-token drops
        by_doc: dict[int, int] = {}
        by_seq: dict[tuple, int] = {}
        last_seq: dict[int, int] = {}
        for r in rows:
            assert 0 < r["n_tokens_in_seq"] <= seq_len
            assert 0 <= r["offset_in_seq"] < seq_len
            by_doc[r["doc_id"]] = (
                by_doc.get(r["doc_id"], 0) + r["n_tokens_in_seq"]
            )
            key = (r["shard"], r["seq_idx"])
            by_seq[key] = by_seq.get(key, 0) + r["n_tokens_in_seq"]
            last_seq[r["shard"]] = max(
                last_seq.get(r["shard"], -1), r["seq_idx"]
            )
        for doc, n in by_doc.items():
            assert n == counts[doc]
        for (shard, seq), n in by_seq.items():
            if seq < last_seq[shard]:
                assert n == seq_len
            else:
                assert 0 < n <= seq_len

    _check()


def test_materialize_sequences_roundtrip(spark):
    """pack -> materialize reconstructs the exact per-shard token streams:
    concatenating a shard's sequences in seq order equals concatenating its
    chunks in pack order, every non-final sequence is exactly full, and
    boundary-straddling chunks split correctly."""
    from movie_recommendation_etl_spark.operators.training_prep import (
        chunk_documents,
        materialize_sequences,
        pack_sequences,
    )

    docs = spark.createDataFrame(
        [
            (i, " ".join(f"d{i}w{j}" for j in range((i % 5 + 1) * 17)))
            for i in range(40)
        ],
        "doc_id long, text string",
    )
    chunks = chunk_documents(docs, chunk_tokens=16, overlap_tokens=0)
    L = 24
    pmap = pack_sequences(
        chunks, chunk_col="chunk_idx", seq_len=L, num_shards=4, seed=3
    )
    seqs = materialize_sequences(
        pmap, chunks, chunk_col="chunk_idx"
    ).collect()
    by_shard: dict[int, list] = {}
    for r in seqs:
        by_shard.setdefault(r["shard"], []).append(r)
    # reference streams from the map itself (ordered slices of chunk text)
    chunk_toks = {
        (r["doc_id"], r["chunk_idx"]): r["chunk_text"].split()
        for r in chunks.collect()
    }
    pmap_rows = pmap.collect()
    for shard, rows in by_shard.items():
        rows.sort(key=lambda r: r["seq_idx"])
        assert [r["seq_idx"] for r in rows] == list(range(len(rows)))
        for r in rows[:-1]:
            assert r["n_tokens"] == L
        stream = [t for r in rows for t in r["tokens"]]
        ref_parts = sorted(
            (p for p in pmap_rows if p["shard"] == shard),
            key=lambda p: (p["seq_idx"], p["offset_in_seq"]),
        )
        ref_stream = [
            t
            for p in ref_parts
            for t in chunk_toks[(p["doc_id"], p["chunk_idx"])][
                p["slice_start"] : p["slice_start"] + p["n_tokens_in_seq"]
            ]
        ]
        assert stream == ref_stream


def test_chunked_shards_byte_identical_across_reruns(spark, tmp_path):
    """With chunked input the shuffle key (xxhash64 of doc_id) is NON-unique
    — many chunks per doc share it — so byte-identical reruns require the
    full (key, doc_id, chunk_idx) tiebreak. Two identical runs must produce
    files with identical bytes, not merely identical row sets."""
    import hashlib
    import os

    docs = spark.createDataFrame(
        [(i, _doc(100)) for i in range(40)], SCHEMA
    )
    chunks = chunk_documents(docs, chunk_tokens=16, overlap_tokens=4)
    p1, p2 = str(tmp_path / "b1"), str(tmp_path / "b2")
    for p in (p1, p2):
        write_training_shards(
            # shuffle the input partitioning between runs so arrival-order
            # nondeterminism would surface if the sort key were non-unique
            chunks.repartition(7 if p is p1 else 3),
            p,
            seed=5,
            num_shards=4,
            tiebreak_cols=("doc_id", "chunk_idx"),
        )

    def digests(p):
        # file names embed a per-run writer UUID; the stable identity of a
        # shard is its part index (part-00003-<uuid>... -> "00003")
        return {
            os.path.basename(f).split("-")[1]: hashlib.md5(
                open(f, "rb").read()
            ).hexdigest()
            for f in glob.glob(f"{p}/*.parquet")
        }

    d1, d2 = digests(p1), digests(p2)
    assert len(d1) == 4
    assert d1 == d2


def test_chunk_pack_materialize_with_regex_tokenizer(spark):
    """The pluggable tokenizer hook: chunking with the BPE-ish regex
    tokenizer (functions/text.py:re_tokens) budgets in regex-token units,
    and the chunk -> pack -> materialize round-trip conserves exactly that
    token stream (punctuation stripped, case folded)."""
    import re

    from movie_recommendation_etl_spark.functions.text import (
        TOKEN_RE,
        re_tokens,
    )
    from movie_recommendation_etl_spark.operators.training_prep import (
        materialize_sequences,
        pack_sequences,
    )

    texts = {
        1: "Hello, world! This is DOC-ONE with punct... and 42 numbers.",
        2: "Second doc; shorter, but Mixed-Case and (parens) plus 7 8 9 "
        + " ".join(f"tail{i}" for i in range(30)),
        3: "Third! " + " ".join(f"w{i}-x{i}" for i in range(40)),
    }
    docs = spark.createDataFrame(list(texts.items()), SCHEMA)
    chunks = chunk_documents(
        docs, chunk_tokens=8, overlap_tokens=0, tokenizer=re_tokens
    )
    got = {r["doc_id"]: r for r in chunks.collect()}  # spot-check counts

    def expect_tokens(t):
        return re.findall(TOKEN_RE, t.lower())

    for doc_id, text in texts.items():
        exp = expect_tokens(text)
        rows = sorted(
            (r for r in chunks.collect() if r["doc_id"] == doc_id),
            key=lambda r: r["chunk_idx"],
        )
        # chunk token counts measured in regex units, concatenation
        # reconstructs the regex token stream exactly (overlap 0)
        assert sum(r["n_tokens"] for r in rows) == len(exp)
        assert " ".join(r["chunk_text"] for r in rows).split() == exp
    assert got  # sanity

    pack = pack_sequences(
        chunks,
        chunk_col="chunk_idx",
        count_col="n_tokens",
        seq_len=16,
        num_shards=2,
        seed=1,
    )
    seqs = materialize_sequences(
        pack, chunks, chunk_col="chunk_idx"
    ).collect()
    total = sum(len(expect_tokens(t)) for t in texts.values())
    assert sum(r["n_tokens"] for r in seqs) == total
    # every materialized token is a regex token (no punctuation survived)
    tok_re = re.compile(f"^{TOKEN_RE}$")
    for r in seqs:
        assert all(tok_re.match(t) for t in r["tokens"])


def test_re_token_count_matches_re_tokens_on_mixed_case(spark):
    """The count and the stream share one case-folding convention: the
    budget a curation gate computes from re_token_count must equal the
    chunker's re_tokens stream length, even on mixed-case text."""
    from movie_recommendation_etl_spark.functions.text import (
        re_token_count,
        re_tokens,
    )

    docs = spark.createDataFrame(
        [
            (1, "HeLLo WoRLD"),
            (2, "ABC def 123"),
            (3, "Mixed-Case, with PUNCT!"),
            (4, "lower only here"),
        ],
        SCHEMA,
    )
    rows = docs.select(
        re_token_count("text").alias("n"),
        F.size(re_tokens("text")).alias("s"),
    ).collect()
    assert all(r["n"] == r["s"] for r in rows)
    assert rows[0]["n"] == 2  # 'hello', 'world' — not 4 case-broken runs


def test_budget_chunking_matches_python_greedy(spark):
    """chunk_documents_by_budget: the Catalyst fold must replay a
    by-definition Python greedy packer exactly — boundaries, texts, and
    per-chunk cost sums — while PRESERVING case and punctuation (the
    lossless alternative to the text-rewriting 're' tokenizer)."""
    import re as _re

    from movie_recommendation_etl_spark.functions.text import TOKEN_RE
    from movie_recommendation_etl_spark.operators.training_prep import (
        chunk_documents_by_budget,
    )

    rows = [
        (1, "Hello, World! This is Mixed-CASE text with URLs http://x.y/z"),
        (2, ""),
        (3, "one"),
        (4, "--- ### !!!"),  # all zero-cost tokens -> ONE chunk
        (5, " ".join(f"w{i}-X{i}" for i in range(60))),  # cost 2 each
        (6, "a " * 40),  # 40 cost-1 tokens
    ]
    budget = 7
    docs = spark.createDataFrame(rows, SCHEMA)
    out = chunk_documents_by_budget(docs, budget=budget).orderBy(
        "doc_id", "chunk_idx"
    ).collect()

    def pycost(t):
        return len(_re.findall(TOKEN_RE, t.lower()))

    def pygreedy(text):
        toks = text.split()
        chunks, cur, acc = [], [], 0
        for t in toks:
            c = pycost(t)
            if cur and acc + c > budget:
                chunks.append(cur)
                cur, acc = [], 0
            cur.append(t)
            acc += c
        if cur:
            chunks.append(cur)
        return [" ".join(c) for c in chunks]

    for doc_id, text in rows:
        got = [r for r in out if r["doc_id"] == doc_id]
        assert [r["chunk_text"] for r in got] == pygreedy(text), doc_id
        assert [r["chunk_idx"] for r in got] == list(range(len(got)))
        # non-overlapping conservation: chunks concatenate back exactly
        assert " ".join(r["chunk_text"] for r in got).split() == text.split()
        for r in got:
            assert r["n_tokens"] == len(r["chunk_text"].split())
            assert r["budget_cost"] == sum(
                pycost(t) for t in r["chunk_text"].split()
            )
            # budget respected unless a single token alone exceeds it
            assert r["budget_cost"] <= budget or r["n_tokens"] == 1
    # case/punctuation survived (the whole point)
    d1 = " ".join(
        r["chunk_text"] for r in out if r["doc_id"] == 1
    )
    assert "Mixed-CASE" in d1 and "Hello," in d1


def _py_budget_greedy(text, budget, pycost, overlap=0):
    """By-definition Python reference for chunk_documents_by_budget:
    greedy starts on cost budget, then each chunk j>0 extends backward by
    up to ``overlap`` ws tokens, clamped at chunk j-1's own start."""
    toks = text.split()
    starts, acc = [], 0
    for i, t in enumerate(toks):
        c = pycost(t)
        if not starts or acc + c > budget:
            starts.append(i)
            acc = c
        else:
            acc += c
    out = []
    for j, s in enumerate(starts):
        end = starts[j + 1] if j + 1 < len(starts) else len(toks)
        eff = s if j == 0 else max(s - overlap, starts[j - 1])
        out.append(
            {
                "chunk_idx": j,
                "chunk_text": " ".join(toks[eff:end]),
                "n_tokens": end - eff,
                "n_new_tokens": end - s,
                "budget_cost": sum(pycost(t) for t in toks[eff:end]),
            }
        )
    return out


def test_budget_chunking_with_overlap_matches_python(spark):
    """The ws-token overlap variant: every chunk after the first carries
    up to overlap_tokens of context from its predecessor (clamped at the
    predecessor's start), the budget still governs NEW tokens, and the
    new portions conserve the stream."""
    import re as _re

    from movie_recommendation_etl_spark.functions.text import TOKEN_RE
    from movie_recommendation_etl_spark.operators.training_prep import (
        chunk_documents_by_budget,
    )

    def pycost(t):
        return len(_re.findall(TOKEN_RE, t.lower()))

    rows = [
        (1, "Hello, World! This is Mixed-CASE text with URLs http://x.y/z"),
        (2, ""),
        (3, "one"),
        (4, " ".join(f"w{i}-X{i}" for i in range(60))),  # cost 2 each
        (5, "a " * 40),  # 40 cost-1 tokens
        (6, "!!! --- " * 5 + "word " * 10),  # zero-cost prefix
    ]
    budget, ov = 7, 3
    docs = spark.createDataFrame(rows, SCHEMA)
    out = (
        chunk_documents_by_budget(docs, budget=budget, overlap_tokens=ov)
        .orderBy("doc_id", "chunk_idx")
        .collect()
    )
    for doc_id, text in rows:
        got = [r for r in out if r["doc_id"] == doc_id]
        want = _py_budget_greedy(text, budget, pycost, overlap=ov)
        assert [
            {k: r[k] for k in want[0]} for r in got
        ] == want if want else got == [], doc_id
        # NEW portions conserve the stream; chunk 0 has no overlap prefix
        stream = [
            t
            for r in got
            for t in r["chunk_text"].split()[
                r["n_tokens"] - r["n_new_tokens"]:
            ]
        ]
        assert stream == text.split()
        for r in got:
            assert 0 <= r["n_tokens"] - r["n_new_tokens"] <= ov
            if r["chunk_idx"] == 0:
                assert r["n_tokens"] == r["n_new_tokens"]


def test_budget_chunking_overlap_property(spark):
    """Property: for any token stream / budget / overlap, the Catalyst
    plan replays the Python reference exactly."""
    import re as _re

    from hypothesis import given, settings, strategies as st

    from movie_recommendation_etl_spark.functions.text import TOKEN_RE
    from movie_recommendation_etl_spark.operators.training_prep import (
        chunk_documents_by_budget,
    )

    vocab = ["!!!", "ab", "Xy9", "a-b", "C,d",
             "-".join(f"r{k}" for k in range(12))]
    tok = st.sampled_from(vocab)

    def pycost(t):
        return len(_re.findall(TOKEN_RE, t.lower()))

    @settings(max_examples=8, deadline=None)
    @given(
        toks=st.lists(tok, min_size=0, max_size=40),
        budget=st.integers(min_value=1, max_value=9),
        ov=st.integers(min_value=0, max_value=6),
    )
    def _check(toks, budget, ov):
        text = " ".join(toks)
        docs = spark.createDataFrame([(1, text)], SCHEMA)
        got = sorted(
            chunk_documents_by_budget(
                docs, budget=budget, overlap_tokens=ov
            ).collect(),
            key=lambda r: r["chunk_idx"],
        )
        want = _py_budget_greedy(text, budget, pycost, overlap=ov)
        assert [
            {
                k: r[k]
                for k in (
                    "chunk_idx", "chunk_text", "n_tokens",
                    "n_new_tokens", "budget_cost",
                )
            }
            for r in got
        ] == want

    _check()


def test_budget_chunking_rejects_bad_overlap(spark):
    import pytest

    from movie_recommendation_etl_spark.operators.training_prep import (
        chunk_documents_by_budget,
    )

    docs = spark.createDataFrame([(1, "a")], SCHEMA)
    with pytest.raises(ValueError):
        chunk_documents_by_budget(docs, budget=3, overlap_tokens=-1)


def test_budget_chunking_plan_is_scan_stage(spark):
    """The greedy fold must ride the scan: no Exchange, no Python UDF —
    one Catalyst aggregate over the token array plus the explode."""
    from movie_recommendation_etl_spark.operators.training_prep import (
        chunk_documents_by_budget,
    )

    docs = spark.createDataFrame([(1, "a b c d")], SCHEMA)
    plan = (
        chunk_documents_by_budget(docs, budget=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan
    assert "Generate posexplode" in plan


def test_budget_chunking_rejects_bad_budget(spark):
    import pytest

    from movie_recommendation_etl_spark.operators.training_prep import (
        chunk_documents_by_budget,
    )

    docs = spark.createDataFrame([(1, "a")], SCHEMA)
    with pytest.raises(ValueError):
        chunk_documents_by_budget(docs, budget=0)


def test_budget_chunking_property(spark):
    """Property: for any token stream (mixed costs, including zero-cost
    punctuation tokens and over-budget mega-tokens) and any budget, the
    Catalyst greedy fold replays the by-definition Python packer exactly
    and chunks conserve the stream."""
    import re as _re

    from hypothesis import given, settings, strategies as st

    from movie_recommendation_etl_spark.functions.text import TOKEN_RE
    from movie_recommendation_etl_spark.operators.training_prep import (
        chunk_documents_by_budget,
    )

    # token alphabet spanning cost 0 (pure punctuation), cost 1, cost 2,
    # and an over-budget chain of alnum runs
    vocab = ["!!!", "---", "ab", "Xy9", "a-b", "C,d", "-".join("q" * 1) * 1,
             "-".join(f"r{k}" for k in range(12))]
    tok = st.sampled_from(vocab)

    def pycost(t):
        return len(_re.findall(TOKEN_RE, t.lower()))

    @settings(max_examples=10, deadline=None)
    @given(
        toks=st.lists(tok, min_size=0, max_size=40),
        budget=st.integers(min_value=1, max_value=9),
    )
    def _check(toks, budget):
        text = " ".join(toks)
        docs = spark.createDataFrame([(1, text)], SCHEMA)
        rows = sorted(
            chunk_documents_by_budget(docs, budget=budget).collect(),
            key=lambda r: r["chunk_idx"],
        )
        chunks, cur, acc = [], [], 0
        for t in toks:
            c = pycost(t)
            if cur and acc + c > budget:
                chunks.append(cur)
                cur, acc = [], 0
            cur.append(t)
            acc += c
        if cur:
            chunks.append(cur)
        assert [r["chunk_text"] for r in rows] == [
            " ".join(c) for c in chunks
        ]
        assert [r["chunk_idx"] for r in rows] == list(range(len(rows)))
        got_stream = [t for r in rows for t in r["chunk_text"].split()]
        assert got_stream == toks

    _check()


def test_budget_chunking_arms_matches_per_arm_union(spark):
    """chunk_documents_by_budget_arms (r19): N overlap variants in one
    scan must be ROW-IDENTICAL to unioning N single-arm calls — the
    boundaries are arm-independent, only the extraction differs. Covers
    the 0-overlap arm (whose unified greatest(start-0, prev) expression
    must still equal the plain arm's eff_start == start), an overlap
    bigger than whole chunks (clamp at the previous chunk's start), and
    empty/short docs."""
    from movie_recommendation_etl_spark.operators.training_prep import (
        chunk_documents_by_budget,
        chunk_documents_by_budget_arms,
    )

    rows = [
        (1, "Hello, World! This is Mixed-CASE text with URLs http://x.y/z"),
        (2, ""),
        (3, "one"),
        (4, " ".join(f"w{i}-X{i}" for i in range(60))),
        (5, "a " * 40),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    arms = (("plain", 0), ("overlap", 4), ("wide", 1000))
    got = sorted(
        map(
            tuple,
            chunk_documents_by_budget_arms(
                docs, arms=arms, budget=8
            ).collect(),
        )
    )
    want = []
    for name, ov in arms:
        for r in chunk_documents_by_budget(
            docs, budget=8, overlap_tokens=ov
        ).collect():
            want.append((name, *tuple(r)))
    assert got == sorted(want)

    # duplicate / empty arm names are rejected
    import pytest

    with pytest.raises(ValueError):
        chunk_documents_by_budget_arms(docs, arms=(("a", 0), ("a", 1)))
    with pytest.raises(ValueError):
        chunk_documents_by_budget_arms(docs, arms=())
    with pytest.raises(ValueError):
        chunk_documents_by_budget_arms(docs, arms=(("a", -1),))
