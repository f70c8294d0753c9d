"""r16 standalone ops-surface commands: `dedup` (exact min-id survivor) and
`decontam` (n-gram contamination verdicts + cleaned corpus), the CLI twins
of the stages trainprep composes."""

from __future__ import annotations

from movie_recommendation_etl_spark.cli import main


def _doc(i: int) -> str:
    return " ".join(f"the wordtoken{i}x{j} another{i}y{j}" for j in range(20))


def test_cli_dedup_exact(capsys, spark, tmp_path):
    rows = [(i, _doc(i)) for i in range(8)]
    # byte-shifted exact duplicates: same normalized fingerprint
    rows += [(100 + i, _doc(i).upper() + "!!") for i in range(3)]
    src = str(tmp_path / "dd_src")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(src)

    out = str(tmp_path / "dd_out")
    assert main(["dedup", src, out]) == 0
    printed = capsys.readouterr().out
    assert "3 exact dup(s) dropped" in printed
    kept = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert kept == set(range(8))  # min ids survive

    assert main(["dedup", src, out, "--id-col", "nope"]) == 1
    assert "nope" in capsys.readouterr().err


def test_cli_decontam_verdicts_and_clean(capsys, spark, tmp_path):
    rows = [(i, _doc(i)) for i in range(10)]
    src = str(tmp_path / "dc_src")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(src)
    ev = str(tmp_path / "dc_eval")
    spark.createDataFrame(
        [(1000 + i, _doc(i)) for i in range(4)], "doc_id long, text string"
    ).write.parquet(ev)

    out = str(tmp_path / "dc_verdicts")
    clean = str(tmp_path / "dc_clean")
    assert main(
        ["decontam", src, ev, out, "--clean-out", clean]
    ) == 0
    printed = capsys.readouterr().out
    assert "4 of 10 training docs" in printed
    verdicts = spark.read.parquet(out)
    bad = {
        r["doc_id"] for r in verdicts.filter("is_contaminated").collect()
    }
    assert bad == {0, 1, 2, 3}
    kept = {r["doc_id"] for r in spark.read.parquet(clean).collect()}
    assert kept == set(range(4, 10))

    # bloom tier: identical verdicts
    out_b = str(tmp_path / "dc_verdicts_bloom")
    assert main(
        ["decontam", src, ev, out_b, "--bloom-bits", "4096"]
    ) == 0
    capsys.readouterr()
    exact_rows = {tuple(r) for r in verdicts.collect()}
    bloom_rows = {tuple(r) for r in spark.read.parquet(out_b).collect()}
    assert exact_rows == bloom_rows

    # user errors exit 1 with a named message
    assert main(["decontam", src, ev, out, "--threshold", "2.0"]) == 1
    assert "--threshold" in capsys.readouterr().err
    assert main(["decontam", src, ev, out, "--text-col", "nope"]) == 1
    assert "nope" in capsys.readouterr().err


def test_cli_admit_docs_two_batches(capsys, spark, tmp_path):
    """r16 admit command: batch 2's near-dup of an admitted batch-1 doc is
    rejected through the store; fresh docs pass; embeddings kind validates
    --dim."""

    def t(tag, uniq):
        return " ".join(f"{tag}w{j}" for j in range(14)) + f" u{uniq}"

    b1 = str(tmp_path / "ad_b1")
    spark.createDataFrame(
        [(1, t("a", 1)), (2, " ".join(f"s2x{j}" for j in range(14)))],
        "doc_id long, text string",
    ).write.parquet(b1)
    b2 = str(tmp_path / "ad_b2")
    spark.createDataFrame(
        [(11, t("a", 11)), (12, " ".join(f"s12x{j}" for j in range(14)))],
        "doc_id long, text string",
    ).write.parquet(b2)

    store = str(tmp_path / "ad_store")
    o1, o2 = str(tmp_path / "ad_o1"), str(tmp_path / "ad_o2")
    assert main(["admit", b1, store, o1, "--threshold", "0.6"]) == 0
    assert "admitted 2 of 2" in capsys.readouterr().out
    assert main(["admit", b2, store, o2, "--threshold", "0.6"]) == 0
    assert "admitted 1 of 2" in capsys.readouterr().out
    kept = {r["doc_id"] for r in spark.read.parquet(o2).collect()}
    assert kept == {12}

    assert main(["admit", b1, store, o1, "--kind", "embeddings"]) == 1
    assert "--dim" in capsys.readouterr().err
