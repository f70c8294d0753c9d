"""Compaction tests (sources/compact.py): fragmented partitions collapse to
the byte-optimal file count, content survives bit-for-bit, well-compacted
partitions are left physically untouched, and a second run is a no-op."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from movie_recommendation_etl_spark.sources.compact import (
    compact_parquet,
    plan_compaction,
)


def _files(path: str) -> list[str]:
    return sorted(
        f
        for f in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
        if not os.path.basename(f).startswith((".", "_"))
    )


def _contents(spark, path):
    return sorted(
        tuple(r) for r in spark.read.parquet(path).collect()
    )


def test_partitioned_compaction(spark, tmp_path):
    path = str(tmp_path / "tbl")
    df = spark.range(0, 2000).select(
        F.col("id"),
        (F.col("id") % 4).alias("bucket"),
        (F.col("id") % 2).cast("string").alias("p"),
    )
    # fragment: 16 tasks x 2 partitions => ~32 small files
    df.repartition(16).write.partitionBy("p").parquet(path)
    before_files = _files(path)
    assert len(before_files) > 8
    before = _contents(spark, path)

    plans = compact_parquet(spark, path)
    assert plans, "fragmented table must produce a non-empty plan"
    after_files = _files(path)
    # both partitions are tiny => one file each
    assert len(after_files) == 2
    assert _contents(spark, path) == before

    # idempotent: second run plans nothing and moves nothing
    assert compact_parquet(spark, path) == []
    assert _files(path) == after_files


def test_untouched_partition_keeps_its_files(spark, tmp_path):
    path = str(tmp_path / "tbl")
    base = spark.range(0, 100).select(
        F.col("id"), F.lit("a").alias("p")
    )
    base.coalesce(1).write.partitionBy("p").parquet(path)
    compact_before = _files(path)
    assert len(compact_before) == 1  # p=a already compact
    # fragment a second partition only
    frag = spark.range(100, 200).select(F.col("id"), F.lit("b").alias("p"))
    frag.repartition(8).write.mode("append").partitionBy("p").parquet(path)

    plans = compact_parquet(spark, path)
    assert [p["partition"] for p in plans] == [{"p": "b"}]
    # p=a's file was not rewritten (same name => same inode history)
    assert [f for f in _files(path) if "p=a" in f] == compact_before
    assert len([f for f in _files(path) if "p=b" in f]) == 1


def test_unpartitioned_compaction(spark, tmp_path):
    path = str(tmp_path / "flat")
    spark.range(0, 1000).repartition(12).write.parquet(path)
    assert len(_files(path)) == 12
    before = _contents(spark, path)
    compact_parquet(spark, path)
    assert len(_files(path)) == 1
    assert _contents(spark, path) == before


def test_file_uri_scheme_inventory_and_compaction(spark, tmp_path):
    """The inventory goes through the Hadoop FileSystem API: a `file:/`
    URI (the seam proving non-POSIX path handling — the old os.walk form
    saw an empty table for ANY scheme'd path and silently no-op'd) must
    plan and compact identically to the bare path."""
    path = str(tmp_path / "uri_tbl")
    spark.range(0, 500).select(
        F.col("id"), (F.col("id") % 2).cast("string").alias("p")
    ).repartition(6).write.partitionBy("p").parquet(path)
    uri = "file:" + path
    plans = plan_compaction(spark, uri)
    assert plans and {tuple(p["partition"].items()) for p in plans} == {
        (("p", "0"),),
        (("p", "1"),),
    }
    executed = compact_parquet(spark, uri)
    assert [p["partition"] for p in executed] == [p["partition"] for p in plans]
    assert len(_files(path)) == 2
    assert compact_parquet(spark, uri) == []


def test_big_partition_resplits_by_target_bytes(spark, tmp_path):
    """A partition over target size must not fuse into one unsplittable
    file: the rows-per-file cap re-splits it."""
    path = str(tmp_path / "big")
    spark.range(0, 50_000).select(
        F.col("id"), F.lit("x").alias("p"), F.expr("uuid()").alias("pad")
    ).repartition(20).write.partitionBy("p").parquet(path)
    n_before = len(_files(path))
    assert n_before == 20
    # tiny target => the plan wants multiple files and the rewrite honors it
    plans = compact_parquet(spark, path, target_file_bytes=200 * 1024)
    assert plans and plans[0]["target_files"] > 1
    n_after = len(_files(path))
    assert 1 < n_after < n_before
