"""Small-file compaction for parquet tables.

Incremental sinks fragment tables: every merge_upsert_parquet /
foreachBatch micro-batch (sources/writers.py, streaming/incremental.py)
rewrites its touched partitions into task-count files, so a partition
receiving thousands of small batches accumulates thousands of small files.
At 100 TB that is the classic warehouse killer — scan planning lists every
file, each file costs an open + footer read, and row-group pruning loses
leverage. Table formats (Delta/Iceberg) ship OPTIMIZE for this; this module
is the plain-parquet equivalent, built on the same dynamic-partition-
overwrite primitive as the merge sink.

Scale shape: the file inventory is a listing (one entry per FILE, never per
row), only FRAGMENTED partitions are read and rewritten — well-compacted
partitions are not touched — and the rewrite is one column-complete scan of
just those partitions. Idempotent: a second run finds nothing fragmented.

The inventory goes through the Hadoop FileSystem API (r5 ADVICE/VERDICT):
the same listing and footer reads work on file:/, hdfs://, s3a:// — the
filesystems the 100 TB target actually lives on — where the previous
os.walk/local-pyarrow form silently saw an empty table on any remote
scheme and reported a fragmented store as 'already compact'.
"""

from __future__ import annotations

import math
from functools import reduce

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

DEFAULT_TARGET_FILE_BYTES = 256 * 1024 * 1024


# Hive writes NULL partition values as this sentinel directory name.
_HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"


def _leaf_partitions(
    spark: SparkSession, path: str
) -> list[tuple[dict[str, str | None], list[tuple[str, int]]]]:
    """(partition-values, [(file-uri, bytes), ...]) per leaf directory,
    listed via ``FileSystem.listFiles(recursive)`` so any Hadoop-supported
    scheme works. Hive layout: each level under the root is ``col=value``
    with the value URL-escaped (space -> %20 etc.) — values are unescaped
    here so they compare against column data, and the null sentinel maps to
    None. A non-partitioned table yields one entry with empty partition
    values. Hidden/temporary trees (any ``_``/``.``-prefixed segment, e.g.
    ``_temporary`` from an in-flight write) are skipped."""
    from urllib.parse import unquote

    jvm = spark._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(conf)
    if not fs.exists(hpath):
        return []
    root = fs.makeQualified(hpath).toString().rstrip("/")

    groups: dict[str, list[tuple[str, int]]] = {}
    it = fs.listFiles(jvm.org.apache.hadoop.fs.Path(root), True)
    while it.hasNext():
        st = it.next()
        full = st.getPath().toString()
        rel = full[len(root):].lstrip("/")
        segs = rel.split("/")
        if any(s.startswith(("_", ".")) for s in segs):
            continue
        if not segs[-1].endswith(".parquet"):
            continue
        groups.setdefault("/".join(segs[:-1]), []).append(
            (full, st.getLen())
        )

    out: list[tuple[dict[str, str | None], list[tuple[str, int]]]] = []
    for parent_rel, files in sorted(groups.items()):
        values: dict[str, str | None] = {}
        if parent_rel:
            for seg in parent_rel.split("/"):
                k, _, v = seg.partition("=")
                values[k] = None if v == _HIVE_NULL else unquote(v)
        out.append((values, files))
    return out


def _footer_rows(spark: SparkSession, file_uri: str) -> int:
    """Row count from the parquet footer, read through the Hadoop input
    layer (works on any scheme; one open + footer read per file, no data
    scan)."""
    jvm = spark._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    in_file = jvm.org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        jvm.org.apache.hadoop.fs.Path(file_uri), conf
    )
    reader = jvm.org.apache.parquet.hadoop.ParquetFileReader.open(in_file)
    try:
        return int(reader.getRecordCount())
    finally:
        reader.close()


def plan_compaction(
    spark: SparkSession,
    path: str,
    *,
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
) -> list[dict]:
    """Dry-run: one dict per FRAGMENTED leaf partition (more files than the
    byte-optimal count). Returns [] for an already-compact table."""
    plans = []
    for values, files in _leaf_partitions(spark, path):
        total = sum(sz for _f, sz in files)
        want = max(1, math.ceil(total / target_file_bytes))
        if len(files) > want:
            plans.append(
                {
                    "partition": values,
                    "n_files": len(files),
                    "target_files": want,
                    "bytes": total,
                    # row count from the footers already being opened —
                    # saves the rewrite a full counting scan
                    "rows": sum(
                        _footer_rows(spark, f) for f, _sz in files
                    ),
                }
            )
    return plans


def compact_parquet(
    spark: SparkSession,
    path: str,
    *,
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
) -> list[dict]:
    """Rewrite fragmented partitions of the parquet table at ``path`` into
    ~``target_file_bytes`` files. Returns the executed compaction plan
    (empty when the table was already compact — the idempotent fast path,
    no Spark job at all).

    Only fragmented partitions are scanned and rewritten (partition-pruned
    read + dynamic partition overwrite); a big partition is re-split by an
    estimated rows-per-file cap so compaction never fuses it into one
    unsplittable file. Like the merge sink, the frame is localCheckpoint'ed
    before overwriting its own source files.
    """
    from movie_recommendation_etl_spark.sources.writers import (
        recover_pending_merge,
    )

    # apply any crash-interrupted merge commit FIRST: compacting on top of
    # a committed-but-unapplied journal would rewrite files the journal's
    # delete set names, and the later replay would resurrect superseded
    # rows (single-writer contract shared with merge_upsert_parquet)
    recover_pending_merge(spark, path)

    plans = plan_compaction(spark, path, target_file_bytes=target_file_bytes)
    if not plans:
        return plans

    df = spark.read.parquet(path)
    part_cols = list(plans[0]["partition"].keys())

    if part_cols:
        # prune to the fragmented partitions: OR of per-partition conjuncts
        # on partition columns only (directory pruning applies); compare via
        # string cast so inferred partition types (int dates etc.) match the
        # (unescaped) directory-name values; None = the Hive null sentinel
        pred = reduce(
            lambda a, b: a | b,
            [
                reduce(
                    lambda a, b: a & b,
                    [
                        F.col(k).isNull()
                        if v is None
                        else F.col(k).cast("string") == F.lit(v)
                        for k, v in p["partition"].items()
                    ],
                )
                for p in plans
            ],
        )
        frag = df.filter(pred)
    else:
        frag = df

    # rows-per-file cap from observed bytes/row (parquet-encoded), so the
    # rewrite hits ~target_file_bytes regardless of row width; both totals
    # come from the planning pass's footers — no counting scan
    total_bytes = sum(p["bytes"] for p in plans)
    total_rows = sum(p["rows"] for p in plans)
    if total_rows == 0:
        return plans
    rows_per_file = max(1, int(target_file_bytes / max(1, total_bytes / total_rows)))

    frag = frag.localCheckpoint(eager=True)
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    try:
        if part_cols:
            spark.conf.set(
                "spark.sql.sources.partitionOverwriteMode", "dynamic"
            )
            # one task per table-partition => one file each (the rows-per-
            # file cap then re-splits genuinely big partitions)
            writer = (
                frag.repartition(len(plans), *part_cols)
                .write.mode("overwrite")
                .option("maxRecordsPerFile", rows_per_file)
                .partitionBy(*part_cols)
            )
        else:
            n_files = max(1, math.ceil(total_bytes / target_file_bytes))
            writer = (
                frag.repartition(n_files)
                .write.mode("overwrite")
                .option("maxRecordsPerFile", rows_per_file)
            )
        writer.parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return plans
