"""Test-data catalog: the driver's TPC-H-ish star schema + events/documents/
embeddings tables (TESTDATA.md). One parquet file per table under an sf dir.

Scans stay declarative (``spark.read.parquet``) so Catalyst gets predicate
pushdown / column pruning for free; at 100 TB the same call reads a
partitioned object-store layout without code changes.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from movie_recommendation_etl_spark.session import default_parallelism

TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimension tables — always broadcast-join candidates.
DIM_TABLES: frozenset[str] = frozenset({"region", "nation", "supplier"})


# Tables whose parquet files MAY carry TIMESTAMP(NANOS) columns, which
# Spark's vectorized reader rejects outright. When the file is actually
# nanos-typed we read those columns as nanos-since-epoch longs (legacy conf)
# and convert with *integer* division — a double intermediate would lose
# precision above 2^53 ns (~1970+104 days). Generator-dependent: earlier
# testdata rounds wrote nanos, current rounds write micros (a plain
# timestamp read) — load_table handles both by probing the plain read first.
_NANOS_TS_COLS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


# Repartition threshold, in UNCOMPRESSED bytes (parquet footer
# total_byte_size): a local table bigger than this that still arrives as
# fewer partitions than cores is a single-row-group layout (unsplittable —
# Spark assigns whole row groups to tasks), so every scan-stage operator
# runs on ONE core. One cheap shuffle restores parallelism. Uncompressed,
# not on-disk, because compute cost tracks decoded width: a text-heavy
# documents file compresses ~3:1, and an on-disk gate left r5's regenerated
# 584 KB/5000-doc file on one core (12 s single-threaded lang-ID scans).
# Dim tables are exempt — they broadcast anyway and a 32-task shuffle of 25
# rows is pure overhead. At real scale data lands as many files/row groups
# and this never triggers; the durable fix is writers.write_parquet's
# maxRecordsPerFile.
_REPARTITION_MIN_UNCOMPRESSED_BYTES = 512 * 1024


_NANOS_CONF = "spark.sql.legacy.parquet.nanosAsLong"


# Session-scoped table cache (opt-in via warm_catalog): repeated analytic
# queries over the same inputs should not re-pay the scan (and, for this
# testdata's single-row-group files, the parallelism-restoring shuffle) per
# query — the standard warehouse pattern (spark.catalog.cacheTable). Policy:
# only tables under _CACHE_MAX_BYTES are eligible, because at 100 TB the fact
# tables must stream from the source (with pushdown) rather than pin the
# cluster's memory; small/warm tables are exactly the ones worth pinning.
# Keyed by (applicationId, sf_dir, table) so a new SparkSession never sees
# stale handles. Cold load_table calls bypass the cache entirely unless an
# entry exists, so plan-shape guarantees (parquet pushdown/pruning) hold for
# un-warmed sessions.
_CACHE_MAX_BYTES = 512 * 1024 * 1024
_TABLE_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def _path_bytes(path: str) -> int:
    """Total bytes under ``path`` — a single file's size, or the sum of all
    files for a directory-backed table (Spark's normal output layout, where
    ``os.path.getsize`` would return only the ~4 KB inode size and let an
    arbitrarily large table slip past size gates)."""
    if os.path.isdir(path):
        total = 0
        for root, _dirs, files in os.walk(path):
            for f in files:
                try:
                    total += os.path.getsize(os.path.join(root, f))
                except OSError:
                    pass
        return total
    return os.path.getsize(path)


def _uncompressed_bytes(path: str) -> int:
    """Sum of parquet row-group ``total_byte_size`` (decoded size) across
    the file, or all files of a directory-backed table. Footer-only reads —
    no data pages touched."""
    import pyarrow.parquet as pq

    if os.path.isdir(path):
        files = [
            os.path.join(root, f)
            for root, _dirs, fs in os.walk(path)
            for f in fs
            if f.endswith(".parquet") and not f.startswith((".", "_"))
        ]
    else:
        files = [path]
    total = 0
    for f in files:
        meta = pq.ParquetFile(f).metadata
        total += sum(
            meta.row_group(i).total_byte_size
            for i in range(meta.num_row_groups)
        )
    return total


def _cache_key(
    spark: SparkSession, sf_dir: str, name: str
) -> tuple[str, str, str]:
    return (
        spark.sparkContext.applicationId,
        os.path.abspath(sf_dir),
        name,
    )


def warm_catalog(
    spark: SparkSession,
    sf_dir: str,
    tables: tuple[str, ...] = TABLES,
    *,
    eager: bool = False,
) -> list[str]:
    """Mark every eligible (< _CACHE_MAX_BYTES) table for session caching.

    Returns the table names actually cached. Later ``load_table`` calls in
    the same session return the cached frame (in-memory columnar batches,
    no re-scan, no repartition shuffle). Lazy by default: the first query
    touching a table fills its cache in-flight, which is strictly less total
    work than a separate materialization pass; ``eager=True`` front-loads
    the fill (predictable first-query latency, e.g. interactive sessions).
    """
    warmed: list[str] = []
    to_fill: list[DataFrame] = []
    for name in tables:
        path = f"{sf_dir}/{name}.parquet"
        try:
            if _path_bytes(path) >= _CACHE_MAX_BYTES:
                continue
        except OSError:
            continue
        key = _cache_key(spark, sf_dir, name)
        if key not in _TABLE_CACHE:
            df = load_table(spark, sf_dir, name).persist()
            if eager:
                to_fill.append(df)
            _TABLE_CACHE[key] = df
        warmed.append(name)
    if to_fill:
        # Fill caches as CONCURRENT jobs: each table's count is far smaller
        # than the cluster, so sequential fills leave most cores idle. The
        # scheduler interleaves the jobs; threads only trigger them.
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(8, len(to_fill))) as pool:
            list(pool.map(lambda df: df.count(), to_fill))
    return warmed


def clear_table_cache() -> None:
    """Unpersist and drop every cached table (all sessions)."""
    for df in _TABLE_CACHE.values():
        try:
            df.unpersist()
        except Exception:  # session already stopped — nothing to release
            pass
    _TABLE_CACHE.clear()


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    cached = _TABLE_CACHE.get(_cache_key(spark, sf_dir, name))
    if cached is not None:
        return cached
    nanos_cols = _NANOS_TS_COLS.get(name, ())
    path = f"{sf_dir}/{name}.parquet"
    if nanos_cols:
        from pyspark.sql.types import LongType
        from pyspark.sql.utils import AnalysisException

        try:
            # Probe with a plain read: micros/millis files (current testdata
            # generation) resolve to a real timestamp type and need no
            # conversion. A genuinely nanos-typed file fails schema
            # conversion HERE (at read time, before any job runs).
            df = spark.read.parquet(path)
        except AnalysisException:
            # Nanos file: scope the legacy conf to this read — parquet→
            # catalyst schema conversion consults it at spark.read time, so
            # save/restore keeps a later nanos-typed read elsewhere failing
            # loudly instead of silently yielding longs (r2 ADVICE).
            prev = spark.conf.get(_NANOS_CONF, "false")  # registered default
            spark.conf.set(_NANOS_CONF, "true")
            try:
                df = spark.read.parquet(path)
            finally:
                spark.conf.set(_NANOS_CONF, prev)
        # Convert any column that arrived as a long (nanos-as-long read, or
        # a session where the legacy conf is globally on).
        for c in nanos_cols:
            if isinstance(df.schema[c].dataType, LongType):
                df = df.withColumn(
                    c, F.timestamp_micros(F.expr(f"{c} div 1000"))
                )
    else:
        df = spark.read.parquet(path)
    try:
        big_enough = (
            name not in DIM_TABLES
            and _uncompressed_bytes(path)
            >= _REPARTITION_MIN_UNCOMPRESSED_BYTES
        )
    except OSError:  # non-local path: rely on the source's own splits
        big_enough = False
    if big_enough:
        target = default_parallelism()
        # File count proxies row-group count for this testdata (one row
        # group per file) without df.rdd's plan-to-RDD conversion on every
        # load (r2 ADVICE): fewer files than cores + a big file = an
        # unsplittable layout that would serialize the scan stage.
        if len(df.inputFiles()) < target:
            df = df.repartition(target)
    return df


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every catalog table and register it as a temp view."""
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
