"""Bucketed tables: pre-shuffled storage for co-located, exchange-free joins.

The reference stages everything as plain unpartitioned parquet (reference
transform/execute.py:273-298) and re-shuffles on every join. At 100 TB the
dominant cost of a fact-fact join (orders x lineitem, events x sessions) is
the shuffle of BOTH sides on the join key — terabytes over the network per
query. Bucketing amortizes that shuffle into the WRITE: each table is
hash-partitioned into a fixed number of buckets on the join key at rest, so
any join (or groupBy) on that key reads co-located buckets and Catalyst
plans a SortMergeJoin with NO Exchange on either side
(tests/test_bucketed.py asserts exactly that plan shape).

Design rules encoded here:

- ``num_buckets`` is the contract. Two tables join exchange-free only when
  bucketed on the same key into compatible bucket counts (equal, or one an
  integer multiple with ``spark.sql.bucketing.coalesceBucketsInJoin``).
  Pick it from target bucket FILE size (~128-512 MiB compressed) at full
  scale, not from test-data size: a 10 TB fact table at 256 MiB/bucket
  wants ~40k buckets. It cannot change without a rewrite, so size for the
  table's growth ceiling.
- ``sortBy`` the bucket key (plus any range-probe column): sorted buckets
  let the join skip its per-task Sort and make min/max row-group pruning
  effective inside each bucket file.
- One file per bucket per write task: we repartition by the bucket columns
  first so each bucket's rows land in one task — without this, N write
  tasks x B buckets produces N*B small files (the classic bucketed-write
  file explosion).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_cols: Sequence[str],
    *,
    num_buckets: int = 8,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as an external bucketed parquet table named ``table``
    at ``path``. Bucket metadata lives in the session catalog (Spark's
    bucketing is table-metadata-driven; a bare ``spark.read.parquet`` of the
    same files would NOT see the bucketing) — on a cluster this is the
    Hive/Glue metastore, in tests the in-memory catalog.
    """
    bcols = list(bucket_cols)
    scols = list(sort_cols) if sort_cols is not None else bcols
    (
        # co-locate each bucket's rows into one task => one file per bucket
        df.repartition(num_buckets, *bcols)
        .write.mode(mode)
        .format("parquet")
        .option("path", path)
        .bucketBy(num_buckets, *bcols)
        .sortBy(*scols)
        .saveAsTable(table)
    )


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table THROUGH the catalog (``spark.table``) so the
    scan carries the bucket-derived output partitioning Catalyst needs to
    elide the join Exchange."""
    return spark.table(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-key bucketed tables. With compatible bucket counts the
    physical plan is a SortMergeJoin whose children are bare bucketed scans:
    zero Exchange, zero network shuffle — the co-located-join pattern the
    100 TB brief calls for. Correctness is identical to a plain join; only
    the physical plan differs (asserted in tests/test_bucketed.py).

    Tables bucketed into DIFFERENT counts still join shuffle-free when one
    count divides the other: ``coalesceBucketsInJoin`` (enabled here) reads
    the finer table's buckets k-at-a-time to match the coarser side — the
    escape hatch when two datasets were sized independently.

    The conf set below is deliberately session-sticky (no save/restore):
    planning happens at ACTION time, not here, so a scoped restore would
    silently defeat the setting; and it only activates for bucketed scans
    with divisible counts, where it strictly removes an Exchange — plans
    never get worse, semantics never change."""
    spark.conf.set("spark.sql.bucketing.coalesceBucketsInJoin.enabled", "true")
    return read_bucketed(spark, left_table).join(
        read_bucketed(spark, right_table), list(on), how
    )
