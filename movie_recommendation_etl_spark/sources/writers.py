"""Sinks: partitioned parquet, CSV, ML-model persistence, JDBC.

The reference's sinks are four unpartitioned ``write.parquet`` calls
(reference transform/execute.py:273-298), an LSH-model save (:283), and a
JDBC writer whose ``mode="append"`` re-inserts on every rerun, violating the
primary key (reference load/execute.py:91 — a semantics bug SURVEY.md §2.1 S7
says to fix, not copy). Our writers partition by natural keys so downstream
scans get partition pruning, and the JDBC path defaults to idempotent
overwrite (truncate-and-reload) instead of blind append.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_parquet(
    df: DataFrame,
    path: str,
    *,
    partition_by: Sequence[str] | None = None,
    mode: str = "overwrite",
    max_records_per_file: int | None = None,
) -> None:
    """Columnar sink. ``partition_by`` natural keys (event date, year, lang)
    so a 100 TB table prunes to the partitions a query touches;
    ``max_records_per_file`` caps file size so a skewed partition doesn't
    produce one giant unsplittable-row-group file.
    """
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(path)


def write_csv(
    df: DataFrame,
    path: str,
    *,
    mode: str = "overwrite",
    header: bool = True,
) -> None:
    """CSV sink with the same quoting dialect read_csv_robust expects
    (reference transform/execute.py:48-57), so write → read round-trips."""
    (
        df.write.mode(mode)
        .option("header", header)
        .option("quote", '"')
        .option("escape", '"')
        .csv(path)
    )


def save_model(model, path: str) -> None:
    """Persist a fitted MLlib model (reference transform/execute.py:283)."""
    model.write().overwrite().save(path)


def load_lsh_model(path: str):
    """Load a persisted BucketedRandomProjectionLSH model (reference
    notebook transform/execute.ipynb:1563)."""
    from pyspark.ml.feature import BucketedRandomProjectionLSHModel

    return BucketedRandomProjectionLSHModel.load(path)


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    *,
    user: str,
    password: str,
    driver: str = "org.postgresql.Driver",
    mode: str = "overwrite",
    truncate: bool = True,
    batchsize: int = 10_000,
    num_partitions: int | None = None,
) -> None:
    """JDBC sink with idempotent semantics (fixes reference
    load/execute.py:91's append-on-PK bug): default overwrite+truncate keeps
    the external DDL (indexes, grants) while replacing rows. Each write
    partition opens one connection — cap ``num_partitions`` so a wide job
    doesn't exhaust the database's connection limit (SURVEY.md §7 risk).

    Live-tested against embedded Apache Derby (on Spark's default
    classpath): write → read-back → idempotent re-write, see
    tests/test_sinks_and_readers.py. Against Postgres, pass the reference's
    url/driver (load/execute.py:74-97) — the option surface is identical.
    """
    if num_partitions is not None:
        df = df.coalesce(num_partitions)
    (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("user", user)
        .option("password", password)
        .option("driver", driver)
        .option("truncate", truncate)
        .option("batchsize", batchsize)
        .mode(mode)
        .save()
    )


def read_parquet_back(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
