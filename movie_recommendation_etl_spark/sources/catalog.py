"""Test-data catalog: the driver's TPC-H-ish star schema + events/documents/
embeddings tables (TESTDATA.md). One parquet file per table under an sf dir.

Scans stay declarative (``spark.read.parquet``) so Catalyst gets predicate
pushdown / column pruning for free; at 100 TB the same call reads a
partitioned object-store layout without code changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every catalog table and register it as a temp view."""
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
