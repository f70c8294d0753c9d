"""Cross-engine-deterministic numeric aggregation.

Floating-point SUM is order-dependent; Spark's shuffle order and DuckDB's scan
order differ, so a plain ``sum(double)`` can hash-mismatch in the last ulp.
The fix used across all oracle-checked aggregates:

1. per-row arithmetic stays in DOUBLE (IEEE-754, bit-identical per row in any
   engine),
2. cast each row value to DECIMAL(38,s) (binary doubles have no exact decimal
   ties, so round-half-up vs round-half-even agree → deterministic),
3. SUM in decimal (exact integer arithmetic, order-independent),
4. cast the total back to DOUBLE (one well-defined rounding).

The DuckDB oracle SQL applies the same CAST chain, making both sides
bit-identical regardless of partitioning/parallelism — which is exactly the
property that lets the correctness gate keep passing when the same query runs
on a 1000-executor cluster.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(38,6)"


def dsum(col: Column | str, scale: int = 6) -> Column:
    """Order-independent SUM: decimal-exact accumulation, double result."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(38,{scale})")).cast("double")


def davg(col: Column | str, scale: int = 6) -> Column:
    """Order-independent AVG = exact decimal sum / count, divided in double."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.sum(c.cast(f"decimal(38,{scale})")).cast("double")
        / F.count(c).cast("double")
    )


def sql_dsum(expr: str, scale: int = 6) -> str:
    """DuckDB/ANSI text form of dsum for oracle queries."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(38,{scale}))) AS DOUBLE)"


def sql_davg(expr: str, scale: int = 6) -> str:
    return (
        f"(CAST(SUM(CAST(({expr}) AS DECIMAL(38,{scale}))) AS DOUBLE)"
        f" / CAST(COUNT({expr}) AS DOUBLE))"
    )
