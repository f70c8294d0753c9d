"""Local replica of the driver's DuckDB-oracle differential check.

Runs a registered Spark query and its oracle SQL on the same sf dir, then
compares row count, column names, and an order-insensitive value comparison
(columns sorted by name, rows sorted by their full stringified tuple).
Running this locally before the driver does is how we keep
CORRECTNESS_r{N}.json green.
"""

from __future__ import annotations

import math
from typing import Any

import duckdb

from movie_recommendation_etl_spark.sources.catalog import TABLES


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(v: Any) -> str:
    """Canonical string form used for order-insensitive comparison."""
    if v is None:
        return "<NULL>"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == 0.0:  # normalize -0.0 so signed zeros compare equal
            v = 0.0
        # repr keeps full double precision; bit-identical doubles -> same repr
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    return str(v)


def canonical_rows(cols: list[str], rows: list[tuple]) -> list[tuple[str, ...]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> dict:
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]
    rel = con.execute(sql)
    d_cols = [d[0] for d in rel.description]
    d_rows = rel.fetchall()

    result = {
        "rows_spark": len(s_rows),
        "rows_oracle": len(d_rows),
        "cols_spark": sorted(s_cols),
        "cols_oracle": sorted(d_cols),
        "rowcount_match": len(s_rows) == len(d_rows),
        "schema_match": sorted(s_cols) == sorted(d_cols),
    }
    if result["rowcount_match"] and result["schema_match"]:
        cs = canonical_rows(s_cols, s_rows)
        cd = canonical_rows(d_cols, d_rows)
        result["values_match"] = cs == cd
        if not result["values_match"]:
            # Set-style diff: positional zip after one insertion marks every
            # later pair as differing, which misleads debugging.
            from collections import Counter

            cs_only = Counter(cs) - Counter(cd)
            cd_only = Counter(cd) - Counter(cs)
            result["first_diffs"] = {
                "spark_only": list(cs_only.elements())[:5],
                "oracle_only": list(cd_only.elements())[:5],
            }
    else:
        result["values_match"] = False
    result["ok"] = result["rowcount_match"] and result["schema_match"] and result["values_match"]
    return result
