"""Local differential check for a subset of registered queries.

Usage: python scripts/check_queries.py [prefix ...]
Runs each registered query whose name starts with any given prefix (default:
all) against its DuckDB oracle at sf0.01 and prints one status line each.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.01"


def main() -> int:
    prefixes = tuple(sys.argv[1:]) or ("q",)
    import movie_recommendation_etl_spark.plans.all  # noqa: F401
    from movie_recommendation_etl_spark.plans.registry import ORACLE, QUERIES
    from movie_recommendation_etl_spark.session import get_spark
    from tests.oracle_harness import compare, duckdb_connect

    spark = get_spark(app_name="check_queries")
    con = duckdb_connect(SF)
    bad = 0
    for name in sorted(QUERIES):
        if not name.startswith(prefixes):
            continue
        df = QUERIES[name](spark, SF)
        if name not in ORACLE:
            n = df.count()
            print(f"{name}: rows-only n={n}")
            continue
        r = compare(df, con, ORACLE[name])
        status = "OK" if r["ok"] else f"FAIL {r}"
        print(f"{name}: {status}")
        bad += 0 if r["ok"] else 1
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
