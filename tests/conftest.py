from __future__ import annotations

import os
import sys

import pytest

SF_SMALL = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

# Make `google.protobuf` importable BEFORE any SparkSession exists (the
# transformWithStateInPandas protocol needs it driver- AND worker-side;
# workers inherit $PYTHONPATH through the JVM, so activation must precede
# JVM launch). No-op wherever protobuf is actually installed or no
# vendored runtime exists — the twin test keeps its skipif either way.
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
from vendor.protobuf_compat.activate import ensure_protobuf  # noqa: E402

ensure_protobuf()


@pytest.fixture(scope="session")
def spark():
    from movie_recommendation_etl_spark.session import get_spark

    s = get_spark(app_name="tests")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMALL


@pytest.fixture(scope="session")
def oracle_con(sf_dir):
    from tests.oracle_harness import duckdb_connect

    con = duckdb_connect(sf_dir)
    yield con
    con.close()
