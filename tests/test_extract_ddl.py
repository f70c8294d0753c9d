"""Tests for extract-stage utilities (S1/S2) and schema-derived DDL (S8)."""

from __future__ import annotations

import http.server
import os
import threading
import zipfile

import pytest
from pyspark.sql import types as T

from movie_recommendation_etl_spark.sources.ddl import (
    create_table_ddl,
    pg_type,
)
from movie_recommendation_etl_spark.sources.extract import (
    download_file,
    extract_zip,
)


def test_http_download_and_unzip(tmp_path):
    src_dir = tmp_path / "serve"
    src_dir.mkdir()
    payload = b"movie_id,title\n1,Inception\n" * 500
    archive = src_dir / "data.zip"
    with zipfile.ZipFile(archive, "w") as zf:
        zf.writestr("movies.csv", payload)

    handler = lambda *a, **kw: http.server.SimpleHTTPRequestHandler(
        *a, directory=str(src_dir), **kw
    )
    server = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        port = server.server_address[1]
        dest = str(tmp_path / "dl" / "data.zip")
        got = download_file(f"http://127.0.0.1:{port}/data.zip", dest)
        assert os.path.getsize(got) == os.path.getsize(archive)
        out = extract_zip(got, str(tmp_path / "out"), delete_archive=True)
        assert len(out) == 1
        with open(out[0], "rb") as f:
            assert f.read() == payload
        assert not os.path.exists(got)
    finally:
        server.shutdown()


def test_zip_rejects_path_traversal(tmp_path):
    bad = tmp_path / "evil.zip"
    with zipfile.ZipFile(bad, "w") as zf:
        zf.writestr("../outside.txt", "nope")
    with pytest.raises(ValueError, match="unsafe zip member"):
        extract_zip(str(bad), str(tmp_path / "out"))


def test_ddl_from_schema():
    schema = T.StructType(
        [
            T.StructField("id", T.IntegerType(), nullable=False),
            T.StructField("title", T.StringType()),
            T.StructField("revenue", T.LongType()),
            T.StructField("tags", T.ArrayType(T.StringType())),
            T.StructField("score", T.DoubleType()),
            T.StructField("price", T.DecimalType(12, 2)),
        ]
    )
    ddl = create_table_ddl(schema, "master_table", primary_key="id")
    assert ddl.startswith("CREATE TABLE IF NOT EXISTS master_table")
    assert "id INTEGER NOT NULL PRIMARY KEY" in ddl
    assert "tags TEXT[]" in ddl  # reference load/execute.py:54
    assert "revenue BIGINT" in ddl  # reference load/execute.py:51
    assert "price NUMERIC(12,2)" in ddl
    with pytest.raises(ValueError):
        pg_type(T.MapType(T.StringType(), T.StringType()))
