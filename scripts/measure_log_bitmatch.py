"""One-off measurement: do Spark (JVM StrictMath-based) and DuckDB (C libm)
produce BIT-IDENTICAL doubles for log2 / ln / pow(2, x) over the domains the
q79 perplexity oracle and the q40 log-feature arm would hash?

The q71 oracle work measured DuckDB ln diverging from Spark in the last ulp
on ~6% of its idf domain, which forced the rational-idf design. Before
committing q79 to a log2 formulation, measure the actual divergence rate on
the actual domain:

  A. log2(x) for x = (cnt+1)/denom over the sf0.01 documents vocabulary
     (the exact per-token log-probabilities the unigram model stores), via
     (1) DuckDB log2(x)  (2) DuckDB ln(x)/ln(2).
  B. ln(1+n) for n = 1..200000 (the q40 log_n_tokens feature domain).
  C. pow(2.0, ce) for representative cross-entropy doubles.

Usage: python scripts/measure_log_bitmatch.py [sf_dir]
Prints one JSON line with mismatch counts per formulation.
"""

from __future__ import annotations

import json
import os
import struct
import sys
import tempfile

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def bits(x: float) -> int:
    return struct.unpack("<Q", struct.pack("<d", x))[0]


def main() -> int:
    import duckdb

    from pyspark.sql import functions as F
    from movie_recommendation_etl_spark.session import get_spark

    spark = get_spark(app_name="log-bitmatch")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    counts = (
        docs.select(F.explode(toks).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    totals = counts.agg(
        F.sum("cnt").alias("n"), F.count(F.lit(1)).alias("v")
    ).first()
    denom = float(totals["n"] + totals["v"] + 1)

    # A: the model's probability domain, Spark side — INCLUDING the OOV
    # point x = 1/denom (cnt = 0), which the q79 oracle's COALESCE branch
    # substitutes with ln(1/denom)/ln(2.0); a domain built from observed
    # counts alone (cnt >= 1) would never test it.
    probe = (
        counts.select(F.col("cnt"))
        .unionByName(spark.range(1).select(F.lit(0).alias("cnt")))
        .select(
            ((F.col("cnt") + 1).cast("double") / F.lit(denom)).alias("x"),
            F.log2(
                (F.col("cnt") + 1).cast("double") / F.lit(denom)
            ).alias("spark_log2"),
        )
        .distinct()
    )
    out_dir = tempfile.mkdtemp(prefix="bitmatch_")
    probe.write.mode("overwrite").parquet(f"{out_dir}/probA")

    # B: integer ln domain (q40 log feature) — ln(1+n), n in 1..200000.
    # spark_round9 is the DEPLOYED q40 form: Spark-side F.round(F.log1p, 9)
    # (Spark rounds via the decimal string, not floating-point math).
    intdom = spark.range(1, 200_001).select(
        F.col("id").cast("double").alias("n"),
        F.log(F.col("id").cast("double") + F.lit(1.0)).alias("spark_ln"),
        F.log1p(F.col("id").cast("double")).alias("spark_log1p"),
        F.round(
            F.log1p(F.col("id").cast("double")), 9
        ).alias("spark_round9"),
    )
    intdom.write.mode("overwrite").parquet(f"{out_dir}/probB")

    # C: pow(2, ce) over the log2 outputs (negated → positive ce domain)
    powdom = probe.select(
        (-F.col("spark_log2")).alias("ce"),
        F.pow(F.lit(2.0), -F.col("spark_log2")).alias("spark_pow"),
    )
    powdom.write.mode("overwrite").parquet(f"{out_dir}/probC")

    con = duckdb.connect()
    res = {}
    a = con.execute(
        f"""
        SELECT count(*) AS n,
               sum(CASE WHEN log2(x) <> spark_log2 THEN 1 ELSE 0 END)
                   AS log2_mism,
               sum(CASE WHEN ln(x)/ln(2.0) <> spark_log2 THEN 1 ELSE 0 END)
                   AS lnratio_mism
        FROM read_parquet('{out_dir}/probA/*.parquet')
        """
    ).fetchone()
    res["probA_n"] = a[0]
    res["probA_log2_mismatch"] = a[1]
    res["probA_ln_over_ln2_mismatch"] = a[2]

    b = con.execute(
        f"""
        SELECT count(*) AS n,
               sum(CASE WHEN ln(n + 1.0) <> spark_ln THEN 1 ELSE 0 END)
                   AS ln_mism,
               sum(CASE WHEN log(n + 1.0) <> spark_ln THEN 1 ELSE 0 END)
                   AS log_mism,
               sum(CASE WHEN ln(n + 1.0) <> spark_log1p THEN 1 ELSE 0 END)
                   AS ln_vs_log1p_mism,
               sum(CASE WHEN round(ln(n + 1.0), 9)
                        <> spark_round9 THEN 1 ELSE 0 END)
                   AS q9_ln_vs_log1p_mism
        FROM read_parquet('{out_dir}/probB/*.parquet')
        """
    ).fetchone()
    res["probB_n"] = b[0]
    res["probB_ln_mismatch"] = b[1]
    res["probB_log_vs_sparkln_mismatch"] = b[2]
    # the pair q40 actually deploys: Spark F.log1p vs oracle ln(n+1.0) —
    # raw bits (diverges ~1%) and quantized to 9 decimals (the hashed form)
    res["probB_ln_vs_log1p_mismatch"] = b[3]
    res["probB_quant9_ln_vs_log1p_mismatch"] = b[4]

    c = con.execute(
        f"""
        SELECT count(*) AS n,
               sum(CASE WHEN pow(2.0, ce) <> spark_pow THEN 1 ELSE 0 END)
                   AS pow_mism
        FROM read_parquet('{out_dir}/probC/*.parquet')
        """
    ).fetchone()
    res["probC_n"] = c[0]
    res["probC_pow_mismatch"] = c[1]

    print(json.dumps(res))
    import shutil

    shutil.rmtree(out_dir, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
