"""One-off A/B decomposition of q53_embedding_neardup_pairs' multi-round
bench drift (VERDICT r16 #1c: 2.33 s in r14 -> 3.70 s in r16 at equal
calibration, never flagged by the one-sided 25%/round gate).

Variants timed in ONE session (bench conditions: same get_spark conf,
warm catalog, min-of-N):

  full        — the shipping q53 (guard detection job + localCheckpoint'd
                band frame + localCheckpoint'd result)
  noguard     — banded_candidate_pairs with the detection job skipped
                (straight self-join; output identical on this corpus)
  nockpt      — shipping guard, but band frame .persist() instead of
                localCheckpoint (the r14 band-frame treatment)
  nofinalckpt — shipping q53 minus the final result localCheckpoint
  stages      — one instrumented run: e-persist / band-ckpt / detection /
                pair-join / verify, so the drift names its stage

Usage: python scripts/ab_q53_drift.py [n_samples]
Prints one JSON line; paste the verdict into README's adjudication note.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from pyspark.sql import functions as F

    import movie_recommendation_etl_spark.operators.neardup as nd
    from bench import host_calibration
    from movie_recommendation_etl_spark.plans.dedup_similarity import (
        _Q53_DIM,
        _Q53_N_BITS,
        _Q53_ROWS_PER_BAND,
        _Q53_THRESHOLD,
        q53_embedding_neardup_pairs,
    )
    from movie_recommendation_etl_spark.functions.vectors import dot, norm2
    from movie_recommendation_etl_spark.session import get_spark
    from movie_recommendation_etl_spark.sources.catalog import (
        load_table,
        warm_catalog,
    )

    spark = get_spark(app_name="ab_q53")
    warm_catalog(spark, SF_DIR, eager=True)
    cal = host_calibration(spark)

    def _count(df) -> int:
        return df.count()

    def timed(fn) -> list[float]:
        out = []
        for _ in range(n):
            t0 = time.monotonic()
            fn()
            out.append(round(time.monotonic() - t0, 3))
        return out

    real_bcp = nd.banded_candidate_pairs

    def bcp_noguard(exploded, id_col="doc_id",
                    bucket_cols=("band_idx", "band_hash"), *,
                    max_bucket_size=2000, out_a="doc_a", out_b="doc_b",
                    stats=None, materialize=None):
        keys = list(bucket_cols)
        a = exploded.select(*keys, F.col(id_col).alias(out_a))
        b = exploded.select(*keys, F.col(id_col).alias(out_b))
        pairs = (
            a.join(b, keys)
            .filter(F.col(out_a) < F.col(out_b))
            .select(out_a, out_b)
            .distinct()
        )
        return pairs.localCheckpoint(eager=True)

    results: dict[str, object] = {"sf_dir": SF_DIR, "calibration_sec": cal}

    # -- full (shipping) --------------------------------------------------
    results["full"] = timed(lambda: _count(
        q53_embedding_neardup_pairs(spark, SF_DIR)))

    # -- guard off --------------------------------------------------------
    nd.banded_candidate_pairs = bcp_noguard
    try:
        import movie_recommendation_etl_spark.plans.dedup_similarity as ds
        results["noguard"] = timed(lambda: _count(
            ds.q53_embedding_neardup_pairs(spark, SF_DIR)))
    finally:
        nd.banded_candidate_pairs = real_bcp

    # -- band frame persist instead of localCheckpoint (r14 treatment) ----
    def q53_nockpt():
        emb = load_table(spark, SF_DIR, "embeddings")
        from movie_recommendation_etl_spark.operators.neardup import (
            HEX_HIGH,
        )
        as_double = F.transform("embedding", lambda x: x.cast("double"))
        orig = emb.select("vec_id", "label", as_double.alias("emb"))
        twin_emb = F.transform(
            as_double,
            lambda x, i: x * F.when(
                F.md5(F.concat(F.lit("t:"), F.col("vec_id").cast("string"),
                               F.lit(":"), i.cast("string"))).substr(1, 1)
                .isin(*HEX_HIGH), F.lit(1.1)).otherwise(F.lit(0.9)),
        )
        twins = emb.select("vec_id", "label", twin_emb.alias("emb")).select(
            (F.col("vec_id") + 100000).alias("vec_id"), "label", "emb")
        e = orig.unionByName(twins).withColumn("nrm", norm2("emb")).persist()
        banded = e.select(
            F.col("vec_id").alias("_id"), F.col("label").alias("_lbl"),
            nd.srp_bands("emb", dim=_Q53_DIM, n_bits=_Q53_N_BITS,
                         rows_per_band=_Q53_ROWS_PER_BAND).alias("_bands"),
        ).persist()
        expl = banded.select(
            "_id", "_lbl",
            F.posexplode("_bands").alias("_band_idx", "_band_val"))
        cand = real_bcp(expl, id_col="_id",
                        bucket_cols=("_lbl", "_band_idx", "_band_val"),
                        max_bucket_size=2000,
                        out_a="vec_id_a", out_b="vec_id_b")
        x = e.select(F.col("vec_id").alias("vec_id_a"),
                     F.col("emb").alias("emb_a"), F.col("nrm").alias("nrm_a"))
        y = e.select(F.col("vec_id").alias("vec_id_b"),
                     F.col("emb").alias("emb_b"), F.col("nrm").alias("nrm_b"))
        v = (cand.join(x, "vec_id_a").join(y, "vec_id_b")
             .select(F.col("vec_id_a").alias("vec_a"),
                     F.col("vec_id_b").alias("vec_b"),
                     (dot("emb_a", "emb_b")
                      / (F.col("nrm_a") * F.col("nrm_b"))).alias("cosine_sim"))
             .filter(F.col("cosine_sim") >= _Q53_THRESHOLD))
        c = v.count()
        banded.unpersist()
        e.unpersist()
        return c

    results["nockpt_bandpersist"] = timed(q53_nockpt)

    # -- stage decomposition (one run) -------------------------------------
    stages: dict[str, float] = {}

    def stamp(name, t0):
        stages[name] = round(time.monotonic() - t0, 3)
        return time.monotonic()

    emb = load_table(spark, SF_DIR, "embeddings")
    from movie_recommendation_etl_spark.operators.neardup import HEX_HIGH
    as_double = F.transform("embedding", lambda x: x.cast("double"))
    orig = emb.select("vec_id", "label", as_double.alias("emb"))
    twin_emb = F.transform(
        as_double,
        lambda x, i: x * F.when(
            F.md5(F.concat(F.lit("t:"), F.col("vec_id").cast("string"),
                           F.lit(":"), i.cast("string"))).substr(1, 1)
            .isin(*HEX_HIGH), F.lit(1.1)).otherwise(F.lit(0.9)),
    )
    twins = emb.select("vec_id", "label", twin_emb.alias("emb")).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "label", "emb")
    t0 = time.monotonic()
    e = orig.unionByName(twins).withColumn("nrm", norm2("emb")).persist()
    e.count()
    t0 = stamp("e_persist", t0)
    banded = e.select(
        F.col("vec_id").alias("_id"), F.col("label").alias("_lbl"),
        nd.srp_bands("emb", dim=_Q53_DIM, n_bits=_Q53_N_BITS,
                     rows_per_band=_Q53_ROWS_PER_BAND).alias("_bands"),
    ).localCheckpoint(eager=True)
    t0 = stamp("band_ckpt", t0)
    expl = banded.select(
        "_id", "_lbl", F.posexplode("_bands").alias("_band_idx", "_band_val"))
    det = (expl.groupBy("_lbl", "_band_idx", "_band_val")
           .agg(F.count(F.lit(1)).alias("_bsz"))
           .agg(F.sum((F.col("_bsz") > 2000).cast("long")).alias("n"),
                F.max("_bsz").alias("m")).first())
    t0 = stamp("detection_job", t0)
    a = expl.select("_lbl", "_band_idx", "_band_val",
                    F.col("_id").alias("vec_id_a"))
    b = expl.select("_lbl", "_band_idx", "_band_val",
                    F.col("_id").alias("vec_id_b"))
    cand = (a.join(b, ["_lbl", "_band_idx", "_band_val"])
            .filter(F.col("vec_id_a") < F.col("vec_id_b"))
            .select("vec_id_a", "vec_id_b").distinct()
            .localCheckpoint(eager=True))
    t0 = stamp("pair_join_ckpt", t0)
    x = e.select(F.col("vec_id").alias("vec_id_a"),
                 F.col("emb").alias("emb_a"), F.col("nrm").alias("nrm_a"))
    y = e.select(F.col("vec_id").alias("vec_id_b"),
                 F.col("emb").alias("emb_b"), F.col("nrm").alias("nrm_b"))
    v = (cand.join(x, "vec_id_a").join(y, "vec_id_b")
         .select(F.col("vec_id_a").alias("vec_a"),
                 F.col("vec_id_b").alias("vec_b"),
                 (dot("emb_a", "emb_b")
                  / (F.col("nrm_a") * F.col("nrm_b"))).alias("cosine_sim"))
         .filter(F.col("cosine_sim") >= _Q53_THRESHOLD)
         .localCheckpoint(eager=True))
    stamp("verify_ckpt", t0)
    e.unpersist()
    results["stages"] = stages
    results["loadavg_1m"] = round(os.getloadavg()[0], 1)
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
