"""Plan evidence for the r20 near-dup optimizations.

The touched queries (q50/q53/q54, the q80/ref-scale neardup stage) all
materialize their results through localCheckpoint, so their QUERY-level
plans are `Scan ExistingRDD` one-liners before AND after — the optimization
lives in the internal stage plans. This script explains those stages by
calling the LIVE operators with materialization disabled (pair join,
verify join) and by building the CC symmetrize+seed prefix exactly the way
operators/graph.py does (the operator checkpoints every round, so its
internals are not reachable from any returned frame).

Usage: python scripts/capture_plans_r20_neardup.py [before|after]
Writes plans/r20/neardup_{pair_join,verify,cc_seed}_<tag>.txt
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    "r20",
)


def _explain(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "after"


    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from movie_recommendation_etl_spark.operators import neardup as nd
    from movie_recommendation_etl_spark.operators.skew import (
        right_size_materialized,
    )
    from movie_recommendation_etl_spark.session import get_spark
    from movie_recommendation_etl_spark.sources.catalog import load_table

    spark = get_spark(app_name="capture_plans_r20_neardup")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    toks = F.split(F.col("text"), " ")
    base = docs.select(
        "doc_id", nd.word_shingles(toks, 3).alias("sh")
    ).filter(F.size("sh") > 0)
    base = right_size_materialized(
        base.persist(StorageLevel.MEMORY_AND_DISK)
    )
    bands_df = right_size_materialized(
        nd.minhash_bands(base, 12, 3).persist(StorageLevel.MEMORY_AND_DISK)
    )

    # Pair-join stage, materialization disabled so the full join+distinct
    # plan is visible. The "after" pipeline passes the prior columns; the
    # "before" worktree has no explode_bands_with_priors, so this script
    # mirrors whichever shape the checked-out operator module exposes.
    if hasattr(nd, "explode_bands_with_priors"):
        exploded, prior_cols = nd.explode_bands_with_priors(bands_df, 4)
        pairs_lazy = nd.banded_candidate_pairs(
            exploded,
            max_bucket_size=2000,
            prior_match_cols=prior_cols,
            materialize=lambda df: df,
        )
    else:
        exploded = bands_df.select(
            "doc_id", F.posexplode("bands").alias("band_idx", "band_hash")
        )
        pairs_lazy = nd.banded_candidate_pairs(
            exploded, max_bucket_size=2000, materialize=lambda df: df
        )
    plans = {"neardup_pair_join": _explain(pairs_lazy)}

    # Verify stage over a materialized pair frame (what the pipeline
    # feeds it): before = hashed subtree inlined per join side; after =
    # one checkpointed hashed frame (Scan ExistingRDD on both sides).
    pairs = pairs_lazy.localCheckpoint(eager=True)
    plans["neardup_verify"] = _explain(nd._verify_pairs(pairs, base, 0.8))

    # CC symmetrize+seed prefix, built exactly as connected_components
    # does (operators/graph.py — the distinct is conditional there on
    # edges_distinct, selected here by the tag since the operator
    # checkpoints every round and exposes no internal frame).
    verified = nd._verify_pairs(pairs, base, 0.8).localCheckpoint(eager=True)
    clean = verified.select(
        F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
    ).dropna()
    fwd = clean
    rev = clean.select(F.col("b").alias("a"), F.col("a").alias("b"))
    sym = fwd.union(rev)
    if tag == "before":
        sym = sym.distinct()
    # The operator persists sym before seeding (rounds re-read it), and
    # the persist is a plan barrier: without it whole-plan optimization
    # legally collapses the distinct into the seed aggregation (min is
    # duplicate-insensitive) and the seed plan looks identical either way
    # — the real per-round cost lives in materializing the InMemoryRelation.
    sym = sym.persist(StorageLevel.MEMORY_AND_DISK)
    seed = (
        sym.groupBy("a")
        .agg(F.min("b").alias("__mb"))
        .select(
            F.col("a").alias("node"),
            F.least(F.col("a"), F.col("__mb")).alias("lbl"),
        )
    )
    plans["neardup_cc_seed"] = _explain(seed)

    os.makedirs(OUT_DIR, exist_ok=True)
    for name, plan in plans.items():
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
