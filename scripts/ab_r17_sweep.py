"""One-off A/B adjudication of the r17 bench sweep's three open lines
(VERDICT r17 #2/#5):

  q57_repetition_metrics  — +87% (0.594 -> 1.109 s) on UNTOUCHED code, an
                            all-time high vs the r11-r16 envelope
                            (0.55-0.79); the round's `weak`. Re-measured
                            here under bench conditions (warm catalog,
                            min-of-N) on the current host.
  incremental_admit       — +34% (2.776 -> 3.733 s) the same round
                            right_size_materialized entered its path
                            (operators/incremental_dedup.py). A/B: the
                            shipping path vs the helper patched to a
                            no-op, fresh signature store per sample, so
                            the delta names the helper's real cost.
                            NOTE (post-adjudication): the measured ~4-5%
                            cost led r18 to REVERT the admission-path
                            call — on the current tree both arms run
                            identical code and the A/B reads ~0%; the
                            recorded comparison only reproduces against
                            the r17 tree (commit c9385d1^). The helper
                            still runs at the q50/q53 band hubs
                            (operators/neardup.py), which the monkeypatch
                            also covers if re-measuring those.
  batch_ann               — bimodal 1.9-4.2 s across identical code since
                            r11. N samples recorded individually (not
                            min-folded) so the mode split is visible.

Usage: python scripts/ab_r17_sweep.py [n_samples]
Prints one JSON line; the verdict lands in README's adjudication notes.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4

    import movie_recommendation_etl_spark.plans.all  # noqa: F401  (registry fill)
    from bench import host_calibration
    import movie_recommendation_etl_spark.operators.skew as skew
    from movie_recommendation_etl_spark.operators.incremental_dedup import (
        admit_new_documents,
    )
    from movie_recommendation_etl_spark.plans.registry import QUERIES
    from movie_recommendation_etl_spark.session import get_spark
    from movie_recommendation_etl_spark.sources.catalog import (
        load_table,
        warm_catalog,
    )

    spark = get_spark(app_name="ab_r17_sweep")
    spark.sparkContext.setLogLevel("ERROR")
    warm_catalog(spark, SF_DIR, eager=True)
    cal = host_calibration(spark)
    results: dict[str, object] = {
        "sf_dir": SF_DIR,
        "calibration_sec": cal,
        "loadavg_start": round(os.getloadavg()[0], 1),
    }

    def timed(fn) -> list[float]:
        out = []
        for _ in range(n):
            t0 = time.monotonic()
            fn()
            out.append(round(time.monotonic() - t0, 3))
        return out

    def _noop(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    # -- q57: plain re-measure (code untouched; the question is regime) --
    results["q57_repetition_metrics"] = timed(
        lambda: _noop(QUERIES["q57_repetition_metrics"](spark, SF_DIR))
    )

    # -- incremental_admit: shipping vs right-sizing no-op'd -------------
    def _admit_timed() -> float:
        store_dir = tempfile.mkdtemp(prefix="ab_sig_store_")
        try:
            docs = load_table(spark, SF_DIR, "documents")
            admit_new_documents(
                spark, docs.filter("doc_id % 2 = 0"), f"{store_dir}/store"
            )
            t0 = time.monotonic()
            admit_new_documents(
                spark, docs.filter("doc_id % 2 = 1"), f"{store_dir}/store"
            )
            return round(time.monotonic() - t0, 3)
        finally:
            shutil.rmtree(store_dir, ignore_errors=True)

    results["admit_with_rightsize"] = [_admit_timed() for _ in range(n)]

    real_rs = skew.right_size_materialized
    skew.right_size_materialized = lambda df, **kw: df
    try:
        results["admit_without_rightsize"] = [_admit_timed() for _ in range(n)]
    finally:
        skew.right_size_materialized = real_rs

    # -- batch_ann: individual samples, one fixture (the bench's shape) --
    from movie_recommendation_etl_spark.ml.ann import (
        batch_ann,
        fit_lsh,
        prepare_index,
    )
    from movie_recommendation_etl_spark.ml.tfidf import fit_document_vectors

    docs = load_table(spark, SF_DIR, "documents")
    _, vecs = fit_document_vectors(docs)
    vecs = vecs.cache()
    vecs.count()
    lsh = fit_lsh(vecs)
    index = prepare_index(lsh, vecs)
    q_batch = vecs.filter("doc_id % 37 = 0")
    results["batch_ann"] = timed(
        lambda: batch_ann(
            lsh, q_batch, index, "doc_id", "doc_id", top_k=5
        ).count()
    )
    index.unpersist()
    vecs.unpersist()

    results["loadavg_end"] = round(os.getloadavg()[0], 1)
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
