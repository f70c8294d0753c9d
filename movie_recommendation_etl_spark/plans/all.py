"""Import every query module so their @query decorators populate the registry.

Import order matters: the driver's correctness gate checks the FIRST 50
registered queries (VERDICT.md r2 #1), so modules whose queries have no other
hard signal (text_analysis, windows_ext) import before the big relational
suites. The registry is kept at <=50 total (asserted at the bottom) so every
query gets a driver CORRECTNESS row regardless.
"""

import movie_recommendation_etl_spark.plans.text_analysis  # noqa: F401
import movie_recommendation_etl_spark.plans.windows_ext  # noqa: F401
import movie_recommendation_etl_spark.plans.curation  # noqa: F401
import movie_recommendation_etl_spark.plans.dedup_similarity  # noqa: F401
import movie_recommendation_etl_spark.plans.events_stream  # noqa: F401
import movie_recommendation_etl_spark.plans.lookup  # noqa: F401
import movie_recommendation_etl_spark.plans.recommend  # noqa: F401
import movie_recommendation_etl_spark.plans.relational  # noqa: F401
import movie_recommendation_etl_spark.plans.relational_ext  # noqa: F401
import movie_recommendation_etl_spark.plans.scalars  # noqa: F401
import movie_recommendation_etl_spark.plans.training_pipeline  # noqa: F401

from movie_recommendation_etl_spark.plans.registry import QUERIES

DRIVER_QUERY_CAP = 50
if len(QUERIES) > DRIVER_QUERY_CAP:
    # explicit raise, not assert: this gate-critical invariant must survive
    # python -O (which strips asserts)
    raise RuntimeError(
        f"registry has {len(QUERIES)} queries but the driver correctness gate "
        f"checks only the first {DRIVER_QUERY_CAP}; consolidate suites "
        "(see VERDICT.md round 2, item 1) before registering more"
    )

__all__: list[str] = []
