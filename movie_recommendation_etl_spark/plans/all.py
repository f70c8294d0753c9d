"""Import every query module so their @query decorators populate the registry."""

import movie_recommendation_etl_spark.plans.dedup_similarity  # noqa: F401
import movie_recommendation_etl_spark.plans.events_stream  # noqa: F401
import movie_recommendation_etl_spark.plans.lookup  # noqa: F401
import movie_recommendation_etl_spark.plans.recommend  # noqa: F401
import movie_recommendation_etl_spark.plans.relational  # noqa: F401
import movie_recommendation_etl_spark.plans.relational_ext  # noqa: F401
import movie_recommendation_etl_spark.plans.scalars  # noqa: F401
import movie_recommendation_etl_spark.plans.text_analysis  # noqa: F401
import movie_recommendation_etl_spark.plans.windows_ext  # noqa: F401

__all__: list[str] = []
