"""Import every query module so their @query decorators populate the registry."""

import movie_recommendation_etl_spark.plans.relational  # noqa: F401

__all__: list[str] = []
