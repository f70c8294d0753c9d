from movie_recommendation_etl_spark.functions.numeric import davg, dsum

__all__ = ["davg", "dsum"]
