from movie_recommendation_etl_spark.plans.registry import ORACLE, QUERIES, query

__all__ = ["ORACLE", "QUERIES", "query"]
