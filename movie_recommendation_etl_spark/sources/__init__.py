from movie_recommendation_etl_spark.sources.catalog import TABLES, load_table, register_views
from movie_recommendation_etl_spark.sources.readers import read_csv_robust, read_parquet

__all__ = ["TABLES", "load_table", "register_views", "read_csv_robust", "read_parquet"]
