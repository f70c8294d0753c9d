from movie_recommendation_etl_spark.operators.dedup import (
    SortSpec,
    dedup_keep_first,
)
from movie_recommendation_etl_spark.operators.joins import asof_join
from movie_recommendation_etl_spark.operators.topk import (
    grouped_top_k,
    grouped_top_k_two_stage,
    top_k,
)

__all__ = [
    "SortSpec",
    "asof_join",
    "dedup_keep_first",
    "grouped_top_k",
    "grouped_top_k_two_stage",
    "top_k",
]
