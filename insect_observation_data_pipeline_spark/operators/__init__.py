from insect_observation_data_pipeline_spark.operators.quarantine import Rule, split_valid_invalid
from insect_observation_data_pipeline_spark.operators.dedupe import distinct_on
from insect_observation_data_pipeline_spark.operators.scd2 import scd2_end_date
from insect_observation_data_pipeline_spark.operators.asof import (
    asof_join,
    interval_join,
    priority_match,
    fallback_coalesce_join,
)
from insect_observation_data_pipeline_spark.operators.topk import top_k
from insect_observation_data_pipeline_spark.operators.merge import merge_upsert
from insect_observation_data_pipeline_spark.operators.skew import (
    salted_count_distinct,
    salted_join,
)
from insect_observation_data_pipeline_spark.operators.graph import (
    pagerank,
    triangle_counts,
    unpersist_intermediates,
)
from insect_observation_data_pipeline_spark.operators.rangejoin import band_join

__all__ = [
    "merge_upsert",
    "salted_join",
    "salted_count_distinct",
    "Rule",
    "split_valid_invalid",
    "distinct_on",
    "scd2_end_date",
    "asof_join",
    "interval_join",
    "priority_match",
    "fallback_coalesce_join",
    "top_k",
    "pagerank",
    "triangle_counts",
    "unpersist_intermediates",
    "band_join",
]
