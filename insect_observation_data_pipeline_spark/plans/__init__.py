from insect_observation_data_pipeline_spark.plans.inspect import (
    formatted_plan,
    join_key_names,
    plan_flags,
    pushed_filters,
    read_schema_columns,
    unpartitioned_windows,
)

__all__ = [
    "formatted_plan",
    "join_key_names",
    "plan_flags",
    "pushed_filters",
    "read_schema_columns",
    "unpartitioned_windows",
]
