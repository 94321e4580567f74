from insect_observation_data_pipeline_spark.plans.inspect import (
    executed_plan_string,
    formatted_plan,
    join_key_names,
    plan_flags,
    pushed_filters,
    simple_plan,
    read_schema_columns,
    shuffle_write_stages,
    shuffle_write_totals,
    unpartitioned_windows,
)

__all__ = [
    "executed_plan_string",
    "formatted_plan",
    "join_key_names",
    "plan_flags",
    "pushed_filters",
    "simple_plan",
    "read_schema_columns",
    "shuffle_write_stages",
    "shuffle_write_totals",
    "unpartitioned_windows",
]
