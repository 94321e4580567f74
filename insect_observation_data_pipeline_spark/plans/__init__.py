from insect_observation_data_pipeline_spark.plans.inspect import (
    formatted_plan,
    pushed_filters,
    read_schema_columns,
    plan_flags,
)

__all__ = ["formatted_plan", "pushed_filters", "read_schema_columns", "plan_flags"]
