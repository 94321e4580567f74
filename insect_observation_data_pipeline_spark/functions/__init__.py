from insect_observation_data_pipeline_spark.functions.numeric import stable_round, sround_sql
from insect_observation_data_pipeline_spark.functions.approx import approx_distinct, approx_quantiles

__all__ = ["stable_round", "sround_sql", "approx_distinct", "approx_quantiles"]
