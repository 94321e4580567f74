from insect_observation_data_pipeline_spark.functions.numeric import stable_round, sround_sql

__all__ = ["stable_round", "sround_sql"]
