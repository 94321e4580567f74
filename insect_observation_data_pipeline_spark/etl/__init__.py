from insect_observation_data_pipeline_spark.etl import etl1, etl2

__all__ = ["etl1", "etl2"]
