from insect_observation_data_pipeline_spark.queries.testdata import QUERIES, flagship
from insect_observation_data_pipeline_spark.queries.oracle import ORACLE

__all__ = ["QUERIES", "ORACLE", "flagship"]
