from insect_observation_data_pipeline_spark.sources.parquet import read_table, read_tables
from insect_observation_data_pipeline_spark.sources.csv import read_csv_staging
from insect_observation_data_pipeline_spark.sources.seed import seed_frame

__all__ = ["read_table", "read_tables", "read_csv_staging", "seed_frame"]
