"""insect_observation_data_pipeline_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query & data-processing capabilities of the
reference repo ``mrs-wilderness/insect-observation-data-pipeline`` (a
PostgreSQL batch-ETL pipeline for pollinator observation data), re-expressed
Spark-first:

- bronze/silver/gold layered ETL (CSV staging -> validated OLTP-shaped
  silver -> Kimball star gold) as pure DataFrame -> DataFrame functions,
- a relational operator library (quarantine split, DISTINCT ON, SCD2
  end-dating, interval/as-of attribution, priority match, deterministic
  top-k) built only on Catalyst-optimizable built-in expressions,
- large-scale training-data operators (dedup: exact/MinHash-LSH/SimHash/
  n-gram Jaccard; similarity search; text analysis; multimodal plumbing),
- a Structured Streaming surface over the events table.

No code is copied from the reference (which is pure PostgreSQL SQL); file:line
citations in docstrings point at the reference semantics being reproduced.
"""

__version__ = "0.1.0"

from insect_observation_data_pipeline_spark.session import get_spark

__all__ = ["get_spark", "__version__"]
