"""Large-scale training-data pipeline operators (north-star extensions).

Not part of the reference's surface (BASELINE.json north_star): dedup,
similarity search, text analysis, multimodal plumbing — all built on
built-in Spark SQL expressions (no Python UDFs in any hot path) so they
whole-stage-codegen and scale like the rest of the engine.
"""

from insect_observation_data_pipeline_spark.llm import dedup, similarity, textstats, multimodal

__all__ = ["dedup", "similarity", "textstats", "multimodal"]
