"""Static seed data (VALUES-list inserts).

Reproduces the reference's seeded lookup rows
(/root/reference/03_sql/01_oltp/01_create_oltp.sql:130-150:
subscription_types, pollination_qualities, the 'Unaffiliated' institution).
Seeds are tiny literal frames; idempotence comes from recompute-overwrite
(M1 in SURVEY §2i), not ON CONFLICT.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def seed_frame(
    spark: SparkSession, rows: Sequence[tuple], schema: StructType | str
) -> DataFrame:
    return spark.createDataFrame(list(rows), schema)


SUBSCRIPTION_TYPES = [
    ("Free",),
    ("Pro",),
    ("HiveMind",),
    ("FieldScout",),
    ("BeeWatch+",),
]

# (pollination_quality_id, quality_code, description) — seed VALUES from
# 01_create_oltp.sql:139-145; ids follow insert order (SERIAL).
POLLINATION_QUALITIES = [
    (1, 1, "pollination confirmed"),
    (2, 2, "pollination inferred"),
    (3, 3, "pollination inferred from circumstantial evidence"),
    (4, 4, "no pollination, the visitor is not a pollinator"),
]

POLLINATION_QUALITIES_SCHEMA = (
    "pollination_quality_id SMALLINT, quality_code SMALLINT, description STRING"
)


def pollination_qualities(spark: SparkSession) -> DataFrame:
    return seed_frame(spark, POLLINATION_QUALITIES, POLLINATION_QUALITIES_SCHEMA)
