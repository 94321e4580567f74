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

POLLINATION_QUALITIES = [
    (1, "Confirmed pollination"),
    (2, "Probable pollination"),
    (3, "Possible pollination"),
    (4, "Not a pollinator"),
]
