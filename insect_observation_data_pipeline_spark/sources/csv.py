"""CSV staging sources (schema-on-load: every column lands as string).

Reproduces the reference's COPY-into-all-TEXT-staging pattern
(/root/reference/03_sql/02_etl_csv_to_oltp/02_ETL1_part1.sql:7-27,
04_ETL1_part3.sql:43-46): header CSVs, optional LATIN1 encoding, optional
column subset with defaulted constants
(02_ETL1_part1.sql:24 defaults country='United Kingdom').

All-string schemas are declared explicitly (never inferSchema — a second
pass over 100 TB of CSV just to guess types is wasted IO, and inference is
non-deterministic under sampling). Typing happens downstream in the silver
layer where failures can be quarantined row-by-row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType


def all_string_schema(columns: list[str]) -> StructType:
    return StructType([StructField(c, StringType(), True) for c in columns])


def read_csv_staging(
    spark: SparkSession,
    path: str,
    columns: list[str],
    *,
    delimiter: str = ",",
    encoding: str = "UTF-8",
    defaults: dict[str, str] | None = None,
) -> DataFrame:
    """Read a header CSV into an all-string staging DataFrame.

    ``defaults`` adds constant columns not present in the file (S3 in
    SURVEY §2a) — a key that collides with ``columns`` raises instead of
    silently overwriting the file's values (round-13 review).
    ``encoding='ISO-8859-1'`` covers the reference's LATIN1 observations
    file (04_ETL1_part3.sql:46).

    ``enforceSchema`` is disabled (round-13 review): Spark's default
    binds a user schema POSITIONALLY and discards the header, so a file
    whose column order drifted from ``columns`` was silently mis-mapped
    column-for-column; with it off, Spark validates header names against
    the schema and fails loudly on drift.
    """
    bad_defaults = set(defaults or {}) & set(columns)
    if bad_defaults:
        raise ValueError(
            f"defaults {sorted(bad_defaults)} collide with file columns — "
            "a constant would silently overwrite every row's value"
        )
    df = (
        spark.read.option("header", True)
        .option("delimiter", delimiter)
        .option("encoding", encoding)
        # keep malformed lines: staging never drops rows silently — the
        # quarantine layer decides.
        .option("mode", "PERMISSIVE")
        .option("enforceSchema", False)
        .schema(all_string_schema(columns))
        .csv(path)
    )
    for col, value in (defaults or {}).items():
        df = df.withColumn(col, F.lit(value))
    return df
