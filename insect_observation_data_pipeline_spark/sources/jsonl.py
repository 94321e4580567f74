"""JSON-lines source with corrupt-record quarantine.

JSONL is the lingua franca of training-data interchange; the reader
follows the same schema-on-load discipline as the CSV staging source
(sources/csv.py): an EXPLICIT schema, never inference (a sampling pass
over 100 TB of JSONL to guess types is wasted IO and non-deterministic),
and malformed lines flow into the engine's quarantine pattern instead of
being silently dropped or failing the job.

Formulation: read raw lines with the text source, parse with the
``from_json`` EXPRESSION in PERMISSIVE mode carrying a corrupt-record
field. This sidesteps the reader-internal ``_corrupt_record`` column,
which Spark refuses to query in isolation
(UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN) unless the whole
parse is cached — a non-starter at 100 TB. Here parse + split are plain
projections over ONE text scan, no cache, fully codegen'd.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType,
) -> DataFrame:
    """Parse JSONL into ``schema``'s columns plus ``_corrupt_record``
    (NULL for clean rows, the raw line for malformed/mistyped ones).

    Blank / whitespace-only lines are DROPPED before parsing (the
    JSON-lines convention treats them as record separators, not
    records). Every other line the parser cannot turn into a record —
    including inputs like a bare ``null``, where from_json returns a
    NULL struct with the corrupt field unset — is quarantined with its
    raw text (round-13 review: the NULL-struct shape previously slipped
    into the GOOD output as an all-NULL row)."""
    parse_schema = StructType(
        list(schema.fields) + [StructField(CORRUPT_COL, StringType(), True)]
    )
    parsed = (
        spark.read.text(path)
        .filter(F.col("value").rlike(r"\S"))
        .select(
            F.col("value").alias("__raw"),
            F.from_json(
                F.col("value"),
                parse_schema,
                {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
            ).alias("j"),
        )
    )
    fields = [F.col(f"j.`{f.name}`").alias(f.name) for f in schema.fields]
    corrupt = (
        F.when(F.col("j").isNull(), F.col("__raw"))
        .otherwise(F.col(f"j.`{CORRUPT_COL}`"))
        .alias(CORRUPT_COL)
    )
    return parsed.select(*fields, corrupt)


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good, quarantine): good rows typed without the corrupt column;
    quarantine rows carry error_message + the raw offending line —
    shaped like the reference's ``invalid_*`` tables
    (02_ETL1_part1.sql:15-21)."""
    good = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.lit("Malformed JSON line.").alias("error_message"),
        F.col(CORRUPT_COL).alias("row_data"),
    )
    return good, bad
