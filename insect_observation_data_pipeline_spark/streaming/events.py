"""Structured Streaming surface over the events table.

The reference is batch-only (SURVEY §2j) — this is a net-new capability
kept out of the oracle-checked path. Design:

- ``read_events_stream``: file-source stream with an explicit schema (no
  inference on a stream) — swap the path for a Kafka source in prod.
- ``windowed_event_counts``: tumbling event-time window + watermark, so
  late events are handled and state is bounded — the streaming form of the
  batch ``e1_hourly_event_stats`` query (same groupBy(window(...)) logical
  plan; Spark plans stateful aggregation under ``writeStream``).
- ``run_batch_backfill``: the SAME transformation applied in batch mode —
  one code path for backfill and live tail, the main reason to express the
  rollup over ``window()`` instead of ``date_trunc``.

Scale notes: state is keyed by (window, event_type) — cardinality bounded
by watermark horizon; shuffle partitions follow the session conf and AQE
does not apply to streaming, so size `spark.sql.shuffle.partitions`
against expected state, not batch data volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType(), True),
        StructField("ts", TimestampType(), True),
        StructField("user_id", LongType(), True),
        StructField("event_type", StringType(), True),
        StructField("value", DoubleType(), True),
        StructField("props", StringType(), True),
    ]
)


def read_events_stream(
    spark: SparkSession, path: str, fmt: str = "parquet"
) -> DataFrame:
    return (
        spark.readStream.format(fmt)
        .schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .load(path)
    )


def as_event_time(df: DataFrame, col: str) -> DataFrame:
    """Pin an event-time column to TIMESTAMP at the operator boundary.

    ``withWatermark`` (like ``unix_micros`` — the j14 driver failure)
    rejects TIMESTAMP_NTZ, which a vanilla Spark 4.x session infers from
    parquet files written without the UTC-adjusted flag. Streams built
    by ``read_events_stream`` carry an explicit TimestampType schema and
    are unaffected; this guard is for caller-supplied frames (their own
    ``spark.read.parquet`` on an unpinned session). NTZ -> TIMESTAMP
    reinterprets the wall clock in the session tz — an identity on the
    instant when the session runs UTC (this engine's documented
    assumption, session.py), and a fixed offset that cancels in every
    window/gap/horizon comparison otherwise."""
    if dict(df.dtypes).get(col) == "timestamp_ntz":
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def windowed_event_counts(
    events: DataFrame,
    *,
    window_duration: str = "1 hour",
    slide_duration: str | None = None,
    watermark_delay: str = "2 hours",
) -> DataFrame:
    """Tumbling (default) or sliding window counts per event type with a
    late-data watermark. ``slide_duration`` < ``window_duration`` puts
    each event in window/slide overlapping windows (state grows by the
    same factor — bounded by the watermark horizon either way)."""
    w = (
        F.window("ts", window_duration, slide_duration)
        if slide_duration
        else F.window("ts", window_duration)
    )
    return (
        as_event_time(events, "ts")
        .withWatermark("ts", watermark_delay)
        .groupBy(w.alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sessionized_event_counts(
    events: DataFrame,
    *,
    gap: str = "10 minutes",
    watermark_delay: str = "2 hours",
) -> DataFrame:
    """Per-session interval counts via the NATIVE ``session_window``
    stateful operator — the streaming twin of the batch e5 query (same
    logical plan; Spark merges windows within ``gap`` and finalizes a
    session once the watermark passes its close). State per key lives
    only until watermark + gap — bounded, unlike the unbounded
    lag()-rewrite which streaming cannot express."""
    return (
        as_event_time(events, "ts")
        .withWatermark("ts", watermark_delay)
        .groupBy(F.session_window(F.col("ts"), gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def run_batch_backfill(
    spark: SparkSession, path: str, fmt: str = "parquet"
) -> DataFrame:
    """Same rollup in batch mode (backfill path shares the stream code).

    Accepts the SAME path contract as :func:`read_events_stream` —
    any file/directory the format source can load, read with the same
    explicit schema (round-14 review: the old detour through
    ``read_table``'s ``{base}/{name}.parquet`` convention silently
    rewrote the path, so a directory that streamed fine failed the
    advertised backfill/live-tail parity with PATH_NOT_FOUND)."""
    events = spark.read.format(fmt).schema(EVENTS_SCHEMA).load(path)
    return windowed_event_counts(events)
