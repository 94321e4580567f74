"""Stream-stream temporal joins over the events stream.

The batch engine attributes purchases to SCD2-style signup windows
(J9 / j9_interval_attribution). The streaming form can't see "the next
signup" (unbounded future), so the streaming-native equivalent is a
bounded-horizon attribution: join each purchase to signups within the
trailing ``horizon``. The time-range predicate is REQUIRED, not a
nicety — it's what lets Spark expire join state once the watermark
passes ``start_ts + horizon``; an unbounded stream-stream join would
buffer both sides forever.

The same function body runs on batch frames (identical predicate,
identical results on replay) — asserted in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from insect_observation_data_pipeline_spark.streaming.events import as_event_time


def attribute_purchases(
    purchases: DataFrame,
    signups: DataFrame,
    *,
    horizon: str = "7 days",
    watermark_delay: str = "1 hour",
) -> DataFrame:
    """Join purchases to same-user signups within the trailing horizon.

    Streaming: both sides watermarked; state for a signup is dropped once
    the watermark passes its horizon end. Batch: same expression, no
    state. Output: one row per (purchase, qualifying signup).
    """
    p = purchases.select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
    )
    s = signups.select(
        F.col("user_id").alias("s_user_id"),
        F.col("ts").alias("signup_ts"),
    )
    if purchases.isStreaming:
        p = as_event_time(p, "purchase_ts").withWatermark(
            "purchase_ts", watermark_delay
        )
        s = as_event_time(s, "signup_ts").withWatermark(
            "signup_ts", watermark_delay
        )
    cond = (
        (F.col("p_user_id") == F.col("s_user_id"))
        & (F.col("purchase_ts") >= F.col("signup_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("signup_ts") + F.expr(f"INTERVAL {horizon}")
        )
    )
    return p.join(s, cond, "inner").select(
        "purchase_id",
        F.col("p_user_id").alias("user_id"),
        "purchase_ts",
        "signup_ts",
    )
