"""Streaming write-side: maintain a keyed warehouse table from a stream.

``foreachBatch`` is Spark's bridge from a stream to batch-only sinks: per
micro-batch the handler gets an ordinary DataFrame and full batch APIs.
Here it maintains a last-value-per-key materialized view (the streaming
twin of the u1 upsert recompute):

- ORDER-AWARE merge, not arrival-order last-wins: the current state and
  the batch are unioned and reduced with ``distinct_on`` by the event
  order columns DESC. File-source micro-batches carry no ordering
  guarantee (a replay can deliver old files after new ones), so an
  upsert keyed on arrival would silently regress rows; keeping the
  max-order row per key is idempotent under any delivery order and under
  epoch replays (exactly-once effect from at-least-once delivery).
- State rewrite goes to a temp dir then swaps into place — on a local
  filesystem that is one directory rename; on an object store use a
  transactional table format (Delta/Iceberg) instead, same handler shape.

State size = one row per key, read+rewritten per epoch: right for
dimension-scale keyed views (the use case). For event-scale state use
``applyInPandasWithState`` (streaming/stateful.py), which keeps state in
the state store instead of the warehouse.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from insect_observation_data_pipeline_spark.operators.dedupe import distinct_on


def merge_latest(
    current: DataFrame | None,
    batch: DataFrame,
    keys: list[str],
    order_by: list[Column],
) -> DataFrame:
    """Max-order row per key over current state + new batch."""
    merged = batch if current is None else current.unionByName(batch)
    return distinct_on(merged, list(keys), order_by)


def keyed_state_sink(
    path: str,
    keys: list[str],
    order_cols: list[str],
):
    """Build a ``foreachBatch`` handler maintaining last-row-per-key at
    ``path`` (parquet), ordered by ``order_cols`` (ties broken by the
    later column(s); pass a unique tiebreak for determinism)."""
    order_by = [F.col(c).desc() for c in order_cols]

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        current = None
        if os.path.exists(path):
            current = spark.read.parquet(path)
        merged = merge_latest(current, batch_df, keys, order_by)
        tmp = f"{path}.tmp-{epoch_id}"
        merged.write.mode("overwrite").parquet(tmp)
        if os.path.exists(path):
            shutil.rmtree(path)
        os.rename(tmp, path)

    return handle
