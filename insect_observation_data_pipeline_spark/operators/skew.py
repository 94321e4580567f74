"""Skew-handling operators: salting for hot keys.

AQE's skew-join handling (`spark.sql.adaptive.skewJoin.enabled`, on by
default in this engine's session) splits oversized shuffle partitions at
runtime and is the first line of defense. These explicit operators cover
the cases AQE can't fix:

- ``salted_join``: a single hot key whose rows exceed one executor's
  memory even after AQE splitting (AQE splits partitions, not keys, for
  non-sort-merge plans; and broadcast isn't possible because the other
  side is also large). The large side gets a deterministic salt bucket
  per row, the small-but-unbroadcastable side is replicated once per
  bucket, so a hot key's rows spread over ``buckets`` shuffle partitions.
  Replication multiplies the small side's shuffle volume by ``buckets`` —
  use the smallest bucket count that levels the skew.
- ``salted_count_distinct``: exact COUNT(DISTINCT x) per key where one
  key dominates. Two-phase: dedup on (key, x) first (the skewed shuffle
  carries only distinct combinations), then count per key — the skew-safe
  rewrite of the single-pass expand that `countDistinct` plans.

Salts are deterministic (hash of the row's columns, not rand()) so
re-runs and retried tasks produce identical results — the same
determinism rule the surrogate keys follow (SURVEY §4.3).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def _row_salt(df: DataFrame, buckets: int) -> Column:
    """Deterministic per-row bucket: hash over every column, so a hot
    key's rows spread as long as any non-key column varies."""
    return F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(buckets))


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    *,
    buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with hot-key salting on the large side.

    Output is identical to ``large.join(small, on, how)``; only the
    physical key distribution changes. Join columns must be same-named
    on both sides (the coalesced-key USING form).

    Only ``inner`` and ``left`` are supported: the salting rewrite
    replicates the small side once per bucket, so for right/full outer
    joins every unmatched small-side row would be emitted once per salt
    bucket instead of once. Those joins need the mirrored rewrite (salt
    the small side, replicate the large) — not provided here.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left', got {how!r}: "
            "replicating the small side breaks right/full outer semantics "
            "(unmatched small rows would appear once per bucket)"
        )
    keys = list(on)
    salted_large = large.withColumn(SALT_COL, _row_salt(large, buckets))
    replicated_small = small.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(buckets)]))
    )
    return salted_large.join(replicated_small, keys + [SALT_COL], how).drop(SALT_COL)


def salted_count_distinct(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    *,
    alias: str = "n_distinct",
) -> DataFrame:
    """Exact per-key COUNT(DISTINCT value_col), skew-safe.

    Phase 1 shuffles on (keys, value) — a hot key's rows split across
    partitions by value. Phase 2 shuffles only the deduped combinations.
    Equivalent to ``groupBy(keys).agg(countDistinct(value_col))``,
    including NULL handling: ``count(value_col)`` skips the (key, NULL)
    row that ``distinct()`` keeps, so NULL is never counted as a distinct
    value, while keys whose values are all NULL still surface with 0
    (their group exists via the kept NULL row).
    """
    keys = list(keys)
    deduped = df.select(*keys, value_col).distinct()
    return deduped.groupBy(*keys).agg(F.count(value_col).alias(alias))
