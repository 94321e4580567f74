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


def _null_payload(df: DataFrame, keys: list[str]) -> list[Column]:
    """Typed-NULL stand-ins for a side's non-key columns, schema order."""
    return [
        F.lit(None).cast(f.dataType).alias(f.name)
        for f in df.schema.fields
        if f.name not in keys
    ]


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

    ``inner`` and ``left`` salt directly: the small side is replicated
    once per bucket, which never changes either side's emitted
    multiplicity for those join types.

    ``right`` and ``full`` cannot be salted directly (an unmatched
    small-side row would surface once per bucket), so they decompose
    exactly: salted INNER core + the unmatched rows of each preserved
    side found with an anti-join against the other side's DISTINCT
    keys. Only the SMALL side's distinct keys are explicitly broadcast
    (bounded by the broadcastable table). The large side's distinct
    keys can be billions of rows — forcing those through a broadcast
    build would OOM at exactly the scale this operator targets — so
    that anti-join is left to the planner: it shuffles on the keys,
    and its skew exposure is bounded by the SMALL side's row count per
    key, not the hot key's large-side multiplicity. Output column
    order is keys + large payload + small payload for every branch.
    """
    keys = list(on)
    if buckets < 1 or buckets != int(buckets):
        # same guard class as band_join's delta (round-13 review):
        # buckets=0 makes the salt pmod(hash, 0) — DIVIDE_BY_ZERO under
        # ANSI, NULL salt + zero replicas otherwise, i.e. a silently
        # EMPTY inner join; negative buckets replicate into zero
        # buckets the same way
        raise ValueError(
            f"salted_join needs an integer buckets >= 1, got {buckets!r}"
        )
    if how in ("inner", "left"):
        salted_large = large.withColumn(SALT_COL, _row_salt(large, buckets))
        replicated_small = small.withColumn(
            SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(buckets)]))
        )
        return salted_large.join(
            replicated_small, keys + [SALT_COL], how
        ).drop(SALT_COL)
    if how not in ("right", "full"):
        raise ValueError(
            f"salted_join supports how='inner'|'left'|'right'|'full', got {how!r}"
        )
    large_payload = [c for c in large.columns if c not in keys]
    small_payload = [c for c in small.columns if c not in keys]
    cols = keys + large_payload + small_payload
    inner_core = salted_join(large, small, keys, buckets=buckets, how="inner")
    parts = [inner_core.select(*cols)]
    if how == "full":
        unmatched_large = large.join(
            F.broadcast(small.select(*keys).distinct()), keys, "left_anti"
        ).select(*keys, *large_payload, *_null_payload(small, keys))
        parts.append(unmatched_large)
    unmatched_small = small.join(
        large.select(*keys).distinct(), keys, "left_anti"
    ).select(*keys, *_null_payload(large, keys), *small_payload)
    parts.append(unmatched_small)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


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
