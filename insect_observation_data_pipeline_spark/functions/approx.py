"""Approximate aggregates: the opt-in scale variants.

Oracle-checked queries use exact aggregation (`countDistinct`,
`percentile`) because hash equality demands it (SURVEY §4.5). At 100 TB
the approximate forms are the default choice — constant memory per group
instead of per-distinct-value state:

- ``approx_distinct``: HyperLogLog++ (`approx_count_distinct`), rsd
  defaults to 5%; sketch size ~ (1.04/rsd)^2 registers regardless of
  cardinality.
- ``approx_quantiles``: Greenwald-Khanna (`percentile_approx`) with a
  relative-error accuracy knob; exact percentile would buffer the whole
  group.

Both are single-pass, partial-aggregable (map-side combine), and plan
inside whole-stage codegen — the skew-safe exact rewrite lives in
``operators.skew.salted_count_distinct`` when exactness is required.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def approx_distinct(col: Column | str, *, rsd: float = 0.05) -> Column:
    """HLL++ distinct-count estimate with relative standard deviation ``rsd``."""
    return F.approx_count_distinct(col, rsd=rsd)


def approx_quantiles(
    col: Column | str, probabilities: Sequence[float], *, accuracy: int = 10_000
) -> Column:
    """Approximate quantiles at the given probabilities (array result).

    ``accuracy`` trades memory for error: relative error <= 1/accuracy.
    """
    return F.percentile_approx(
        col, F.array(*[F.lit(p) for p in probabilities]), F.lit(accuracy)
    )


def cm_bucket(term: Column, row: int, width: int) -> Column:
    """Count-min hash: row ``row``'s bucket for ``term`` in a width-
    ``width`` sketch. md5-prefix arithmetic (no engine-private hash), so
    any engine — and the DuckDB oracle — lands every term in the same
    bucket: bucket = int(md5(row ':' term)[:8], 16) % width."""
    h = F.md5(F.concat(F.lit(f"{row}:"), term))
    return (
        F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % width
    ).alias(f"bucket_{row}")


def cm_weights(term_counts, term_col: str, cnt_col: str, *,
               depth: int = 3, width: int = 1024):
    """Count-min sketch TABLE from exact per-term counts: one row per
    (sketch row, bucket) with the summed weight of all terms hashing
    there. This is the mergeable fixed-size state (depth x width cells)
    a 100 TB frequency pipeline keeps INSTEAD of vocabulary-sized exact
    counts — per partition the map-side combine caps at depth*width
    rows no matter how many distinct terms pass through, and cross-
    shard merge is cellwise addition (the same property the HLL/GK
    audit pins for distinct/quantiles). Estimates read back as
    min over rows of the term's bucket weight: never an underestimate
    (every occurrence of the term is in each of its buckets), over by
    at most the colliding mass, bounded by ~N/width per row."""
    rows = F.explode(
        F.array(*[F.lit(r) for r in range(depth)])
    ).alias("cm_row")
    exploded = term_counts.select(
        F.col(term_col).alias("__term"), F.col(cnt_col).alias("__cnt"), rows
    )
    bucketed = exploded.select(
        "cm_row",
        "__cnt",
        _cm_bucket_expr("__term", "cm_row", width).alias("bucket"),
    )
    return bucketed.groupBy("cm_row", "bucket").agg(
        F.sum("__cnt").alias("weight")
    )


def _cm_bucket_expr(term_col: str, row_col: str, width: int) -> Column:
    """cm_bucket with the row index as a COLUMN (post-explode form)."""
    h = F.md5(
        F.concat(F.col(row_col).cast("string"), F.lit(":"), F.col(term_col))
    )
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % width
