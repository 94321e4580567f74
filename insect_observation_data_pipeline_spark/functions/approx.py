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
