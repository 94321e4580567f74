"""Cross-engine-deterministic numeric helpers.

``round()`` is NOT portable across engines for doubles: Spark rounds the
shortest decimal representation with HALF_UP (BigDecimal.valueOf path), so
189/40 = 4.7249999999999996 renders as "4.725" and rounds to 4.73, while
DuckDB/Postgres round the raw binary double to 4.72. Any oracle-compared
column built with native round() can flip on such boundary values.

``stable_round`` instead computes floor(|x| * 10^d + 0.5) / 10^d with the
sign restored — every step is an IEEE-754 double op that evaluates
bit-identically on any engine. ``sround_sql`` emits the same formula as
ANSI SQL for the DuckDB oracles. The trailing ``+ 0.0`` folds -0.0 to 0.0
on both sides.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def stable_round(c: Column, digits: int = 2) -> Column:
    s = float(10**digits)
    sign = F.when(c < 0, F.lit(-1.0)).otherwise(F.lit(1.0))
    return F.floor(F.abs(c) * F.lit(s) + F.lit(0.5)) / F.lit(s) * sign + F.lit(0.0)


def sround_sql(expr: str, digits: int = 2) -> str:
    s = float(10**digits)
    return (
        f"((floor(abs({expr}) * {s} + 0.5) / {s})"
        f" * (CASE WHEN ({expr}) < 0 THEN -1.0 ELSE 1.0 END) + 0.0)"
    )
