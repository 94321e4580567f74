"""DISTINCT ON — deterministic first-row-per-key.

Reproduces Postgres ``DISTINCT ON (k) ... ORDER BY k, o``
(/root/reference/03_sql/02_etl_csv_to_oltp/03_ETL1_part2.sql:108-127,
137-147,192-202; 04_ETL1_part3.sql:412-416) as
``row_number() OVER (PARTITION BY k ORDER BY o) = 1``.

The reference's ORDER BY is sometimes not a total order (SURVEY §7 risk
register) — Postgres then keeps an arbitrary row. Here callers must pass a
total order (add a unique tiebreak column) so results are stable across
runs, partitionings and engines.

Scale note: this is a single hash-shuffle on the key (same cost class as
the groupBy it replaces). For heavily skewed keys AQE skew-split applies
because the window partitions by the same key as the shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_RN = "__rn"


def distinct_on(
    df: DataFrame, keys: list[str | Column], order_by: list[Column]
) -> DataFrame:
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn(_RN, F.row_number().over(w))
        .filter(F.col(_RN) == 1)
        .drop(_RN)
    )
