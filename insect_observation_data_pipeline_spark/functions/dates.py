"""Date assembly + repair functions from the reference ETL.

Reference semantics reproduced (file:line into /root/reference/):
- impossible-date clamping (Apr/Jun/Sep/Nov 31 -> 30; Feb 29-31 -> 28,
  even in leap years — a deliberate quirk): 04_ETL1_part3.sql:370-377
- observation-date build with the January placeholder (missing month -> 1,
  missing day -> 1, missing year -> NULL date): 04_ETL1_part3.sql:379-388
  Downstream analytics EXCLUDE January because of this placeholder
  (05_queries/olap_queries.sql:6,13).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def clamp_day(month: Column, day: Column) -> Column:
    """Clamp impossible day-of-month values. Deliberately NOT
    leap-year-aware — Feb always clamps to 28, the reference quirk
    (04_ETL1_part3.sql:370-377) — which is why this takes no year
    (round-13: the unread ``year`` parameter implied calendar-correct
    clamping this function must never do)."""
    return (
        F.when(month.isin(4, 6, 9, 11) & (day > 30), F.lit(30))
        .when((month == 2) & (day > 28), F.lit(28))
        .otherwise(day)
    )


def build_observation_date(year: Column, month: Column, day: Column) -> Column:
    """make_date with the January/day-1 placeholder; NULL year -> NULL."""
    m = F.coalesce(month, F.lit(1))
    d0 = F.coalesce(day, F.lit(1))
    d = clamp_day(m, d0)
    return F.when(year.isNull(), F.lit(None).cast("date")).otherwise(
        F.make_date(year, m, d)
    )
