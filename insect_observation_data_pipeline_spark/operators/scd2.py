"""SCD2 interval construction (end-dating) from change events.

Reproduces the reference's two-phase "insert new interval, then UPDATE the
previous one's end_date" (W1/M3 in SURVEY §2:
/root/reference/03_sql/02_etl_csv_to_oltp/03_ETL1_part2.sql:160-188,
214-246; propagated to dims at 07_ETL2_part1.sql:92-130) as a single
``lead()`` window expression — the idiomatic Spark formulation: SCD2 state
is a pure function of the ordered change history, so no mutation pass is
needed and the whole thing stays in one shuffle on the entity key.

Semantics preserved:
- change rows are deduplicated per (entity, start) first, as the reference
  does via DISTINCT ON before inserting (03_ETL1_part2.sql:137-147);
- end_date = next start minus one unit (the reference subtracts
  INTERVAL '1 day', 03_ETL1_part2.sql:183); pass ``closed_end=False`` for
  half-open [start, next_start) intervals (timestamps);
- the current interval keeps end = NULL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def scd2_end_date(
    df: DataFrame,
    entity_keys: list[str],
    start_col: str,
    *,
    end_col: str = "end_date",
    order_tiebreak: list[Column] | None = None,
    closed_end: bool = True,
) -> DataFrame:
    """Add ``end_col``: day-before-next-start (closed) or next-start (open).

    Rows must already be one-per-(entity, start) — use
    :func:`~insect_observation_data_pipeline_spark.operators.dedupe.distinct_on` first, mirroring the
    reference's dedup-before-insert.
    """
    if closed_end:
        # loud guard (round-13 review): date_sub CASTS a timestamp
        # start to DATE, silently truncating the end bound to midnight
        # (intervals then overlap by up to a day against a timestamp
        # probe and the end column's type diverges from the start's)
        dt = df.schema[start_col].dataType.typeName()
        if dt.startswith("timestamp"):
            raise ValueError(
                f"scd2_end_date: start col {start_col!r} is {dt}; "
                "closed 'minus one day' end-dating is a DATE semantic — "
                "pass closed_end=False for half-open timestamp intervals"
            )
    order = [F.col(start_col).asc()] + (order_tiebreak or [])
    w = Window.partitionBy(*entity_keys).orderBy(*order)
    nxt = F.lead(F.col(start_col)).over(w)
    end = F.date_sub(nxt, 1) if closed_end else nxt
    return df.withColumn(end_col, end)
