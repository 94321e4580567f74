"""Deterministic top-k.

The reference's ``ORDER BY metric DESC LIMIT n`` queries
(/root/reference/03_sql/05_queries/oltp_queries.sql:14-15,47-48;
olap_queries.sql:15-16,33-35,68-69) are tie-unstable: two rows with equal
metric can swap across runs/engines. ``top_k`` forces callers to supply
tiebreak columns producing a total order, so results are reproducible and
oracle-comparable.

Physical plan: Spark compiles orderBy+limit to TakeOrderedAndProject —
each partition keeps a k-row heap, then the driver merges k*numPartitions
rows. No full sort, no full shuffle; this is exactly the plan you want at
100 TB (k rows per partition travel, not the data).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame


def top_k(df: DataFrame, order_by: list[Column], k: int) -> DataFrame:
    return df.orderBy(*order_by).limit(k)
