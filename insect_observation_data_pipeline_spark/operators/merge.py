"""Batch MERGE (upsert) as a pure recompute.

The reference's ON CONFLICT DO UPDATE (M2, 08_ETL2_part2.sql:60-66,
119-122, 178-185) mutates rows in place; Spark tables are immutable, so
the engine recomputes the post-merge state instead: updates win on key
collision, unmatched current rows survive, unmatched updates insert.
Same observable table, one anti-join instead of per-row index maintenance
— and the anti-join shuffles only the (deduped) key columns of the
current side. Delta Lake MERGE is the incremental file-level variant when
a table format with transaction support is in play.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def merge_upsert(
    current: DataFrame, updates: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """Post-merge state: ``updates`` replace same-key rows in ``current``,
    new keys append. ``updates`` must be unique per key (dedup upstream
    with ``distinct_on`` when merging a changelog)."""
    keys = list(keys)
    survivors = current.join(updates, keys, "left_anti")
    return updates.unionByName(survivors)
