"""Explicit release for library-internal persisted frames.

Several operators persist intermediate frames their RESULT plan
references (dedup's shingle/signature frames, graph's edge/degree
frames, tf-cosine's tf/vector frames). The persists stay pinned for
the session after the caller materializes the result; Python GC does
eventually release them through Spark's ContextCleaner, but a
long-lived ingest loop should not depend on GC timing for
corpus-sized caches.

The mechanism (round-12 generalization of graph.py's historical
``_graph_intermediates``; every operator migrated to the shared tag in
round 13): the operator tags its returned DataFrame with the persisted
frames via :func:`tag_intermediates`; a caller that wants surgical
release calls :func:`unpersist_intermediates` AFTER materializing
(collect/write) the result. Harnesses that time many queries keep
using session-wide ``spark.catalog.clearCache()`` between runs instead
(bench.py, tools/scaling.py).
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame

#: attribute names scanned by :func:`unpersist_intermediates`
_TAG_ATTRS = ("_persisted_intermediates",)


def tag_intermediates(df: DataFrame, frames: Iterable[DataFrame]) -> DataFrame:
    """Attach the operator's persisted intermediates to its result."""
    df._persisted_intermediates = tuple(frames)
    return df


def unpersist_intermediates(df: DataFrame, blocking: bool = False) -> None:
    """Release the persisted frames backing an operator result.

    No-op on DataFrames no operator tagged. Call only after the result
    is materialized — the frames back the result's PLAN, so an
    un-materialized result would recompute them from source."""
    for attr in _TAG_ATTRS:
        for frame in getattr(df, attr, ()):
            frame.unpersist(blocking=blocking)
