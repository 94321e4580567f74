"""Surrogate keys: hash-of-business-key (SERIAL replacement).

The reference's dims use SERIAL ids (01_create_oltp.sql,
05_create_olap.sql); round 1 replaced them with ``row_number()`` over an
unpartitioned window — deterministic, but a global sort that funnels the
whole input through ONE partition. Harmless for 25-row dims, a scale
killer for anything that grows with the fact table (locations,
user_institution at 100×).

``xxhash64(entity_name, business_key...)`` instead is per-row and
shuffle-free: no window, no sort, no single-partition funnel, same key
for the same business row on any cluster size or run. The entity name
salts the hash so equal business values in different tables get distinct
keys. Collision odds for a 64-bit key are ~n^2/2^65 — ~3e-10 at a
million dim rows — and ``assert_unique`` turns a collision into a loud
failure instead of a silent fold (used by the ETL tests; call it in a
pipeline validation step when dims are rebuilt).

Downstream joins are unaffected: every FK in the ETL is propagated by
joining on the business key and carrying the surrogate, never by
arithmetic on key values.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_sk(entity: str, cols: Sequence[Column]) -> Column:
    """64-bit deterministic surrogate key over the business key columns.

    Each value column is paired with its ``isNull()`` flag (round-13
    review): Spark's XxHash64 SKIPS a NULL child — the running seed
    passes through unchanged — so without the flags, keys that differ
    only in WHICH column is NULL collide with probability 1
    (``('X', NULL)`` vs ``(NULL, 'X')`` vs ``('X',)``). The flag column
    is never NULL, so every position contributes at least one hash step
    and the n^2/2^65 random-collision bound actually holds.
    """
    flagged = [x for c in cols for x in (c, c.isNull())]
    return F.xxhash64(F.lit(entity), *flagged)


def with_hash_sk(df: DataFrame, name: str, business_cols: Sequence[str]) -> DataFrame:
    """Add surrogate column ``name`` hashed from ``business_cols``.

    ``business_cols`` must be unique per row (the caller's distinct /
    distinct_on guarantees it); verify with ``assert_unique`` in tests.
    """
    return df.withColumn(name, hash_sk(name, [F.col(c) for c in business_cols]))


def assert_unique(df: DataFrame, col: str) -> None:
    """Raise if ``col`` has duplicate values (hash collision or a
    non-unique business key). One action; run on small dims / in tests."""
    dup = (
        df.groupBy(col).count().filter(F.col("count") > 1).limit(1).collect()
    )
    if dup:
        raise ValueError(
            f"surrogate key {col!r} not unique: value {dup[0][0]!r} appears "
            f"{dup[0][1]} times (hash collision or non-unique business key)"
        )
