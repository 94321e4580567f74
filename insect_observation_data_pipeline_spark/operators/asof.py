"""Temporal attribution operators: interval join, priority match, fallback.

Reproduce the reference's SCD2-window attribution logic:

- interval join (J9): match an event date into a validity window
  ``start <= d AND (end IS NULL OR d <= end)``
  (/root/reference/03_sql/02_etl_csv_to_oltp/04_ETL1_part3.sql:401-405;
  04_etl_oltp_to_olap/08_ETL2_part2.sql:98-101,160-163);
- priority match (J11): rank candidate matches 1=active-interval,
  2=null-dates+current, 3=before-first-interval, 4=else and keep the best
  per row (04_ETL1_part3.sql:396-416);
- fallback pair (J12): COALESCE of an exact interval lookup and an
  "earliest interval" lookup (08_ETL2_part2.sql:85,98-104,143,160-166).

Physical strategy: all three keep an EQUI component (the entity key) so
Catalyst plans a shuffled hash / sort-merge join with the range residual as
a post-join filter — never a cross join. At 100 TB the windows side (SCD2
dims) is orders of magnitude smaller than the fact side; broadcast it when
it fits (callers can wrap in ``F.broadcast``). If a windows-per-entity
explosion ever made the residual hot, the rewrite is the classic as-of:
union probe+build, one window ``last(value, ignorenulls)`` over
(entity, time) — kept in mind, not needed at reference semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def interval_join(
    probe: DataFrame,
    windows: DataFrame,
    on: list[str],
    probe_time: str,
    win_start: str,
    win_end: str,
    *,
    how: str = "inner",
    closed_end: bool = True,
) -> DataFrame:
    """Join each probe row to the validity window containing its time."""
    # qualify the time columns like the equi keys (round-13 review):
    # bare F.col raises AMBIGUOUS_REFERENCE whenever the two frames
    # share a time column name (e.g. probing SCD2 output, which has its
    # own start_date, against another SCD2 table)
    upper = (
        windows[win_end].isNull()
        | (
            probe[probe_time] <= windows[win_end]
            if closed_end
            else probe[probe_time] < windows[win_end]
        )
    )
    cond = [probe[k] == windows[k] for k in on] + [
        probe[probe_time] >= windows[win_start],
        upper,
    ]
    joined = probe.join(windows, cond, how)
    # drop the duplicate equi-key columns from the windows side
    for k in on:
        joined = joined.drop(windows[k])
    return joined


def priority_match(
    probe: DataFrame,
    candidates: DataFrame,
    on: list[str],
    probe_key: list[str],
    priority: Column,
    order_by: list[Column],
    *,
    how: str = "left",
) -> DataFrame:
    """Keep the single best candidate row per probe row.

    ``priority`` is evaluated on the joined row (lower = better), matching
    the reference's CASE ladder (04_ETL1_part3.sql:401-409); ``order_by``
    breaks ties *totally* so the pick is deterministic (the reference's
    ORDER BY priority, start_date is not a total order — SURVEY §7).
    """
    cond = [probe[k] == candidates[k] for k in on]
    joined = probe.join(candidates, cond, how)
    for k in on:
        joined = joined.drop(candidates[k])
    tagged = joined.withColumn("__prio", priority)
    # nulls LAST (round-13 review): a CASE ladder without an ELSE (or a
    # condition over a nullable column evaluating UNKNOWN) yields a
    # NULL priority, and plain asc() would sort that candidate FIRST —
    # silently beating a genuine priority-1 match
    w = Window.partitionBy(*probe_key).orderBy(
        F.col("__prio").asc_nulls_last(), *order_by
    )
    return (
        tagged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__prio", "__rn")
    )


def fallback_coalesce_join(
    probe: DataFrame,
    primary: DataFrame,
    secondary: DataFrame,
    primary_cond: list[Column],
    secondary_cond: list[Column],
    pick: list[tuple[str, Column, Column]],
) -> DataFrame:
    """Two LEFT JOINs + COALESCE(primary.col, secondary.col) per picked col.

    ``pick`` is (output_name, primary_col, secondary_col). Mirrors the
    reference's active-subscription-else-earliest pattern
    (08_ETL2_part2.sql:85,98-104).
    """
    out = probe.join(primary, primary_cond, "left").join(
        secondary, secondary_cond, "left"
    )
    for name, pcol, scol in pick:
        out = out.withColumn(name, F.coalesce(pcol, scol))
    return out


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    *,
    left_ts: str,
    right_ts: str,
    payload: list[str],
    how: str = "inner",
) -> DataFrame:
    """As-of join: attach the most recent right row at-or-before each
    left row's timestamp.

    Implemented as union + running ``last(ignorenulls)`` over a
    (keys, time) window — the scale form of the interval join's window
    rewrite (SURVEY §4.2): ONE shuffle on the key columns, state bounded
    by the window frame, and no join-explosion risk however many right
    rows precede a left row. At equal timestamps the right row wins
    (``>=`` as-of semantics: right sorts before left on the tie).

    ``payload`` columns must not collide with left column names.
    ``how='inner'`` drops left rows with no preceding right row;
    ``'left'`` keeps them with null payload.

    Match detection rides a struct whose first field is the right row's
    own timestamp — never NULL for a real right row — so a most-recent
    right row with genuinely NULL payload values is still the match (its
    NULLs are returned), instead of being skipped in favor of an older
    non-null value. Matches DuckDB ASOF JOIN semantics for nullable
    payloads.

    Determinism on right-side ties: when several right rows share
    (keys, right_ts), the window order is completed with the md5 of
    the payload struct's JSON — an arbitrary but PARTITIONING-STABLE
    total order, so repeated runs pick the same row (the repo's
    total-order tiebreak rule; without it ``last`` returns whichever
    row the sort happened to place last).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"asof_join supports how='inner'|'left', got {how!r}")
    # JOIN semantics on NULLs (round-12 review): an equi-join never
    # matches a NULL key, and `l.ts >= r.ts` is UNKNOWN for a NULL
    # right timestamp — but the window rewrite would happily group
    # NULL keys into one partition and sort a NULL __ts FIRST (an
    # always-preceding phantom match). Drop right rows with a NULL key
    # or NULL timestamp up front: they can never be the as-of match.
    # Left rows with NULL keys then simply find no right row in their
    # partition — inner drops them, left null-extends them — exactly
    # DuckDB ASOF JOIN behavior.
    right_matchable = right
    for c in [*on, right_ts]:
        right_matchable = right_matchable.filter(F.col(c).isNotNull())
    rt = right_matchable.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(
            F.col(right_ts).alias("__match_ts"), *[F.col(p) for p in payload]
        ).alias("__m"),
    )
    lt = (
        left.withColumn("__ts", F.col(left_ts))
        .withColumn("__side", F.lit(1))
        .withColumn("__m", F.lit(None).cast(rt.schema["__m"].dataType))
    )
    unioned = lt.unionByName(rt, allowMissingColumns=True)
    w = (
        Window.partitionBy(*on)
        .orderBy(
            F.col("__ts").asc(),
            F.col("__side").asc(),
            # tie-break equal-(keys, ts) right rows deterministically
            F.md5(F.to_json(F.col("__m"))).asc_nulls_last(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.withColumn("__m", F.last("__m", ignorenulls=True).over(w))
    out = filled.filter(F.col("__side") == 1)
    if how == "inner":
        out = out.filter(F.col("__m").isNotNull())
    out = out.select(
        *[c for c in left.columns],
        *[F.col(f"__m.{p}").alias(p) for p in payload],
    )
    return out
