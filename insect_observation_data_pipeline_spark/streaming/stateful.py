"""Custom stateful streaming operators over the events stream.

The reference is batch-only (SURVEY §2j); these are the net-new streaming
capabilities a training-data pipeline needs beyond windowed aggregation:

- ``sessionize_stateful``: gap-based sessionization as an
  ``applyInPandasWithState`` operator — arbitrary per-key state Spark's
  built-in windowed aggs can't express (session count depends on the gap
  to the *previous* event, not on a fixed window grid). The streaming
  twin of the batch ``e2_sessionization`` query: on a single-batch
  replay the outputs are identical (asserted in tests).
- ``dedup_stream``: exactly-once-per-key streaming dedup via
  ``dropDuplicatesWithinWatermark`` — state is bounded by the watermark
  horizon instead of growing forever, the scale-safe form of streaming
  exact dedup.

Scale notes: state lives in the state store keyed by user_id — one entry
per active user, independent of event volume; the update function sees
Arrow batches per key (no per-row Python hop). The gap logic itself is a
pure function (``advance_session_state``) so cross-batch continuation is
unit-testable without a streaming harness.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

SESSION_GAP_US = 600 * 1_000_000  # 10 min idle starts a new session

SESSION_STATE_SCHEMA = StructType(
    [
        StructField("last_ts_us", LongType(), True),
        StructField("n_sessions", LongType(), True),
        StructField("n_events", LongType(), True),
    ]
)

SESSION_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), True),
        StructField("n_events", LongType(), True),
        StructField("n_sessions", LongType(), True),
    ]
)


def advance_session_state(
    last_ts_us: int | None,
    n_sessions: int,
    n_events: int,
    ts_us_sorted: list[int],
    gap_us: int = SESSION_GAP_US,
) -> tuple[int | None, int, int]:
    """Fold a sorted batch of event timestamps into session state.

    Pure function so the cross-batch semantics (a session spanning a
    micro-batch boundary must NOT be double-counted) are testable without
    Spark. Matches the batch lag()-gap formulation exactly: the first
    event ever opens session 1; an event > gap after its predecessor
    opens a new one.
    """
    for ts in ts_us_sorted:
        if last_ts_us is None or ts - last_ts_us > gap_us:
            n_sessions += 1
        last_ts_us = ts
        n_events += 1
    return last_ts_us, n_sessions, n_events


def _ts_micros(series) -> list[int]:
    """Event timestamps as microsecond ints with NULLs DROPPED. A NaT
    run through .astype('int64') silently becomes int64 min, which
    would open a phantom first session and satisfy every 'strictly
    after' funnel comparison — null event times carry no ordering
    information, so the folds must never see them."""
    s = series.astype("datetime64[us]")
    s = s[s.notna()]
    return [int(v) for v in s.astype("int64")]


def _ts_event_pairs(pdf) -> list[tuple[int, str]]:
    """(ts_us, event_type) pairs with null-ts rows dropped (see
    :func:`_ts_micros`)."""
    mask = pdf["ts"].notna()
    ts = pdf.loc[mask, "ts"].astype("datetime64[us]").astype("int64")
    return list(zip((int(v) for v in ts), pdf.loc[mask, "event_type"]))


def _with_idle_eviction(update_fn, idle_timeout_ms: int | None):
    """Wrap a NoTimeout update function with ProcessingTime idle
    eviction (round-12 review: per-key state otherwise grows with every
    key ever seen — unbounded on a stream with a growing population).
    ``idle_timeout_ms=None`` keeps the exact unbounded semantics. With a
    timeout, a key idle for that duration has its state REMOVED after
    its latest counts were already emitted (update mode emits per
    batch), so a key that returns later starts fresh — the documented
    trade for bounded state, analogous to ``dedup_stream``'s
    watermark-bounded horizon."""
    if idle_timeout_ms is None:
        return update_fn

    def run(key, pdfs, state):
        if state.hasTimedOut:
            # latest totals were emitted when last updated; just evict
            state.remove()
            return
        yield from update_fn(key, pdfs, state)
        # (re)arm AFTER the fold updated state — each batch a key
        # appears in pushes its eviction out by idle_timeout_ms
        # (PySpark's setTimeoutDuration takes int milliseconds)
        state.setTimeoutDuration(idle_timeout_ms)

    return run


def _update_sessions(
    key: tuple[Any, ...],
    pdfs: Iterator["pd.DataFrame"],  # noqa: F821
    state: GroupState,
) -> Iterator["pd.DataFrame"]:  # noqa: F821
    import pandas as pd

    if state.exists:
        last_ts_us, n_sessions, n_events = state.get
    else:
        last_ts_us, n_sessions, n_events = None, 0, 0

    ts_us: list[int] = []
    for pdf in pdfs:
        # normalize to µs explicitly (Arrow may hand us ns- or µs-unit)
        # and drop null timestamps (NaT -> int64 min otherwise)
        ts_us.extend(_ts_micros(pdf["ts"]))
    ts_us.sort()
    last_ts_us, n_sessions, n_events = advance_session_state(
        last_ts_us, n_sessions, n_events, ts_us
    )
    state.update((last_ts_us, n_sessions, n_events))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n_events], "n_sessions": [n_sessions]}
    )


def sessionize_stateful(
    events: DataFrame, *, idle_timeout_ms: int | None = None
) -> DataFrame:
    """Gap-based sessionization as a custom stateful operator.

    Works on both a stream (``applyInPandasWithState``, update output
    mode) and a batch DataFrame (same grouping, one "batch" per key) —
    the backfill/live parity property again.

    State is one entry per user EVER SEEN; with an unbounded, growing
    user population that is unbounded state (round-12 review). Pass
    ``idle_timeout_ms`` (processing-time milliseconds) to evict keys
    idle that long — their latest totals were already emitted, and
    a user who returns after eviction restarts their counts (the
    bounded-state trade; None keeps the exact cumulative semantics the
    batch twin replays).
    """
    if idle_timeout_ms is not None and idle_timeout_ms <= 0:
        # 0 is falsy at the timeoutConf pick but not None at the
        # wrapper, so it would arm setTimeoutDuration under NoTimeout
        # and kill the stream on its first keyed batch (round-12
        # follow-up review); "no eviction" is spelled None
        raise ValueError(
            f"idle_timeout_ms must be a positive duration or None, "
            f"got {idle_timeout_ms!r}"
        )
    grouped = events.select("user_id", "ts").groupBy("user_id")
    if events.isStreaming:
        return grouped.applyInPandasWithState(
            _with_idle_eviction(_update_sessions, idle_timeout_ms),
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=(
                GroupStateTimeout.ProcessingTimeTimeout
                if idle_timeout_ms
                else GroupStateTimeout.NoTimeout
            ),
        )
    # batch fallback: same per-key fold without a state store
    import pandas as pd  # noqa: F401

    def run_batch(pdf: "pd.DataFrame") -> "pd.DataFrame":  # noqa: F821
        import pandas as pd

        ts_us = sorted(_ts_micros(pdf["ts"]))
        _, n_sessions, n_events = advance_session_state(None, 0, 0, ts_us)
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "n_events": [n_events],
                "n_sessions": [n_sessions],
            }
        )

    return grouped.applyInPandas(run_batch, SESSION_OUTPUT_SCHEMA)


def dedup_stream(
    events: DataFrame,
    *,
    key_cols: tuple[str, ...] = ("event_id",),
    watermark_delay: str = "2 hours",
) -> DataFrame:
    """Streaming exact dedup with bounded state.

    ``dropDuplicatesWithinWatermark`` keeps a key only until the
    watermark passes it, so state is O(keys-per-horizon) instead of
    O(all keys ever) — required for an unbounded stream. Batch callers
    get plain ``dropDuplicates`` (same observable result on replay).
    """
    if not events.isStreaming:
        return events.dropDuplicates(list(key_cols))
    from insect_observation_data_pipeline_spark.streaming.events import as_event_time

    return (
        as_event_time(events, "ts")
        .withWatermark("ts", watermark_delay)
        .dropDuplicatesWithinWatermark(list(key_cols))
    )


FUNNEL_STEPS = ("view", "click", "purchase")

FUNNEL_STATE_SCHEMA = StructType(
    [
        StructField("t1_us", LongType(), True),
        StructField("t2_us", LongType(), True),
        StructField("t3_us", LongType(), True),
    ]
)

FUNNEL_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), True),
        StructField("t1_us", LongType(), True),
        StructField("t2_us", LongType(), True),
        StructField("t3_us", LongType(), True),
    ]
)


def advance_funnel_state(
    t1_us: int | None,
    t2_us: int | None,
    t3_us: int | None,
    events_sorted: list[tuple[int, str]],
    steps: tuple[str, ...] = FUNNEL_STEPS,
) -> tuple[int | None, int | None, int | None]:
    """Fold a ts-sorted batch of (ts_us, event_type) into funnel state.

    The cascade of the batch e6 query (first ``steps[0]``, first
    ``steps[1]`` STRICTLY after it, first ``steps[2]`` strictly after
    that) as an incremental left-to-right scan: with events processed
    in global ts order, each step's slot is set at most once, by the
    earliest qualifying event. Pure function — cross-micro-batch
    continuation (a funnel spanning a batch boundary) is unit-testable
    without a streaming harness. Exact parity with the batch query
    holds when batches arrive in ts order (the same in-order-replay
    assumption the sessionizer makes). State is MONOTONE across
    batches: once a step fires it never moves, so a cross-batch late
    event that predates a set t1 is DROPPED (round-14 review: the old
    branch moved t1 earlier while t2/t3 stayed computed against the
    old t1, emitting (t1', t2, t3) triples no batch replay over the
    same data could ever produce — and the divergence was permanent
    because the displaced events are gone from state; within one
    sorted batch the earliest qualifying event still wins, so in-order
    parity is unchanged).
    """
    for ts, typ in events_sorted:
        if typ == steps[0]:
            if t1_us is None:
                t1_us = ts
        elif typ == steps[1]:
            if t1_us is not None and ts > t1_us and t2_us is None:
                t2_us = ts
        elif typ == steps[2]:
            if t2_us is not None and ts > t2_us and t3_us is None:
                t3_us = ts
    return t1_us, t2_us, t3_us


def _update_funnel(
    key: tuple[Any, ...],
    pdfs: Iterator["pd.DataFrame"],  # noqa: F821
    state: GroupState,
) -> Iterator["pd.DataFrame"]:  # noqa: F821
    import pandas as pd

    t1, t2, t3 = state.get if state.exists else (None, None, None)
    evs: list[tuple[int, str]] = []
    for pdf in pdfs:
        evs.extend(_ts_event_pairs(pdf))
    evs.sort(key=lambda p: p[0])
    t1, t2, t3 = advance_funnel_state(t1, t2, t3, evs)
    state.update((t1, t2, t3))
    if t1 is None:  # no funnel entry yet: nothing to report for this key
        return
    yield pd.DataFrame(
        {"user_id": [key[0]], "t1_us": [t1], "t2_us": [t2], "t3_us": [t3]}
    )


def funnel_stateful(
    events: DataFrame, *, idle_timeout_ms: int | None = None
) -> DataFrame:
    """Streaming twin of the batch e6 funnel query as a custom stateful
    operator: per-user (first view, first click strictly after, first
    purchase strictly after) with O(1) state per user — three slots,
    regardless of event volume — emitted in update mode as the funnel
    progresses. Returns (user_id, ts_view, ts_click, ts_purchase,
    funnel_depth), only users who entered the funnel.

    State is per-user-ever-seen; ``idle_timeout_ms`` bounds it by evicting
    idle keys (their funnel-so-far was already emitted; a returning
    user restarts the cascade — see :func:`sessionize_stateful`).

    Batch DataFrames take the same fold per key (backfill/live parity,
    asserted against e6 in tests)."""
    if idle_timeout_ms is not None and idle_timeout_ms <= 0:
        raise ValueError(  # see sessionize_stateful
            f"idle_timeout_ms must be a positive duration or None, "
            f"got {idle_timeout_ms!r}"
        )
    grouped = events.select("user_id", "ts", "event_type").groupBy("user_id")
    if events.isStreaming:
        raw = grouped.applyInPandasWithState(
            _with_idle_eviction(_update_funnel, idle_timeout_ms),
            outputStructType=FUNNEL_OUTPUT_SCHEMA,
            stateStructType=FUNNEL_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=(
                GroupStateTimeout.ProcessingTimeTimeout
                if idle_timeout_ms
                else GroupStateTimeout.NoTimeout
            ),
        )
    else:

        def run_batch(pdf: "pd.DataFrame") -> "pd.DataFrame":  # noqa: F821
            import pandas as pd

            evs = sorted(_ts_event_pairs(pdf), key=lambda p: p[0])
            t1, t2, t3 = advance_funnel_state(None, None, None, evs)
            if t1 is None:
                return pd.DataFrame(
                    {c.name: [] for c in FUNNEL_OUTPUT_SCHEMA}
                ).astype({"user_id": "int64"})
            return pd.DataFrame(
                {
                    "user_id": [pdf["user_id"].iloc[0]],
                    "t1_us": [t1],
                    "t2_us": [t2],
                    "t3_us": [t3],
                }
            )

        raw = grouped.applyInPandas(run_batch, FUNNEL_OUTPUT_SCHEMA)

    from pyspark.sql import functions as F

    return raw.select(
        "user_id",
        F.timestamp_micros(F.col("t1_us")).alias("ts_view"),
        F.timestamp_micros(F.col("t2_us")).alias("ts_click"),
        F.timestamp_micros(F.col("t3_us")).alias("ts_purchase"),
        (
            F.lit(1)
            + F.col("t2_us").isNotNull().cast("int")
            + F.col("t3_us").isNotNull().cast("int")
        ).cast("int").alias("funnel_depth"),
    )
