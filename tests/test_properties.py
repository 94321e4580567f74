"""Property-based tests (hypothesis) for pure engine logic."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from insect_observation_data_pipeline_spark.streaming import advance_session_state

GAP = 600 * 1_000_000

ts_lists = st.lists(
    st.integers(min_value=0, max_value=10**15), min_size=0, max_size=60
).map(sorted)


@given(ts_lists, st.integers(min_value=0, max_value=60))
@settings(max_examples=200, deadline=None)
def test_session_fold_is_split_invariant(ts, cut):
    """Folding a timestamp sequence in one batch == any two-batch split —
    the property that makes micro-batch boundaries semantically invisible."""
    cut = min(cut, len(ts))
    whole = advance_session_state(None, 0, 0, ts, GAP)
    head = advance_session_state(None, 0, 0, ts[:cut], GAP)
    split = advance_session_state(*head, ts[cut:], GAP)
    assert split == whole


@given(ts_lists)
@settings(max_examples=200, deadline=None)
def test_session_counts_bounds(ts):
    """n_sessions in [1, n_events] when events exist; 0 sessions only
    when 0 events; last_ts is the max timestamp."""
    last, n_sessions, n_events = advance_session_state(None, 0, 0, ts, GAP)
    assert n_events == len(ts)
    if ts:
        assert 1 <= n_sessions <= n_events
        assert last == ts[-1]
    else:
        assert (last, n_sessions) == (None, 0)
