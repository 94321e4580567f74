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


@given(
    st.lists(
        st.floats(
            min_value=-2.0, max_value=2.0, allow_nan=False, allow_infinity=False
        ),
        min_size=1,
        max_size=50,
    ),
    st.integers(min_value=0, max_value=6),
)
@settings(max_examples=300, deadline=None)
def test_numpy_stable_round_matches_scalar_formula(xs, digits):
    """The gram kernel replicates stable_round in vectorized numpy; both
    are the same IEEE-754 ops, so they must agree bit-for-bit on every
    input — this is what makes the numpy pair kernel oracle-safe."""
    import numpy as np

    s = float(10**digits)
    a = np.asarray(xs, dtype=np.float64)
    vec = np.floor(np.abs(a) * s + 0.5) / s * np.where(a < 0, -1.0, 1.0) + 0.0
    import math

    for x, got in zip(xs, vec):
        want = math.floor(abs(x) * s + 0.5) / s * (-1.0 if x < 0 else 1.0) + 0.0
        assert got == want


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


ev_lists = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=50),
        st.sampled_from(["view", "click", "purchase", "error"]),
    ),
    max_size=30,
)


def _brute_funnel(evs):
    """Reference cascade: first view, first click strictly after it,
    first purchase strictly after that — computed by global minimums,
    the way the e6 oracle SQL does."""
    views = [t for t, y in evs if y == "view"]
    t1 = min(views) if views else None
    t2 = (
        min((t for t, y in evs if y == "click" and t > t1), default=None)
        if t1 is not None
        else None
    )
    t3 = (
        min((t for t, y in evs if y == "purchase" and t > t2), default=None)
        if t2 is not None
        else None
    )
    return t1, t2, t3


@given(ev_lists, st.integers(min_value=0, max_value=30))
@settings(max_examples=300, deadline=None)
def test_funnel_fold_matches_cascade_and_split_invariant(evs, cut):
    """The incremental funnel fold over ts-sorted events equals the
    global-minimum cascade, and splitting the sorted stream at ANY
    point (micro-batch boundary) gives the same final state."""
    from insect_observation_data_pipeline_spark.streaming import advance_funnel_state

    evs = sorted(evs, key=lambda p: p[0])
    whole = advance_funnel_state(None, None, None, evs)
    assert whole == _brute_funnel(evs)
    cut = min(cut, len(evs))
    split = advance_funnel_state(
        *advance_funnel_state(None, None, None, evs[:cut]), evs[cut:]
    )
    assert split == whole


@given(
    st.integers(min_value=1, max_value=4),   # channels
    st.integers(min_value=1, max_value=12),  # height
    st.integers(min_value=1, max_value=12),  # width
    st.booleans(),                            # interlace
    st.randoms(use_true_random=False),
)
@settings(max_examples=60, deadline=None)
def test_png_roundtrip_property(ch, h, w, interlace, rnd):
    """encode -> decode is the identity for every 8-bit shape and both
    interlace modes — sizes with empty Adam7 passes included."""
    import numpy as np

    from insect_observation_data_pipeline_spark.llm import multimodal

    rng = np.random.default_rng(rnd.randrange(2**32))
    px = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
    got = multimodal.png_decode_pixels(
        multimodal.png_encode_pixels(px, interlace=interlace)
    )
    assert (got == px).all()


@given(
    st.lists(
        st.integers(min_value=-32768, max_value=32767), min_size=1, max_size=300
    ),
    st.sampled_from(["alaw", "ulaw"]),
)
@settings(max_examples=100, deadline=None)
def test_g711_nearest_level_property(xs, law):
    """decode(encode(x)) is always the nearest representable companded
    level to x — no input is ever mapped across a closer level."""
    import numpy as np

    from insect_observation_data_pipeline_spark.llm import multimodal

    table = multimodal.g711_decode_table(law).astype(np.int64)
    levels = np.unique(table)
    x = np.asarray(xs, dtype=np.int64)
    got = table[multimodal._g711_encode_bytes(x, law)]
    best = levels[
        np.argmin(np.abs(levels[None, :] - x[:, None]), axis=1)
    ]
    assert (np.abs(got - x) == np.abs(best - x)).all()
