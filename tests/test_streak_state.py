"""Property tests for the stateful streak tracker's batch-boundary
chaining (streaming/events.py:_streak_tracker) — pure Python, no Spark.

The invariant: for ANY event sequence and ANY way of cutting it into
ordered micro-batches, feeding the batches through the tracker with its
state threaded between calls must produce exactly the single-pass
reference statistics (longest run of consecutive clicks, number of
maximal runs, click count). This is the property that makes the operator
safe on a real stream, where the file source decides the batch
boundaries — the Spark-side identity and two-file chain tests
(test_streaming.py) pin the wiring; this pins the algebra on thousands
of adversarial cuts.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from intellect_bi_spark.streaming.events import STREAK_TYPE, _streak_tracker


class _FakeState:
    """Minimal GroupState stand-in: exists/get/update."""

    def __init__(self) -> None:
        self._v = None

    @property
    def exists(self) -> bool:
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v) -> None:
        self._v = tuple(v)


def _reference(types: list[str]) -> tuple[int, int, int]:
    """Single-pass streak stats: (longest, n_streaks, n_clicks)."""
    best = n_streaks = n_clicks = cur = 0
    for t in types:
        if t == STREAK_TYPE:
            if cur == 0:
                n_streaks += 1
            cur += 1
            n_clicks += 1
            best = max(best, cur)
        else:
            cur = 0
    return best, n_streaks, n_clicks


def _run_batches(types: list[str], cuts: list[int]) -> tuple[int, int, int]:
    """Feed `types` to the tracker in slices at `cuts`, threading state."""
    state = _FakeState()
    bounds = [0, *sorted(cuts), len(types)]
    out = None
    for lo, hi in zip(bounds, bounds[1:]):
        if lo == hi:
            continue
        pdf = pd.DataFrame(
            {
                "ts": pd.to_datetime(range(lo, hi), unit="m", utc=True),
                "event_id": range(lo, hi),
                "event_type": types[lo:hi],
            }
        )
        out = list(_streak_tracker((7,), iter([pdf]), state))[0]
    assert out is not None
    return (
        int(out["longest_streak"][0]),
        int(out["n_streaks"][0]),
        int(out["n_clicks"][0]),
    )


@settings(max_examples=500, deadline=None)
@given(
    types=st.lists(
        st.sampled_from([STREAK_TYPE, "view", "purchase"]),
        min_size=1,
        max_size=40,
    ),
    data=st.data(),
)
def test_streak_chaining_any_cut_equals_single_pass(types, data):
    cuts = data.draw(
        st.lists(
            st.integers(min_value=0, max_value=len(types)), max_size=6
        )
    )
    want = _reference(types)
    got = _run_batches(types, cuts)
    assert got == want


def test_streak_tracker_multi_chunk_batch():
    """One micro-batch may arrive as several Arrow chunks — the tracker
    concats then sorts, so chunk boundaries must not matter."""
    state = _FakeState()
    c1 = pd.DataFrame(
        {
            "ts": pd.to_datetime([3, 4], unit="m", utc=True),
            "event_id": [3, 4],
            "event_type": [STREAK_TYPE, STREAK_TYPE],
        }
    )
    c2 = pd.DataFrame(
        {
            "ts": pd.to_datetime([1, 2], unit="m", utc=True),
            "event_id": [1, 2],
            "event_type": [STREAK_TYPE, "view"],
        }
    )
    out = list(_streak_tracker((1,), iter([c1, c2]), state))[0]
    # sorted order is click,view,click,click → longest 2, two streaks
    assert int(out["longest_streak"][0]) == 2
    assert int(out["n_streaks"][0]) == 2
    assert int(out["n_clicks"][0]) == 3
