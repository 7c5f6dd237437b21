"""Tests for streaming sessionization (streaming/stateful
.sessions_with_state). The full streaming↔batch parity is the
`streaming_sessions` gate query; these pin the per-batch state-machine
semantics directly on the state function."""

from __future__ import annotations

import pandas as pd

from m13_sparkstreaming_python_azure_spark.streaming.stateful import (
    _sessions_fn_factory,
)

US = 1_000_000
GAP = 600 * US  # 10 minutes in micros


class FakeState:
    def __init__(self, value=None):
        self._v = value

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v


def _run(fn, rows, state):
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id"])
    pdf["ts"] = pd.to_datetime(pdf["ts"] * 1000)  # micros -> ns
    outs = list(fn((7,), iter([pdf]), state))
    return pd.concat(outs) if outs else pd.DataFrame()


def test_sessions_split_on_gap():
    fn = _sessions_fn_factory(GAP)
    st = FakeState()
    t0 = 1_700_000_000 * US
    out = _run(
        fn,
        [(1, t0, 7), (2, t0 + 60 * US, 7), (3, t0 + 2000 * US, 7)],
        st,
    )
    # first two merge, third starts a new (still open) session
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["session_start"], r["n_events"]) == (t0, 2)
    assert r["session_end"] == t0 + 60 * US + GAP
    assert st.get == (t0 + 2000 * US, t0 + 2000 * US + GAP, 1)


def test_sessions_state_carries_across_batches():
    fn = _sessions_fn_factory(GAP)
    st = FakeState()
    t0 = 1_700_000_000 * US
    _run(fn, [(1, t0, 7)], st)
    # second batch extends the same session (within gap), then closes it
    out = _run(fn, [(2, t0 + 300 * US, 7), (3, t0 + 10_000 * US, 7)], st)
    assert len(out) == 1
    assert out.iloc[0]["n_events"] == 2
    assert st.get[2] == 1  # new open session from the late event


def test_touching_intervals_merge_exact_boundary():
    fn = _sessions_fn_factory(GAP)
    st = FakeState()
    t0 = 1_700_000_000 * US
    _run(fn, [(1, t0, 7), (2, t0 + GAP, 7)], st)
    # start == previous end -> same session (overlap-or-touch contract)
    assert st.get == (t0, t0 + 2 * GAP, 2)


def test_microsecond_boundary_splits():
    fn = _sessions_fn_factory(GAP)
    st = FakeState()
    t0 = 1_700_000_000 * US
    out = _run(fn, [(1, t0, 7), (2, t0 + GAP + 1, 7)], st)
    # one microsecond past the end -> distinct sessions
    assert len(out) == 1 and out.iloc[0]["n_events"] == 1
    assert st.get[2] == 1
