"""streaming/stateful.holt_with_state — incremental Holt recursion in
GroupState must be bit-identical to the batch operator, enforce the
day-aligned replay contract, and keep O(1) state."""

from __future__ import annotations

import math

import pandas as pd
import pytest

from m13_sparkstreaming_python_azure_spark.streaming.stateful import (
    _holt_fn_factory,
)


class _FakeState:
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


def _batch_holt(ys, alpha=0.2, beta=0.1):
    lvl, trend = ys[0], ys[1] - ys[0]
    for t in range(1, len(ys)):
        prev = lvl
        lvl = alpha * ys[t] + (1.0 - alpha) * (lvl + trend)
        trend = beta * (lvl - prev) + (1.0 - beta) * trend
    return lvl, trend


def _feed(fn, state, days):
    pdf = pd.DataFrame({"day": [d for d, c in days for _ in range(c)]})
    return list(fn(("t",), iter([pdf]), state))


def test_incremental_matches_batch_bitwise():
    fn = _holt_fn_factory(0.2, 0.1)
    state = _FakeState()
    counts = [(0, 3), (1, 7), (2, 2), (3, 9), (4, 4), (5, 6)]
    # split across three "batches" at arbitrary day boundaries
    _feed(fn, state, counts[:2])
    _feed(fn, state, counts[2:5])
    (out,) = _feed(fn, state, counts[5:])
    lvl, trend = _batch_holt([float(c) for _, c in counts])
    assert out["level"].iloc[0] == lvl  # bit-equal, no tolerance
    assert out["trend"].iloc[0] == trend
    assert out["n_days"].iloc[0] == 6


def test_out_of_order_day_raises():
    fn = _holt_fn_factory(0.2, 0.1)
    state = _FakeState()
    _feed(fn, state, [(5, 2), (6, 3)])
    with pytest.raises(ValueError, match="out of order"):
        _feed(fn, state, [(6, 1)])  # day 6 split across batches


def test_state_is_constant_size():
    fn = _holt_fn_factory(0.2, 0.1)
    state = _FakeState()
    _feed(fn, state, [(d, 1 + d % 3) for d in range(50)])
    assert len(state.get) == 4  # (n, lvl, trend, last_day) — O(1)
    assert state.get[0] == 50
    assert not math.isnan(state.get[1])
