"""Tests for the EWMA control chart (operators/timeseries)."""

from __future__ import annotations

import datetime as dt

from m13_sparkstreaming_python_azure_spark.operators.timeseries import (
    ewma_control_chart,
)


def _events(spark, values, key="k"):
    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(minutes=i), key, float(v))
        for i, v in enumerate(values)
    ]
    return spark.createDataFrame(rows, ["event_id", "ts", "event_type", "value"])


def test_constant_series_flat_no_anomalies(spark):
    df = _events(spark, [5.0] * 30)
    out = ewma_control_chart(df, "event_type").collect()
    assert all(abs(r["ewma"] - 5.0) < 1e-9 for r in out)
    assert not any(r["is_anomaly"] for r in out)


def test_hand_computed_weights(spark):
    # series [1, 3]: row0 ewma = 1; row1 = (3*1 + 1*0.5) / 1.5 = 7/3
    df = _events(spark, [1.0, 3.0])
    out = {r["event_id"]: r["ewma"] for r in ewma_control_chart(df, "event_type").collect()}
    assert abs(out[0] - 1.0) < 1e-6
    assert abs(out[1] - 7.0 / 3.0) < 1e-6


def test_spike_flags_anomaly(spark):
    values = [10.0, 11.0, 9.0, 10.5, 9.5] * 6 + [500.0]
    df = _events(spark, values)
    out = sorted(
        ewma_control_chart(df, "event_type").collect(),
        key=lambda r: r["event_id"],
    )
    assert out[-1]["is_anomaly"]
    assert sum(r["is_anomaly"] for r in out) == 1


def test_truncation_bounds_memory(spark):
    # after >max_lag identical values the ewma equals that value exactly
    values = [100.0] + [2.0] * 25
    df = _events(spark, values)
    out = sorted(
        ewma_control_chart(df, "event_type", max_lag=20).collect(),
        key=lambda r: r["event_id"],
    )
    assert abs(out[-1]["ewma"] - 2.0) < 1e-9  # the 100 fell out of the frame


def test_keys_are_independent(spark):
    a = _events(spark, [1.0, 2.0, 3.0], key="a")
    b = _events(spark, [100.0, 200.0, 300.0], key="b")
    out = ewma_control_chart(a.unionByName(b), "event_type").collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r["event_type"], []).append(r["ewma"])
    assert max(by_key["a"]) < 4 and min(by_key["b"]) >= 100
