"""Tests for changepoint detection, linear interpolation, and rolling
correlation (operators/timeseries round-2 additions)."""

from __future__ import annotations

import math

from m13_sparkstreaming_python_azure_spark.operators.timeseries import (
    changepoint_mean_shift,
    interpolate_linear,
    rolling_correlation,
)


def test_changepoint_finds_step(spark):
    # level 10.0 for t=1..5, level 20.0 for t=6..10 -> split at t=5
    rows = [("k", i, 10.0 if i <= 5 else 20.0) for i in range(1, 11)]
    df = spark.createDataFrame(rows, ["k", "t", "v"])
    out = changepoint_mean_shift(df, "k", "t", "v", min_segment=2).collect()
    assert len(out) == 1
    r = out[0]
    assert r["split_point"] == 5
    assert r["mean_before"] == 10.0
    assert r["mean_after"] == 20.0
    assert r["shift"] == 10.0


def test_changepoint_respects_min_segment(spark):
    # outlier at the very first point must not win when min_segment=3
    rows = [("k", 1, 100.0)] + [("k", i, 10.0) for i in range(2, 9)]
    df = spark.createDataFrame(rows, ["k", "t", "v"])
    r = changepoint_mean_shift(df, "k", "t", "v", min_segment=3).collect()[0]
    assert r["split_point"] >= 3


def test_interpolate_midpoints(spark):
    rows = [
        ("k", 0, 0.0),
        ("k", 1, None),
        ("k", 2, None),
        ("k", 3, 30.0),
    ]
    df = spark.createDataFrame(rows, ["k", "i", "v"])
    out = {
        r["i"]: r["filled"]
        for r in interpolate_linear(df, "k", "i", "v").collect()
    }
    assert out == {0: 0.0, 1: 10.0, 2: 20.0, 3: 30.0}


def test_interpolate_clamps_edges(spark):
    rows = [("k", 0, None), ("k", 1, 5.0), ("k", 2, None)]
    df = spark.createDataFrame(rows, ["k", "i", "v"])
    out = {
        r["i"]: r["filled"]
        for r in interpolate_linear(df, "k", "i", "v").collect()
    }
    assert out == {0: 5.0, 1: 5.0, 2: 5.0}


def test_rolling_corr_perfect_linear(spark):
    # y = 2x -> corr 1.0 on every full window; first row (n=1) is null
    rows = [("k", i, float(i), 2.0 * i) for i in range(1, 8)]
    df = spark.createDataFrame(rows, ["k", "t", "x", "y"])
    out = {
        r["t"]: r["rolling_corr"]
        for r in rolling_correlation(df, "k", "t", "x", "y", 4).collect()
    }
    assert out[1] is None  # single-row window
    for t in range(2, 8):
        assert out[t] == 1.0


def test_rolling_corr_matches_numpy(spark):
    xs = [1.0, 3.0, 2.0, 8.0, 5.0, 4.0, 9.0]
    ys = [2.0, 1.0, 4.0, 3.0, 7.0, 6.0, 5.0]
    rows = [("k", i, xs[i], ys[i]) for i in range(7)]
    df = spark.createDataFrame(rows, ["k", "t", "x", "y"])
    out = {
        r["t"]: r["rolling_corr"]
        for r in rolling_correlation(df, "k", "t", "x", "y", 3).collect()
    }
    # manual pearson over window t=2..4 etc.
    def pearson(a, b):
        n = len(a)
        sx, sy = sum(a), sum(b)
        sxx = sum(v * v for v in a)
        syy = sum(v * v for v in b)
        sxy = sum(u * v for u, v in zip(a, b))
        return (n * sxy - sx * sy) / math.sqrt(
            (n * sxx - sx * sx) * (n * syy - sy * sy)
        )

    for t in range(2, 7):
        expect = pearson(xs[t - 2 : t + 1], ys[t - 2 : t + 1])
        assert abs(out[t] - expect) < 2e-6


def test_rolling_corr_zero_variance_null(spark):
    rows = [("k", i, 1.0, float(i)) for i in range(5)]
    df = spark.createDataFrame(rows, ["k", "t", "x", "y"])
    out = rolling_correlation(df, "k", "t", "x", "y", 3).collect()
    assert all(r["rolling_corr"] is None for r in out)
