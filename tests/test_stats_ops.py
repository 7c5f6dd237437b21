"""Tests for chi-square independence and winsorized stats
(operators/stats) against scipy-free hand computations."""

from __future__ import annotations

from m13_sparkstreaming_python_azure_spark.operators.stats import (
    chi_square_independence,
    winsorized_stats,
)


def test_chi_square_independent_uniform(spark):
    # perfectly balanced 2x2 table -> chi2 = 0
    rows = [("a", "x")] * 5 + [("a", "y")] * 5 + [("b", "x")] * 5 + [("b", "y")] * 5
    df = spark.createDataFrame(rows, ["u", "v"])
    r = chi_square_independence(df, "u", "v").collect()[0]
    assert r["chi2"] == 0.0
    assert r["dof"] == 1
    assert r["n_rows"] == 20


def test_chi_square_matches_manual_2x2(spark):
    # table [[10, 0], [0, 10]] -> chi2 = N = 20, cramers_v = 1
    rows = [("a", "x")] * 10 + [("b", "y")] * 10
    df = spark.createDataFrame(rows, ["u", "v"])
    r = chi_square_independence(df, "u", "v").collect()[0]
    assert r["chi2"] == 20.0
    assert r["cramers_v"] == 1.0


def test_chi_square_manual_asymmetric(spark):
    # observed [[4, 1], [1, 4]]: chi2 = N*sum(n^2/(ra*cb)) - N
    rows = (
        [("a", "x")] * 4 + [("a", "y")] * 1
        + [("b", "x")] * 1 + [("b", "y")] * 4
    )
    df = spark.createDataFrame(rows, ["u", "v"])
    r = chi_square_independence(df, "u", "v").collect()[0]
    n = 10.0
    s = 16 / 25 + 1 / 25 + 1 / 25 + 16 / 25
    assert abs(r["chi2"] - (n * s - n)) < 2e-6


def test_winsorized_mean_clips_outlier(spark):
    vals = [1.0] * 9 + [1000.0]
    df = spark.createDataFrame([("k", v) for v in vals], ["k", "v"])
    r = winsorized_stats(df, "k", "v", 0.1, 0.9).collect()[0]
    # p90 = interpolated between sorted[8]=1 and sorted[9]=1000 at
    # index 8.1 -> 1 + 0.1*999 = 100.9; clipped mean far below raw mean
    assert r["p_hi"] < 1000.0
    assert r["winsorized_mean"] < 101.0
    assert r["n_values"] == 10


def test_winsorized_noop_on_uniformish(spark):
    df = spark.createDataFrame([("k", float(i)) for i in range(1, 12)], ["k", "v"])
    r = winsorized_stats(df, "k", "v", 0.0, 1.0).collect()[0]
    # p0/p100 with full range -> no clipping -> plain mean
    assert r["winsorized_mean"] == 6.0
