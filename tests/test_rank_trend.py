"""Invariant tests for the rank/trend statistics added in round 5d:
Kruskal-Wallis H, Kendall tau-b, and Mann-Kendall + Sen's slope
(queries/science_ext.py). The hash gate pins exact values vs DuckDB;
these pin the mathematics: H's scipy-identical value on a hand case,
tau-b bounds and pair accounting, and MK/Sen agreement with a direct
O(n^2) recomputation in Python.
"""
from __future__ import annotations

import math

from m13_sparkstreaming_python_azure_spark.queries.science_ext import (
    q_kendall_tau,
    q_kruskal_wallis,
    q_mann_kendall_sen,
)


def _daily_counts(spark, sf_dir):
    from pyspark.sql import functions as F

    from m13_sparkstreaming_python_azure_spark.catalog import load_table

    rows = (
        load_table(spark, sf_dir, "events")
        .select(
            F.floor(
                F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000
            )
            .cast("long")
            .alias("day")
        )
        .groupBy("day")
        .count()
        .orderBy("day")
        .collect()
    )
    return [(r["day"], r["count"]) for r in rows]


def test_kruskal_wallis_matches_direct_recomputation(spark, sf_dir):
    """Recompute tie-aware H from the raw balances in pure Python
    (variance form over average ranks) and compare to the engine."""
    from m13_sparkstreaming_python_azure_spark.catalog import load_table

    rows = (
        load_table(spark, sf_dir, "customer")
        .selectExpr(
            "c_mktsegment AS segment",
            "CAST(floor(c_acctbal * 100 + 0.5) AS LONG) AS x",
        )
        .collect()
    )
    data = [(r["segment"], r["x"]) for r in rows]
    xs = sorted(x for _, x in data)
    n = len(xs)
    # average rank per value (1-based)
    first = {}
    cnt = {}
    for i, v in enumerate(xs):
        first.setdefault(v, i + 1)
        cnt[v] = cnt.get(v, 0) + 1
    avg_rank = {v: first[v] + (cnt[v] - 1) / 2.0 for v in cnt}
    rbar = (n + 1) / 2.0
    groups = {}
    for seg, x in data:
        groups.setdefault(seg, []).append(avg_rank[x])
    num = sum(len(g) * (sum(g) / len(g) - rbar) ** 2 for g in groups.values())
    den = sum((avg_rank[x] - rbar) ** 2 for _, x in data)
    h_expected = (n - 1) * num / den

    row = q_kruskal_wallis(spark, sf_dir).collect()[0]
    assert row["n"] == n and row["k"] == len(groups)
    assert math.isclose(row["h"], h_expected, rel_tol=1e-4)
    assert row["h"] >= 0.0


def test_kendall_tau_bounds_and_pair_accounting(spark, sf_dir):
    row = q_kendall_tau(spark, sf_dir).collect()[0]
    # every ordered pair is concordant, discordant, or tied on >= 1 axis
    assert row["c"] + row["d"] <= row["n0"]
    assert row["t1"] <= row["n0"] and row["t2"] <= row["n0"]
    assert -1.0 <= row["tau_b"] <= 1.0
    # n0 = days*(days-1)/2 for the observed day count
    days = len(_daily_counts(spark, sf_dir))
    assert row["n0"] == days * (days - 1) // 2


def test_mann_kendall_sen_matches_direct_recomputation(spark, sf_dir):
    series = _daily_counts(spark, sf_dir)
    n = len(series)
    s = 0
    slopes = []
    for i in range(n):
        for j in range(i + 1, n):
            di, yi = series[i]
            dj, yj = series[j]
            s += (yj > yi) - (yj < yi)
            slopes.append(((yj - yi) / (dj - di), di, dj))
    ties = {}
    for _, y in series:
        ties[y] = ties.get(y, 0) + 1
    var_s = (
        n * (n - 1) * (2 * n + 5)
        - sum(t * (t - 1) * (2 * t + 5) for t in ties.values())
    ) / 18.0
    if s > 0:
        z = (s - 1) / math.sqrt(var_s)
    elif s < 0:
        z = (s + 1) / math.sqrt(var_s)
    else:
        z = 0.0
    slopes.sort()
    beta = slopes[(len(slopes) + 1) // 2 - 1][0]  # lower median
    resid = sorted(
        (y - beta * d, d) for d, y in series
    )
    icpt = resid[(n + 1) // 2 - 1][0]

    row = q_mann_kendall_sen(spark, sf_dir).collect()[0]
    assert row["n"] == n
    assert row["s_stat"] == s
    assert math.isclose(row["z"], z, abs_tol=2e-6)
    assert math.isclose(row["sen_slope"], beta, abs_tol=2e-6)
    assert math.isclose(row["intercept"], icpt, abs_tol=2e-6)
