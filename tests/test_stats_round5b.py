"""Independent-recomputation tests for the round-5b statistics queries
(queries/science_ext.py: log-rank, Spearman, Welch, Gini, ACF).

The hash gate pins exact values vs DuckDB; these tests recompute each
statistic a THIRD way — driver-side numpy/pandas from the raw parquet —
so an algebra error shared by the Spark query and its hand-mirrored SQL
oracle cannot survive."""
from __future__ import annotations

import math

import numpy as np
import pandas as pd

from m13_sparkstreaming_python_azure_spark.queries.science_ext import (
    _KM_CENSOR_DAYS,
    q_acf_daily_events,
    q_anova_oneway,
    q_gini_concentration,
    q_log_rank_test,
    q_spearman_corr,
    q_welch_ttest,
)


def _cents(s: pd.Series) -> pd.Series:
    return np.floor(s * 100 + 0.5).astype("int64")


def _cust_spend(sf_dir: str) -> pd.DataFrame:
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    cust = pd.read_parquet(f"{sf_dir}/customer.parquet")
    orders["cents"] = _cents(orders["o_totalprice"])
    spend = orders.groupby("o_custkey")["cents"].sum().rename("y")
    df = cust.merge(spend, left_on="c_custkey", right_index=True)
    df["x"] = _cents(df["c_acctbal"])
    return df


def test_spearman_matches_pandas(spark, sf_dir):
    out = {
        r["segment"]: r for r in q_spearman_corr(spark, sf_dir).collect()
    }
    df = _cust_spend(sf_dir)
    for seg, grp in df.groupby("c_mktsegment"):
        # avg-rank Spearman without scipy: Pearson over average ranks
        rx = grp["x"].rank(method="average").to_numpy()
        ry = grp["y"].rank(method="average").to_numpy()
        expected = np.corrcoef(rx, ry)[0, 1]
        assert out[seg]["n"] == len(grp)
        assert math.isclose(out[seg]["rho"], expected, abs_tol=2e-6), seg
        assert -1.0 <= out[seg]["rho"] <= 1.0


def test_welch_matches_numpy(spark, sf_dir):
    row = q_welch_ttest(spark, sf_dir).collect()[0]
    df = _cust_spend(sf_dir)
    # Welch runs on ALL customers in the two segments (no order join)
    cust = pd.read_parquet(f"{sf_dir}/customer.parquet")
    cust["x"] = _cents(cust["c_acctbal"])
    a = cust.loc[cust.c_mktsegment == "BUILDING", "x"].to_numpy(float)
    b = cust.loc[cust.c_mktsegment == "AUTOMOBILE", "x"].to_numpy(float)
    vn1 = a.var(ddof=1) / len(a)
    vn2 = b.var(ddof=1) / len(b)
    t = (a.mean() - b.mean()) / math.sqrt(vn1 + vn2)
    dof = (vn1 + vn2) ** 2 / (
        vn1**2 / (len(a) - 1) + vn2**2 / (len(b) - 1)
    )
    assert row["n1"] == len(a) and row["n2"] == len(b)
    assert math.isclose(row["mean1"], a.mean() / 100, abs_tol=2e-6)
    assert math.isclose(row["t_stat"], t, abs_tol=1e-4)
    assert math.isclose(row["welch_df"], dof, rel_tol=1e-6)


def test_gini_matches_numpy(spark, sf_dir):
    out = {
        r["segment"]: r
        for r in q_gini_concentration(spark, sf_dir).collect()
    }
    df = _cust_spend(sf_dir)
    for seg, grp in df.groupby("c_mktsegment"):
        x = np.sort(grp["y"].to_numpy(np.int64))
        n = len(x)
        i = np.arange(1, n + 1, dtype=np.int64)
        expected = (2 * (i * x).sum() - (n + 1) * x.sum()) / (
            n * x.sum()
        )
        assert out[seg]["n"] == n
        assert out[seg]["total_cents"] == int(x.sum())
        assert math.isclose(out[seg]["gini"], expected, rel_tol=1e-12)
        assert 0.0 <= out[seg]["gini"] < 1.0


def test_acf_matches_numpy(spark, sf_dir):
    out = {r["lag"]: r for r in q_acf_daily_events(spark, sf_dir).collect()}
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    micros = ev["ts"].astype("datetime64[us]").astype("int64")
    day = (micros // 86_400_000_000).to_numpy()
    y = pd.Series(day).value_counts().sort_index().to_numpy(np.int64)
    n = len(y)
    z = n * y - y.sum()  # scaled centering — N² cancels in the ratio
    denom = float((z * z).sum())
    assert len(out) == 14
    for lag in range(1, 15):
        expected = float((z[:-lag] * z[lag:]).sum()) / denom
        assert out[lag]["n_pairs"] == n - lag
        assert math.isclose(out[lag]["acf"], expected, rel_tol=1e-12), lag
        assert -1.0 <= out[lag]["acf"] <= 1.0


def test_log_rank_matches_numpy(spark, sf_dir):
    row = q_log_rank_test(spark, sf_dir).collect()[0]
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    cust = pd.read_parquet(f"{sf_dir}/customer.parquet")
    day = (
        orders["o_orderdate"].astype("datetime64[us]").astype("int64")
        // 86_400_000_000
    )
    span = (
        orders.assign(day=day)
        .groupby("o_custkey")["day"]
        .agg(["min", "max"])
    )
    span["t"] = span["max"] - span["min"]
    span["event"] = (
        span["max"] <= span["max"].max() - _KM_CENSOR_DAYS
    ).astype(int)
    g1 = cust.set_index("c_custkey")["c_mktsegment"].eq("BUILDING")
    span["g1"] = g1.reindex(span.index).astype(int)
    u_sum = v_sum = 0.0
    obs1 = 0
    times = np.sort(span["t"].unique())
    for t in times:
        at_risk = span[span["t"] >= t]
        here = span[span["t"] == t]
        d1 = int((here["event"] * here["g1"]).sum())
        d = int(here["event"].sum())
        n1 = int(at_risk["g1"].sum())
        n = len(at_risk)
        if d == 0:
            continue
        obs1 += d1
        u_sum += d1 - d * n1 / n
        if n > 1:
            v_sum += (d * n1 / n) * ((n - n1) / n) * (n - d) / (n - 1)
    chi2 = u_sum * u_sum / v_sum
    assert row["observed1"] == obs1
    assert math.isclose(row["expected1"], obs1 - u_sum, abs_tol=1e-3)
    assert math.isclose(row["chi2"], chi2, rel_tol=1e-3)
    assert row["n1_subjects"] + row["n0_subjects"] == len(span)
    assert row["chi2"] >= 0.0


def test_anova_matches_numpy(spark, sf_dir):
    row = q_anova_oneway(spark, sf_dir).collect()[0]
    cust = pd.read_parquet(f"{sf_dir}/customer.parquet")
    cust["x"] = _cents(cust["c_acctbal"]).astype(float)
    groups = [g["x"].to_numpy() for _, g in cust.groupby("c_mktsegment")]
    allx = cust["x"].to_numpy()
    ssb = sum(len(g) * (g.mean() - allx.mean()) ** 2 for g in groups)
    ssw = sum(((g - g.mean()) ** 2).sum() for g in groups)
    k, n = len(groups), len(allx)
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert row["k"] == k and row["n"] == n
    assert row["df_between"] == k - 1 and row["df_within"] == n - k
    assert math.isclose(row["f_stat"], f, rel_tol=1e-4)
    assert math.isclose(
        row["eta_sq"], ssb / (ssb + ssw), rel_tol=1e-4
    )
    assert row["f_stat"] >= 0.0 and 0.0 <= row["eta_sq"] <= 1.0


def test_huber_downweights_outliers(spark, sf_dir):
    from m13_sparkstreaming_python_azure_spark.queries.science_ext import (
        _HUBER_C,
        _HUBER_ITERS,
        q_huber_regression,
    )

    row = q_huber_regression(spark, sf_dir).collect()[0]
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    x = li["l_quantity"].to_numpy(float)
    y = np.floor(li["l_extendedprice"]).to_numpy(float)
    # plain-float IRLS twin (no 1e-4 quantization): must agree closely
    b, a = np.polyfit(x, y, 1)
    for _ in range(_HUBER_ITERS):
        r = y - (a + b * x)
        w = np.minimum(1.0, _HUBER_C / np.abs(r))
        sw, swx, swy = w.sum(), (w * x).sum(), (w * y).sum()
        swxy, swxx = (w * x * y).sum(), (w * x * x).sum()
        b = (sw * swxy - swx * swy) / (sw * swxx - swx * swx)
        a = (swy - b * swx) / sw
    assert row["n"] == len(x)
    assert math.isclose(row["slope"], b, rel_tol=1e-3)
    assert math.isclose(row["intercept"], a, rel_tol=1e-3)
    r = y - (a + b * x)
    assert row["n_downweighted"] == int((np.abs(r) > _HUBER_C).sum())
    assert 0 < row["n_downweighted"] < len(x)  # Huber actually engaged
    assert row["sum_w"] < len(x)  # downweighting reduced total weight


def test_lsh_recall_eval_is_discriminative(spark, sf_dir):
    """With graded planted partials the banding curve must show real
    misses AND real candidates: recall strictly inside (0, 1)."""
    from m13_sparkstreaming_python_azure_spark.queries.llm import (
        q_lsh_recall_eval,
    )

    row = q_lsh_recall_eval(spark, sf_dir).collect()[0]
    assert row["n_truth"] > 0 and row["n_candidates"] > 0
    assert 0 < row["n_tp"] <= min(row["n_truth"], row["n_candidates"])
    assert 0.0 < row["recall"] < 1.0
    assert 0.0 < row["precision"] <= 1.0
    assert math.isclose(row["recall"], row["n_tp"] / row["n_truth"])
