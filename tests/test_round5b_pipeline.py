"""Independent-recomputation tests for the round-5b pipeline queries:
phrase search, k-anonymity, RFM segmentation, Holt forecasting."""
from __future__ import annotations

import math
import re

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from m13_sparkstreaming_python_azure_spark.queries.analytics_ext import (
    q_holt_forecast,
)
from m13_sparkstreaming_python_azure_spark.queries.behavior import (
    q_rfm_segments,
)
from m13_sparkstreaming_python_azure_spark.queries.llm import q_phrase_search
from m13_sparkstreaming_python_azure_spark.queries.science_ext import (
    q_k_anonymity,
)


def test_phrase_search_matches_python(spark):
    # sf0.001's corpus happens to contain zero 3-gram matches; use
    # sf0.01 so the positive path is actually exercised
    from tests.conftest import SF001

    out = {
        r["doc_id"]: r["n_matches"]
        for r in q_phrase_search(spark, SF001).collect()
    }
    docs = pd.read_parquet(f"{SF001}/documents.parquet")
    expected = {}
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        toks = [t for t in re.split(r"\s+", text.lower()) if t]
        n = sum(
            1
            for i in range(len(toks) - 2)
            if toks[i : i + 3] == ["slow", "hash", "batch"]
        )
        if n:
            expected[doc_id] = n
    assert out == expected
    assert expected, "fixture should contain at least one phrase match"


def test_phrase_search_counts_overlapping_occurrences(spark, sf_dir):
    """'b b b s' contains 'b b s' once and 'b b' twice — the adjacency
    join must count occurrences, not just matched docs."""
    from m13_sparkstreaming_python_azure_spark.operators.retrieval import (
        phrase_match,
    )

    df = spark.createDataFrame(
        [(1, "b b b s"), (2, "b s b"), (3, "x y z")], "doc_id long, text string"
    )
    two = {
        r["doc_id"]: r["n_matches"]
        for r in phrase_match(df, ["b", "b"]).collect()
    }
    three = {
        r["doc_id"]: r["n_matches"]
        for r in phrase_match(df, ["b", "b", "s"]).collect()
    }
    assert two == {1: 2}
    assert three == {1: 1}


def test_k_anonymity_matches_pandas(spark, sf_dir):
    out = {r["k"]: r for r in q_k_anonymity(spark, sf_dir).collect()}
    cust = pd.read_parquet(f"{sf_dir}/customer.parquet")
    cust["band"] = np.floor(cust["c_acctbal"] / 1000).astype("int64")
    sizes = cust.groupby(
        ["c_nationkey", "c_mktsegment", "band"]
    ).size()
    for k in (2, 5, 10):
        row = out[k]
        assert row["n_classes"] == len(sizes)
        assert row["k_anonymity"] == int(sizes.min())
        assert row["n_small_classes"] == int((sizes < k).sum())
        assert row["rows_at_risk"] == int(sizes[sizes < k].sum())
        assert math.isclose(
            row["risk_rate"], sizes[sizes < k].sum() / sizes.sum()
        )
    # monotone: higher k can only put more rows at risk
    assert out[2]["rows_at_risk"] <= out[5]["rows_at_risk"]
    assert out[5]["rows_at_risk"] <= out[10]["rows_at_risk"]


def test_rfm_cell_census_is_consistent(spark, sf_dir):
    rows = q_rfm_segments(spark, sf_dir).collect()
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    n_cust = orders["o_custkey"].nunique()
    assert sum(r["n_customers"] for r in rows) == n_cust
    total_cents = int(
        np.floor(orders["o_totalprice"] * 100 + 0.5).astype("int64").sum()
    )
    assert sum(r["total_cents"] for r in rows) == total_cents
    for r in rows:
        assert 1 <= r["r_score"] <= 5
        assert 1 <= r["f_score"] <= 5
        assert 1 <= r["m_score"] <= 5
    # quintiles are balanced: each m_score bucket holds n/5 ±1 customers
    per_m = {}
    for r in rows:
        per_m[r["m_score"]] = per_m.get(r["m_score"], 0) + r["n_customers"]
    assert max(per_m.values()) - min(per_m.values()) <= 1
    # high-monetary cells must out-earn low ones on average
    hi = sum(r["total_cents"] for r in rows if r["m_score"] == 5)
    lo = sum(r["total_cents"] for r in rows if r["m_score"] == 1)
    assert hi > lo


def test_holt_matches_numpy_recursion(spark, sf_dir):
    out = q_holt_forecast(spark, sf_dir).collect()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    micros = ev["ts"].astype("datetime64[us]").astype("int64")
    ev = ev.assign(day=micros // 86_400_000_000)
    daily = (
        ev.groupby(["event_type", "day"]).size().rename("y").reset_index()
    )
    alpha, beta = 0.2, 0.1
    expected = {}
    for et, grp in daily.groupby("event_type"):
        y = grp.sort_values("day")["y"].to_numpy(dtype="float64")
        lvl, trend = y[0], y[1] - y[0]
        for t in range(1, len(y)):
            prev = lvl
            lvl = alpha * y[t] + (1.0 - alpha) * (lvl + trend)
            trend = beta * (lvl - prev) + (1.0 - beta) * trend
        for h in range(1, 8):
            expected[(et, h)] = math.floor(
                (lvl + h * trend) * 1e6 + 0.5
            ) / 1e6
    got = {(r["event_type"], r["h"]): r["forecast"] for r in out}
    assert got == expected
    # forecasts are linear in h: second differences vanish
    for et in {k[0] for k in got}:
        f = [got[(et, h)] for h in range(1, 8)]
        d2 = [f[i + 2] - 2 * f[i + 1] + f[i] for i in range(5)]
        assert all(abs(x) < 5e-6 for x in d2)


def _md5_int(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def test_cv_regression_matches_numpy(spark, sf_dir):
    from m13_sparkstreaming_python_azure_spark.queries.science_ext import (
        q_cv_regression,
    )

    out = {r["fold"]: r for r in q_cv_regression(spark, sf_dir).collect()}
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    li["x"] = li["l_quantity"].astype("int64")
    li["y"] = np.floor(li["l_extendedprice"]).astype("int64")
    li["fold"] = [
        _md5_int(f"cv:{o}-{l}") % 5
        for o, l in zip(li["l_orderkey"], li["l_linenumber"])
    ]
    assert len(out) == 5
    for f in range(5):
        tr = li[li["fold"] != f]
        te = li[li["fold"] == f]
        b, a = np.polyfit(tr["x"], tr["y"], 1)
        rmse = math.sqrt(
            ((te["y"] - (a + b * te["x"])) ** 2).mean()
        )
        row = out[f]
        assert row["n_train"] == len(tr) and row["n_test"] == len(te)
        assert math.isclose(row["slope"], b, rel_tol=1e-6)
        assert math.isclose(row["intercept"], a, rel_tol=1e-6)
        assert math.isclose(row["test_rmse"], rmse, rel_tol=1e-6)


def test_conformal_coverage_property(spark, sf_dir):
    from m13_sparkstreaming_python_azure_spark.queries.science_ext import (
        q_conformal_intervals,
    )

    out = {
        r["alpha_pct"]: r
        for r in q_conformal_intervals(spark, sf_dir).collect()
    }
    assert set(out) == {5, 10}
    # tighter alpha -> wider interval
    assert out[5]["radius"] >= out[10]["radius"]
    for p, row in out.items():
        target = 1 - p / 100
        n = row["n_test"]
        # finite-sample conformal guarantee: coverage >= 1 - alpha in
        # expectation; allow 3 binomial sigmas of test-sampling noise
        slack = 3 * math.sqrt(target * (1 - target) / n)
        assert row["coverage"] >= target - slack
        assert row["coverage"] <= 1.0


def test_entity_clusters_transitivity(spark):
    """A~B and B~C (each within distance 2) must merge into ONE entity
    even though A and C are 4 edits apart."""
    from m13_sparkstreaming_python_azure_spark.operators.graph import (
        connected_components,
    )

    df = spark.createDataFrame(
        [
            (1, "aaaa00"), (2, "aaaa11"), (3, "aaaa1122"),
            (4, "zzzzzz"),
        ],
        "key long, name string",
    )
    a = df.select(
        F.col("key").alias("key_a"), F.col("name").alias("name_a")
    )
    b = df.select(
        F.col("key").alias("key_b"), F.col("name").alias("name_b")
    )
    pairs = a.crossJoin(b).filter(
        (F.col("key_a") < F.col("key_b"))
        & (F.levenshtein("name_a", "name_b") <= 2)
    )
    comp = connected_components(pairs, "key_a", "key_b")
    got = {r["node"]: r["component"] for r in comp.collect()}
    assert got == {1: 1, 2: 1, 3: 1}  # 4 is a singleton, not in edges
