"""Property tests for the statistical / ML-evaluation queries
(queries/science_ext.py). The hash gate pins exact values vs DuckDB;
these tests pin the MATHEMATICAL invariants that a hash can't explain:
KM monotonicity, kappa bounds, CI coverage of the point estimate,
cosine bounds, and WOE/IV sign structure.
"""
from __future__ import annotations

import math

from m13_sparkstreaming_python_azure_spark.queries.science_ext import (
    q_cohens_kappa,
    q_cuped_lift,
    q_embedding_drift,
    q_kaplan_meier,
    q_ks_test,
    q_poisson_bootstrap_ci,
    q_psi_drift,
    q_roc_auc,
    q_scd2_pit_join,
    q_woe_iv,
)


def test_scd2_pit_segments_partition_orders(spark, sf_dir):
    """Every order matches EXACTLY one dimension version (validity
    intervals partition the timeline), so segment counts sum to the
    orders row count."""
    out = q_scd2_pit_join(spark, sf_dir).collect()
    n_orders = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    assert sum(r["n_orders"] for r in out) == n_orders
    segs = {r["segment_at_order"] for r in out}
    assert "UPGRADED-1" in segs and "UPGRADED-2" in segs


def test_cohens_kappa_bounds_and_identity(spark, sf_dir):
    row = q_cohens_kappa(spark, sf_dir).collect()[0]
    po, pe, kappa = row["po"], row["pe"], row["kappa"]
    assert 0.0 <= po <= 1.0 and 0.0 < pe < 1.0
    assert -1.0 <= kappa <= 1.0
    # kappa = (po - pe) / (1 - pe), and with 25% noise po stays high
    assert math.isclose(kappa, (po - pe) / (1 - pe), rel_tol=1e-9)
    assert po >= 0.7  # 75% of labels untouched


def test_bootstrap_ci_brackets_point_estimate(spark, sf_dir):
    """Poisson-bootstrap replica means concentrate around the sample
    mean; with B=32 the 2.5/97.5 ranks must bracket it for every
    priority class at this n (thousands of orders per class)."""
    for r in q_poisson_bootstrap_ci(spark, sf_dir).collect():
        assert r["ci_lo"] <= r["ci_hi"]
        assert r["ci_lo"] <= r["mean_price"] <= r["ci_hi"]
        # CI width is a few sigma/sqrt(n) — sanity-bound it
        assert (r["ci_hi"] - r["ci_lo"]) / r["mean_price"] < 0.2


def test_kaplan_meier_monotone_and_risk_consistent(spark, sf_dir):
    rows = sorted(
        q_kaplan_meier(spark, sf_dir).collect(),
        key=lambda r: r["lifetime_days"],
    )
    # survival starts <= 1 and never increases
    prev = 1.0
    for r in rows:
        assert r["survival"] <= prev + 1e-9
        prev = r["survival"]
    # risk set at the earliest time is the whole cohort, and decrements
    # by exactly the events+censored at each step
    n_cust = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert rows[0]["n_risk"] == n_cust
    for a, b in zip(rows, rows[1:]):
        assert b["n_risk"] == a["n_risk"] - a["n_events"] - a["n_censored"]
    # censoring exists (the 90-day horizon rule fires on this corpus)
    assert sum(r["n_censored"] for r in rows) > 0


def test_embedding_drift_cosine_bounds(spark, sf_dir):
    rows = q_embedding_drift(spark, sf_dir).collect()
    assert rows, "expected consecutive-label pairs"
    for r in rows:
        assert -1.0 - 1e-6 <= r["centroid_cosine"] <= 1.0 + 1e-6
        assert r["label_to"] == r["label_from"] + 1
        assert r["n_from"] > 0 and r["n_to"] > 0


def test_roc_auc_matches_pairwise_definition(spark, sf_dir):
    """The rank-sum AUC must equal the O(n·m) pairwise definition
    P(s_pos > s_neg) + 0.5·P(s_pos = s_neg), computed directly on the
    driver at sf0.001."""
    row = q_roc_auc(spark, sf_dir).collect()[0]
    orders = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .filter("o_orderstatus IN ('F','O')")
        .select("o_orderstatus", "o_totalprice")
        .collect()
    )
    pos = sorted(
        round(r["o_totalprice"] * 100) for r in orders
        if r["o_orderstatus"] == "F"
    )
    neg = sorted(
        round(r["o_totalprice"] * 100) for r in orders
        if r["o_orderstatus"] == "O"
    )
    import bisect
    u = 0.0
    for p in pos:
        lo = bisect.bisect_left(neg, p)
        hi = bisect.bisect_right(neg, p)
        u += lo + 0.5 * (hi - lo)
    expect = u / (len(pos) * len(neg))
    assert row["n_pos"] == len(pos) and row["n_neg"] == len(neg)
    assert math.isclose(row["auc"], expect, rel_tol=1e-12)
    assert math.isclose(row["gini"], 2 * expect - 1, rel_tol=1e-9)


def test_ks_test_matches_driver_scan(spark, sf_dir):
    """The windowed KS D must equal the direct two-ECDF max computed on
    the driver, and the decision must be consistent with D vs crit."""
    row = q_ks_test(spark, sf_dir).collect()[0]
    orders = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .filter("o_orderstatus IN ('F','O')")
        .select("o_orderstatus", "o_totalprice")
        .collect()
    )
    s1 = sorted(
        round(r["o_totalprice"] * 100) for r in orders
        if r["o_orderstatus"] == "F"
    )
    s2 = sorted(
        round(r["o_totalprice"] * 100) for r in orders
        if r["o_orderstatus"] == "O"
    )
    import bisect
    n1, n2 = len(s1), len(s2)
    d_num = max(
        abs(bisect.bisect_right(s1, v) * n2 - bisect.bisect_right(s2, v) * n1)
        for v in set(s1) | set(s2)
    )
    assert row["n1"] == n1 and row["n2"] == n2
    assert math.isclose(row["d_stat"], d_num / (n1 * n2), rel_tol=1e-12)
    assert row["reject_05"] == int(row["d_stat"] > row["crit_05"])


def test_cuped_reduces_variance_and_preserves_null_lift(spark, sf_dir):
    """Assignment is independent of outcomes (md5 on custkey), so the
    CUPED adjustment must (a) report rho_sq in (0,1) — pre- and
    post-period spend of the same customer correlate; (b) keep the
    adjusted lift within the raw lift's noise scale (no sign blow-up)."""
    row = q_cuped_lift(spark, sf_dir).collect()[0]
    assert row["n_treat"] > 0 and row["n_control"] > 0
    assert 0.0 < row["rho_sq"] < 1.0
    assert row["theta"] != 0.0
    # adjustment shifts the estimate but cannot exceed the raw spread
    # scale at this n — a loose sanity envelope
    assert abs(row["cuped_lift"] - row["raw_lift"]) < max(
        100.0, abs(row["raw_lift"])
    )


def test_psi_drift_null_case_is_small(spark, sf_dir):
    """Even/odd doc_id cohorts draw from the SAME distribution, so PSI
    must land at its sampling-noise floor: under the null,
    E[PSI] ≈ (B−1)·(1/n_e + 1/n_a) (the chi-square/2 approximation), so
    3× that envelope is a comfortable bound at any sf, while a REAL
    shift (PSI ≥ 0.25 at production n) would blow through it."""
    rows = q_psi_drift(spark, sf_dir).collect()
    assert rows
    psi = rows[0]["psi_total"]
    assert all(
        math.isclose(r["psi_total"], psi, rel_tol=1e-12) for r in rows
    )
    n_e = sum(r["n_expected"] for r in rows)
    n_a = sum(r["n_actual"] for r in rows)
    noise_floor = (len(rows) - 1) * (1.0 / n_e + 1.0 / n_a)
    assert 0.0 <= psi < 3 * noise_floor
    for r in rows:
        assert r["n_expected"] > 0 and r["n_actual"] > 0


def test_woe_iv_sign_structure(spark, sf_dir):
    """Each IV contribution (pe - pn)·woe is non-negative (both factors
    share a sign), so the reported iv_total must be >= any single bin's
    contribution and >= 0."""
    rows = q_woe_iv(spark, sf_dir).collect()
    iv = rows[0]["iv_total"]
    assert all(math.isclose(r["iv_total"], iv, rel_tol=1e-12) for r in rows)
    assert iv >= -1e-9
    te = sum(r["n_event"] for r in rows)
    tn = sum(r["n_nonevent"] for r in rows)
    for r in rows:
        contrib = (r["n_event"] / te - r["n_nonevent"] / tn) * r["woe"]
        assert contrib >= -1e-9
        assert iv >= contrib - 1e-9


def test_ece_calibration_integer_exact_identities(spark, sf_dir):
    """ECE invariants: bins partition the population, per-bin gap =
    |confidence − accuracy|, and the replicated ece equals the
    n-weighted gap sum — all derived from the same BIGINTs."""
    from m13_sparkstreaming_python_azure_spark.queries.science_ext import (
        q_ece_calibration,
    )

    rows = q_ece_calibration(spark, sf_dir).collect()
    assert 0 < len(rows) <= 10
    n_total = sum(r["n"] for r in rows)
    ece = rows[0]["ece"]
    assert all(abs(r["ece"] - ece) < 1e-12 for r in rows)
    weighted = sum(r["n"] * r["gap"] for r in rows) / n_total
    assert abs(weighted - ece) < 1e-9
    for r in rows:
        assert 0.0 <= r["confidence"] <= 1.0
        assert 0.0 <= r["accuracy"] <= 1.0
        assert abs(r["gap"] - abs(r["confidence"] - r["accuracy"])) < 1e-12


def test_model_quality_scores_sigmoid_and_determinism(spark, sf_dir):
    """Linear scorer invariants: probability in (0,1), keep == (prob ≥
    .5), score is length-normalized (|sum| ≤ 5e5·n_tokens), and the
    frozen weights make reruns bit-identical."""
    from m13_sparkstreaming_python_azure_spark.queries.llm import (
        q_model_quality_scores,
    )

    a = q_model_quality_scores(spark, sf_dir).collect()
    b = q_model_quality_scores(spark, sf_dir).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert len(a) > 0
    for r in a:
        assert 0.0 < r["quality_prob"] < 1.0
        assert r["keep"] == int(r["quality_prob"] >= 0.5)
        assert abs(r["sum_w_micro"]) <= 500000 * r["n_tokens"]
