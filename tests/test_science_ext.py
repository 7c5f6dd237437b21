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
    q_embedding_drift,
    q_kaplan_meier,
    q_poisson_bootstrap_ci,
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
