"""Seasonal decomposition (operators/timeseries.seasonal_decompose) and
contrastive pair mining (operators/similarity.hard_negative_mining)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from m13_sparkstreaming_python_azure_spark.operators.similarity import (
    hard_negative_mining,
)
from m13_sparkstreaming_python_azure_spark.operators.timeseries import (
    seasonal_decompose,
)


def _series(spark, n=28, period=7):
    # value = linear trend + exact weekly wave + nothing else
    rows = [
        (t, 10.0 + 0.5 * t + [3.0, -1.0, 0.0, 2.0, -2.0, 1.0, -3.0][t % period])
        for t in range(n)
    ]
    return spark.createDataFrame(rows, "t long, v double")


def test_decomposition_reconstructs_value(spark):
    out = seasonal_decompose(_series(spark), "t", "v").collect()
    full = [r for r in out if r["trend"] is not None]
    assert len(full) == 28 - 6  # 3 lost at each edge
    for r in full:
        assert math.isclose(
            r["trend"] + r["seasonal"] + r["remainder"], r["value"],
            abs_tol=5e-6,
        )


def test_seasonal_effects_centered_and_periodic(spark):
    out = seasonal_decompose(_series(spark), "t", "v").collect()
    by_phase = {}
    for r in out:
        if r["seasonal"] is not None:
            by_phase.setdefault(r["t"] % 7, set()).add(r["seasonal"])
    # one seasonal value per phase, and they sum to ~0
    assert all(len(v) == 1 for v in by_phase.values())
    assert abs(sum(next(iter(v)) for v in by_phase.values())) < 1e-5
    # a pure linear trend + exact wave: remainder ~0 everywhere
    for r in out:
        if r["remainder"] is not None:
            assert abs(r["remainder"]) < 1e-4


def test_even_period_rejected(spark):
    with pytest.raises(ValueError):
        seasonal_decompose(_series(spark), "t", "v", period=6)


def _emb(spark):
    rows = [
        (0, [1.0, 0.0], 1),
        (1, [0.9, 0.1], 1),   # near 0, same label
        (2, [0.8, 0.2], 2),   # near 0, OTHER label -> hard negative
        (3, [0.0, 1.0], 1),   # far, same label
        (4, [-1.0, 0.0], 2),  # far, other label
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )


def test_hard_negative_mining_splits_by_label(spark):
    emb = _emb(spark)
    anchors = emb.filter(F.col("vec_id") == 0)
    got = {
        (r["pair_type"], r["pair_id"], r["rank"])
        for r in hard_negative_mining(emb, anchors, k_pos=1, k_neg=1).collect()
    }
    # nearest same-label is 1; nearest different-label is 2
    assert got == {("pos", 1, 1), ("neg", 2, 1)}


def test_hard_negative_mining_excludes_self_and_bounds_k(spark):
    emb = _emb(spark)
    anchors = emb.filter(F.col("vec_id") <= 1)
    out = hard_negative_mining(emb, anchors, k_pos=2, k_neg=2).collect()
    assert all(r["pair_id"] != r["anchor_id"] for r in out)
    for aid in (0, 1):
        pos = [r for r in out if r["anchor_id"] == aid and r["pair_type"] == "pos"]
        neg = [r for r in out if r["anchor_id"] == aid and r["pair_type"] == "neg"]
        assert len(pos) <= 2 and len(neg) <= 2
        assert [r["rank"] for r in sorted(pos, key=lambda r: r["rank"])] == list(
            range(1, len(pos) + 1)
        )
