"""Tests for Fellegi–Sunter record linkage (operators/linkage)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from m13_sparkstreaming_python_azure_spark.operators.linkage import fs_score


def _pairs(spark):
    return spark.createDataFrame(
        [
            (1, 2, True, True),
            (3, 4, True, False),
            (5, 6, False, False),
        ],
        ["key_a", "key_b", "name_ok", "bal_ok"],
    )


MU = {"name": (0.9, 0.1), "balance": (0.8, 0.2)}


def _w(m, u, agree):
    return math.log(m / u) if agree else math.log((1 - m) / (1 - u))


def test_scores_match_manual(spark):
    out = {
        r["key_a"]: r["score"]
        for r in fs_score(
            _pairs(spark),
            {"name": F.col("name_ok"), "balance": F.col("bal_ok")},
            MU,
            lower=-1.0,
            upper=3.0,
        ).collect()
    }
    for ka, (n_ok, b_ok) in {1: (True, True), 3: (True, False), 5: (False, False)}.items():
        expect = _w(0.9, 0.1, n_ok) + _w(0.8, 0.2, b_ok)
        assert abs(out[ka] - expect) < 1e-8


def test_decisions_threshold(spark):
    out = {
        r["key_a"]: r["decision"]
        for r in fs_score(
            _pairs(spark),
            {"name": F.col("name_ok"), "balance": F.col("bal_ok")},
            MU,
            lower=-1.0,
            upper=3.0,
        ).collect()
    }
    # both agree: ln9+ln4 = 3.58 -> match; both disagree: ln(1/9)+ln(1/4)
    # = -3.58 -> non_match; mixed: ln9+ln(1/4) = 0.81 -> possible
    assert out == {1: "match", 3: "possible", 5: "non_match"}


def test_invalid_mu_rejected(spark):
    with pytest.raises(ValueError):
        fs_score(
            _pairs(spark),
            {"name": F.col("name_ok")},
            {"name": (0.1, 0.9)},  # u > m
            -1,
            1,
        )


def test_mismatched_fields_rejected(spark):
    with pytest.raises(ValueError):
        fs_score(
            _pairs(spark), {"name": F.col("name_ok")}, MU, -1, 1
        )
