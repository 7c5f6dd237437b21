"""Approximate-percentile accuracy harness (VERDICT r4 #8).

Round 1's sketch queries are rows-only in the oracle gate (randomized /
engine-specific internals), so this is what keeps them honest as data
grows: explicit RANK-ERROR bounds against exact percentiles.

- ``percentile_approx(value, q, A)`` is Spark's KLL-class one-pass
  mergeable quantile sketch (GK-variant) with a documented guarantee:
  the returned value's rank is within ``N/A`` of ``q·N`` (accuracy
  parameter A = 1/ε). We assert exactly that, tie-aware: the target
  rank must fall within ``[count(< v) − εN, count(≤ v) + εN]``.
- ``histogram_quantiles`` (the deterministic sketch) carries a VALUE
  bound instead: |est − exact| ≤ one bin width, by construction.

Runs at sf0.01 by default; set SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
for the at-scale sweep (same bounds must hold — that's the point).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from m13_sparkstreaming_python_azure_spark.catalog import load_table

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

QS = [0.5, 0.9, 0.99]


@pytest.fixture(scope="module")
def values(spark):
    ev = load_table(spark, SF, "events").select("value").persist()
    n = ev.count()
    yield ev, n
    ev.unpersist()


def _rank_window(ev, v):
    """(count(< v), count(<= v)) — the rank interval v occupies."""
    row = ev.agg(
        F.sum((F.col("value") < v).cast("long")).alias("lt"),
        F.sum((F.col("value") <= v).cast("long")).alias("le"),
    ).collect()[0]
    return row["lt"], row["le"]


@pytest.mark.parametrize("accuracy", [100, 10000])
def test_percentile_approx_rank_error_within_documented_epsilon(
    spark, values, accuracy
):
    ev, n = values
    eps_n = n / accuracy
    approx = ev.agg(
        *[
            F.percentile_approx("value", q, accuracy).alias(f"q{i}")
            for i, q in enumerate(QS)
        ]
    ).collect()[0]
    for i, q in enumerate(QS):
        v = approx[f"q{i}"]
        lt, le = _rank_window(ev, v)
        target = q * n
        assert lt - eps_n <= target <= le + eps_n, (
            f"q={q} A={accuracy}: approx {v} has rank window [{lt}, {le}], "
            f"target {target:.1f} outside ±{eps_n:.1f}"
        )


def test_histogram_quantiles_value_error_within_bin_width(spark, values):
    from m13_sparkstreaming_python_azure_spark.operators.histogram import (
        build_histogram,
        histogram_quantiles,
        merge_histograms,
    )

    ev, n = values
    bounds = ev.agg(
        F.min("value").alias("lo"), F.max("value").alias("hi")
    ).collect()[0]
    lo, hi, n_bins = float(bounds["lo"]), float(bounds["hi"]), 512
    width = (hi - lo) / n_bins

    tagged = ev.withColumn("g", F.lit("all"))
    # build per-half sketches and MERGE them — the accuracy bound must
    # survive the mergeable path, not just the single-pass one
    h1 = build_histogram(
        tagged.filter(F.col("value") < (lo + hi) / 2), "value", ["g"], lo, hi, n_bins
    )
    h2 = build_histogram(
        tagged.filter(F.col("value") >= (lo + hi) / 2), "value", ["g"], lo, hi, n_bins
    )
    merged = merge_histograms(h1.unionByName(h2), ["g"])
    est = {
        r["q"]: r["quantile_est"]
        for r in histogram_quantiles(merged, ["g"], QS, lo, hi, n_bins).collect()
    }
    exact = ev.agg(
        *[F.percentile("value", q).alias(f"q{i}") for i, q in enumerate(QS)]
    ).collect()[0]
    for i, q in enumerate(QS):
        got, want = est[q], float(exact[f"q{i}"])
        assert abs(got - want) <= width + 1e-9, (
            f"q={q}: histogram est {got} vs exact {want}, "
            f"|err| {abs(got - want):.4f} > bin width {width:.4f}"
        )
