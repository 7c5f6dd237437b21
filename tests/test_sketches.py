"""Accuracy tests for the theta / KLL sketch queries. Since r9 the
driver gates hash the derived invariants (exact values + within-
tolerance flags); these tests keep the TIGHTER sketch-value assertions
the flags relax."""

from __future__ import annotations

from pyspark.sql import functions as F

from m13_sparkstreaming_python_azure_spark.catalog import load_table
from m13_sparkstreaming_python_azure_spark.queries.core import (
    q_kll_quantiles,
    q_theta_sketch_audiences,
)

SF = "/root/testdata/sf0.001"


def test_theta_estimates_match_exact_at_fixture_cardinality(spark):
    """Below the sketch's nominal entries (k=4096) theta is EXACT —
    the fixture's distinct user counts must match set arithmetic, and
    every est_ok flag must hold (the sketch estimates feed them)."""
    ev = load_table(spark, SF, "events")
    p = {r["user_id"] for r in ev.filter(F.col("event_type") == "purchase").select("user_id").distinct().collect()}
    c = {r["user_id"] for r in ev.filter(F.col("event_type") == "click").select("user_id").distinct().collect()}
    row = q_theta_sketch_audiences(spark, SF).collect()[0]
    assert row["n_purchasers"] == len(p)
    assert row["n_clickers"] == len(c)
    assert row["n_both"] == len(p & c)
    assert row["n_purchase_only"] == len(p - c)
    assert row["n_either"] == len(p | c)
    for col in (
        "n_purchasers_est_ok",
        "n_clickers_est_ok",
        "n_both_est_ok",
        "n_purchase_only_est_ok",
        "n_either_est_ok",
    ):
        assert row[col] == 1, col


def _kll_quantile_values(spark):
    """The raw merged-sketch quantile values (the gate query now returns
    rank-ok flags; tests still pin the values' empirical ranks)."""
    ev = load_table(spark, SF, "events")
    first_half = F.dayofmonth("ts") <= 15
    per_type = ev.groupBy("event_type").agg(
        F.kll_sketch_agg_double(F.when(first_half, F.col("value"))).alias("a"),
        F.kll_sketch_agg_double(F.when(~first_half, F.col("value"))).alias("b"),
    )
    merged = per_type.select(
        "event_type", F.kll_sketch_merge_double("a", "b").alias("sk")
    )
    return merged.select(
        "event_type",
        F.kll_sketch_get_n_double("sk").alias("n_values"),
        F.kll_sketch_get_quantile_double("sk", F.lit(0.5)).alias("p50"),
        F.kll_sketch_get_quantile_double("sk", F.lit(0.9)).alias("p90"),
        F.kll_sketch_get_quantile_double("sk", F.lit(0.99)).alias("p99"),
    )


def test_kll_quantiles_close_to_exact(spark):
    """KLL's contract is bounded RANK error (~1.7% at default k), not
    value error — assert the empirical rank of each returned quantile
    value, and that the gate query's rank-ok flags all hold."""
    ev = load_table(spark, SF, "events")
    values = {}
    for r in ev.select("event_type", "value").collect():
        values.setdefault(r["event_type"], []).append(r["value"])
    for v in values.values():
        v.sort()
    got = _kll_quantile_values(spark).collect()
    assert {r["event_type"] for r in got} == set(values)
    for r in got:
        vs = values[r["event_type"]]
        assert r["n_values"] == len(vs)
        for q, col in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99")):
            rank = sum(1 for x in vs if x <= r[col]) / len(vs)
            assert abs(rank - q) <= 0.05, (col, rank, q)
    for r in q_kll_quantiles(spark, SF).collect():
        assert r["p50_rank_ok"] == 1 and r["p90_rank_ok"] == 1
        assert r["p99_rank_ok"] == 1
        assert r["n_values"] == len(values[r["event_type"]])


def test_kll_merge_equals_unsplit_sketch(spark):
    """Merging the two half-month sketches must answer like one sketch
    over all values (mergeability — the reason to use KLL at all)."""
    ev = load_table(spark, SF, "events")
    whole = (
        ev.groupBy("event_type")
        .agg(F.kll_sketch_agg_double("value").alias("sk"))
        .select(
            "event_type",
            F.kll_sketch_get_quantile_double("sk", F.lit(0.5)).alias("p50"),
        )
    )
    whole_map = {r["event_type"]: r["p50"] for r in whole.collect()}
    merged = {
        r["event_type"]: r["p50"] for r in _kll_quantile_values(spark).collect()
    }
    for k in whole_map:
        assert abs(merged[k] - whole_map[k]) <= 1e-9 or (
            abs(merged[k] - whole_map[k])
            <= 0.05 * max(abs(whole_map[k]), 1.0)
        )
