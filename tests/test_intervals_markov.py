"""Tests for interval merge (operators/intervals) and the Markov /
decile analytics queries (queries/analytics_ext)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from m13_sparkstreaming_python_azure_spark.operators.intervals import (
    merge_intervals,
)
from m13_sparkstreaming_python_azure_spark.queries.analytics_ext import (
    q_markov_transitions,
    q_price_decile_stats,
)

SF0001 = "/root/testdata/sf0.001"


def _iv(spark, rows):
    return spark.createDataFrame(rows, ["k", "tb", "s", "e"])


def test_merge_overlapping_and_touching(spark):
    rows = [
        ("u", 1, 0, 10),
        ("u", 2, 5, 15),   # overlaps first
        ("u", 3, 15, 20),  # touches second -> same island
        ("u", 4, 30, 40),  # gap -> new island
    ]
    out = merge_intervals(_iv(spark, rows), "k", "s", "e", "tb").collect()
    islands = sorted((r["island_start"], r["island_end"], r["n_merged"]) for r in out)
    assert islands == [(0, 20, 3), (30, 40, 1)]


def test_merge_contained_interval(spark):
    # an interval fully inside an earlier one must not split the island
    rows = [("u", 1, 0, 100), ("u", 2, 10, 20), ("u", 3, 50, 120)]
    out = merge_intervals(_iv(spark, rows), "k", "s", "e", "tb").collect()
    assert len(out) == 1
    assert (out[0]["island_start"], out[0]["island_end"]) == (0, 120)
    assert out[0]["n_merged"] == 3


def test_merge_keys_independent(spark):
    rows = [("a", 1, 0, 10), ("b", 1, 5, 15)]
    out = merge_intervals(_iv(spark, rows), "k", "s", "e", "tb").collect()
    assert len(out) == 2


def test_markov_probs_sum_to_one(spark):
    out = q_markov_transitions(spark, SF0001)
    sums = (
        out.groupBy("cur_type")
        .agg(F.sum("prob").alias("p"))
        .collect()
    )
    assert sums
    for r in sums:
        assert abs(r["p"] - 1.0) < 1e-9


def test_markov_counts_match_manual(spark):
    rows = [
        (1, dt.datetime(2024, 1, 1, 0, 0, i), 7, "a", 0.0, "{}")
        for i in range(3)
    ] + [(4, dt.datetime(2024, 1, 1, 0, 0, 3), 7, "b", 0.0, "{}")]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/events.parquet")
        out = {
            (r["cur_type"], r["next_type"]): (r["n_trans"], r["prob"])
            for r in q_markov_transitions(spark, d).collect()
        }
    # sequence a,a,a,b -> a->a twice, a->b once
    assert out[("a", "a")] == (2, 2 / 3)
    assert out[("a", "b")] == (1, 1 / 3)


def test_deciles_balanced_and_ordered(spark):
    out = q_price_decile_stats(spark, SF0001).orderBy("decile").collect()
    assert [r["decile"] for r in out] == list(range(1, 11))
    counts = [r["n_orders"] for r in out]
    assert max(counts) - min(counts) <= 1  # ntile balance
    mins = [r["min_price"] for r in out]
    assert mins == sorted(mins)  # deciles ordered by price
