"""Tests for bloom-filter join pruning (operators/bloom)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from m13_sparkstreaming_python_azure_spark.operators.bloom import (
    bloom_pruned_join,
    build_bloom,
    might_contain,
)


def test_bloom_no_false_negatives(spark):
    keys = spark.range(0, 1000).select((F.col("id") * 7 + 3).alias("k"))
    bitmap = build_bloom(keys, "k", num_bits=1 << 14, num_hashes=5)
    # every inserted key must probe positive
    hits = (
        keys.filter(might_contain(F.col("k"), bitmap, 5)).count()
    )
    assert hits == 1000


def test_bloom_false_positive_rate_bounded(spark):
    keys = spark.range(0, 1000).select(F.col("id").alias("k"))
    # m/n = 16 bits/key, k = 5 → theoretical FP ≈ 0.0009; assert < 2%
    bitmap = build_bloom(keys, "k", num_bits=1 << 14, num_hashes=5)
    probes = spark.range(100000, 120000).select(F.col("id").alias("k"))
    fp = probes.filter(might_contain(F.col("k"), bitmap, 5)).count()
    assert fp / 20000 < 0.02


def test_bloom_pruned_join_matches_plain_join(spark):
    fact = spark.range(0, 5000).select(
        (F.col("id") % 500).alias("k"), (F.col("id") * 2).alias("v")
    )
    dim = spark.createDataFrame(
        [(k, f"d{k}") for k in range(0, 500, 25)], ["k", "name"]
    )
    plain = sorted(
        tuple(r)
        for r in fact.join(dim, "k").select("k", "v", "name").collect()
    )
    pruned = sorted(
        tuple(r)
        for r in bloom_pruned_join(fact, dim, "k", num_bits=1 << 12)
        .select("k", "v", "name")
        .collect()
    )
    assert pruned == plain
    assert len(pruned) == 5000 // 25  # 20 dim keys × 10 fact rows each...

    # string keys work too (xxhash64 accepts any atomic type)
    fact_s = fact.select(F.concat(F.lit("k"), "k").alias("k"), "v")
    dim_s = dim.select(F.concat(F.lit("k"), "k").alias("k"), "name")
    assert (
        bloom_pruned_join(fact_s, dim_s, "k", num_bits=1 << 12).count()
        == fact_s.join(dim_s, "k").count()
    )


def test_bloom_pruning_actually_prunes(spark):
    """The pre-filter must drop (almost all) non-matching fact rows before
    the join — the whole point of the operator."""
    fact = spark.range(0, 10000).select((F.col("id") % 1000).alias("k"))
    dim = spark.createDataFrame([(7,), (13,)], ["k"])
    bitmap = build_bloom(dim, "k", num_bits=1 << 12, num_hashes=5)
    survivors = fact.filter(might_contain(F.col("k"), bitmap, 5)).count()
    # 2 real keys → 20 rows; allow a little FP slack
    assert survivors >= 20
    assert survivors < 200


def test_bloom_rejects_outer_join_and_bad_bits(spark):
    df = spark.range(3).select(F.col("id").alias("k"))
    with pytest.raises(ValueError):
        bloom_pruned_join(df, df, "k", how="left")
    with pytest.raises(ValueError):
        build_bloom(df, "k", num_bits=100)
