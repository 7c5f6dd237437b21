"""Tests for the count-min sketch (operators/cms)."""

from __future__ import annotations

from pyspark.sql import functions as F

from m13_sparkstreaming_python_azure_spark.operators.cms import (
    cms_build,
    cms_estimate,
)


def _items(spark, counts):
    rows = [(k,) for k, n in counts.items() for _ in range(n)]
    return spark.createDataFrame(rows, ["item"])


def test_estimate_never_underestimates(spark):
    counts = {f"w{i}": (i % 7) + 1 for i in range(60)}
    df = _items(spark, counts)
    cms = cms_build(df, "item", depth=4, width=64)
    probes = spark.createDataFrame([(k,) for k in counts], ["item"])
    out = {
        r["item"]: r["estimate"]
        for r in cms_estimate(cms, probes, "item", 4, 64).collect()
    }
    for k, n in counts.items():
        assert out[k] >= n  # one-sided error


def test_exact_when_width_dominates(spark):
    counts = {"a": 5, "b": 3, "c": 9}
    df = _items(spark, counts)
    cms = cms_build(df, "item", depth=4, width=4096)
    probes = spark.createDataFrame([(k,) for k in counts], ["item"])
    out = {
        r["item"]: r["estimate"]
        for r in cms_estimate(cms, probes, "item", 4, 4096).collect()
    }
    assert out == counts  # 3 keys in 4096 buckets: no collisions


def test_mergeability_cellwise_sum(spark):
    a = _items(spark, {"x": 4, "y": 2})
    b = _items(spark, {"x": 1, "z": 7})
    merged = (
        cms_build(a, "item", 4, 64)
        .unionByName(cms_build(b, "item", 4, 64))
        .groupBy("d", "bucket")
        .agg(F.sum("n").alias("n"))
    )
    direct = cms_build(a.unionByName(b), "item", 4, 64)
    got = {
        (r["d"], r["bucket"]): r["n"] for r in merged.collect()
    }
    want = {
        (r["d"], r["bucket"]): r["n"] for r in direct.collect()
    }
    assert got == want  # sketch of the union == cell-wise sum


def test_absent_item_zero(spark):
    cms = cms_build(_items(spark, {"a": 3}), "item", 4, 4096)
    probes = spark.createDataFrame([("zzz",)], ["item"])
    out = cms_estimate(cms, probes, "item", 4, 4096).collect()
    assert out[0]["estimate"] == 0
