"""operators/window.global_cumsum — the distributed running sum that
replaced the unpartitioned cumulative windows of the roc_auc/ks_test/
kruskal_wallis/ece_calibration family (VERDICT r9 #1).

The r10 rebuild of global_rank/global_cumsum derives the partition tag
from DATA (quantile-literal buckets) instead of spark_partition_id over
repartitionByRange: a range exchange re-samples its boundaries per
branch evaluation, so when AQE declines to reuse it the stats branch
and the data branch disagree about partition membership — measured in
round 10 as nondeterministic ±0.5% AUC drift. These tests pin (a) exact
agreement with the naive unpartitioned window, (b) run-to-run stability
across fresh DAG evaluations, (c) plan invariants: no unpartitioned
window, no range exchange anywhere.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import Window

from m13_sparkstreaming_python_azure_spark.operators.window import (
    global_cumsum,
    global_rank,
)


def _naive_cumsum(df, order_cols, val):
    w = Window.orderBy(*order_cols).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.select(*order_cols, val, F.sum(val).over(w).alias("exp"))


@pytest.mark.parametrize("parts", [1, 4, 7, 32])
def test_matches_naive_window(spark, parts):
    df = spark.range(997).select(
        ((F.col("id") * 131) % 9973).alias("k"),
        ((F.col("id") % 13) + 1).alias("v"),
    ).groupBy("k").agg(F.sum("v").alias("v"))
    got = {
        (r["k"]): r["cum_v"]
        for r in global_cumsum(
            df, ["k"], ["v"], num_partitions=parts
        ).collect()
    }
    exp = {
        r["k"]: r["exp"] for r in _naive_cumsum(df, ["k"], "v").collect()
    }
    assert got == exp


def test_grouped_cumsum_and_totals(spark):
    df = spark.range(600).select(
        (F.col("id") % 3).cast("string").alias("g"),
        ((F.col("id") * 37) % 1009).alias("k"),
        F.lit(1).alias("v"),
    ).groupBy("g", "k").agg(F.sum("v").alias("v"))
    out = global_cumsum(
        df,
        ["k"],
        ["v"],
        partition_by=["g"],
        num_partitions=5,
        totals_prefix="tot_",
    ).collect()
    w = Window.partitionBy("g").orderBy("k").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    exp = {
        (r["g"], r["k"]): r["exp"]
        for r in df.select(
            "g", "k", F.sum("v").over(w).alias("exp")
        ).collect()
    }
    tots = {}
    for r in out:
        assert exp[(r["g"], r["k"])] == r["cum_v"]
        tots.setdefault(r["g"], r["tot_v"])
    true_tots = {
        r["g"]: r["t"]
        for r in df.groupBy("g").agg(F.sum("v").alias("t")).collect()
    }
    assert tots == true_tots


def test_deterministic_across_fresh_evaluations(spark):
    # The r9 failure mode: same logical query, fresh DAG each time,
    # values drifting run to run because the stats and data branches
    # re-sampled range boundaries independently. Three fresh builds
    # must agree exactly.
    results = []
    for _ in range(3):
        df = spark.read.parquet(
            "/root/testdata/sf0.001/orders.parquet"
        ).select(
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
            .cast("long")
            .alias("cents")
        ).groupBy("cents").agg(F.count(F.lit(1)).alias("nt"))
        agg = global_cumsum(df, ["cents"], ["nt"]).agg(
            F.sum(F.col("cum_nt") * F.col("cents")).alias("chk")
        )
        results.append(agg.collect()[0]["chk"])
    assert results[0] == results[1] == results[2]


def test_plan_has_no_unpartitioned_window_or_range_exchange(spark):
    import sys

    sys.path.insert(0, "tools")
    from plan_audit import unpartitioned_windows

    df = spark.range(500).select(
        F.col("id").alias("k"), F.lit(1).alias("v")
    )
    out = global_cumsum(df, ["k"], ["v"], num_partitions=6)
    jvm = spark._jvm
    plan = out._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert unpartitioned_windows(plan) == 0
    assert "rangepartitioning" not in plan


def test_global_rank_string_lead(spark):
    # sorted_neighborhood orders by a string name column: the surrogate
    # (first-6-bytes integer) must bucket consistently with Spark's
    # binary string order, including short/empty strings.
    names = ["", "A", "AB", "B", "ba", "b", "Customer#1", "Customer#2", "z"]
    df = spark.createDataFrame(
        [(n, i) for i, n in enumerate(names)], ["name", "id"]
    )
    got = {
        r["name"]: r["rank"]
        for r in global_rank(
            df, [F.col("name"), F.col("id")], num_partitions=4
        ).collect()
    }
    exp = {n: i + 1 for i, n in enumerate(sorted(names))}
    assert got == exp


def test_global_rank_desc_and_nulls(spark):
    df = spark.createDataFrame(
        [(None, 1), (5, 2), (3, 3), (9, 4), (None, 5), (7, 6)],
        ["x", "id"],
    )
    # desc: nulls last (Spark default)
    got = [
        (r["x"], r["id"])
        for r in sorted(
            global_rank(
                df, [F.col("x").desc(), F.col("id")], num_partitions=3
            ).collect(),
            key=lambda r: r["rank"],
        )
    ]
    assert got == [(9, 4), (7, 6), (5, 2), (3, 3), (None, 1), (None, 5)]
    # asc: nulls first (Spark default)
    got2 = [
        (r["x"], r["id"])
        for r in sorted(
            global_rank(
                df, [F.col("x"), F.col("id")], num_partitions=3
            ).collect(),
            key=lambda r: r["rank"],
        )
    ]
    assert got2 == [(None, 1), (None, 5), (3, 3), (5, 2), (7, 6), (9, 4)]
