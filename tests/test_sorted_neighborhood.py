"""operators/linkage.sorted_neighborhood + operators/window.global_rank —
the scale-safe sorted-neighborhood candidate generator (VERDICT r7 #1):
global_rank's distributed total order + a dense-rank equi-join must
reproduce exactly the pairs a naive unpartitioned lead() window yields,
with candidate count linear in n, and the plan must contain NO
unpartitioned Window node."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from m13_sparkstreaming_python_azure_spark.operators.linkage import (
    sorted_neighborhood,
)
from m13_sparkstreaming_python_azure_spark.operators.window import (
    global_rank,
)


def _naive_pairs(spark, rows, window):
    df = spark.createDataFrame(rows, ["k", "v"])
    w = Window.orderBy("k")
    out = (
        df.withColumn(
            "__nbrs",
            F.array(
                *[
                    F.lead(F.struct("k", "v"), i).over(w)
                    for i in range(1, window + 1)
                ]
            ),
        )
        .select(
            F.col("k").alias("k_a"),
            F.col("v").alias("v_a"),
            F.explode("__nbrs").alias("__n"),
        )
        .filter(F.col("__n").isNotNull())
        .select("k_a", "v_a", F.col("__n.k").alias("k_b"), F.col("__n.v").alias("v_b"))
    )
    return {tuple(r) for r in out.collect()}


def test_matches_naive_lead_window(spark):
    rows = [(i * 7 % 97, f"v{i}") for i in range(60)]  # unique keys
    got = sorted_neighborhood(
        spark.createDataFrame(rows, ["k", "v"]), [F.col("k")], window=4
    )
    assert set(got.columns) == {"k_a", "v_a", "k_b", "v_b"}
    assert {tuple(r) for r in got.select("k_a", "v_a", "k_b", "v_b").collect()} == _naive_pairs(
        spark, rows, 4
    )


def test_candidate_count_linear(spark):
    # n rows with window w -> exactly w*n - w*(w+1)/2 pairs (tail rows
    # have fewer neighbors): linear in n, never quadratic
    for n in (50, 500):
        df = spark.range(n).select(F.col("id").alias("k"))
        got = sorted_neighborhood(df, [F.col("k")], window=10).count()
        assert got == 10 * n - 55


def test_no_unpartitioned_window_in_plan(spark):
    df = spark.range(100).select(F.col("id").alias("k"))
    plan = (
        sorted_neighborhood(df, [F.col("k")], window=3)
        ._jdf.queryExecution()
        .explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
    )
    import re

    for m in re.finditer(
        r"\(\d+\) Window\n(?:[^\n]*\n)*?Arguments: ([^\n]*)", plan
    ):
        assert m.group(1).count("], [") + 1 >= 3, "unpartitioned Window"


def test_global_rank_exact(spark):
    rows = [(i * 13 % 101,) for i in range(101)]
    df = spark.createDataFrame(rows, ["k"])
    got = {
        (r["k"], r["rank"])
        for r in global_rank(df, [F.col("k")], total_col="n")
        .select("k", "rank", "n")
        .collect()
    }
    expect = {(k, k + 1) for (k,) in rows}  # keys are 0..100 shuffled
    assert {(k, r) for k, r in got} == expect


def test_global_rank_total_col(spark):
    df = spark.range(37).select(F.col("id").alias("k"))
    rows = global_rank(df, [F.col("k")], total_col="n").collect()
    assert all(r["n"] == 37 for r in rows)


def test_window_validation(spark):
    df = spark.range(5).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="window"):
        sorted_neighborhood(df, [F.col("k")], window=0)
