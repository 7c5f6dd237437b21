"""Tests for the data-quality suite (operators/quality) and frequency
analytics (operators/frequency: heavy hitters, association rules)."""

from __future__ import annotations

from pyspark.sql import functions as F

from m13_sparkstreaming_python_azure_spark.operators.frequency import (
    association_rules,
    heavy_hitters,
)
from m13_sparkstreaming_python_azure_spark.operators.quality import (
    evaluate_suite,
    referential_integrity,
    single_table_metrics,
)


def test_quality_metrics_on_dirty_data(spark):
    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, None, -1.0), (2, "c", 3.0), (3, "d", 0.0)],
        ["id", "name", "amount"],
    )
    m = {
        r["check"]: r["metric"]
        for r in single_table_metrics(
            df,
            completeness=["name"],
            uniqueness=["id"],
            compliance={"positive_amount": F.col("amount") > 0},
        ).collect()
    }
    assert m["completeness:name"] == 3 / 4
    assert m["uniqueness:id"] == 3 / 4
    assert m["compliance:positive_amount"] == 2 / 4


def test_referential_orphans(spark):
    child = spark.createDataFrame([(1,), (2,), (9,)], ["fk"])
    parent = spark.createDataFrame([(1,), (2,), (3,)], ["pk"])
    row = referential_integrity(child, "fk", parent, "pk").collect()[0]
    assert row["check"] == "referential:fk"
    assert row["metric"] == 2 / 3


def test_empty_suite_and_empty_child_guards(spark):
    df = spark.createDataFrame([(1,)], ["id"])
    out = single_table_metrics(df)
    assert out.columns == ["check", "metric"]
    assert out.count() == 0
    empty_child = spark.createDataFrame([], "fk bigint")
    parent = spark.createDataFrame([(1,)], ["pk"])
    row = referential_integrity(empty_child, "fk", parent, "pk").collect()[0]
    assert row["metric"] == 1.0


def test_evaluate_suite_thresholds(spark):
    metrics = spark.createDataFrame(
        [("a", 0.9), ("b", 1.0), ("c", 0.5)], ["check", "metric"]
    )
    out = {
        r["check"]: r["passed"]
        for r in evaluate_suite(
            metrics, {"a": 0.95, "b": 1.0}
        ).collect()
    }
    assert out == {"a": False, "b": True, "c": True}  # c: no threshold


def test_heavy_hitters_matches_naive(spark):
    rows = (
        [("x",)] * 50 + [("y",)] * 30 + [("z",)] * 15
        + [(f"t{i}",) for i in range(5)]
    )
    df = spark.createDataFrame(rows, ["item"]).repartition(4)
    out = {r["item"]: r["n"] for r in heavy_hitters(df, "item", 0.1).collect()}
    # N=100; share >= 0.1 -> x (0.5), y (0.3), z (0.15); tails excluded
    assert out == {"x": 50, "y": 30, "z": 15}


def test_heavy_hitters_no_false_negatives_under_skewed_partitioning(spark):
    # all copies of the hitter in ONE partition; candidate pass must
    # still surface it (local share there is high)
    df = spark.createDataFrame(
        [(0, "hot")] * 20 + [(i % 8, f"cold{i}") for i in range(80)],
        ["p", "item"],
    ).repartition(8, "p")
    out = {r["item"] for r in heavy_hitters(df, "item", 0.15).collect()}
    assert out == {"hot"}


def test_association_rules_metrics(spark):
    # 4 baskets: {a,b} x3, {a} x1 -> a->b: n_ab=3, conf=3/4, supp=3/4,
    # lift = (3/4)/(3/4) = 1.0 ; b->a: conf=1.0, lift = 1/(4/4) = 1.0
    rows = [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"), (3, "b"), (4, "a")]
    df = spark.createDataFrame(rows, ["basket", "item"])
    out = {
        (r["antecedent"], r["consequent"]): r
        for r in association_rules(df, "basket", "item", 1).collect()
    }
    ab = out[("a", "b")]
    assert (ab["n_ab"], ab["support"], ab["confidence"]) == (3, 0.75, 0.75)
    assert ab["lift"] == 1.0
    ba = out[("b", "a")]
    assert ba["confidence"] == 1.0 and ba["lift"] == 1.0


def test_association_rules_min_count_prunes(spark):
    rows = [(1, "a"), (1, "b"), (2, "a"), (2, "c")]
    df = spark.createDataFrame(rows, ["basket", "item"])
    out = association_rules(df, "basket", "item", 2).collect()
    assert out == []  # every pair co-occurs only once
