"""Misra-Gries heavy hitters (operators/heavy): the sketch guarantee
(every item over threshold survives the candidate pass), exactness of
the verified answer, and partition invariance."""

from __future__ import annotations

from pyspark.sql import functions as F

from m13_sparkstreaming_python_azure_spark.operators.heavy import (
    heavy_hitters_exact,
)


def _exact_hh(items, k):
    total = items.count()
    return {
        (r["item"], r["n"])
        for r in items.groupBy(F.col("item"))
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") * k > F.lit(total))
        .collect()
    }


def test_matches_exact_threshold_answer_any_partitioning(spark, sf_dir):
    from m13_sparkstreaming_python_azure_spark.catalog import load_table
    from m13_sparkstreaming_python_azure_spark.operators.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    toked = docs.select(F.explode(tokens("text")).alias("item"))
    want = _exact_hh(toked, 50)
    assert want  # fixture has frequent tokens at k=50
    for parts in (1, 7):
        got = {
            (r["item"], r["n"])
            for r in heavy_hitters_exact(
                toked.repartition(parts), "item", k=50
            ).collect()
        }
        assert got == want


def test_skewed_singleton_stream(spark):
    """Adversarial shape for MG: one hot key drowning in unique noise —
    the decrement step must not evict it."""
    hot = spark.range(0, 500).select(F.lit("HOT").alias("item"))
    noise = spark.range(0, 5000).select(
        F.concat(F.lit("u"), F.col("id")).alias("item")
    )
    items = hot.unionAll(noise).repartition(4)
    got = {(r["item"], r["n"]) for r in heavy_hitters_exact(items, "item", k=20).collect()}
    assert got == {("HOT", 500)}  # 500 * 20 > 5500; no noise key qualifies


def test_nulls_excluded_from_item_universe(spark):
    """NULL items are outside the universe: the threshold total N must
    not count them, or a borderline item is wrongly excluded. 100 HOT +
    900 unique noise + 1100 NULLs at k=10: N=1000 -> 100*10 > 1000 is
    false... use 101 HOT so 101*10 > 1000 holds, but 101*10 > 2100
    (NULL-inflated N) would not."""
    hot = spark.range(0, 101).select(F.lit("HOT").alias("item"))
    noise = spark.range(0, 899).select(
        F.concat(F.lit("u"), F.col("id")).alias("item")
    )
    nulls = spark.range(0, 1100).select(
        F.lit(None).cast("string").alias("item")
    )
    items = hot.unionAll(noise).unionAll(nulls).repartition(4)
    got = {
        (r["item"], r["n"])
        for r in heavy_hitters_exact(items, "item", k=10).collect()
    }
    assert got == {("HOT", 101)}
