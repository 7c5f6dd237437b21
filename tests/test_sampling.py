"""Sampling & data-mixing operator properties (operators/sampling.py).

The gate hash-checks the md5-deterministic selections against DuckDB;
these tests pin the STATISTICAL and structural contracts the hash can't:
exact per-group counts, weight bias, mixture rebalancing, determinism
under repartitioning, and salt redraws.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from m13_sparkstreaming_python_azure_spark.catalog import load_table
from m13_sparkstreaming_python_azure_spark.operators.sampling import (
    mixture_resample,
    sample_exact_per_group,
    weighted_sample_global,
)


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )


def test_exact_k_per_group_counts_and_determinism(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    out = sample_exact_per_group(docs, ["source"], "doc_id", k=2)
    counts = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    sizes = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    for src, n in counts.items():
        assert n == min(2, sizes[src])
    # determinism under repartitioning: same ids either way
    ids1 = {r["doc_id"] for r in out.collect()}
    ids2 = {
        r["doc_id"]
        for r in sample_exact_per_group(
            docs.repartition(7), ["source"], "doc_id", k=2
        ).collect()
    }
    assert ids1 == ids2
    # a different salt redraws the sample
    ids3 = {
        r["doc_id"]
        for r in sample_exact_per_group(
            docs, ["source"], "doc_id", k=2, salt="other"
        ).collect()
    }
    assert ids3 != ids1


def test_weighted_sample_biases_toward_weight(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    k = 20
    out = weighted_sample_global(docs, "doc_id", "n_chars", k=k)
    rows = out.collect()
    assert len(rows) == k
    sampled_mean = sum(r["n_chars"] for r in rows) / k
    pop = docs.agg(F.avg("n_chars").alias("m")).collect()[0]["m"]
    # inclusion ∝ n_chars ⇒ the sampled mean must exceed the population
    # mean (length-biased sampling); margin loose enough for any fixture
    assert sampled_mean > pop
    # determinism under repartitioning
    ids2 = {
        r["doc_id"]
        for r in weighted_sample_global(
            docs.repartition(5), "doc_id", "n_chars", k=k
        ).collect()
    }
    assert ids2 == {r["doc_id"] for r in rows}


def test_weighted_sample_zero_weight_never_wins(spark, sf_dir):
    docs = _docs(spark, sf_dir).withColumn(
        "w",
        F.when(F.col("doc_id") % 2 == 0, F.lit(0.0001)).otherwise(
            F.lit(1000.0)
        ),
    )
    out = weighted_sample_global(docs, "doc_id", "w", k=10)
    # with a 10^7 weight ratio and ≥10 heavy rows, every winner is heavy
    heavy = docs.filter(F.col("doc_id") % 2 == 1).count()
    assert heavy >= 10
    assert all(r["doc_id"] % 2 == 1 for r in out.collect())


def test_mixture_resample_rebalances(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    total = docs.count()
    target = max(20, total // 2)
    out = mixture_resample(docs, "source", target, "doc_id")
    got = out.count()
    # Bernoulli around the target: 3σ of Binomial(total, target/total)
    import math

    sigma = math.sqrt(target * (1 - target / total)) if total else 0
    assert abs(got - target) <= max(10, 3 * sigma)
    # explicit targets: all mass on one domain keeps only that domain
    one = mixture_resample(
        docs, "source", 10, "doc_id", targets={"src0": 1.0}
    )
    assert {r["source"] for r in one.collect()} == {"src0"}
    # a domain with share*total >= |domain| keeps every row (fraction 1)
    n_src0 = docs.filter(F.col("source") == "src0").count()
    all_kept = mixture_resample(
        docs, "source", total * 2, "doc_id", targets={"src0": 1.0}
    )
    assert all_kept.count() == n_src0


def test_temperature_resample_flattens_mixture(spark, sf_dir):
    from m13_sparkstreaming_python_azure_spark.operators.sampling import (
        temperature_resample,
    )

    docs = _docs(spark, sf_dir)
    # skew the corpus: src0 gets 5 echoes of every doc
    skewed = docs.unionByName(
        docs.filter(F.col("source") == "src0")
        .crossJoin(spark.range(1, 6).withColumnRenamed("id", "echo"))
        .select(
            (F.col("doc_id") + F.col("echo") * 1000000).alias("doc_id"),
            "source",
            "n_chars",
        )
    )
    total = 200

    def share_of_src0(df):
        rows = df.groupBy("source").agg(F.count("*").alias("n")).collect()
        m = {r["source"]: r["n"] for r in rows}
        return m.get("src0", 0) / max(1, sum(m.values()))

    nat = share_of_src0(skewed)  # src0 dominates the skewed corpus
    t1 = share_of_src0(
        temperature_resample(skewed, "source", total, "doc_id", tau=1.0)
    )
    t0 = share_of_src0(
        temperature_resample(skewed, "source", total, "doc_id", tau=0.0)
    )
    th = share_of_src0(
        temperature_resample(skewed, "source", total, "doc_id", tau=0.5)
    )
    # tau=1 preserves the natural skew, tau=0 flattens to ~uniform,
    # tau=0.5 sits in between
    assert abs(t1 - nat) < 0.1
    assert t0 < th < t1
