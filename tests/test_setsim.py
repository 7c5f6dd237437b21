"""Prefix-filtered exact set-similarity joins (operators/setsim):
recall-1 parity against the O(n²) brute force, and the cost invariant —
the prefix index must stay a small fraction of the full posting list."""

from __future__ import annotations

from pyspark.sql import functions as F

from m13_sparkstreaming_python_azure_spark.catalog import load_table
from m13_sparkstreaming_python_azure_spark.operators import setsim
from m13_sparkstreaming_python_azure_spark.operators.dedup import word_shingles


def _brute_force(spark, docs, threshold, measure):
    g = docs.select(
        "doc_id", F.explode(word_shingles("text", 3)).alias("gram")
    ).distinct()
    sizes = g.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = g.select(F.col("doc_id").alias("id_a"), "gram")
    b = g.select(F.col("doc_id").alias("id_b"), "gram")
    inter = (
        a.join(b, "gram")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("ni"))
        .join(sizes.select(F.col("doc_id").alias("id_a"), F.col("n").alias("na")), "id_a")
        .join(sizes.select(F.col("doc_id").alias("id_b"), F.col("n").alias("nb")), "id_b")
    )
    if measure == "jaccard":
        m = F.col("ni") / (F.col("na") + F.col("nb") - F.col("ni"))
    else:
        m = F.col("ni") / F.least("na", "nb")
    return {
        (r.id_a, r.id_b)
        for r in inter.withColumn("m", m).filter(F.col("m") >= threshold).collect()
    }


def test_ppjoin_matches_brute_force(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    got = {
        (r.id_a, r.id_b)
        for r in setsim.ppjoin_pairs(docs, "doc_id", threshold=0.3).collect()
    }
    want = _brute_force(spark, docs, 0.3, "jaccard")
    assert got == want and len(want) > 0


def test_containment_matches_brute_force(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    got = {
        (r.id_a, r.id_b)
        for r in setsim.containment_pairs(docs, "doc_id", threshold=0.6).collect()
    }
    want = _brute_force(spark, docs, 0.6, "containment")
    assert got == want and len(want) > 0


def test_containment_catches_subset_jaccard_misses(spark):
    """A short doc fully inside a long one: containment 1.0, Jaccard far
    below any useful threshold — the pair ppjoin(0.5) must NOT emit and
    containment(0.9) MUST."""
    short = "alpha beta gamma delta epsilon zeta eta theta"
    long = short + " " + " ".join(f"w{i} x{i} y{i}" for i in range(40))
    docs = spark.createDataFrame(
        [(1, short), (2, long)], "doc_id long, text string"
    )
    jac = setsim.ppjoin_pairs(docs, "doc_id", threshold=0.5).collect()
    assert jac == []
    cont = setsim.containment_pairs(docs, "doc_id", threshold=0.9).collect()
    assert [(r.id_a, r.id_b) for r in cont] == [(1, 2)]
    assert cont[0].containment == 1.0


def test_prefix_index_is_fraction_of_postings(spark, sf_dir):
    """The scale claim: at threshold t the indexed prefix holds at most
    ~(1-t) of each doc's shingles (+1), so the candidate join touches a
    strict subset of the full inverted index."""
    docs = load_table(spark, sf_dir, "documents")
    grams = setsim._distinct_shingles(docs, "doc_id", "text", 3)
    ranked = setsim._ranked_by_rarity(grams)
    t = 0.7
    prefix = ranked.filter(
        F.col("r") <= F.col("n_grams") - F.ceil(F.lit(t) * F.col("n_grams")) + 1
    )
    n_full, n_prefix = grams.count(), prefix.count()
    assert n_prefix <= 0.35 * n_full  # (1 - 0.7) + per-doc +1 slack
