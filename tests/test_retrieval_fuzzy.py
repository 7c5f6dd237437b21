"""BM25 retrieval and fuzzy-join properties.

The gate hash-checks bm25_search / fuzzy_name_pairs against DuckDB on
the fixtures; these tests cover what those fixtures can't: insertion/
deletion pairs (customer names only exercise substitution), the
max_dist=2 blocking depth, and BM25's ranking semantics.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from m13_sparkstreaming_python_azure_spark.operators.fuzzy import fuzzy_pairs
from m13_sparkstreaming_python_azure_spark.operators.retrieval import (
    bm25_scores,
)


def _pairs(out):
    return {(r["key_a"], r["key_b"], r["edit_distance"]) for r in out.collect()}


def test_fuzzy_pairs_covers_all_edit_kinds(spark):
    # substitution, deletion, insertion, and a far-away control
    words = ["kitten", "sitten", "kittn", "kittens", "banana"]
    df = spark.createDataFrame([(w,) for w in words], ["w"])
    got = _pairs(fuzzy_pairs(df, "w", max_dist=1))
    want = {
        ("kitten", "sitten", 1),  # substitution
        ("kitten", "kittn", 1),  # deletion
        ("kitten", "kittens", 1),  # insertion
        ("kittn", "kittens", 2),  # not within 1 — must be absent
    }
    assert ("kitten", "sitten", 1) in got
    assert ("kitten", "kittn", 1) in got
    assert ("kitten", "kittens", 1) in got
    assert all(p[2] <= 1 for p in got)
    assert not any({"banana"} & {p[0], p[1]} for p in got)


def test_fuzzy_pairs_matches_bruteforce_d2(spark):
    words = [
        "spark", "spork", "sprk", "sparkle", "spars", "stark",
        "quartz", "quart", "qurt", "alpha",
    ]
    df = spark.createDataFrame([(w,) for w in words], ["w"])
    got = _pairs(fuzzy_pairs(df, "w", max_dist=2))
    # brute force via Spark's own levenshtein on the cross join
    a = df.select(F.col("w").alias("x"))
    b = df.select(F.col("w").alias("y"))
    brute = {
        (r["x"], r["y"], r["d"])
        for r in a.crossJoin(b)
        .filter(F.col("x") < F.col("y"))
        .withColumn("d", F.levenshtein("x", "y"))
        .filter(F.col("d") <= 2)
        .collect()
    }
    assert got == brute


def test_fuzzy_pairs_vectorized_hash_edge_cases(spark):
    """r13: variant hashes come from the numpy rolling-hash pass (no
    variant strings built). Edge cases that stress it: multi-byte
    unicode (code-point vs byte indexing), 1-char and empty-adjacent
    strings, embedded NUL, null keys, and block columns — results must
    equal the brute-force levenshtein join within each block."""
    rows = [
        ("héllo", 1), ("hèllo", 1), ("héllo", 2), ("hللo", 1),
        ("a", 1), ("b", 1), ("ab", 1), ("", 1), ("a\x00", 1),
        ("世界abc", 1), ("世界abd", 1), ("世界ab", 2), (None, 1),
    ]
    df = spark.createDataFrame(rows, "w string, blk int").distinct()
    got = {
        (r["key_a"], r["key_b"], r["blk"], r["edit_distance"])
        for r in fuzzy_pairs(
            df, "w", max_dist=2, block_cols=["blk"]
        ).collect()
    }
    a = df.select(F.col("w").alias("x"), F.col("blk").alias("ba"))
    b = df.select(F.col("w").alias("y"), F.col("blk").alias("bb"))
    want = {
        (r["x"], r["y"], r["ba"], r["d"])
        for r in a.join(b, (F.col("x") < F.col("y")) & (F.col("ba") == F.col("bb")))
        .withColumn("d", F.levenshtein("x", "y"))
        .filter(F.col("d") <= 2)
        .collect()
    }
    assert got == want


def test_fuzzy_pairs_rejects_bad_depth(spark):
    df = spark.createDataFrame([("a",)], ["w"])
    with pytest.raises(ValueError):
        fuzzy_pairs(df, "w", max_dist=3)


def test_bm25_ranking_semantics(spark):
    rows = [
        (1, "hash join hash join hash"),  # high tf for both terms
        (2, "hash table scan"),  # one term, once
        (3, "sort merge only"),  # no terms — must not appear
        (4, "hash " + "filler " * 50),  # same tf as 2 but much longer doc
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: r["bm25"]
        for r in bm25_scores(df, ["hash", "join"]).collect()
    }
    assert set(out) == {1, 2, 4}
    assert out[1] > out[2]  # more matching mass ranks higher
    assert out[2] > out[4]  # length normalization: same tf, longer doc loses
    assert all(v > 0 for v in out.values())  # smoothed idf never negative


def test_bm25_query_case_insensitive(spark):
    df = spark.createDataFrame([(1, "Hash JOIN")], ["doc_id", "text"])
    out = bm25_scores(df, ["HASH", "Join"]).collect()
    assert len(out) == 1 and out[0]["bm25"] > 0


def test_text_index_parity_and_pruning(spark, sf_dir, tmp_path):
    import os

    from m13_sparkstreaming_python_azure_spark.catalog import load_table
    from m13_sparkstreaming_python_azure_spark.operators.retrieval import (
        _term_bucket_py,
        build_text_index,
        query_text_index,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    idx = str(tmp_path / "text_index")
    build_text_index(docs, idx, n_buckets=16)

    terms = ["hash", "join", "stream"]
    live = {
        r["doc_id"]: r["bm25"] for r in bm25_scores(docs, terms).collect()
    }
    from_index = {
        r["doc_id"]: r["bm25"]
        for r in query_text_index(spark, idx, terms).collect()
    }
    # bit-identical scores: same operation order on both paths
    assert from_index == live

    # the scan must carry a partition filter on the probed buckets
    # (inputFiles() reports the pre-pruning relation, so read the plan)
    probed = {_term_bucket_py(t, 16) for t in terms}
    q = query_text_index(spark, idx, terms)
    plan = q._jdf.queryExecution().executedPlan().toString()
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "bucket" in m.group(1), plan
    listed = {int(x) for x in re.findall(r"\b(\d+)\b", m.group(1).split("IN")[-1])}
    assert probed <= listed
    n_dirs = len(
        [d for d in os.listdir(f"{idx}/postings") if d.startswith("bucket=")]
    )
    assert n_dirs > len(probed)  # pruning was non-vacuous


def test_fuzzy_pairs_equals_bruteforce_property(spark):
    """Property (hypothesis): on ANY small-alphabet word set (high
    collision pressure), symmetric-delete blocking + verify equals the
    brute-force levenshtein cross join, at both supported depths."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    words = st.lists(
        st.text(alphabet="abc", min_size=1, max_size=5),
        min_size=2,
        max_size=10,
        unique=True,
    )

    @settings(
        max_examples=5,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(ws=words, d=st.sampled_from([1, 2]))
    def run(ws, d):
        df = spark.createDataFrame([(w,) for w in ws], ["w"])
        got = _pairs(fuzzy_pairs(df, "w", max_dist=d))
        a = df.select(F.col("w").alias("x"))
        b = df.select(F.col("w").alias("y"))
        brute = {
            (r["x"], r["y"], r["d"])
            for r in a.crossJoin(b)
            .filter(F.col("x") < F.col("y"))
            .withColumn("d", F.levenshtein("x", "y"))
            .filter(F.col("d") <= d)
            .collect()
        }
        assert got == brute

    run()
