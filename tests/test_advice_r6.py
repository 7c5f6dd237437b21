"""Regression tests for the round-6 ADVICE findings.

1. append_snapshot on a hive-partitioned table must raise (flat files into
   data/ would be invisible to partition-pruned reads and break basePath).
2. binary_quantize_words: >64-dim vectors raise instead of dropping bits;
   <=32-dim vectors get w1 = 0, never NULL (a NULL hamming sorts FIRST and
   promotes bogus rerank candidates).
3. hits() raises a clear ValueError on an edgeless/zero-mass graph instead
   of TypeError on int(None).
4. ngram_novelty / bm25_prf_search release their pinned intermediates —
   no cached-block accumulation across repeated calls.
"""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from m13_sparkstreaming_python_azure_spark.operators.graph import hits
from m13_sparkstreaming_python_azure_spark.operators.retrieval import (
    bm25_prf_search,
)
from m13_sparkstreaming_python_azure_spark.operators.similarity import (
    binary_quantize_words,
)
from m13_sparkstreaming_python_azure_spark.operators.text import ngram_novelty
from m13_sparkstreaming_python_azure_spark.operators.util import (
    release_local_checkpoint,
)
from m13_sparkstreaming_python_azure_spark.sources.snapshots import (
    append_snapshot,
    read_snapshot_partitions,
    write_snapshot_partitioned,
)


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox naps under the old oak"),
            (3, "completely different tokens appear in this row"),
        ],
        "doc_id long, text string",
    )


def test_append_snapshot_guards_partitioned_layout(spark, tmp_path):
    table = str(tmp_path / "t")
    df = spark.range(0, 30).select(
        "id", (F.col("id") % 3).cast("string").alias("bucket")
    )
    write_snapshot_partitioned(df, table, "bucket")
    with pytest.raises(ValueError, match="append_snapshot_partitioned"):
        append_snapshot(spark.range(100, 105).select(
            "id", F.lit("0").alias("bucket")
        ), table)
    # the failed append must not have corrupted the pruned read
    got = read_snapshot_partitions(spark, table, ["0"])
    assert sorted(r["id"] for r in got.collect()) == [
        i for i in range(30) if i % 3 == 0
    ]


def test_binary_quantize_rejects_wide_vectors(spark):
    wide = spark.createDataFrame(
        [(1, [float(i) for i in range(80)])],
        "vec_id long, embedding array<double>",
    )
    from py4j.protocol import Py4JJavaError

    with pytest.raises(Exception) as exc:
        binary_quantize_words(wide).collect()
    assert "64 dims" in str(exc.value)


def test_binary_quantize_short_vectors_never_null(spark):
    short = spark.createDataFrame(
        [(1, [1.0, -2.0, 3.0]), (2, [-1.0] * 20)],
        "vec_id long, embedding array<double>",
    )
    rows = {r["vec_id"]: r for r in binary_quantize_words(short).collect()}
    # dims <= 32 leave no word-1 rows: w1 must coalesce to 0, not NULL
    assert rows[1]["w1"] == 0 and rows[2]["w1"] == 0
    assert rows[1]["w0"] == 0b101  # bits 0 and 2 set (v >= 0)
    assert rows[2]["w0"] == 0


def test_hits_raises_on_zero_mass(spark):
    empty = spark.createDataFrame([], "src long, dst long")
    with pytest.raises(ValueError, match="HITS is undefined"):
        hits(empty)


def test_ngram_novelty_and_bm25_release_cached_blocks(spark):
    # Each operator returns an eagerly localCheckpoint'ed result whose
    # persisted RDD lives exactly as long as the DataFrame reference (the
    # ContextCleaner removes it after GC). Hold both results so the
    # expected registration count is deterministic: +1 per live result,
    # and nothing else — the heavyweight intermediates (grams, toks) must
    # have been unpersisted synchronously inside the operator. The old
    # `after <= before` form dropped the references and raced JVM GC.
    docs = _docs(spark)
    sc = spark.sparkContext
    before = sc._jsc.getPersistentRDDs().size()
    r1 = ngram_novelty(docs, n=2)
    r1.collect()
    r2 = bm25_prf_search(docs, ["quick", "fox"], top_n=3)
    r2.collect()
    after = sc._jsc.getPersistentRDDs().size()
    assert after <= before + 2, (
        f"persisted RDDs grew {before} -> {after} with only 2 live "
        f"checkpointed results: an operator leaked cached blocks"
    )
    # ADVICE r12: make the bound EXACT — releasing the two held results
    # must return the count to the baseline, so a future regression that
    # leaks up to two blocks per run can no longer hide inside the +2.
    # This doubles as the canary for release_local_checkpoint itself: if
    # a Spark upgrade breaks the internal handle, the release silently
    # degrades to GC-timed and this assertion catches it.
    release_local_checkpoint(r1)
    release_local_checkpoint(r2)
    released = sc._jsc.getPersistentRDDs().size()
    assert released <= before, (
        f"release_local_checkpoint did not drop the blocks "
        f"({before} -> {after} -> {released}): the internal RDD handle "
        "may have broken (releases now degrade to GC-timed)"
    )
