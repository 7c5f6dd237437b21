"""Exactly-once streaming corpus dedup (operators/dedup
.incremental_dedup_sink): in-batch and cross-batch dedup, replay
idempotence, and the crash-window ordering contract."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from m13_sparkstreaming_python_azure_spark.operators.dedup import (
    incremental_dedup_sink,
    text_fingerprint,
)
from m13_sparkstreaming_python_azure_spark.sources.snapshots import (
    history,
    read_manifest,
    read_snapshot,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _dirs():
    root = tempfile.mkdtemp(prefix="incdedup-t-")
    return os.path.join(root, "corpus"), os.path.join(root, "fps")


def test_in_batch_and_cross_batch_dedup(spark):
    corpus, fps = _dirs()
    sink = incremental_dedup_sink(corpus, fps)
    # batch 0: doc 5 and doc 9 share text — min doc_id wins in-batch
    sink(_docs(spark, [(5, "aaa"), (9, "aaa"), (7, "bbb")]), 0)
    # batch 1: doc 11 repeats "bbb" (cross-batch dup), doc 12 is fresh
    sink(_docs(spark, [(11, "bbb"), (12, "ccc")]), 1)
    got = {
        (r["doc_id"], r["text"])
        for r in read_snapshot(spark, corpus).collect()
    }
    assert got == {(5, "aaa"), (7, "bbb"), (12, "ccc")}


def test_replay_is_idempotent(spark):
    corpus, fps = _dirs()
    sink = incremental_dedup_sink(corpus, fps)
    sink(_docs(spark, [(1, "x")]), 0)
    sink(_docs(spark, [(2, "y")]), 1)
    v = read_manifest(corpus)["version"]
    sink(_docs(spark, [(2, "y")]), 1)  # crash replay of batch 1
    assert read_manifest(corpus)["version"] == v
    assert read_snapshot(spark, corpus).count() == 2


def test_crash_between_corpus_and_fp_commit_converges(spark):
    """Corpus committed, fingerprints not (the crash window the ordering
    contract allows): the replay must skip the corpus append but land
    the fingerprints, and later batches must still dedup against them."""
    corpus, fps = _dirs()
    sink = incremental_dedup_sink(corpus, fps)
    sink(_docs(spark, [(1, "x")]), 0)

    # simulate the crash: run batch 1 with a sink whose fp table is a
    # THROWAWAY dir, so only the corpus advances
    scratch_fps = tempfile.mkdtemp(prefix="lost-fps-")
    incremental_dedup_sink(corpus, os.path.join(scratch_fps, "f"))(
        _docs(spark, [(2, "y")]), 1
    )
    assert read_manifest(corpus)["batch_id"] == 1
    # fp table for "y" was never committed
    fp_y = None

    # replay of batch 1 through the REAL sink: corpus skip, fp commit
    sink(_docs(spark, [(2, "y")]), 1)
    assert read_snapshot(spark, corpus).count() == 2  # no double append
    # batch 2 re-sends "y": must dedup against the recovered fp table
    sink(_docs(spark, [(3, "y"), (4, "z")]), 2)
    got = {r["doc_id"] for r in read_snapshot(spark, corpus).collect()}
    assert got == {1, 2, 4}
    assert fp_y is None  # (explicitness: nothing read from the lost dir)


def test_fingerprint_engine_independence(spark):
    df = _docs(spark, [(1, "hello world")]).select(
        text_fingerprint("text").alias("fp")
    )
    import duckdb

    want = duckdb.connect().execute(
        "SELECT ('0x' || substring(md5('hello world'), 1, 15))::BIGINT"
    ).fetchone()[0]
    assert df.collect()[0]["fp"] == want


def test_corpus_history_tracks_batches(spark):
    corpus, fps = _dirs()
    sink = incremental_dedup_sink(corpus, fps)
    for i, t in enumerate(["a", "b", "c"]):
        sink(_docs(spark, [(i, t)]), i)
    hist = history(corpus)
    assert [h["batch_id"] for h in hist] == [0, 1, 2]


def test_keyed_append_sink_accumulates_without_reading(spark):
    """keyed_append_sink (postings-index write path): rows ACCUMULATE per
    key across batches (no merge), probes prune to touched buckets, and
    replays are no-ops."""
    from m13_sparkstreaming_python_azure_spark.sources.snapshots import (
        keyed_append_sink,
        read_keyed_buckets,
    )

    root = tempfile.mkdtemp(prefix="kas-")
    table = os.path.join(root, "idx")
    sink = keyed_append_sink(table, keys=["k"], n_buckets=4)
    rows = lambda data: spark.createDataFrame(data, "k string, v long")  # noqa: E731
    sink(rows([("a", 1), ("b", 2)]), 0)
    sink(rows([("a", 3), ("c", 4)]), 1)  # same key "a" again — must ADD
    sink(rows([("a", 99)]), 1)  # replay — no-op
    m = read_manifest(table)
    assert m["rows"] == 4 and m["mode"] == "append"
    all_buckets = read_keyed_buckets(spark, table, list(range(4)))
    got = sorted((r["k"], r["v"]) for r in all_buckets.collect())
    assert got == [("a", 1), ("a", 3), ("b", 2), ("c", 4)]
    # bucket pruning: reading only key "a"'s bucket sees both its rows
    bucket_a = spark.createDataFrame([("a",)], "k string").select(
        F.pmod(F.xxhash64("k"), F.lit(4)).cast("int").alias("b")
    ).collect()[0]["b"]
    pruned = read_keyed_buckets(spark, table, [bucket_a])
    assert {r["v"] for r in pruned.filter(F.col("k") == "a").collect()} == {1, 3}


def test_streaming_minhash_dedup_sink_near_dups_and_replay(spark):
    """Near-dup streaming dedup: a doc arriving in a later batch that is
    a near-duplicate (not exact) of an earlier survivor is dropped; a
    non-duplicate survives; batch replay is idempotent; and a near-dup
    of a DROPPED doc is still dropped (pair-rule: every doc's signature
    enters the index, survivor or not)."""
    from m13_sparkstreaming_python_azure_spark.operators.dedup import (
        streaming_minhash_dedup_sink,
    )

    root = tempfile.mkdtemp(prefix="mhd-t-")
    corpus, bands, shingles = (
        os.path.join(root, d) for d in ("corpus", "bands", "shingles")
    )
    sink = streaming_minhash_dedup_sink(corpus, bands, shingles, threshold=0.5)
    base = "the quick brown fox jumps over the lazy dog again and again"
    near = base + " today"          # high-Jaccard variant of base
    near2 = base + " today ok"      # near-dup of BOTH base and near
    other = "completely different content about spark structured streaming engines"
    sink(_docs(spark, [(1, base), (2, other)]), 0)
    sink(_docs(spark, [(3, near), (4, "unrelated fresh text that stands alone entirely")]), 1)
    sink(_docs(spark, [(3, near), (4, "unrelated fresh text that stands alone entirely")]), 1)  # replay
    sink(_docs(spark, [(5, near2)]), 2)  # near-dup of dropped doc 3 + of doc 1
    got = sorted(r["doc_id"] for r in read_snapshot(spark, corpus).collect())
    assert got == [1, 2, 4]


def test_rebucket_compaction_mid_stream_keeps_dedup_exact(spark):
    """VERDICT r11 #1: rebucketing compaction (hash-index resize) is the
    maintenance invariant that keeps streaming probes O(batch) as
    history grows. Resizing BOTH index tables between batches must not
    change any outcome: sinks and probes read the live bucket count
    from the manifest, so a near-dup of a pre-resize survivor is still
    caught after the resize."""
    from m13_sparkstreaming_python_azure_spark.operators.dedup import (
        streaming_minhash_dedup_sink,
    )
    from m13_sparkstreaming_python_azure_spark.sources.snapshots import (
        compact_keyed_snapshot,
        read_manifest,
    )

    root = tempfile.mkdtemp(prefix="mhd-rb-")
    corpus, bands, shingles = (
        os.path.join(root, d) for d in ("corpus", "bands", "shingles")
    )
    sink = streaming_minhash_dedup_sink(corpus, bands, shingles, threshold=0.5)
    base = "the quick brown fox jumps over the lazy dog again and again"
    other = "completely different content about spark structured streaming engines"
    sink(_docs(spark, [(1, base), (2, other)]), 0)
    compact_keyed_snapshot(spark, bands, n_buckets=64)
    compact_keyed_snapshot(spark, shingles, n_buckets=64)
    assert read_manifest(bands)["n_buckets"] == 64
    # near-dup of doc 1 must be caught through the RESIZED index; the
    # fresh doc must survive and its index rows land in the new layout
    sink(_docs(spark, [(3, base + " today"), (4, "fresh standalone text entirely new")]), 1)
    sink(_docs(spark, [(5, base + " today ok")]), 2)  # near-dup of dropped 3
    got = sorted(r["doc_id"] for r in read_snapshot(spark, corpus).collect())
    assert got == [1, 2, 4]
    # post-resize appends committed under the live bucket count
    assert read_manifest(bands)["n_buckets"] == 64


def test_fp_append_mode_rebucket_and_exactness(spark):
    """The fingerprint table is append-only (O(batch) writes) — resizing
    it mid-stream must keep exact dedup exact, and replay must stay
    idempotent under the new layout."""
    from m13_sparkstreaming_python_azure_spark.sources.snapshots import (
        compact_keyed_snapshot,
        read_manifest,
    )

    corpus, fps = _dirs()
    sink = incremental_dedup_sink(corpus, fps)
    sink(_docs(spark, [(1, "aaa"), (2, "bbb")]), 0)
    compact_keyed_snapshot(spark, fps, n_buckets=64)
    sink(_docs(spark, [(3, "aaa"), (4, "ccc")]), 1)  # 3 dups pre-resize doc
    sink(_docs(spark, [(3, "aaa"), (4, "ccc")]), 1)  # replay
    sink(_docs(spark, [(5, "ccc"), (6, "ddd")]), 2)  # 5 dups post-resize doc
    got = sorted(r["doc_id"] for r in read_snapshot(spark, corpus).collect())
    assert got == [1, 2, 4, 6]
    m = read_manifest(fps)
    assert m["n_buckets"] == 64 and m["mode"] == "append"


def test_all_duplicate_batch_does_not_grow_the_delta(spark):
    """Review r12: Spark writes one EMPTY part file for an empty
    DataFrame, so 'no files written' cannot detect an empty batch — the
    sink counts footers. A steady-state all-duplicate batch must leave
    the fingerprint table's manifest delta UNTOUCHED (no empty files
    every later probe would open) and keep its batch_id unadvanced."""
    from m13_sparkstreaming_python_azure_spark.sources.snapshots import (
        read_manifest,
    )

    corpus, fps = _dirs()
    sink = incremental_dedup_sink(corpus, fps)
    sink(_docs(spark, [(1, "aaa"), (2, "bbb")]), 0)
    m0 = read_manifest(fps)
    sink(_docs(spark, [(3, "aaa"), (4, "bbb")]), 1)  # nothing fresh
    m1 = read_manifest(fps)
    assert m1["version"] == m0["version"], "all-dup batch committed fps"
    assert m1.get("delta") == m0.get("delta")
    assert m1.get("batch_id") == m0.get("batch_id")
    # and the batch is still replay-safe + later fresh content lands
    sink(_docs(spark, [(3, "aaa"), (4, "bbb")]), 1)  # replay of the no-op
    sink(_docs(spark, [(5, "ccc")]), 2)
    got = sorted(r["doc_id"] for r in read_snapshot(spark, corpus).collect())
    assert got == [1, 2, 5]
