"""Tests for cross-document repeated-span detection (operators/spans)."""

from __future__ import annotations

from m13_sparkstreaming_python_azure_spark.operators.spans import (
    positional_shingles,
    repeated_spans,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_identical_docs_full_span(spark):
    text = " ".join(f"w{i}" for i in range(30))
    df = _df(spark, [(1, text), (2, text)])
    out = repeated_spans(df, "doc_id", n=4, min_span=10).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["id_a"], r["id_b"]) == (1, 2)
    assert r["span_len"] == 30
    assert (r["a_start"], r["b_start"]) == (0, 0)


def test_known_offset_span(spark):
    # doc 2 = tokens 10..24 of doc 1 (15 tokens), plus unrelated tail
    toks = [f"t{i}" for i in range(40)]
    shared = toks[10:25]
    df = _df(
        spark,
        [
            (1, " ".join(toks)),
            (2, " ".join(shared + [f"x{i}" for i in range(10)])),
        ],
    )
    out = repeated_spans(df, "doc_id", n=4, min_span=10).collect()
    assert len(out) == 1
    r = out[0]
    assert r["span_len"] == 15
    assert (r["a_start"], r["b_start"]) == (10, 0)


def test_no_overlap_empty(spark):
    df = _df(
        spark,
        [
            (1, " ".join(f"a{i}" for i in range(20))),
            (2, " ".join(f"b{i}" for i in range(20))),
        ],
    )
    assert repeated_spans(df, "doc_id", n=4, min_span=4).count() == 0


def test_longest_of_multiple_spans_wins(spark):
    # two shared runs: a 6-token one and a 12-token one, separated by noise
    run1 = [f"p{i}" for i in range(6)]
    run2 = [f"q{i}" for i in range(12)]
    doc1 = run1 + ["n1", "n2", "n3"] + run2
    doc2 = run2 + ["m1", "m2", "m3", "m4"] + run1
    df = _df(spark, [(1, " ".join(doc1)), (2, " ".join(doc2))])
    out = repeated_spans(df, "doc_id", n=3, min_span=5).collect()
    assert len(out) == 1
    r = out[0]
    assert r["span_len"] == 12
    assert (r["a_start"], r["b_start"]) == (9, 0)


def test_short_docs_emit_no_shingles(spark):
    df = _df(spark, [(1, "only three tokens"), (2, "only three tokens")])
    assert positional_shingles(df, "doc_id", n=8).count() == 0
    assert repeated_spans(df, "doc_id", n=8, min_span=2).count() == 0


def test_positional_shingles_positions(spark):
    df = _df(spark, [(1, "a b c d e")])
    got = sorted(
        (r["pos"], r["gram"])
        for r in positional_shingles(df, "doc_id", n=3).collect()
    )
    assert got == [(0, "a b c"), (1, "b c d"), (2, "c d e")]
