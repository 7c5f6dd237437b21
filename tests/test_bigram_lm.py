"""Tests for the interpolated bigram LM (operators/lm.train_bigram_model
/ bigram_logppl)."""

from __future__ import annotations

import math

from m13_sparkstreaming_python_azure_spark.operators.lm import (
    bigram_logppl,
    train_bigram_model,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_counts(spark):
    df = _docs(spark, [(1, "a b a b"), (2, "a b")])
    uni, bi = train_bigram_model(df, "text")
    u = {r["term"]: r["n"] for r in uni.collect()}
    b = {(r["t1"], r["t2"]): r["n12"] for r in bi.collect()}
    assert u == {"a": 3, "b": 3}
    assert b == {("a", "b"): 3, ("b", "a"): 1}


def test_logppl_manual(spark):
    df = _docs(spark, [(1, "a b"), (2, "b b")])
    uni, bi = train_bigram_model(df, "text")
    out = {
        r["doc_id"]: (r["n_transitions"], r["logppl"])
        for r in bigram_logppl(df, uni, bi).collect()
    }
    # counts: a:1, b:3, N=4, V=2; bigrams: (a,b):1, (b,b):1
    def p(n12, n1, n2):
        return 0.7 * (n12 / n1) + 0.3 * ((n2 + 1.0) / (4 + 2 + 1.0))

    lp_ab = math.log(p(1, 1, 3))
    lp_bb = math.log(p(1, 3, 3))
    assert out[1][0] == 1 and abs(out[1][1] + lp_ab) < 1e-8
    assert out[2][0] == 1 and abs(out[2][1] + lp_bb) < 1e-8


def test_predictable_text_scores_lower(spark):
    rows = [(1, "x y " * 20), (2, "q w e r t z u i o p a s d f g h")]
    df = _docs(spark, rows)
    uni, bi = train_bigram_model(df, "text")
    out = {
        r["doc_id"]: r["logppl"] for r in bigram_logppl(df, uni, bi).collect()
    }
    assert out[1] < out[2]  # repetitive bigrams are highly predictable


def test_short_docs_excluded(spark):
    df = _docs(spark, [(1, "solo"), (2, "two words")])
    uni, bi = train_bigram_model(df, "text")
    out = bigram_logppl(df, uni, bi).collect()
    assert {r["doc_id"] for r in out} == {2}
