"""Unigram LM perplexity scoring/filtering semantics (operators/lm.py).
The gate hash-checks scores against DuckDB; these tests pin the model's
ORDERING behavior — what the filter actually relies on."""

from __future__ import annotations

from pyspark.sql import functions as F

from m13_sparkstreaming_python_azure_spark.operators.lm import (
    perplexity_filter,
    train_unigram_model,
    unigram_logppl,
)


def _scores(spark, ref_texts, doc_rows):
    ref = spark.createDataFrame([(t,) for t in ref_texts], ["text"])
    docs = spark.createDataFrame(doc_rows, ["doc_id", "text"])
    model = train_unigram_model(ref)
    return {
        r["doc_id"]: (r["n_tokens"], r["logppl"])
        for r in unigram_logppl(docs, model).collect()
    }


def test_in_domain_beats_oov(spark):
    ref = ["the cat sat on the mat", "the dog sat on the rug"]
    got = _scores(
        spark,
        ref,
        [
            (1, "the cat sat"),  # all in-vocab, frequent tokens
            (2, "zyx qwv jkl"),  # all OOV
            (3, "the cat zyx"),  # mixed
        ],
    )
    assert got[1][1] < got[3][1] < got[2][1]
    # OOV-only docs still score (smoothed unseen mass, no crash/null)
    assert got[2][1] > 0


def test_frequent_tokens_score_lower(spark):
    # "the" dominates the reference → a the-only doc beats a rare-word doc
    ref = ["the the the the cat"]
    got = _scores(spark, ref, [(1, "the the"), (2, "cat cat")])
    assert got[1][1] < got[2][1]


def test_empty_docs_excluded_and_counts_right(spark):
    ref = ["a b c"]
    got = _scores(spark, ref, [(1, "a b"), (2, "   "), (3, "")])
    assert set(got) == {1}
    assert got[1][0] == 2


def test_perplexity_filter_band(spark):
    ref = spark.createDataFrame(
        [("the cat sat on the mat",), ("the dog sat on the rug",)], ["text"]
    )
    docs = spark.createDataFrame(
        [(1, "the cat sat"), (2, "zyx qwv jkl"), (3, "the dog sat")],
        ["doc_id", "text"],
    )
    model = train_unigram_model(ref)
    scores = {
        r["doc_id"]: r["logppl"]
        for r in unigram_logppl(docs, model).collect()
    }
    cut = (max(scores.values()) + min(scores.values())) / 2
    kept = perplexity_filter(docs, model, max_logppl=cut)
    assert {r["doc_id"] for r in kept.collect()} == {
        d for d, s in scores.items() if s <= cut
    }
    # keep band retains original columns plus the score
    assert set(kept.columns) == {"doc_id", "text", "logppl"}
    # min bound alone drops the low tail instead
    low_dropped = perplexity_filter(docs, model, min_logppl=cut)
    assert {r["doc_id"] for r in low_dropped.collect()} == {
        d for d, s in scores.items() if s >= cut
    }


def test_kn_perplexity_properties(spark, sf_dir):
    """KN invariants: per-transition probabilities form a proper mixture
    (logppl > 0 for any non-degenerate corpus), short docs are excluded,
    and a repeated-phrase doc scores LOWER perplexity than a unique-word
    doc under the same model (the continuation effect)."""
    from m13_sparkstreaming_python_azure_spark.operators.lm import (
        kn_bigram_logppl,
    )

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat the cat sat on the mat"),
            (2, "quantum turbines whisper beneath crimson observatories tonight"),
            (3, "hi"),  # single token: no transitions, excluded
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in kn_bigram_logppl(docs).collect()}
    assert set(rows) == {1, 2}
    assert rows[1]["kn_logppl"] > 0 and rows[2]["kn_logppl"] > 0
    assert rows[1]["kn_logppl"] < rows[2]["kn_logppl"]


def test_kn_heldout_unseen_pair_backs_off(spark):
    """Held-out scoring (model_docs != docs): a transition whose (v, w)
    pair never occurs in the model must NOT vanish — it scores c(vw)=0
    via the left-join fallthrough, landing on the continuation term
    alone, and counts toward n_trans."""
    from m13_sparkstreaming_python_azure_spark.operators.lm import (
        kn_bigram_logppl,
    )

    model = spark.createDataFrame(
        [
            (100, "the cat sat on the mat"),
            (101, "the dog sat on the rug"),
        ],
        "doc_id long, text string",
    )
    # "the rug" / "dog sat" exist; "cat ate"-style pair "mat the" absent;
    # every individual word (cat, mat, dog, rug...) occurs in the model
    held = spark.createDataFrame(
        [(1, "the dog sat on the mat"), (2, "the cat sat on the rug")],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in kn_bigram_logppl(held, model_docs=model).collect()
    }
    # all 5 transitions of each doc survive: vocab is covered, pairs
    # like (the, mat)/(the, rug) exist, (dog, sat) unseen pair in doc 1?
    # (dog, sat) IS in the model; (the, mat) is. Doc 2's (the, rug) is
    # in the model too -- force a truly unseen pair instead:
    assert rows[1]["n_trans"] == 5 and rows[2]["n_trans"] == 5

    held2 = spark.createDataFrame(
        [(3, "cat sat on the dog")], "doc_id long, text string"
    )  # (the, dog) seen; (cat, sat) seen; (on, the) seen; (sat, on) seen
    held3 = spark.createDataFrame(
        [(4, "cat rug")], "doc_id long, text string"
    )  # (cat, rug): "cat" is a model context, "rug" a model
    #    continuation, but the PAIR never occurs in the model
    r3 = kn_bigram_logppl(held2, model_docs=model).collect()[0]
    r4 = kn_bigram_logppl(held3, model_docs=model).collect()[0]
    assert r3["n_trans"] == 4
    # pre-fix an inner join dropped the doc entirely (zero transitions)
    assert r4["n_trans"] == 1 and r4["kn_logppl"] > 0
    # unseen pair scores strictly worse than the seen-pair average
    assert r4["kn_logppl"] > r3["kn_logppl"]
