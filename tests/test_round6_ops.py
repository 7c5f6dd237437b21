"""Edge semantics for round-6 operators: NB classifier, majority vote,
HITS, info gain, novelty/OOV, CCF, PRF expansion — properties the oracle
gates don't isolate."""
from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from m13_sparkstreaming_python_azure_spark.operators.classify import (
    nb_classify,
    weighted_majority_vote,
)
from m13_sparkstreaming_python_azure_spark.operators.graph import hits
from m13_sparkstreaming_python_azure_spark.operators.retrieval import (
    bm25_prf_search,
    ql_dirichlet_scores,
)
from m13_sparkstreaming_python_azure_spark.operators.stats import info_gain
from m13_sparkstreaming_python_azure_spark.operators.text import (
    ngram_novelty,
    oov_rate,
)
from m13_sparkstreaming_python_azure_spark.operators.timeseries import (
    ccf_lags,
)


def test_nb_all_oov_doc_gets_prior_argmax(spark):
    train = spark.createDataFrame(
        [(1, "alpha beta beta", "A"), (2, "gamma delta", "B"),
         (3, "alpha alpha", "A")],
        "doc_id long, text string, source string",
    )
    held = spark.createDataFrame(
        [(10, "zzz qqq www")], "doc_id long, text string"
    )
    out = nb_classify(train, held, "source").collect()
    assert len(out) == 1
    # no vocab token matches -> prior-only; A has 2/3 prior > B 1/3
    assert out[0]["pred_source"] == "A"


def test_nb_token_evidence_beats_prior(spark):
    train = spark.createDataFrame(
        [(1, "alpha alpha alpha", "A"), (2, "alpha beta", "A"),
         (3, "gamma gamma gamma gamma", "B")],
        "doc_id long, text string, source string",
    )
    held = spark.createDataFrame(
        [(10, "gamma gamma gamma")], "doc_id long, text string"
    )
    out = nb_classify(train, held, "source").collect()[0]
    assert out["pred_source"] == "B"  # evidence overrides the 2:1 prior


def test_majority_vote_tiebreak_and_reweighting(spark):
    # item 1: 2-2 tie between 'a' and 'b' in round 1 -> 'a' (lex min).
    # worker w4 always disagrees with consensus -> low weight in round 2.
    votes = spark.createDataFrame(
        [
            (1, "w1", "a"), (1, "w2", "a"), (1, "w3", "b"), (1, "w4", "b"),
            (2, "w1", "x"), (2, "w2", "x"), (2, "w3", "x"), (2, "w4", "y"),
            (3, "w1", "m"), (3, "w2", "m"), (3, "w3", "m"), (3, "w4", "n"),
        ],
        "item_id long, worker_id string, label string",
    )
    out = {
        r["item_id"]: r
        for r in weighted_majority_vote(votes).collect()
    }
    assert out[1]["consensus"] == "a"
    assert out[2]["consensus"] == "x" and out[3]["consensus"] == "m"
    # w1/w2 agreed 3x, w3 2x, w4 0x -> item-1 weighted vote a:6 vs b:2
    assert out[1]["weight"] == 6


def test_hits_star_graph(spark):
    # star: many hubs point at one authority; authority concentrates
    edges = spark.createDataFrame(
        [("h1", "x"), ("h2", "x"), ("h3", "x"), ("h1", "y")],
        "src string, dst string",
    )
    out = {r["node"]: r for r in hits(edges, iterations=3).collect()}
    assert out["x"]["authority"] > out["y"]["authority"]
    # pure-source nodes have authority 0; pure-sink nodes have hub 0
    assert out["h1"]["authority"] == 0 and out["x"]["hub"] == 0
    # L1 normalization: authorities sum to ~G (integer floor slack)
    tot_a = sum(r["authority"] for r in out.values())
    assert 999_990 <= tot_a <= 1_000_000


def test_info_gain_constant_zero_and_perfect_feature(spark):
    df = spark.createDataFrame(
        [(i, "c", str(i % 2), i % 2) for i in range(40)],
        "id long, const string, perfect string, y long",
    ).select("id", "const", "perfect", F.col("y").cast("string").alias("y"))
    out = {
        r["feature"]: r["ig_scaled"]
        for r in info_gain(df, ["const", "perfect"], "y").collect()
    }
    assert out["const"] == 0
    # perfect feature: IG = H(Y) = ln 2 -> scaled = N * floor-ish ln2 grid
    expected = -40 * math.floor(math.log(0.5) * 1_000_000 + 0.5)
    assert out["perfect"] == expected


def test_ngram_novelty_shared_vs_unique(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e f g h i"), (2, "a b c d e f g h z"),
         (3, "p q r s t u v w x")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in ngram_novelty(docs, n=8).collect()}
    # doc1: grams 'a..h' (shared with doc2) + 'b..i' (unique) -> 1 of 2
    assert out[1]["n_grams"] == 2 and out[1]["n_novel"] == 1
    assert out[3]["n_novel"] == out[3]["n_grams"] == 2


def test_oov_rate_counts_multiplicity(spark):
    docs = spark.createDataFrame(
        [(1, "a a a b"), (2, "b b c c c")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r for r in oov_rate(docs, vocab_size=2).collect()
    }
    # counts: a=3, b=3, c=3 — all tie; token-asc tiebreak -> vocab {a, b}
    assert out[1]["n_tokens"] == 4 and out[1]["n_oov"] == 0
    assert out[2]["n_tokens"] == 5 and out[2]["n_oov"] == 3


def test_ccf_detects_shifted_series(spark):
    import pandas as pd

    base = [5, 9, 2, 14, 3, 8, 11, 1, 7, 13, 4, 10, 6, 12, 15, 2, 9, 5]
    a = spark.createDataFrame(
        pd.DataFrame({"day": range(18), "y": base})
    )
    # B leads A by 2 (B(t) = A(t+2)): za(t) pairs with zb(t-2) -> peak
    # at lag = +2 under the za(t)·zb(t-lag) convention
    b = spark.createDataFrame(
        pd.DataFrame({"day": range(18), "y": base[2:] + [3, 4]})
    )
    rows = {r["lag"]: r["ccf"] for r in ccf_lags(a, b, max_lag=4).collect()}
    best = max(rows, key=lambda k: rows[k])
    assert best == 2 and rows[2] > 0.8


def test_prf_expansion_excludes_query_terms_and_reranks(spark):
    docs = spark.createDataFrame(
        [
            (1, "hash join hash join widget widget widget"),
            (2, "hash join widget gadget"),
            (3, "widget widget gadget gadget"),
            (4, "unrelated words only here"),
        ],
        "doc_id long, text string",
    )
    out = bm25_prf_search(
        docs, ["hash"], k_fb=2, m_expand=1, top_n=4
    ).collect()
    ids = {r["doc_id"] for r in out}
    # expansion term must be 'widget'/'join' (from docs 1-2), never 'hash';
    # doc 3 (no query term, expansion-only) can now score
    assert 3 in ids and 4 not in ids


def test_ql_includes_background_for_missing_terms(spark):
    docs = spark.createDataFrame(
        [(1, "hash hash other"), (2, "join join other")],
        "doc_id long, text string",
    )
    out = ql_dirichlet_scores(docs, ["hash", "join"], top_n=10).collect()
    assert len(out) == 2  # both match >=1 term, both score BOTH terms
    assert all(r["score"] < 0 for r in out)
