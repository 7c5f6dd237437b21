"""Counts-based text classifiers — multinomial naive Bayes over the
engine's whitespace tokenizer.

A quality/domain classifier is a standard stage in large-scale training-
data curation (cf. CCNet's fastText LM filtering, GPT-3's WebText-vs-
CommonCrawl logistic filter); naive Bayes is the counts-only member of
that family, so both train and score are pure DataFrame aggregations —
no Python in the hot path, every shuffle keyed on token or (doc, label).

Reproducibility: per-token log-likelihood terms are snapped to a BIGINT
grid (``floor(ln(x)·G + 0.5)``) BEFORE summation, so scores are exact
integer sums — fold-order independent and hash-comparable across engines
(the repo-wide oracle-gate float rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from m13_sparkstreaming_python_azure_spark.operators.text import tokens

_GRID = 1_000_000


def nb_classify(
    train_docs: DataFrame,
    score_docs: DataFrame,
    label_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Train multinomial NB (add-1 smoothing over the training vocabulary)
    on ``train_docs`` and return the argmax class per ``score_docs`` row:
    ``(id_col, pred_<label_col>, score)`` where score is the integer-grid
    log-posterior.

    Semantics: ``p(c|d) ∝ ln p(c) + Σ_t ln((c(t,c)+1)/(tot_c+V))`` summed
    over the doc's tokens WITH multiplicity; tokens outside the training
    vocabulary are ignored (they shift every class equally only under
    equal smoothing denominators, so dropping them is the standard
    out-of-vocabulary choice and keeps the score a pure vocab join). Ties
    break to the lexicographically smallest class.

    Scale shape: token-keyed shuffles to build the (token × class) term
    table, one broadcastable term join for scoring (vocab × |classes|
    rows), one (doc, class) aggregation. No per-row Python, no driver
    loop; the only collect is the bounded class list."""
    t_tok = train_docs.select(
        F.col(label_col).alias("__label"),
        F.explode(tokens(text_col)).alias("token"),
    )
    cct = t_tok.groupBy("__label", "token").agg(
        F.count(F.lit(1)).alias("c")
    )
    totc = t_tok.groupBy("__label").agg(F.count(F.lit(1)).alias("tot"))
    vocab = t_tok.select("token").distinct()
    v_size = vocab.count()
    prior = train_docs.groupBy(F.col(label_col).alias("__label")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    n_total = train_docs.count()
    labels = sorted(r["__label"] for r in prior.select("__label").collect())

    # (token × class) smoothed log-term grid — exact-int argument, one ln
    term = (
        vocab.crossJoin(F.broadcast(totc))
        .join(cct, ["__label", "token"], "left")
        .select(
            "__label",
            "token",
            F.floor(
                F.log(
                    (F.coalesce(F.col("c"), F.lit(0)) + F.lit(1))
                    / (F.col("tot") + F.lit(v_size))
                )
                * _GRID
                + F.lit(0.5)
            )
            .cast("long")
            .alias("g_term"),
        )
    )
    prior_g = prior.select(
        "__label",
        F.floor(F.log(F.col("n_docs") / F.lit(n_total)) * _GRID + F.lit(0.5))
        .cast("long")
        .alias("g_prior"),
    )

    s_tok = score_docs.select(
        id_col, F.explode(tokens(text_col)).alias("token")
    )
    tok_scores = (
        s_tok.join(term, "token")
        .groupBy(id_col, "__label")
        .agg(F.sum("g_term").alias("g_tokens"))
    )
    # every (doc, class) pair exists even for all-OOV docs: prior-only
    all_pairs = score_docs.select(
        id_col,
        F.explode(F.array(*[F.lit(x) for x in labels])).alias("__label"),
    )
    scored = (
        all_pairs.join(tok_scores, [id_col, "__label"], "left")
        .join(F.broadcast(prior_g), "__label")
        .select(
            id_col,
            "__label",
            (
                F.coalesce(F.col("g_tokens"), F.lit(0)) + F.col("g_prior")
            ).alias("score"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("__label").asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            id_col,
            F.col("__label").alias(f"pred_{label_col}"),
            "score",
        )
    )


def weighted_majority_vote(
    votes: DataFrame,
    item_col: str = "item_id",
    worker_col: str = "worker_id",
    label_col: str = "label",
) -> DataFrame:
    """Two-round weak-supervision label model (one Dawid-Skene EM step,
    counts-only): round 1 takes the plain per-item majority (ties → the
    lexicographically smallest label), round 2 scores each worker by how
    many of their votes agreed with the round-1 consensus (an exact
    integer weight) and re-votes with workers weighted by that agreement
    count. Returns ``(item_col, consensus, weight)`` where weight is the
    winning label's total integer worker-weight.

    All arithmetic is integer counts — bit-equal across engines. Scale:
    two (item, label) aggregations + one worker aggregation, every
    shuffle keyed on item or worker; worker weights broadcast."""
    v = votes.select(
        F.col(item_col).alias("item"),
        F.col(worker_col).alias("worker"),
        F.col(label_col).alias("vote"),
    )
    w1 = Window.partitionBy("item").orderBy(
        F.col("n").desc(), F.col("vote").asc()
    )
    round1 = (
        v.groupBy("item", "vote")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("__rn", F.row_number().over(w1))
        .filter(F.col("__rn") == 1)
        .select("item", F.col("vote").alias("consensus1"))
    )
    acc = (
        v.join(round1, "item")
        .groupBy("worker")
        .agg(
            F.sum(
                F.when(F.col("vote") == F.col("consensus1"), 1).otherwise(0)
            ).alias("weight")
        )
    )
    w2 = Window.partitionBy("item").orderBy(
        F.col("w").desc(), F.col("vote").asc()
    )
    return (
        v.join(F.broadcast(acc), "worker")
        .groupBy("item", "vote")
        .agg(F.sum("weight").alias("w"))
        .withColumn("__rn", F.row_number().over(w2))
        .filter(F.col("__rn") == 1)
        .select(
            F.col("item").alias(item_col),
            F.col("vote").alias("consensus"),
            F.col("w").alias("weight"),
        )
    )
