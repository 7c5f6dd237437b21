"""Statistical language-model scoring for corpus quality filtering.

The perplexity-filter stage of a pretraining pipeline (CCNet/KenLM
pattern): score every document by how "expected" its tokens are under a
language model trained on a reference corpus, then drop the tails —
high perplexity ≈ garbled/boilerplate/foreign text, suspiciously low ≈
templated or repeated text. The model here is an add-one-smoothed
UNIGRAM model — deliberately the simplest member of the n-gram family:
the Spark shape (one aggregate to train, one broadcast join to score)
is identical for higher orders (the model table keys on the n-gram
instead of the token), while unigram probabilities stay exactly
reproducible in ANSI SQL, which keeps the operator under the oracle
gate. A production deployment swaps the model table for KenLM scores
via mapInPandas; the pipeline shape does not change.

Scale shape: training is one token-count aggregate (|vocab| rows).
Scoring joins exploded tokens to the model — broadcast while the vocab
fits (natural-language vocabs do), shuffle-on-term beyond — then one
per-doc sum. OOV tokens take the smoothed unseen probability, so
scoring any corpus against any reference model is total.

Determinism: ln() is libm-dependent — per-token log-probs snap to a
1e-9 grid BEFORE the per-doc mean (the verify gotcha), and the mean
divides by the token count only after summing grid-snapped values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from m13_sparkstreaming_python_azure_spark.operators.text import tokens


def train_unigram_model(
    corpus: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(term, n) token counts over the reference corpus — the model
    table. Keep it as a DataFrame (not a driver dict): it broadcasts
    into the scoring join and can be persisted/reused like any table."""
    return (
        corpus.select(F.explode(tokens(text_col)).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def unigram_logppl(
    docs: DataFrame,
    model: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_tokens, logppl) per document: mean negative log-probability
    of its tokens under the add-one-smoothed unigram model —
    log-perplexity, lower = more expected text. Empty documents are
    excluded (perplexity is undefined on zero tokens).

    p(t) = (n_t + 1) / (N + V + 1): V observed types plus one shared
    unseen type, so out-of-vocabulary tokens score ln((N+V+1)/1) rather
    than crashing the join (left join + coalesce)."""
    stats = model.agg(
        F.sum("n").alias("__N"), F.count(F.lit(1)).alias("__V")
    )
    toks = docs.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("term")
    )
    scored = (
        toks.join(F.broadcast(model), on="term", how="left")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "__logp",
            F.log(
                (F.coalesce(F.col("n"), F.lit(0)) + F.lit(1.0))
                / (F.col("__N") + F.col("__V") + F.lit(1.0))
            ),
        )
        # snap each token's log-prob to a 1e-9 grid pre-sum: libm ln
        # differs in the last ulp across engines, and the per-doc SUM
        # would amplify that past any post-hoc rounding
        .withColumn(
            "__logp",
            F.floor(F.col("__logp") * F.lit(1e9) + F.lit(0.5)) / F.lit(1e9),
        )
    )
    # sum as exact decimal (grid-snapped doubles still fold-order-drift
    # when summed as doubles — same trick as operators/graph.pagerank),
    # then one double division for the mean
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        (
            -F.sum(F.col("__logp").cast("decimal(27,12)")).cast("double")
            / F.count(F.lit(1))
        ).alias("logppl"),
    )


def perplexity_filter(
    docs: DataFrame,
    model: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_logppl: float | None = None,
    min_logppl: float | None = None,
) -> DataFrame:
    """Documents whose log-perplexity lies inside the keep band — the
    actual filter stage (both tails are suspect; pass only the bound you
    want). Returns the input columns plus ``logppl``."""
    scores = unigram_logppl(docs, model, id_col, text_col).select(
        id_col, "logppl"
    )
    out = docs.join(scores, on=id_col)
    if max_logppl is not None:
        out = out.filter(F.col("logppl") <= max_logppl)
    if min_logppl is not None:
        out = out.filter(F.col("logppl") >= min_logppl)
    return out
