"""Keyword retrieval over the document corpus: BM25 scoring.

The retrieval side of a training-data / RAG pipeline: given a bag of
query terms, rank documents by Okapi BM25. Complements the vector path
(operators/similarity.py) with the lexical path — production retrieval
stacks run both and fuse.

Scale shape (everything JVM-side, no Python):
- tokenize + explode happens AFTER a broadcast `array_contains` filter
  against the query terms, so only matching postings ever materialize —
  the corpus-sized explode is pruned to O(matching tokens).
- per-term document frequencies are a tiny aggregate (|query terms|
  rows) broadcast back; N and avgdl are single-row scalar aggregates
  broadcast the same way (the `crossJoin(broadcast(scalar))` idiom used
  throughout queries/tpch_ext.py).
- the final score is one groupBy(doc) sum — a single data-sized shuffle
  of only the matching (doc, term) rows.

Determinism: scores involve ln(); the returned score snaps to a 1e-4
grid via floor(x*1e4 + 0.5) (verify gotcha — libm ln differs in the
last ulp across engines), which the DuckDB oracle mirrors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from m13_sparkstreaming_python_azure_spark.operators.text import tokens


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """(id, bm25) for every document matching ≥1 query term, using the
    Lucene-style smoothed idf ``ln(1 + (N - df + 0.5)/(df + 0.5))`` —
    always positive, so a match never subtracts.

    ``query_terms`` is a driver-side constant (a user query is small by
    definition); it ships as a broadcast literal array, never a shuffle.
    """
    toks = docs.select(
        F.col(id_col),
        F.size(tokens(text_col)).alias("__dl"),
        F.explode(tokens(text_col)).alias("__term"),
    ).filter(
        F.col("__term").isin([t.lower() for t in query_terms])
    )
    tf = toks.groupBy(id_col, "__dl", "__term").agg(
        F.count(F.lit(1)).alias("__tf")
    )

    stats = docs.select(
        F.count(F.lit(1)).alias("__n_docs"),
        F.avg(F.size(tokens(text_col))).alias("__avgdl"),
    )
    df_t = tf.groupBy("__term").agg(
        F.count(F.lit(1)).alias("__df")
    )

    scored = (
        tf.join(F.broadcast(df_t), on="__term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "__idf",
            F.log(
                F.lit(1.0)
                + (F.col("__n_docs") - F.col("__df") + F.lit(0.5))
                / (F.col("__df") + F.lit(0.5))
            ),
        )
        .withColumn(
            "__contrib",
            F.col("__idf")
            * (F.col("__tf") * F.lit(k1 + 1.0))
            / (
                F.col("__tf")
                + F.lit(k1)
                * (
                    F.lit(1.0 - b)
                    + F.lit(b) * F.col("__dl") / F.col("__avgdl")
                )
            ),
        )
    )
    return scored.groupBy(id_col).agg(
        (
            F.floor(F.sum("__contrib") * F.lit(1e4) + F.lit(0.5)) / F.lit(1e4)
        ).alias("bm25")
    )
