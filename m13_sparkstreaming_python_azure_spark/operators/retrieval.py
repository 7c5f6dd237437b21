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


# ---------------------------------------------------------------------------
# Persisted inverted index — the at-scale path. bm25_scores() re-tokenizes
# the corpus per query; at 100 TB you tokenize ONCE into a postings table
# partitioned by a term-hash bucket, and each query reads only its terms'
# bucket directories (partition pruning at the file level, like the IVF
# cell index in operators/similarity.py). Query cost is then
# O(postings of the query terms), independent of corpus size.
# ---------------------------------------------------------------------------


def _term_bucket_py(term: str, n_buckets: int) -> int:
    """Driver-side twin of the bucket expression — md5-based so Python
    (hashlib) and the Spark plan agree on every term's bucket."""
    import hashlib

    return int(hashlib.md5(term.encode()).hexdigest()[:8], 16) % n_buckets


def _term_bucket_col(term: Column, n_buckets: int) -> Column:
    return (
        F.conv(F.substring(F.md5(term), 1, 8), 16, 10).cast("bigint")
        % n_buckets
    )


def build_text_index(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
) -> None:
    """Tokenize once: write a postings table (term, id, tf, dl) bucketed
    by ``bucket = md5(term) % n_buckets`` via ``partitionBy`` (one
    directory per bucket → a query's scan prunes to its terms' buckets),
    plus a single-row corpus-stats table (N, avgdl, n_buckets)."""
    toks = docs.select(
        F.col(id_col),
        F.size(tokens(text_col)).alias("dl"),
        F.explode(tokens(text_col)).alias("term"),
    )
    postings = (
        toks.groupBy(id_col, "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn("bucket", _term_bucket_col(F.col("term"), n_buckets))
    )
    postings.write.mode("overwrite").partitionBy("bucket").parquet(
        f"{path}/postings"
    )
    docs.select(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.size(tokens(text_col))).alias("avgdl"),
        F.lit(n_buckets).alias("n_buckets"),
    ).write.mode("overwrite").parquet(f"{path}/stats")


def query_text_index(
    spark,
    path: str,
    query_terms: list[str],
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 over a persisted index — bit-identical scores to
    ``bm25_scores`` on the same corpus (same operation order), but the
    scan touches only the query terms' bucket partitions. Per-term df is
    computed from the pruned postings themselves (no separate df table to
    keep in sync)."""
    stats = spark.read.parquet(f"{path}/stats")
    n_buckets = stats.select("n_buckets").head()[0]
    terms = sorted({t.lower() for t in query_terms})
    buckets = sorted({_term_bucket_py(t, n_buckets) for t in terms})

    tf = (
        spark.read.parquet(f"{path}/postings")
        .filter(F.col("bucket").isin(buckets))  # partition-pruned scan
        .filter(F.col("term").isin(terms))
        .select(
            F.col(id_col),
            F.col("term").alias("__term"),
            F.col("tf").alias("__tf"),
            F.col("dl").alias("__dl"),
        )
    )
    df_t = tf.groupBy("__term").agg(F.count(F.lit(1)).alias("__df"))
    corpus = stats.select(
        F.col("n_docs").alias("__n_docs"), F.col("avgdl").alias("__avgdl")
    )
    scored = (
        tf.join(F.broadcast(df_t), on="__term")
        .crossJoin(F.broadcast(corpus))
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


def bm25_multi(
    docs: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Batch BM25: score MANY queries in one corpus pass — (query_id,
    doc_id, bm25) for every (query, matching doc) pair.

    ``bm25_scores`` runs one driver-side term list per call; evaluation
    and offline-reranking workloads score thousands of queries, and
    re-scanning the corpus per query would be O(queries × corpus). Here
    the query-term table (tiny by definition) broadcast-joins into the
    exploded postings ONCE: cost is O(corpus tokens) + O(matching
    postings × queries-per-term), one shuffle on (query_id, doc).

    Same Lucene-smoothed idf + 1e-4 score grid as ``bm25_scores``;
    duplicate (query_id, term) rows are collapsed so a repeated query
    term scores once (set semantics, mirroring a DISTINCT in SQL)."""
    q = queries.select(
        F.col("query_id"), F.lower(F.col("term")).alias("__term")
    ).distinct()
    toks = docs.select(
        F.col(id_col),
        F.size(tokens(text_col)).alias("__dl"),
        F.explode(tokens(text_col)).alias("__term"),
    )
    matched = toks.join(F.broadcast(q), on="__term")
    tf = matched.groupBy("query_id", id_col, "__dl", "__term").agg(
        F.count(F.lit(1)).alias("__tf")
    )
    stats = docs.select(
        F.count(F.lit(1)).alias("__n_docs"),
        F.avg(F.size(tokens(text_col))).alias("__avgdl"),
    )
    # document frequency is a TERM property (docs containing it), shared
    # across queries — never per (query, term), or idf would depend on
    # which queries mention the term
    df_t = (
        matched.select("__term", id_col)
        .distinct()
        .groupBy("__term")
        .agg(F.count(F.lit(1)).alias("__df"))
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
    return scored.groupBy("query_id", id_col).agg(
        (
            F.floor(F.sum("__contrib") * F.lit(1e4) + F.lit(0.5)) / F.lit(1e4)
        ).alias("bm25")
    )


def phrase_match(
    docs: DataFrame,
    phrase: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact phrase search over POSITIONAL postings: ``(id, n_matches)``
    for every document containing the k-term phrase as consecutive
    tokens (the retrieval primitive BM25's bag-of-words scoring cannot
    express — "new york" must not match "york ... new").

    Plan shape: one ``posexplode`` pass assigns token positions, a
    broadcast ``isin`` keeps only postings of the phrase's terms (the
    corpus-sized explode reduces immediately to O(phrase-term
    occurrences)), then k−1 self-equi-joins on ``(id, pos + i)`` chain
    the adjacency — each join key includes the doc id, so at scale every
    join co-partitions on the same key and overlapping occurrences fall
    out naturally (the "b b s" / phrase "b b s" case). At 100 TB the
    postings table is the thing you persist once (the
    ``build_postings_index`` pattern above); this operator consumes
    either that or raw text."""
    postings = docs.select(
        F.col(id_col),
        F.posexplode(tokens(text_col)).alias("pos", "term"),
    ).filter(F.col("term").isin([t.lower() for t in phrase]))
    first = postings.filter(
        F.col("term") == phrase[0].lower()
    ).select(id_col, F.col("pos").alias("p0"))
    chain = first
    for i, term in enumerate(phrase[1:], start=1):
        nxt = postings.filter(F.col("term") == term.lower()).select(
            F.col(id_col).alias("__id_b"), F.col("pos").alias("__pos_b")
        )
        chain = chain.join(
            nxt,
            (chain[id_col] == nxt.__id_b)
            & (nxt.__pos_b == chain.p0 + F.lit(i)),
        ).select(id_col, "p0")
    return chain.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_matches")
    )
