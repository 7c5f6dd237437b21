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

from pyspark.sql import Column, DataFrame, Window
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
    # stage the token ARRAY in its own projection so size/explode read
    # one evaluation — ``tokens`` ends in an interpreted higher-order
    # filter, and referencing it twice in one select pays the whole
    # regex+HOF pass twice per row (r12, guide §4.1)
    toks = (
        docs.select(F.col(id_col), tokens(text_col).alias("__ts"))
        .select(
            id_col,
            F.size("__ts").alias("__dl"),
            F.explode("__ts").alias("__term"),
        )
        .filter(F.col("__term").isin([t.lower() for t in query_terms]))
    )
    tf = toks.groupBy(id_col, "__dl", "__term").agg(
        F.count(F.lit(1)).alias("__tf")
    )

    stats = docs.select(tokens(text_col).alias("__ts")).select(
        F.count(F.lit(1)).alias("__n_docs"),
        F.avg(F.size("__ts")).alias("__avgdl"),
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
    # staged token array: one tokenize evaluation per corpus pass (r12,
    # guide §4.1 — ``tokens`` ends in an interpreted HOF; see bm25_scores)
    toks = docs.select(
        F.col(id_col), tokens(text_col).alias("__ts")
    ).select(
        id_col,
        F.size("__ts").alias("__dl"),
        F.explode("__ts").alias("__term"),
    )
    matched = toks.join(F.broadcast(q), on="__term")
    tf = matched.groupBy("query_id", id_col, "__dl", "__term").agg(
        F.count(F.lit(1)).alias("__tf")
    )
    stats = docs.select(tokens(text_col).alias("__ts")).select(
        F.count(F.lit(1)).alias("__n_docs"),
        F.avg(F.size("__ts")).alias("__avgdl"),
    )
    # document frequency is a TERM property (docs containing it), shared
    # across queries — never per (query, term), or idf would depend on
    # which queries mention the term. Derived from ``tf`` (one row per
    # (query, doc, term)) rather than re-scanning ``matched``: distinct
    # (term, doc) pairs are identical, and this branch then reuses tf's
    # aggregation instead of re-paying the corpus tokenize (r12).
    df_t = (
        tf.select("__term", id_col)
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


def tfidf_cosine_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_shared_terms: int = 5,
    min_cosine: float = 0.35,
    max_df_fraction: float = 0.25,
    shingle_size: int = 1,
) -> DataFrame:
    """Sparse TF-IDF cosine similarity join over an inverted index —
    the weighted upgrade of ngram-Jaccard near-dup detection (Jaccard
    treats 'the' and a rare term alike; TF-IDF cosine is what content
    similarity actually uses). Pairs sharing >= ``min_shared_terms``
    indexed terms score cos(a,b) = Σ_t w_at·w_bt / (‖a‖·‖b‖); pairs
    below ``min_cosine`` are dropped.

    Scale design: this is a POSTING-LIST join (term-partitioned,
    doc_a < doc_b), never a doc×doc cross join — and terms with
    df > ``max_df_fraction``·N are dropped from the index FIRST (the
    classic stop-term cap: a term in a quarter of the corpus carries
    ~no signal but produces df² join pairs — the quadratic hot spot at
    100 TB). Dot products and norms ride one groupBy each.

    ``shingle_size`` > 1 indexes word n-gram shingles instead of
    unigrams — the right unit when the unigram vocabulary is tiny
    relative to the corpus (every term's df then hugs N and the index
    degenerates toward all-pairs; shingles re-sparsify it).

    Determinism contract: idf = ln(N/df) snaps to the 1e-6 grid (libm
    rule), each weight tf·idf quantizes to a 1e-4 BIGINT grid, so dots
    and squared norms are EXACT integer sums (|qw| ≤ ~3e6, squares
    ≤ ~1e13·terms — inside int64 at the 10× audit scale), and the final
    cosine is a mirrored double ratio snapped 1e-6.
    """
    if shingle_size <= 1:
        terms = docs.select(
            F.col(id_col), F.explode(tokens(text_col)).alias("term")
        )
    else:
        k = shingle_size
        arr = docs.select(F.col(id_col), tokens(text_col).alias("t")).filter(
            F.size("t") >= k
        )
        terms = arr.select(
            id_col,
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("t") - (k - 1)),
                    lambda i: F.concat_ws(
                        " ", *[F.element_at("t", i + j) for j in range(k)]
                    ),
                )
            ).alias("term"),
        )
    tf = terms.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.countDistinct(id_col).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n"))
    idf = F.floor(
        F.log(F.col("n").cast("double") / F.col("df")) * 1e6 + F.lit(0.5)
    ) / 1e6
    posting = (
        tf.join(F.broadcast(df_), on="term")
        .crossJoin(F.broadcast(n))
        .filter(F.col("df") <= F.col("n") * F.lit(max_df_fraction))
        .select(
            id_col,
            "term",
            F.floor(F.col("tf") * idf * 1e4 + F.lit(0.5))
            .cast("long")
            .alias("qw"),
        )
    )
    norms = posting.groupBy(id_col).agg(
        F.sum(F.col("qw") * F.col("qw")).alias("norm2")
    )
    a = posting.select(
        F.col(id_col).alias("doc_a"), "term", F.col("qw").alias("qa")
    )
    b = posting.select(
        F.col(id_col).alias("doc_b"), "term", F.col("qw").alias("qb")
    )
    pairs = (
        a.join(b, on="term")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(
            F.sum(F.col("qa") * F.col("qb")).alias("dot"),
            F.count(F.lit(1)).alias("shared_terms"),
        )
        .filter(F.col("shared_terms") >= min_shared_terms)
    )
    na = norms.select(
        F.col(id_col).alias("doc_a"), F.col("norm2").alias("na2")
    )
    nb = norms.select(
        F.col(id_col).alias("doc_b"), F.col("norm2").alias("nb2")
    )
    cosine = F.floor(
        F.col("dot")
        / (
            F.sqrt(F.col("na2").cast("double"))
            * F.sqrt(F.col("nb2").cast("double"))
        )
        * 1e6
        + F.lit(0.5)
    ) / 1e6
    return (
        pairs.join(na, on="doc_a")
        .join(nb, on="doc_b")
        .select("doc_a", "doc_b", "shared_terms", cosine.alias("cosine"))
        .filter(F.col("cosine") >= F.lit(min_cosine))
    )


def _bm25_grid_contrib(k1: float, b: float, grid: int) -> Column:
    """Integer-grid BM25 contribution for one (doc, term) row with columns
    __tf __df __dl __n_docs __sum_dl. Every float input derives from exact
    integers (IEEE ops are engine-identical); the single ln snaps to the
    grid, so per-doc scores are exact BIGINT sums."""
    avgdl = F.col("__sum_dl") / F.col("__n_docs")
    idf = F.log(
        F.lit(1.0)
        + (F.col("__n_docs") - F.col("__df") + F.lit(0.5))
        / (F.col("__df") + F.lit(0.5))
    )
    denom = F.col("__tf") + F.lit(k1) * (
        F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("__dl") / avgdl
    )
    return (
        F.floor(
            idf * (F.col("__tf") * F.lit(k1 + 1.0)) / denom * F.lit(grid)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("__g")
    )


def bm25_prf_search(
    docs: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k_fb: int = 10,
    m_expand: int = 5,
    top_n: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    grid: int = 1_000_000,
) -> DataFrame:
    """BM25 with pseudo-relevance feedback (RM3-style two-pass): score the
    seed query, take the top ``k_fb`` docs, harvest the ``m_expand``
    heaviest non-query terms from them (exact token counts, ties → term
    asc), re-score with the expanded term set, return the top ``top_n``
    docs as ``(id, score, rank)``.

    Determinism: contributions snap to a BIGINT grid before summation
    (``_bm25_grid_contrib``), feedback-term selection is integer counts,
    and both rank cuts tie-break on the id — the oracle replays every
    stage. Scale: one tokenize pass reused by both rounds (persist), term
    df / stats are broadcast aggregates, the expansion set is ≤ m+|q|
    terms — the second pass is as cheap as the first; nothing is
    quadratic."""
    q0 = sorted({t.lower() for t in query_terms})
    # tokenize ONCE into cached ARRAYS (r12, guide §4.1): ``tokens``
    # ends in an interpreted higher-order filter, so every extra
    # evaluation re-pays the whole regex+HOF pass — the old shape ran it
    # for toks AND once per broadcast(stats) build (measured 12.3 s →
    # 4.0 s at sf0.1, hash-identical). toks/stats now derive from the
    # cached arrays; the explode itself is cheap codegen.
    base = docs.select(F.col(id_col), tokens(text_col).alias("__ts")).persist()
    toks = base.select(
        id_col,
        F.size("__ts").alias("__dl"),
        F.explode("__ts").alias("__term"),
    )
    stats = base.select(
        F.count(F.lit(1)).alias("__n_docs"),
        F.sum(F.size("__ts")).cast("long").alias("__sum_dl"),
    )

    def _score(term_set: DataFrame) -> DataFrame:
        tf = (
            toks.join(F.broadcast(term_set), on="__term")
            .groupBy(id_col, "__dl", "__term")
            .agg(F.count(F.lit(1)).alias("__tf"))
        )
        df_t = tf.groupBy("__term").agg(F.count(F.lit(1)).alias("__df"))
        return (
            tf.join(F.broadcast(df_t), on="__term")
            .crossJoin(F.broadcast(stats))
            .select(F.col(id_col), _bm25_grid_contrib(k1, b, grid))
            .groupBy(id_col)
            .agg(F.sum("__g").alias("score"))
        )

    spark = docs.sparkSession
    seed_terms = spark.createDataFrame(
        [(t,) for t in q0], "__term string"
    )
    w = Window.orderBy(F.col("score").desc(), F.col(id_col).asc())
    seed_top = (
        _score(seed_terms)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k_fb)
        .select(id_col)
    )
    expansion = (
        toks.join(seed_top, on=id_col)
        .filter(~F.col("__term").isin(q0))
        .groupBy("__term")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .withColumn(
            "__rn",
            F.row_number().over(
                Window.orderBy(F.col("__cnt").desc(), F.col("__term").asc())
            ),
        )
        .filter(F.col("__rn") <= m_expand)
        .select("__term")
    )
    expanded = seed_terms.unionByName(expansion)
    out = (
        _score(expanded)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_n)
    )
    # the result is ≤ top_n rows — checkpoint it eagerly and release the
    # pinned token arrays (leaving them cached leaks blocks across calls)
    out = out.localCheckpoint(eager=True)
    base.unpersist()
    return out


def ql_dirichlet_scores(
    docs: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    mu: int = 2000,
    top_n: int = 20,
    grid: int = 1_000_000,
) -> DataFrame:
    """Query-likelihood retrieval with Dirichlet smoothing (Zhai &
    Lafferty '01): ``score(q,d) = Σ_t ln((tf_td + μ·ctf_t/|C|)/(dl_d+μ))``
    over ALL query terms (tf=0 terms contribute the background mass), for
    the candidate docs matching ≥1 term. Per-term lns snap to a BIGINT
    grid → exact integer sums; ``(id, score, rank)`` for the top
    ``top_n`` (ties → id asc).

    Scale: corpus term stats are one token-keyed aggregate; candidates ×
    |q| rows via a broadcast literal array — no cartesian, no Python."""
    q0 = sorted({t.lower() for t in query_terms})
    # staged token array (one tokenize per pass — see bm25_scores) and
    # two derived-aggregate savings (r12): |C| is a sum of array sizes,
    # no explode needed; corpus term frequency ctf_t = Σ_d tf_td, so it
    # folds out of ``tf`` instead of re-scanning the token stream.
    toks = docs.select(
        F.col(id_col), tokens(text_col).alias("__ts")
    ).select(
        id_col,
        F.size("__ts").alias("__dl"),
        F.explode("__ts").alias("__term"),
    )
    corpus = (
        docs.select(tokens(text_col).alias("__ts"))
        .agg(F.sum(F.size("__ts")).alias("__c_len"))
        .collect()[0]
    )
    c_len = int(corpus["__c_len"])
    # tf feeds three branches (candidates, the scoring join, ctf); its
    # aggregation exchange is identical across them, so ReusedExchange
    # already shares the heavy work (an explicit persist measured SLOWER
    # — cache-write cost for no saved compute)
    tf = (
        toks.filter(F.col("__term").isin(q0))
        .groupBy(id_col, "__dl", "__term")
        .agg(F.count(F.lit(1)).alias("__tf"))
    )
    ctf = tf.groupBy("__term").agg(F.sum("__tf").alias("__ctf"))
    cand = tf.select(id_col, "__dl").distinct()
    pairs = cand.select(
        id_col,
        "__dl",
        F.explode(F.array(*[F.lit(t) for t in q0])).alias("__term"),
    )
    g = (
        pairs.join(tf, [id_col, "__dl", "__term"], "left")
        .join(F.broadcast(ctf), "__term")
        .select(
            F.col(id_col),
            F.floor(
                F.log(
                    (
                        F.coalesce(F.col("__tf"), F.lit(0))
                        + F.lit(mu) * (F.col("__ctf") / F.lit(c_len))
                    )
                    / (F.col("__dl") + F.lit(mu))
                )
                * F.lit(grid)
                + F.lit(0.5)
            )
            .cast("long")
            .alias("__g"),
        )
    )
    w = Window.orderBy(F.col("score").desc(), F.col(id_col).asc())
    return (
        g.groupBy(id_col)
        .agg(F.sum("__g").alias("score"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_n)
    )


def boolean_search(
    docs: DataFrame,
    clauses: list[dict],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Boolean retrieval over token postings — the DNF query shape
    ``(a AND b AND NOT c) OR (d AND e)``: ``clauses`` is a list of
    ``{"all": [...terms...], "none": [...terms...]}``; a document matches
    if ANY clause is satisfied. Returns ``(id, clause)`` with the lowest
    matching clause index (deterministic).

    Scale shape: postings are built ONLY for the query's vocabulary — an
    ``isin`` prune on the exploded token stream (a broadcast semi-join
    when the vocabulary is a table) — so the per-doc flag aggregate
    touches O(query_terms) rows per doc, never the whole posting list.
    One explode + one doc-keyed aggregate; no self-joins.

    Every clause must carry at least one positive ("all") term: flags are
    built only for documents containing ≥1 query-vocabulary token, so a
    pure-negation clause like ``{"none": ["spam"]}`` cannot be evaluated
    against the (unscanned) rest of the corpus — it is rejected up front
    rather than silently matching zero documents."""
    for i, c in enumerate(clauses):
        if not c.get("all"):
            raise ValueError(
                f"boolean_search clause {i} has no positive ('all') terms; "
                "pure-negation clauses are not supported — postings are "
                "built only for the query vocabulary, so a clause needs at "
                "least one required term to anchor the candidate set"
            )
    vocab = sorted(
        {t.lower() for c in clauses for t in c.get("all", [])}
        | {t.lower() for c in clauses for t in c.get("none", [])}
    )
    if not vocab:
        raise ValueError("boolean_search needs at least one term")
    postings = (
        docs.select(
            F.col(id_col), F.explode(tokens(text_col)).alias("__term")
        )
        .filter(F.col("__term").isin(vocab))
        .distinct()
    )
    flags = postings.groupBy(id_col).agg(
        *[
            F.max(
                F.when(F.col("__term") == t, F.lit(1)).otherwise(F.lit(0))
            ).alias(f"__has_{i}")
            for i, t in enumerate(vocab)
        ]
    )
    idx = {t: i for i, t in enumerate(vocab)}

    def _clause(c: dict):
        cond = F.lit(True)
        for t in c.get("all", []):
            cond = cond & (F.col(f"__has_{idx[t.lower()]}") == 1)
        for t in c.get("none", []):
            cond = cond & (F.col(f"__has_{idx[t.lower()]}") == 0)
        return cond

    matched = F.lit(None).cast("int")
    for ci in range(len(clauses) - 1, -1, -1):
        matched = F.when(_clause(clauses[ci]), F.lit(ci)).otherwise(matched)
    return (
        flags.withColumn("clause", matched)
        .filter(F.col("clause").isNotNull())
        .select(id_col, "clause")
    )
