"""Text-analysis operators for large-scale training-data pipelines.

Beyond the reference's own surface (north_star in BASELINE.json): language
ID, quality scoring, token counting, document fingerprinting — all over the
``documents`` fixture table.

Everything here is built-in `pyspark.sql.functions` (JVM-side, whole-stage
codegen); no Python UDFs. Per-row work is O(tokens) inside codegen, the
plan stays embarrassingly parallel (no shuffle), so it scales linearly to
100 TB of documents.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Tiny per-language stopword marker sets for the n-gram/stopword heuristic
# language ID. Deliberately small: the operator's contract is "deterministic
# heuristic", not a trained model (those libs aren't in this container).
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "fr": ["le", "la", "les", "de", "et", "un", "une", "est", "que", "pour"],
    "es": ["el", "la", "los", "de", "y", "un", "una", "es", "que", "por"],
    "de": ["der", "die", "das", "und", "ein", "eine", "ist", "zu", "den", "von"],
}

# "BPE-ish" word/punct splitter: a token is a run of word chars OR a single
# non-word non-space char (so punctuation counts, like byte-level BPE does).
BPE_ISH_TOKEN_RE = r"\w+|[^\w\s]"


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization, lowercased, empty-safe."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), r"\s+"), lambda t: t != "")


def token_count(col: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column | str) -> Column:
    """Regex token count approximating a byte-level BPE pre-tokenizer
    (word runs + individual punctuation marks)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(BPE_ISH_TOKEN_RE))


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality-scoring features: lengths, ratios, lexical diversity.

    Ratios are null-safe (empty docs → null, not divide-by-zero — ANSI mode
    is on in Spark 4).
    """
    toks = tokens(text_col)
    n_tok = F.size(toks)
    n_chars = F.length(text_col)
    return (
        df.withColumn("n_chars_computed", n_chars)
        .withColumn("n_tokens", n_tok)
        .withColumn("n_bpe_tokens", bpe_ish_token_count(text_col))
        .withColumn(
            "avg_token_len",
            F.when(
                n_tok > 0,
                F.round(
                    F.aggregate(
                        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
                    )
                    / n_tok,
                    4,
                ),
            ),
        )
        .withColumn(
            "uniq_token_ratio",
            F.when(n_tok > 0, F.round(F.size(F.array_distinct(toks)) / n_tok, 4)),
        )
        .withColumn(
            "punct_ratio",
            F.when(
                n_chars > 0,
                F.round(
                    F.regexp_count(F.col(text_col), F.lit(r"[^\w\s]")) / n_chars, 4
                ),
            ),
        )
        .withColumn(
            "stopword_ratio",
            F.when(
                n_tok > 0,
                F.round(
                    F.size(
                        F.filter(
                            toks,
                            lambda t: F.array_contains(
                                F.lit(STOPWORDS["en"]), t
                            ),
                        )
                    )
                    / n_tok,
                    4,
                ),
            ),
        )
    )


def with_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style heuristic quality filter: a [0,1] score from length,
    mean word length, lexical diversity and stopword presence, plus a
    boolean ``quality_keep`` gate. Deterministic, documented rule — callers
    tune the weights per corpus."""
    stats = with_text_stats(df, text_col)
    in_range = (
        (F.col("n_tokens") >= 10)
        & (F.col("n_tokens") <= 100000)
        & (F.col("avg_token_len") >= 2.0)
        & (F.col("avg_token_len") <= 12.0)
    ).cast("int")
    diversity = F.least(F.coalesce(F.col("uniq_token_ratio"), F.lit(0.0)) * 2, F.lit(1.0))
    stop_presence = F.least(
        F.coalesce(F.col("stopword_ratio"), F.lit(0.0)) * 10, F.lit(1.0)
    )
    score = F.round(0.4 * in_range + 0.3 * diversity + 0.3 * stop_presence, 4)
    return stats.withColumn("quality_score", score).withColumn(
        "quality_keep", score >= F.lit(0.5)
    )


def with_lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: fraction of tokens in each language's marker
    stopword set; argmax with deterministic alphabetical tie-break; 'und'
    (undetermined) when no marker hits."""
    toks = tokens(text_col)
    n_tok = F.size(toks)
    out = df
    score_cols = []
    def _in_set(words: list[str]):
        arr = F.lit(words)
        # single-param lambda: pyspark treats 2-param HOF lambdas as
        # (element, index), so the word set must bind via closure
        return lambda t: F.array_contains(arr, t)

    for lang, words in sorted(STOPWORDS.items()):
        sc = F.when(
            n_tok > 0,
            F.size(F.filter(toks, _in_set(words))) / n_tok,
        ).otherwise(F.lit(0.0))
        out = out.withColumn(f"__score_{lang}", sc)
        score_cols.append(f"__score_{lang}")
    best = F.greatest(*[F.col(c) for c in score_cols])
    lang_expr = F.lit("und")
    # reversed so the FIRST alphabetical language wins ties
    for lang in sorted(STOPWORDS, reverse=True):
        lang_expr = F.when(
            (best > 0) & (F.col(f"__score_{lang}") == best), F.lit(lang)
        ).otherwise(lang_expr)
    return out.withColumn("lang_pred", lang_expr).drop(*score_cols)


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprints:
    - ``fp_exact``: xxhash64 of whitespace-normalized lowercased text
      (exact-dup key);
    - ``fp_rolling``: min of rolling 8-token-window hashes (winnowing-style
      — stable under small edits far from the minimizing window).
    """
    from m13_sparkstreaming_python_azure_spark.operators.util import bind

    k = 8
    # let-bind the token array: referencing tokens() inside the window
    # lambda would re-tokenize once per window position
    win_hashes = bind(
        tokens(text_col),
        lambda toks: F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(toks) - (k - 1), F.lit(1))),
            lambda i: F.xxhash64(F.concat_ws(" ", F.slice(toks, i, k))),
        ),
    )
    return df.withColumn(
        "fp_exact", F.xxhash64(F.concat_ws(" ", tokens(text_col)))
    ).withColumn("fp_rolling", F.array_min(win_hashes))


def with_repetition_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition signals for quality filtering: duplicate-word
    fraction plus the fraction of tokens covered by the single most frequent
    unigram / bigram. Heavily repeated boilerplate (the classic web-crawl
    failure mode) scores high on all three.

    Shuffle-free: per-row array HOFs inside codegen. The per-row top-count
    scan is O(distinct × tokens); fine for document-sized rows (≤ ~10k
    tokens). For book-length rows switch to the explode → (id, token)
    groupBy shape used by the dedup sketches — one keyed shuffle instead of
    the quadratic row-local scan.

    All token arrays are let-bound (``bind``): referencing ``tokens(col)``
    inside the nested counting lambdas would otherwise re-tokenize once per
    array element (see the HOF-inlining hazard note in operators/dedup.py).
    """
    from m13_sparkstreaming_python_azure_spark.operators.util import bind

    def top_count(arr: Column) -> Column:
        # max over distinct elements of that element's occurrence count
        return bind(
            arr,
            lambda a: F.array_max(
                F.transform(
                    F.array_distinct(a),
                    lambda d: F.size(F.filter(a, lambda t: t == d)),
                )
            ),
        )

    def bigrams(text: Column | str) -> Column:
        # bind: the token array is referenced once per bigram position
        return bind(
            tokens(text),
            lambda t: F.transform(
                F.sequence(F.lit(1), F.size(t) - 1),
                lambda i: F.concat_ws(
                    " ", F.element_at(t, i), F.element_at(t, i + 1)
                ),
            ),
        )

    toks = tokens(text_col)
    n_tok = F.size(toks)
    # Ratios of two identically-derived ints: IEEE division is correctly
    # rounded, so the doubles are bit-equal across engines — no grid needed.
    return (
        df.withColumn("n_tokens", n_tok)
        .withColumn(
            "dup_word_frac",
            F.when(
                n_tok > 0, (n_tok - F.size(F.array_distinct(toks))) / n_tok
            ).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "top_unigram_count",
            F.when(n_tok > 0, top_count(toks)).otherwise(F.lit(0)),
        )
        .withColumn(
            "top_bigram_count",
            F.when(n_tok > 1, top_count(bigrams(text_col))).otherwise(F.lit(0)),
        )
        .withColumn(
            "top_unigram_frac",
            F.when(n_tok > 0, F.col("top_unigram_count") / n_tok).otherwise(
                F.lit(0.0)
            ),
        )
        .withColumn(
            "top_bigram_frac",
            F.when(
                n_tok > 1, F.col("top_bigram_count") / (n_tok - 1)
            ).otherwise(F.lit(0.0)),
        )
    )


# PII redaction patterns — written to the common subset of Java regex
# (Spark) and RE2 (DuckDB/Go tooling) so one pattern string serves every
# engine in the pipeline; extend per deployment's compliance list.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("phone", r"\+?\d[\d-]{6,}\d"),
)


def redact_pii(
    df: DataFrame, text_col: str = "text", out_col: str = "redacted"
) -> DataFrame:
    """Scrub PII from a text column before training: each pattern class is
    replaced by its `<class>` token, and per-class match counts are kept
    for curation stats/auditing. Pure JVM regexp expressions — the chain
    of regexp_replace folds into the scan stage (one pass over the text,
    no shuffle, no Python)."""
    c = F.col(text_col)
    counts = [
        F.regexp_count(c, F.lit(pat)).alias(f"n_{name}")
        for name, pat in PII_PATTERNS
    ]
    red = c
    for name, pat in PII_PATTERNS:
        red = F.regexp_replace(red, pat, f"<{name}>")
    return df.withColumn(out_col, red).select("*", *counts)


def with_readability(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Flesch reading-ease + Flesch-Kincaid grade per document — the
    classic readability gate a pretraining curation pipeline layers on
    top of `with_quality_score` (too-hard and too-degenerate text both
    score poorly).

    The syllable counter is the standard regex proxy: contiguous vowel
    groups `[aeiouy]+` per word (exact syllabification needs a
    dictionary; the proxy is deterministic, cross-engine, and what
    textstat-style libraries fall back to). Sentences are `[.!?]+` runs,
    floored at 1; words are `[a-z']+` runs of the lowercased text.

    Float contract (hash-gate): all three counts are exact BIGINTs, the
    two ratios divide identically-derived BIGINTs (bit-equal), the
    Flesch constants mirror as CAST(206.835 AS DOUBLE) etc. in the
    oracle, outputs snap 1e-6. Pure JVM regexp expressions — folds into
    the scan, no shuffle, no Python.
    """
    lc = F.lower(F.col(text_col))
    n_words = F.regexp_count(lc, F.lit(r"[a-z']+")).cast("long")
    n_sents = F.greatest(
        F.lit(1).cast("long"),
        F.regexp_count(F.col(text_col), F.lit(r"[.!?]+")).cast("long"),
    )
    n_syll = F.regexp_count(lc, F.lit(r"[aeiouy]+")).cast("long")
    wps = n_words.cast("double") / n_sents.cast("double")
    spw = n_syll.cast("double") / n_words.cast("double")
    snap = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    flesch = (
        F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw
    )
    fk_grade = (
        F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59)
    )
    return df.where(n_words >= 1).select(
        "*",
        n_words.alias("n_words"),
        n_sents.alias("n_sentences"),
        n_syll.alias("n_syllables"),
        snap(flesch).alias("flesch_score"),
        snap(fk_grade).alias("fk_grade"),
    )


def ngram_novelty(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """Per-document n-gram novelty — the memorization/duplication risk
    signal (cf. Lee et al. '22 dedup analysis): of a doc's DISTINCT
    positional n-grams, how many appear in NO other document (corpus
    document-frequency 1). Returns ``(id, n_grams, n_novel)``; the
    novelty ratio is n_novel/n_grams. Docs shorter than ``n`` tokens
    contribute their single truncated gram (mirrors the slice clip).

    Scale: explode → distinct per doc → one gram-keyed df aggregate →
    one doc-keyed rollup; grams hash-shuffle once, nothing quadratic."""
    t = tokens(text_col)
    grams = docs.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(
                        F.lit(1), F.greatest(F.size(t) - (n - 1), F.lit(1))
                    ),
                    lambda i: F.concat_ws(" ", F.slice(t, i, n)),
                )
            )
        ).alias("gram"),
    ).filter(F.col("gram") != "")
    # both the df aggregate and the doc rollup consume the exploded gram
    # stream — pin it once instead of paying the explode twice
    grams = grams.persist()
    # ONE gram-keyed shuffle instead of two (r13, guide §2.4): the old
    # shape aggregated df per gram and then JOINED it back onto the gram
    # stream — a second full shuffle of the gram STRINGS — just to count
    # df==1 grams per doc. But a df==1 gram has exactly one owner, so
    # min(doc_id) inside the same aggregate identifies it; the novel
    # counts then shuffle (gram-distinct, two-long) rows by owner, and
    # per-doc totals come map-side off the pinned stream. Identical
    # results — no hashing, no approximation.
    g1 = grams.groupBy("gram").agg(
        F.count(F.lit(1)).alias("df"), F.min(id_col).alias("__owner")
    )
    novel = (
        g1.filter(F.col("df") == 1)
        .groupBy(F.col("__owner").alias(id_col))
        .agg(F.count(F.lit(1)).alias("n_novel"))
    )
    totals = grams.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_grams"))
    out = totals.join(novel, id_col, "left").select(
        id_col,
        "n_grams",
        F.coalesce("n_novel", F.lit(0).cast("long")).alias("n_novel"),
    )
    # materialize eagerly so the pinned gram stream can be released now —
    # otherwise repeated invocations in one session accumulate cached blocks
    out = out.localCheckpoint(eager=True)
    grams.unpersist()
    return out


def oov_rate(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_size: int = 1000,
) -> DataFrame:
    """Out-of-vocabulary rate per document against the corpus's own
    top-``vocab_size`` token vocabulary (count desc, token asc tiebreak) —
    the tokenizer-coverage proxy a data pipeline tracks per source.
    Returns ``(id, n_tokens, n_oov)`` counting WITH multiplicity.

    Scale: one token aggregate for the vocab (broadcast back), one
    token-keyed left join + doc rollup."""
    toks = docs.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("token")
    )
    w = Window.orderBy(F.col("cnt").desc(), F.col("token").asc())
    vocab = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= vocab_size)
        .select("token", F.lit(1).alias("__in_vocab"))
    )
    return (
        toks.join(F.broadcast(vocab), "token", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(
                F.when(F.col("__in_vocab").isNull(), 1).otherwise(0)
            ).alias("n_oov"),
        )
    )


# Gopher stopword set (Rae et al. 2021, appendix A1.1): a doc should
# contain at least two of these to look like running English prose
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style document quality rules (Rae et al. 2021 — the
    word-level subset; line-level rules live in ``c4_keep_line``):

    - word count in [min_words, max_words] (50..100k)
    - mean word length in [3, 10] chars
    - ≤ 10% of words are symbol junk (#, ellipsis)
    - ≥ 80% of words contain at least one alphabetic character
    - contains ≥ 2 Gopher stopwords

    Every threshold evaluates as an exact integer cross-multiplication
    (3·n ≤ Σlen ≤ 10·n, 5·n_alpha ≥ 4·n, 10·n_sym ≤ n) — no float
    ratios, so the pass/fail flags are engine-bit-equal. One tokenize
    pass, all flags in one projection; aggregates roll up at scan speed.
    """
    t = tokens(text_col)
    n = F.size(t)
    sum_len = F.aggregate(
        F.transform(t, F.length), F.lit(0), lambda a, x: a + x
    )
    n_alpha = F.size(F.filter(t, lambda w: w.rlike("[a-z]")))
    n_sym = F.size(
        F.filter(t, lambda w: w.rlike(r"^#+$") | w.contains("..."))
    )
    n_stop = F.size(
        F.filter(t, lambda w: w.isin(*GOPHER_STOPWORDS))
    )
    return docs.select(
        F.col(id_col),
        F.col("source"),
        n.alias("n_words"),
        sum_len.alias("sum_word_len"),
        ((n >= 50) & (n <= 100_000)).alias("pass_word_count"),
        ((sum_len >= 3 * n) & (sum_len <= 10 * n)).alias("pass_mean_len"),
        (10 * n_sym <= n).alias("pass_symbols"),
        (5 * n_alpha >= 4 * n).alias("pass_alpha"),
        (n_stop >= 2).alias("pass_stopwords"),
    ).withColumn(
        "pass_all",
        F.col("pass_word_count")
        & F.col("pass_mean_len")
        & F.col("pass_symbols")
        & F.col("pass_alpha")
        & F.col("pass_stopwords"),
    )


def c4_keep_line(line: Column) -> Column:
    """C4 line-retention predicate (Raffel et al. 2020 §2.2): keep a line
    iff it ends with terminal punctuation, has ≥ 3 words, and does not
    mention javascript. Doc-level rules (lorem ipsum, curly braces)
    compose on top — see q_c4_line_filters."""
    toks = F.filter(F.split(F.lower(line), r"\s+"), lambda x: x != "")
    return (
        line.rlike(r"[.!?\"']$")
        & (F.size(toks) >= 3)
        & ~F.lower(line).contains("javascript")
    )
