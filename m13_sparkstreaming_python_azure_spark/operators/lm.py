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


def importance_scores(
    docs: DataFrame,
    target_model: DataFrame,
    background_model: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, importance) per document: mean log-likelihood ratio between a
    target-domain unigram model and a background model — the DSIR
    (Data Selection via Importance Resampling, Xie et al. 2023) scoring
    step. importance = logppl_background − logppl_target; higher = more
    target-like relative to the background.

    Single pass: one token explode, BOTH models join in (broadcast — the
    model tables are vocab-sized), both per-token log-probs grid-snap at
    1e-9, and one aggregate produces both means. Scoring cost is
    independent of how many models rank the corpus this way.

    The two models' (N, V) smoothing constants are collected driver-side
    (two single-row aggregates — bounded constants like k-means
    centroids) rather than cross-joined: the two model plans share the
    corpus lineage, and Spark's relation deduplication makes same-name
    attribute resolution across both cloned subtrees ambiguous."""
    tN, tV = target_model.agg(
        F.sum("n"), F.count(F.lit(1))
    ).first()
    bN, bV = background_model.agg(
        F.sum("n"), F.count(F.lit(1))
    ).first()
    t_den = F.lit(float((tN or 0) + tV + 1))
    b_den = F.lit(float((bN or 0) + bV + 1))
    toks = docs.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("term")
    )
    snap9 = lambda c: F.floor(c * F.lit(1e9) + F.lit(0.5)) / F.lit(1e9)  # noqa: E731
    scored = (
        toks.join(
            F.broadcast(target_model.withColumnRenamed("n", "__nt")),
            on="term",
            how="left",
        )
        .join(
            F.broadcast(background_model.withColumnRenamed("n", "__nb")),
            on="term",
            how="left",
        )
        .select(
            F.col(id_col),
            snap9(
                F.log(
                    (F.coalesce(F.col("__nt"), F.lit(0)) + F.lit(1.0))
                    / t_den
                )
            ).alias("__lpt"),
            snap9(
                F.log(
                    (F.coalesce(F.col("__nb"), F.lit(0)) + F.lit(1.0))
                    / b_den
                )
            ).alias("__lpb"),
        )
    )
    cnt = F.count(F.lit(1))
    mean_neg = lambda c: -F.sum(c.cast("decimal(27,12)")).cast("double") / cnt  # noqa: E731
    return scored.groupBy(id_col).agg(
        (mean_neg(F.col("__lpb")) - mean_neg(F.col("__lpt"))).alias(
            "importance"
        )
    )


def dsir_resample(
    docs: DataFrame,
    target_corpus: DataFrame,
    background_corpus: DataFrame,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "seed42",
) -> DataFrame:
    """DSIR selection: train target + background unigram models, score
    every candidate by the mean log-likelihood ratio, and draw ``k``
    documents WITHOUT replacement with inclusion probability ∝
    exp(importance) via the deterministic A-Res sampler
    (operators/sampling.weighted_sample_global — md5 uniforms,
    grid-snapped keys, so the oracle replays the exact selection).

    exp() is libm-dependent, so the weight snaps to a 1e-9 grid (and
    clamps positive) before it enters the sampling key — the same
    determinism rule as every ln() in this module. Returns the selected
    rows with their ``importance``."""
    from m13_sparkstreaming_python_azure_spark.operators.sampling import (
        weighted_sample_global,
    )

    tgt = train_unigram_model(target_corpus, text_col)
    bg = train_unigram_model(background_corpus, text_col)
    scores = importance_scores(docs, tgt, bg, id_col, text_col)
    weighted = docs.join(scores, on=id_col).withColumn(
        "__w",
        F.greatest(
            F.floor(F.exp(F.col("importance")) * F.lit(1e9) + F.lit(0.5))
            / F.lit(1e9),
            F.lit(1e-9),
        ),
    )
    return weighted_sample_global(weighted, id_col, "__w", k, salt).drop(
        "__w"
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


def train_bigram_model(corpus: DataFrame, text_col: str = "text"):
    """Bigram + unigram count tables from a corpus — the two shuffles a
    KenLM-style count pass needs (both keyed on bounded vocab spaces,
    map-side combine does the heavy lifting). Returns (unigrams, bigrams)
    as (term, n) and (t1, t2, n12)."""
    toks = corpus.select(F.explode(tokens(text_col)).alias("term"))
    uni = toks.groupBy("term").agg(F.count(F.lit(1)).alias("n"))
    arr = corpus.select(tokens(text_col).alias("t")).filter(
        F.size("t") >= 2
    )
    pairs = arr.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("t") - 1),
                lambda i: F.struct(
                    F.element_at("t", i).alias("t1"),
                    F.element_at("t", i + 1).alias("t2"),
                ),
            )
        ).alias("p")
    ).select("p.t1", "p.t2")
    bi = pairs.groupBy("t1", "t2").agg(F.count(F.lit(1)).alias("n12"))
    return uni, bi


def bigram_logppl(
    docs: DataFrame,
    uni: DataFrame,
    bi: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lam: float = 0.7,
    lam_uni: float = 0.3,
) -> DataFrame:
    """Interpolated-bigram log-perplexity per document (the KenLM/CCNet
    quality signal one order up from unigram_logppl):

        p(t2 | t1) = lam · n12/n1  +  lam_uni · (n_t2 + 1)/(N + V + 1)

    — ML bigram backed off into the add-one unigram. Documents shorter
    than 2 tokens are excluded (no transitions).

    Cross-engine float discipline: both mixture terms are ratios of
    identically-derived BIGINTs (bit-equal); lam/lam_uni are EXPLICIT
    double literals on both sides (never computed as 1−lam, whose float
    representation differs from a written 0.3); ln grid-snaps at 1e-9
    pre-sum; per-doc sums fold as exact decimals.

    Plan shape: transitions join the bigram and unigram tables — both
    vocabulary-sized, broadcast — then one groupBy on the doc id. The
    corpus shuffles once."""
    stats = uni.agg(F.sum("n").alias("__N"), F.count(F.lit(1)).alias("__V"))
    arr = docs.select(
        F.col(id_col), tokens(text_col).alias("t")
    ).filter(F.size("t") >= 2)
    trans = arr.select(
        id_col,
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("t") - 1),
                lambda i: F.struct(
                    F.element_at("t", i).alias("t1"),
                    F.element_at("t", i + 1).alias("t2"),
                ),
            )
        ).alias("p"),
    ).select(id_col, "p.t1", "p.t2")
    u1 = uni.select(F.col("term").alias("t1"), F.col("n").alias("n1"))
    u2 = uni.select(F.col("term").alias("t2"), F.col("n").alias("n2"))
    # n1 is never null when the model is trained on the scored corpus;
    # the outer coalesce keeps foreign-corpus scoring total (unseen t1
    # -> pure unigram backoff)
    p_ml = F.coalesce(
        F.coalesce(F.col("n12"), F.lit(0)) / F.col("n1"), F.lit(0.0)
    )
    p_uni = (F.coalesce(F.col("n2"), F.lit(0)) + F.lit(1.0)) / (
        F.col("__N") + F.col("__V") + F.lit(1.0)
    )
    lp = F.log(F.lit(lam) * p_ml + F.lit(lam_uni) * p_uni)
    scored = (
        trans.join(F.broadcast(bi), on=["t1", "t2"], how="left")
        .join(F.broadcast(u1), on="t1", how="left")
        .join(F.broadcast(u2), on="t2", how="left")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "__lp", F.floor(lp * F.lit(1e9) + F.lit(0.5)) / F.lit(1e9)
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_transitions"),
        (
            -F.sum(F.col("__lp").cast("decimal(27,12)")).cast("double")
            / F.count(F.lit(1))
        ).alias("logppl"),
    )


def kn_bigram_logppl(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    discount: float = 0.75,
    model_docs: DataFrame | None = None,
) -> DataFrame:
    """Interpolated Kneser-Ney bigram log-perplexity — the smoothing that
    actually wins LM evaluations (Chen & Goodman '98), one order deeper
    than ``bigram_logppl``'s ML+add-one mixture:

        p_KN(w|v) = max(c(vw) − d, 0)/c(v·) + d·N1+(v·)/c(v·) · p_cont(w)
        p_cont(w) = N1+(·w) / N1+(··)

    The continuation distribution scores how many CONTEXTS a word
    completes, not how often it occurs — the "San Francisco" effect:
    "francisco" is frequent but only ever follows "san", so its KN
    continuation probability is tiny and templated/boilerplate docs pop
    out with low perplexity where add-one smoothing hides them.

    Every model quantity is a BIGINT count; both mixture terms are
    ratios of identically-derived BIGINTs (bit-equal across engines);
    the discount is an explicit double literal; ln snaps 1e-9 pre-sum.

    Plan shape: three vocabulary-keyed count aggregates (c(vw), per-v
    context stats, per-w continuation counts), joined back to the
    transition stream — the same two-shuffle KenLM count-pass shape as
    ``train_bigram_model``, plus one groupBy(doc). Unseen-in-context
    transitions (c(vw)=0 after the LEFT join + coalesce) fall through to
    the continuation term alone, exactly the KN backoff — so the scorer
    is reusable on held-out text against counts from another corpus.
    Scope limit: a transition whose context ``v`` never occurs (c(v·)
    undefined) or whose word ``w`` completes no training context
    (N1+(·w)=0) still requires the training vocabulary to cover it —
    those rows are dropped by the remaining inner joins; full open-vocab
    scoring would add an order-0 uniform floor.
    """
    def _trans(src: DataFrame) -> DataFrame:
        a = src.select(F.col(id_col), tokens(text_col).alias("t")).filter(
            F.size("t") >= 2
        )
        return a.select(
            id_col,
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("t") - 1),
                    lambda i: F.struct(
                        F.element_at("t", i).alias("v"),
                        F.element_at("t", i + 1).alias("w"),
                    ),
                )
            ).alias("p"),
        ).select(id_col, "p.v", "p.w")

    trans = _trans(docs)
    # counts come from model_docs when given (held-out scoring); default
    # is the self-scoring quality-filter mode (train == score corpus)
    model_trans = _trans(model_docs) if model_docs is not None else trans
    pairs = model_trans.groupBy("v", "w").agg(
        F.count(F.lit(1)).alias("c_vw")
    )
    ctx = pairs.groupBy("v").agg(
        F.sum("c_vw").alias("c_v"),
        F.count(F.lit(1)).alias("n1_fwd"),  # N1+(v·)
    )
    cont = pairs.groupBy("w").agg(F.count(F.lit(1)).alias("n1_bwd"))  # N1+(·w)
    tot = pairs.agg(F.count(F.lit(1)).alias("n1_tot"))  # N1+(··)

    d = F.lit(float(discount))
    joined = (
        # LEFT join: an unseen (v, w) pair scores c(vw)=0 and backs off
        # to the continuation term (documented KN fallthrough) instead of
        # silently vanishing from the perplexity when counts come from a
        # different corpus than the docs being scored
        trans.join(pairs, on=["v", "w"], how="left")
        .withColumn("c_vw", F.coalesce(F.col("c_vw"), F.lit(0).cast("long")))
        .join(ctx, on="v")
        .join(cont, on="w")
        .crossJoin(F.broadcast(tot))
    )
    p = (
        F.greatest(F.col("c_vw") - d, F.lit(0.0)) / F.col("c_v")
        + (d * F.col("n1_fwd") / F.col("c_v"))
        * (F.col("n1_bwd") / F.col("n1_tot"))
    )
    lp9 = F.floor(F.log(p) * 1e9 + F.lit(0.5)).cast("long")
    return (
        joined.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_trans"),
            F.sum(lp9).alias("__s9"),
        )
        .select(
            id_col,
            "n_trans",
            (
                F.floor(
                    (-F.col("__s9") / 1e9 / F.col("n_trans")) * 1e6
                    + F.lit(0.5)
                )
                / 1e6
            ).alias("kn_logppl"),
        )
    )


def jm_trigram_logppl(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lambdas: tuple[float, float, float] = (0.6, 0.3, 0.1),
) -> DataFrame:
    """Jelinek-Mercer interpolated TRIGRAM log-perplexity — one order
    deeper than ``kn_bigram_logppl``, with the linear-interpolation
    smoothing every KenLM-style pipeline starts from:

        p(w|u,v) = λ₃·c(uvw)/c(uv·) + λ₂·c(vw)/c(v·) + λ₁·c(w)/N

    Trigram context counts come from the trigram stream (c(uv·) sums
    over completions, so the top term is a proper distribution), bigram
    and unigram counts from their own streams. Repetitive/templated
    text scores LOW logppl under the sharp trigram term; incoherent
    word soup falls through to the unigram floor — the separation axis
    a quality filter wants.

    Determinism contract: every count is a BIGINT; each mixture term is
    a λ-literal (mirrored CAST(… AS DOUBLE)) times a ratio of
    identically-derived BIGINTs; ln snaps to the 1e-9 grid BEFORE the
    per-doc sum (fold-order immunity), and the final average is a
    mirrored double ratio snapped 1e-6.

    Plan shape: three vocabulary-keyed count aggregates joined back to
    the per-doc trigram stream (broadcast for the scalar N), one
    groupBy(doc) — the KenLM count-pass shape, one order up.
    """
    l3, l2, l1 = (F.lit(float(x)) for x in lambdas)
    arr = docs.select(F.col(id_col), tokens(text_col).alias("t")).filter(
        F.size("t") >= 3
    )
    tris = arr.select(
        id_col,
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("t") - 2),
                lambda i: F.struct(
                    F.element_at("t", i).alias("u"),
                    F.element_at("t", i + 1).alias("v"),
                    F.element_at("t", i + 2).alias("w"),
                ),
            )
        ).alias("p"),
    ).select(id_col, "p.u", "p.v", "p.w")
    c_uvw = tris.groupBy("u", "v", "w").agg(
        F.count(F.lit(1)).alias("c_uvw")
    )
    c_uv = c_uvw.groupBy("u", "v").agg(F.sum("c_uvw").alias("c_uv"))
    bis = arr.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("t") - 1),
                lambda i: F.struct(
                    F.element_at("t", i).alias("v"),
                    F.element_at("t", i + 1).alias("w"),
                ),
            )
        ).alias("p")
    ).select("p.v", "p.w")
    c_vw = bis.groupBy("v", "w").agg(F.count(F.lit(1)).alias("c_vw"))
    c_v = c_vw.groupBy("v").agg(F.sum("c_vw").alias("c_v"))
    unis = arr.select(F.explode("t").alias("w"))
    c_w = unis.groupBy("w").agg(F.count(F.lit(1)).alias("c_w"))
    n_tot = unis.agg(F.count(F.lit(1)).alias("n_tot"))

    joined = (
        tris.join(c_uvw, on=["u", "v", "w"])
        .join(c_uv, on=["u", "v"])
        .join(c_vw, on=["v", "w"])
        .join(c_v, on="v")
        .join(c_w, on="w")
        .crossJoin(F.broadcast(n_tot))
    )
    p = (
        l3 * (F.col("c_uvw") / F.col("c_uv"))
        + l2 * (F.col("c_vw") / F.col("c_v"))
        + l1 * (F.col("c_w") / F.col("n_tot"))
    )
    lp9 = F.floor(F.log(p) * 1e9 + F.lit(0.5)).cast("long")
    return (
        joined.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_trans"),
            F.sum(lp9).alias("__s9"),
        )
        .select(
            id_col,
            "n_trans",
            (
                F.floor(
                    (-F.col("__s9") / 1e9 / F.col("n_trans")) * 1e6
                    + F.lit(0.5)
                )
                / 1e6
            ).alias("jm_logppl"),
        )
    )


def domain_mixture_weights(
    docs: DataFrame,
    label_col: str = "source",
    text_col: str = "text",
    grid: int = 1_000_000_000,
) -> DataFrame:
    """DoReMi-lite domain reweighting (Xie et al. '23, the one-step
    counts-only variant): score every domain's tokens under ONE
    corpus-wide add-1 unigram reference model, define each domain's
    excess loss over the easiest domain, and emit sampling weights
    ∝ exp(excess) — domains the reference models worst get upweighted,
    exactly the DoReMi intuition without the proxy-model training loop.

    Returns ``(label, n_tokens, ce_g, weight)``: ce_g is the per-domain
    cross-entropy on a 1e-9 BIGINT grid (per-token lns snap BEFORE the
    sum — fold-order immune), weight the exp-normalized mixture ratio
    (IEEE ops over exact sums; one exp snap at 1e-6). Scale: one
    token-keyed count aggregate + one broadcast model join; domains are
    a handful of rows."""
    from m13_sparkstreaming_python_azure_spark.operators.text import tokens

    tok = docs.select(
        F.col(label_col).alias("__label"),
        F.explode(tokens(text_col)).alias("token"),
    )
    # pin the unigram model: corpus size and vocabulary both FOLD OUT of
    # it (n = Σc, |V| = row count) in one bounded collect, and the
    # scoring join reads the same cached aggregate — the lazy shape
    # re-ran the tokenize+explode for the totals pass, the vocab count,
    # the broadcast build, and each consumer of ``scored`` (r12)
    model = tok.groupBy("token").agg(F.count(F.lit(1)).alias("c")).persist()
    totals = model.agg(
        F.sum("c").alias("n"), F.count(F.lit(1)).alias("v")
    ).collect()[0]
    n_corpus = int(totals["n"])
    v_size = int(totals["v"])
    g_ln = (
        F.floor(
            F.log(
                (F.col("c") + F.lit(1))
                / F.lit(float(n_corpus + v_size))
            )
            * F.lit(grid)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("g")
    )
    scored = (
        tok.join(F.broadcast(model.select("token", g_ln)), "token")
        .groupBy("__label")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("g").alias("g_sum"),
        )
        .select(
            "__label",
            "n_tokens",
            (-F.col("g_sum") / F.col("n_tokens")).alias("ce_g"),
        )
        # one row per domain; materialize so the baseline aggregate and
        # the weight projection don't each re-run the scoring join
        .localCheckpoint(eager=True)
    )
    model.unpersist()
    base = scored.agg(F.min("ce_g").alias("base"))
    expg = (
        scored.crossJoin(F.broadcast(base))
        .select(
            "__label",
            "n_tokens",
            "ce_g",
            F.floor(
                F.exp((F.col("ce_g") - F.col("base")) / F.lit(float(grid)))
                * 1e6
                + F.lit(0.5)
            )
            .cast("long")
            .alias("__e"),
        )
    )
    tot = expg.agg(F.sum("__e").alias("t"))
    return expg.crossJoin(F.broadcast(tot)).select(
        F.col("__label").alias(label_col),
        "n_tokens",
        # floor, not cast: Spark's double->long cast truncates while
        # DuckDB's CAST rounds — floor() agrees everywhere
        F.floor(F.col("ce_g")).cast("long").alias("ce_g"),
        (F.col("__e") / F.col("t")).alias("weight"),
    )
