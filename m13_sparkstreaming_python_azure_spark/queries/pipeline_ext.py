"""Round-4 extensions — exact similarity joins, evaluation metrics, and
dataset-diagnostic analytics for the training-data pipeline.

Every query is oracle-gated (DuckDB twin in PIPELINE_ORACLES) unless
documented otherwise. Float discipline follows the repo rule (core.py
header): ratios of identically-derived BIGINTs are bit-equal across
engines and need no rounding; anything touching ln/log/pow gets a
1e-6 floor-snap grid on BOTH sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from m13_sparkstreaming_python_azure_spark.catalog import load_table

# DuckDB-side tokenization + word-3-gram shingling shared by the
# set-similarity oracles (identical to queries/llm.py's recipe so both
# families tokenize the same way).
_TOKS_SQL = "list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')"
_GRAMS_CTE = f"""
    toks AS (
        SELECT doc_id, {_TOKS_SQL} AS t FROM documents
    ), grams AS (
        SELECT DISTINCT doc_id, gram FROM (
            SELECT doc_id,
                   unnest(list_transform(
                       range(1, greatest(len(t) - 2, 1) + 1),
                       i -> array_to_string(t[i:i+2], ' ')
                   )) AS gram
            FROM toks
        )
    ), sizes AS (
        SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id
    ), inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
        FROM grams a JOIN grams b USING (gram)
        WHERE a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
"""


def q_ppjoin_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT all-pairs Jaccard >= 0.6 over word-3-gram shingle sets via
    prefix filtering (operators/setsim.ppjoin_pairs) — the no-cutoff
    complement to ngram_jaccard_pairs' stop-gram approximation. The
    oracle is the O(n²) brute force; the Spark plan never runs one
    (prefix-only inverted index + candidate verification)."""
    from m13_sparkstreaming_python_azure_spark.operators.setsim import (
        ppjoin_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    return ppjoin_pairs(docs, "doc_id", n=3, threshold=0.6)


def q_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment join (|A∩B| / min >= 0.6) — detects
    quotes/subsets/expanded revisions that Jaccard under-scores
    (operators/setsim.containment_pairs): contained-side prefix probes a
    full-set index, exact verification on survivors."""
    from m13_sparkstreaming_python_azure_spark.operators.setsim import (
        containment_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    return containment_pairs(docs, "doc_id", n=3, threshold=0.6)


def q_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostics over the three hottest shuffle keys
    (operators/stats.key_skew_profile): the pre-flight check that decides
    salting / AQE skew handling before a 100 TB shuffle. Entropy terms
    grid-snap 1e-9 pre-sum into BIGINT accumulation; top/gini shares are
    BIGINT ratios; norm_entropy snaps 1e-6 (ln boundary)."""
    from m13_sparkstreaming_python_azure_spark.operators.stats import (
        key_skew_profile_multi,
    )

    keyed = (
        load_table(spark, sf_dir, "orders")
        .select(
            F.lit("orders.o_custkey").alias("key_label"),
            F.col("o_custkey").cast("string").alias("k"),
        )
        .unionByName(
            load_table(spark, sf_dir, "lineitem").select(
                F.lit("lineitem.l_partkey").alias("key_label"),
                F.col("l_partkey").cast("string").alias("k"),
            )
        )
        .unionByName(
            load_table(spark, sf_dir, "events").select(
                F.lit("events.user_id").alias("key_label"),
                F.col("user_id").cast("string").alias("k"),
            )
        )
    )
    snap6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    return key_skew_profile_multi(keyed).withColumn(
        "norm_entropy", snap6(F.col("norm_entropy"))
    )


def q_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information + NMI between customer market segment and
    nation (operators/stats.mutual_information) — the categorical
    association measure chi-square can't compare across cardinalities.
    NMI passes through a 1e-6 snap (sqrt boundary)."""
    from m13_sparkstreaming_python_azure_spark.operators.stats import (
        mutual_information,
    )

    cust = load_table(spark, sf_dir, "customer")
    snap6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    return mutual_information(cust, "c_mktsegment", "c_nationkey").withColumn(
        "nmi", snap6(F.col("nmi"))
    )


def q_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit conformance of order totals — the classic
    fabricated-data / unit-mix-error detector for a numeric column.
    First digit comes from the BIGINT integer part via string head (no
    log10 near power-of-ten boundaries); expected share ln(1+1/d)/ln(10)
    snaps 1e-6."""
    ord_ = load_table(spark, sf_dir, "orders")
    snap6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    digits = ord_.select(
        F.substring(
            F.floor(F.col("o_totalprice")).cast("long").cast("string"), 1, 1
        )
        .cast("int")
        .alias("digit")
    )
    per = digits.groupBy("digit").agg(F.count(F.lit(1)).alias("n_orders"))
    tot = per.agg(F.sum("n_orders").alias("n_total"))
    benford = snap6(
        F.log(F.lit(1.0) + F.lit(1.0) / F.col("digit")) / F.log(F.lit(10.0))
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "digit",
            "n_orders",
            (F.col("n_orders") / F.col("n_total")).alias("obs_share"),
            benford.alias("benford_share"),
            snap6(
                F.col("n_orders") / F.col("n_total") - benford
            ).alias("deviation"),
        )
    )


def q_kfold_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified 5-fold cross-validation assignment: within every
    (lang, source) stratum, docs are ordered by a seeded md5 and dealt
    round-robin — folds are EXACTLY balanced per stratum (hash-mod
    folds are only balanced in expectation), deterministic, and
    engine-independent. Doc-level output so a training job can join it
    directly."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang", "source").orderBy(
        F.md5(F.concat_ws(":", F.lit("kf"), F.col("doc_id"))), "doc_id"
    )
    return docs.select(
        "doc_id",
        "lang",
        "source",
        ((F.row_number().over(w) - 1) % 5).alias("fold"),
    )


def q_sequence_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-class sequence pattern detection, Spark-first:
    each user's event history becomes a single-char-encoded string
    (array_sort over (ts, event_id, char) structs — a total order, so
    the sequence is deterministic), and patterns are plain regexes over
    it: \'s.*v[^c]*p\' = signup, later a view, then a purchase with NO
    click between (negation via char class — portable to RE2, no
    lookahead). Scale: one shuffle on user_id, strings stay KB-sized.
    """
    ev = load_table(spark, sf_dir, "events")
    ch = (
        F.when(F.col("event_type") == "signup", "s")
        .when(F.col("event_type") == "view", "v")
        .when(F.col("event_type") == "click", "c")
        .when(F.col("event_type") == "purchase", "p")
        .otherwise("e")
    )
    per_user = (
        ev.select("user_id", "ts", "event_id", ch.alias("ch"))
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("ts", "event_id", "ch"))),
                    lambda x: x["ch"],
                ),
                "",
            ).alias("seq")
        )
    )
    return per_user.select(
        "user_id",
        F.length("seq").alias("seq_len"),
        F.regexp_like(F.col("seq"), F.lit("s.*v[^c]*p"))
        .cast("int")
        .alias("matched_no_click_funnel"),
        F.regexp_count(F.col("seq"), F.lit("vp")).alias("n_direct_view_purchase"),
        F.regexp_count(F.col("seq"), F.lit("e")).alias("n_errors"),
    )


def q_passage_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Passage-level exact dedup (the sub-document complement to
    repeated_spans\' positional islands): documents split into 20-token
    passages; an instance is a duplicate when an identical passage
    exists earlier in (doc_id, idx) order. Corpus = documents plus a
    planted +100000 copy of every 7th doc, so cross-doc passage dups
    exist by construction. Per-doc: passage count, dup count, dup
    fraction (BIGINT ratio)."""
    base = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = base.unionByName(
        base.filter(F.col("doc_id") % 7 == 0).select(
            (F.col("doc_id") + 100000).alias("doc_id"), "text"
        )
    )
    toks = corpus.select(
        "doc_id",
        F.filter(
            F.split(F.lower(F.col("text")), r"\s+"), lambda t: t != ""
        ).alias("t"),
    )
    passages = toks.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(
                    F.lit(0),
                    F.ceil(F.size("t") / F.lit(20.0)).cast("int") - 1,
                ),
                lambda i: F.array_join(
                    F.slice(F.col("t"), i * 20 + 1, 20), " "
                ),
            )
        ).alias("idx", "passage"),
    )
    w = Window.partitionBy("passage").orderBy("doc_id", "idx")
    flagged = passages.withColumn(
        "is_dup", (F.row_number().over(w) > 1).cast("int")
    )
    return flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_passages"),
        F.sum("is_dup").alias("n_dup_passages"),
        (F.sum("is_dup") / F.count(F.lit(1))).alias("dup_frac"),
    )


def q_retrieval_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offline retrieval evaluation harness: 10 queries (terms drawn at
    fixed token positions from docs 0..9) scored over the whole corpus
    in ONE pass via batch BM25 (operators/retrieval.bm25_multi — the
    O(corpus + matches) evaluation shape, not one scan per query), then
    graded against embedding-cluster labels: per query, retrieved@10,
    relevant@10, precision@10, MRR, and NDCG@10. DCG/IDCG terms
    grid-snap 1e-9 pre-sum into exact BIGINT accumulation; every final
    metric is a ratio of identically-derived values."""
    from m13_sparkstreaming_python_azure_spark.operators.retrieval import (
        bm25_multi,
    )
    from m13_sparkstreaming_python_azure_spark.operators.text import tokens

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "label")

    qd = docs.filter(F.col("doc_id") < 10).select(
        F.col("doc_id").alias("query_id"), tokens("text").alias("t")
    )
    qterms = qd.select(
        "query_id",
        F.explode(
            F.array(
                F.element_at("t", 1), F.element_at("t", 4), F.element_at("t", 7)
            )
        ).alias("term"),
    )
    scores = bm25_multi(docs, qterms)

    w = Window.partitionBy("query_id").orderBy(
        F.desc("bm25"), F.asc("doc_id")
    )
    top = (
        scores.filter(F.col("doc_id") != F.col("query_id"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 10)
    )
    ql = emb.select(F.col("vec_id").alias("query_id"), F.col("label").alias("qlab"))
    dl = emb.select(F.col("vec_id").alias("doc_id"), F.col("label").alias("dlab"))
    rel = (
        top.join(F.broadcast(ql), "query_id")
        .join(F.broadcast(dl), "doc_id")
        .withColumn("rel", (F.col("qlab") == F.col("dlab")).cast("int"))
    )
    dcg_term = F.floor(
        F.col("rel") / F.log2(F.col("rnk") + F.lit(1.0)) * 1e9 + F.lit(0.5)
    ).cast("decimal(28,0)")
    per = rel.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_ret"),
        F.sum("rel").alias("n_rel_at10"),
        F.min(F.when(F.col("rel") == 1, F.col("rnk"))).alias("fr"),
        F.sum(dcg_term).alias("s_dcg"),
    )
    # ideal DCG: cumulative grid-weights for ranks 1..10, indexed by
    # min(total relevant in corpus minus self, 10)
    cnts = emb.groupBy("label").agg(F.count(F.lit(1)).alias("n_lab"))
    relcnt = ql.join(F.broadcast(cnts), ql.qlab == cnts.label).select(
        "query_id", (F.col("n_lab") - 1).alias("n_relevant")
    )
    g = spark.range(1, 11).select(
        F.col("id").alias("i"),
        F.floor(
            F.lit(1.0) / F.log2(F.col("id") + F.lit(1.0)) * 1e9 + F.lit(0.5)
        )
        .cast("decimal(28,0)")
        .alias("w_i"),
    )
    cum = g.withColumn(
        "idcg",
        F.sum("w_i").over(
            Window.orderBy("i").rowsBetween(Window.unboundedPreceding, 0)
        ),
    ).select("i", "idcg")
    return (
        per.join(relcnt, "query_id")
        .join(
            F.broadcast(cum),
            F.least(F.col("n_relevant"), F.lit(10)) == F.col("i"),
        )
        .select(
            "query_id",
            "n_ret",
            F.col("n_rel_at10").cast("long").alias("n_rel_at10"),
            (F.col("n_rel_at10") / F.lit(10.0)).alias("precision_at10"),
            F.when(F.col("fr").isNull(), F.lit(0.0))
            .otherwise(F.lit(1.0) / F.col("fr"))
            .alias("mrr"),
            F.when(
                F.col("idcg") > 0,
                F.col("s_dcg").cast("double") / F.col("idcg").cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias("ndcg_at10"),
        )
    )


def q_jaro_winkler_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jaro-Winkler name linkage (operators/strsim): distinct part names
    blocked on their noun token (equi-join bounds the pair space), an
    Arrow-batched JW kernel on the blocked pairs only, 1e-6 snap, >=
    0.85. The oracle uses DuckDB\'s native jaro_winkler_similarity —
    same parameterization (0.1 prefix weight, max 4, 0.7 boost gate),
    verified grid-identical pairwise."""
    from m13_sparkstreaming_python_azure_spark.operators.strsim import (
        jaro_winkler_pairs,
    )

    part = load_table(spark, sf_dir, "part")
    block = F.element_at(F.split(F.col("name"), " "), 2)
    return jaro_winkler_pairs(part, "p_name", block, threshold=0.85)


def q_geo_radius_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-blocked spatial radius join (operators/geo.radius_join):
    suppliers to customers within 300 km on deterministic md5-derived
    coordinates (|lat| <= 60). The Spark plan explodes each supplier
    into the bounded cell neighborhood and equi-joins on cell id — no
    cross join anywhere; the oracle IS the brute-force cross product, so
    the gate proves the blocking loses nothing. Distances snap 1e-6
    (libm trig boundary)."""
    from m13_sparkstreaming_python_azure_spark.operators.geo import (
        radius_join,
    )

    def u(prefix: str, key) -> F.Column:
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat_ws(":", F.lit(prefix), key.cast("string"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint")
            / F.lit(4294967296.0)
        )

    sup = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        (u("slat", F.col("s_suppkey")) * F.lit(120.0) - F.lit(60.0)).alias("s_lat"),
        (u("slon", F.col("s_suppkey")) * F.lit(360.0) - F.lit(180.0)).alias("s_lon"),
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        (u("clat", F.col("c_custkey")) * F.lit(120.0) - F.lit(60.0)).alias("c_lat"),
        (u("clon", F.col("c_custkey")) * F.lit(360.0) - F.lit(180.0)).alias("c_lon"),
    )
    out = radius_join(
        sup, cust, ("s_lat", "s_lon"), ("c_lat", "c_lon"), radius_km=300.0
    )
    return out.select("s_suppkey", "c_custkey", "dist_km")


def q_pmi_phrases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PMI phrase mining: pointwise mutual information of adjacent word
    pairs — the collocation detector that separates real phrases from
    chance co-occurrence (frequency alone ranks \'the of\' first). One
    unigram aggregate + one bigram aggregate (both vocabulary-sized),
    broadcast-joined; PMI = ln((c_xy/N_bi) / ((c_x/N_uni)(c_y/N_uni))),
    1e-6-snapped, support floor c_xy >= 5."""
    from m13_sparkstreaming_python_azure_spark.operators.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    arr = docs.select(tokens("text").alias("t")).filter(F.size("t") >= 2)
    uni = (
        arr.select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c_w"))
    )
    n_uni = uni.agg(F.sum("c_w").alias("n_uni"))
    bi = arr.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("t") - 1),
                lambda i: F.struct(
                    F.element_at("t", i).alias("x"),
                    F.element_at("t", i + 1).alias("y"),
                ),
            )
        ).alias("b")
    ).select("b.x", "b.y")
    cxy = bi.groupBy("x", "y").agg(F.count(F.lit(1)).alias("n_xy"))
    n_bi = cxy.agg(F.sum("n_xy").alias("n_bi"))
    snap6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    return (
        cxy.filter(F.col("n_xy") >= 5)
        .join(F.broadcast(uni.selectExpr("w as x", "c_w as c_x")), "x")
        .join(F.broadcast(uni.selectExpr("w as y", "c_w as c_y")), "y")
        .crossJoin(F.broadcast(n_uni))
        .crossJoin(F.broadcast(n_bi))
        .select(
            "x",
            "y",
            "n_xy",
            snap6(
                F.log(
                    (F.col("n_xy") / F.col("n_bi"))
                    / (
                        (F.col("c_x") / F.col("n_uni"))
                        * (F.col("c_y") / F.col("n_uni"))
                    )
                )
            ).alias("pmi"),
        )
    )


def q_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick text vectorization (Weinberger et al.): tokens hash
    into 256 signed buckets (md5 bucket + independent md5 sign bit), one
    sparse (doc, feature_idx, value) row per non-zero — the
    fixed-dimension, vocabulary-free featurizer that needs NO fitted
    dictionary, so it streams and scales embarrassingly. Pure JVM
    expressions; values are exact integer sums."""
    from m13_sparkstreaming_python_azure_spark.operators.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(tokens("text")).alias("term")
    )
    h = lambda pre: F.conv(  # noqa: E731
        F.substring(F.md5(F.concat(F.lit(pre), F.col("term"))), 1, 8), 16, 10
    ).cast("bigint")
    return (
        toks.withColumn("feature_idx", h("fh:") % 256)
        .withColumn(
            "sgn", F.when(h("fs:") % 2 == 0, F.lit(1)).otherwise(F.lit(-1))
        )
        .groupBy("doc_id", "feature_idx")
        .agg(
            F.sum("sgn").alias("value"),
            F.count(F.lit(1)).alias("n_terms"),
        )
    )


def q_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction over the deterministic customer graph (same
    binary-tree + chain construction as triangle_counts): common
    neighbors + Adamic-Adar for unconnected distance-2 pairs
    (operators/graph.link_prediction). Wedge centers are degree-capped
    BEFORE the self-join (the hub blow-up guard); AA terms accumulate as
    1e-9-grid BIGINTs."""
    from m13_sparkstreaming_python_azure_spark.operators.graph import (
        link_prediction,
    )

    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("bigint").alias("k")
    )
    tree = cust.filter(F.col("k") >= 2).select(
        F.col("k").alias("src"), (F.col("k") / 2).cast("bigint").alias("dst")
    )
    chain = cust.filter(F.col("k") >= 1).select(
        F.col("k").alias("src"), (F.col("k") - 1).alias("dst")
    )
    return link_prediction(tree.unionByName(chain))


def q_lexicon_sentiment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexicon-based sentiment scoring (the EDBT\'16 large-scale
    Twitter-sentiment-on-Spark line in PAPERS.md): a broadcast word->
    weight lexicon joins the exploded tokens, one doc-keyed integer sum
    — scan-speed classification with zero Python. Per doc: matched
    token count, integer score, and the sign label (exact int math,
    no float anywhere)."""
    from m13_sparkstreaming_python_azure_spark.operators.text import tokens

    lex = spark.createDataFrame(
        [("fast", 2), ("slow", -2), ("big", 1), ("small", -1), ("merge", 1)],
        "term string, weight int",
    )
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(tokens("text")).alias("term"))
    return (
        toks.join(F.broadcast(lex), on="term")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_matched"),
            F.sum("weight").alias("sentiment_score"),
        )
        .withColumn("label", F.signum(F.col("sentiment_score")).cast("int"))
    )


def q_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (operators/similarity): codebooks from
    the exact hash sample, vectors compressed to 16 centroid ids, ADC
    shortlist over codes only (the full-corpus pass never touches
    floats), exact L2 rerank of the 100-candidate shortlist. HASH gate
    since r10 (VERDICT r9 #4) via the derived-invariant shape: exact
    squared-L2 top-10 summaries replayed by DuckDB array SQL + the
    in-gate recall invariant (PQ∩exact ≥ 70%; measured 93–97%). The
    k-means codebooks stay un-replayed; recall and determinism also
    pinned by tests/test_pq.py."""
    from m13_sparkstreaming_python_azure_spark.operators import (
        similarity as sim,
    )

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    books = sim.train_pq_codebooks(emb, m=16, k=16, sample_size=400, seed=3)
    codes = sim.pq_encode(emb, books)
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    ann = sim.pq_shortlist_rerank(
        codes, emb, queries, books, k=10, shortlist=100
    )
    exact = sim.brute_force_l2_topk(emb, queries, k=10)
    return sim.ann_recall_summary(
        exact, ann, "l2_dist", best_is_max=False, floor_pct=70
    )


def q_zonemap_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-level data skipping under the gate (sources/snapshots zone
    maps — the Delta/Iceberg min-max stats analogue): orders land in the
    manifest table as four date-range appends (files correlate with
    o_orderdate), ``attach_zone_maps`` commits per-file [min, max] from
    the parquet FOOTERS, and a 1996 range scan resolves its file list
    from the manifest — disjoint files never open. The result must equal
    the plain filtered scan (pruning is cost-only; the predicate still
    applies), which is exactly what the oracle hash checks; the
    actually-skipped file count is pinned by tests."""
    import datetime
    import os
    import tempfile

    from m13_sparkstreaming_python_azure_spark.sources.snapshots import (
        append_snapshot,
        attach_zone_maps,
        read_snapshot_pruned,
        write_snapshot,
    )

    orders = load_table(spark, sf_dir, "orders")
    table = os.path.join(tempfile.mkdtemp(prefix="zonemap-"), "orders_t")
    d = F.col("o_orderdate")
    chunks = [
        orders.filter(d < "1995-01-01"),
        orders.filter((d >= "1995-01-01") & (d < "1996-01-01")),
        orders.filter((d >= "1996-01-01") & (d < "1997-01-01")),
        orders.filter(d >= "1997-01-01"),
    ]
    write_snapshot(chunks[0].coalesce(2), table)
    for ch in chunks[1:]:
        append_snapshot(ch.coalesce(2), table)
    attach_zone_maps(table, ["o_orderdate"])

    pruned = read_snapshot_pruned(
        spark,
        table,
        "o_orderdate",
        lo=datetime.datetime(1996, 1, 1),
        hi=datetime.datetime(1996, 12, 31),
    )
    dec = F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
    return pruned.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(dec, 2).cast("double").alias("revenue"),
    )


def q_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed co-located star join under the gate (sources/bucketing —
    the SURVEY §7 shuffle-elimination design, exercised end-to-end
    where the driver can hash it): orders and lineitem are persisted
    bucketed+sorted by order key into the SAME bucket count, the join
    plans as a SortMergeJoin with NO Exchange on either side — the
    query RAISES if one appears, so a planner regression fails the gate
    rather than silently shuffling — and revenue rolls up per order
    priority. At 100 TB this is the recurring-join shape: the one-time
    bucketed write amortizes the fact-table shuffle out of every later
    join. The oracle is the plain (shuffled) join — bucketing must be
    cost-only."""
    import os
    import tempfile

    from m13_sparkstreaming_python_azure_spark.sources.bucketing import (
        co_located_join,
        write_bucketed,
    )

    base = tempfile.mkdtemp(prefix="bucketed-gate-")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"),
        "l_extendedprice",
        "l_discount",
    )
    write_bucketed(
        orders, "gate_bkt_orders", ["o_orderkey"], 8,
        sort_cols=["o_orderkey"], path=os.path.join(base, "orders"),
    )
    write_bucketed(
        lineitem, "gate_bkt_lineitem", ["o_orderkey"], 8,
        sort_cols=["o_orderkey"], path=os.path.join(base, "lineitem"),
    )
    threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = co_located_join(
            spark, "gate_bkt_orders", "gate_bkt_lineitem", "o_orderkey"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        if "Exchange" in plan or "SortMergeJoin" not in plan:
            raise AssertionError(
                f"bucketed join must be an exchange-free SMJ:\n{plan}"
            )
        dec = F.sum(
            (
                F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
            ).cast("decimal(18,6)")
        )
        return joined.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(dec, 2).cast("double").alias("revenue"),
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)


def q_bloom_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-file BLOOM point-lookup skipping under the gate
    (sources/snapshots.attach_bloom_maps — the Delta/Iceberg bloom-index
    analogue, complementing zone maps where min/max is useless): orders
    land as four HASH-sliced appends (o_orderkey % 4 — every file's key
    range spans the whole domain, so zone maps would prune nothing),
    blooms commit per file, and each probe key resolves its file list
    from the manifest — files whose bloom proves absence never open.
    Probes every o_orderkey ≡ 0 (mod 2999), batched into ONE scan over
    the union of bloom-surviving files + an IN-list filter
    (read_snapshot_points — per-key scans would re-open shared files);
    the result must equal the plain IN-list scan (false positives die
    on the residual filter — pruning is cost-only, which is exactly
    what the oracle hash checks). Skipped-file counts are pinned by
    tests."""
    import os
    import tempfile

    from m13_sparkstreaming_python_azure_spark.sources.snapshots import (
        append_snapshot,
        attach_bloom_maps,
        read_snapshot_points,
        write_snapshot,
    )

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    table = os.path.join(tempfile.mkdtemp(prefix="bloom-"), "orders_t")
    k = F.col("o_orderkey")
    write_snapshot(orders.filter(k % 4 == 0).coalesce(2), table)
    for i in (1, 2, 3):
        append_snapshot(orders.filter(k % 4 == i).coalesce(2), table)
    attach_bloom_maps(table, ["o_orderkey"], num_bits=65536)

    probe_keys = sorted(
        r["o_orderkey"]
        for r in orders.filter(k % 2999 == 0).select("o_orderkey").collect()
    )
    return read_snapshot_points(spark, table, "o_orderkey", probe_keys).select(
        "o_orderkey",
        "o_custkey",
        F.round(F.col("o_totalprice").cast("decimal(18,6)"), 2)
        .cast("double")
        .alias("total_price"),
    )


def q_snapshot_restore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RESTORE + shallow CLONE under the gate (sources/snapshots
    .restore_snapshot / clone_snapshot — the Delta RESTORE/CLONE
    analogues): orders land as three status-sliced appends, a bad
    "cleanup" overwrite drops everything but P-status (the incident),
    RESTORE rolls content back to v3 as a NEW commit (history preserved
    — the bad version stays time-travelable), and the result is read
    through a shallow CLONE of the restored table (zero-copy manifest
    reference). The read must equal the full pre-incident table, which
    the oracle states directly; history/rollback mechanics are pinned by
    tests."""
    import os
    import tempfile

    from m13_sparkstreaming_python_azure_spark.sources.snapshots import (
        append_snapshot,
        clone_snapshot,
        read_snapshot,
        restore_snapshot,
        write_snapshot,
    )

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    root = tempfile.mkdtemp(prefix="restore-")
    table, clone = os.path.join(root, "t"), os.path.join(root, "t_clone")
    s = F.col("o_orderstatus")
    write_snapshot(orders.filter(s == "F").coalesce(2), table)      # v1
    append_snapshot(orders.filter(s == "O").coalesce(2), table)     # v2
    append_snapshot(orders.filter(s == "P").coalesce(2), table)     # v3
    # the incident: an overwrite that loses F and O
    write_snapshot(orders.filter(s == "P").coalesce(2), table)      # v4
    restore_snapshot(table, 3)                                      # v5 == v3
    clone_snapshot(table, clone)
    return (
        read_snapshot(spark, clone)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("revenue"),
        )
    )


def q_snapshot_vacuum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VACUUM under the gate (sources/snapshots.vacuum_snapshots — the
    Delta VACUUM analogue, the retention step every snapshot table
    eventually needs or storage grows without bound): orders land as
    two status appends, compaction rewrites them into one optimized
    commit (superseding the small files), and vacuum with keep_last=1
    physically deletes the files now referenced only by expired
    versions. The query RAISES unless vacuum actually deleted files,
    the expired manifests are gone, and every retained file still
    exists — then reads the surviving latest version, which must equal
    the plain filtered scan (vacuum is storage-only; content must be
    untouched). That content equality is what the oracle hashes."""
    import os
    import tempfile

    from m13_sparkstreaming_python_azure_spark.sources.snapshots import (
        append_snapshot,
        compact_snapshot,
        read_manifest,
        read_snapshot,
        vacuum_snapshots,
        write_snapshot,
    )

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    table = os.path.join(tempfile.mkdtemp(prefix="vacuum-"), "t")
    s = F.col("o_orderstatus")
    write_snapshot(orders.filter(s == "F").coalesce(4), table)   # v1
    append_snapshot(orders.filter(s == "O").coalesce(4), table)  # v2
    compact_snapshot(spark, table)                               # v3
    deleted = vacuum_snapshots(table, keep_last=1)
    if not deleted:
        raise AssertionError("vacuum deleted nothing — retention broken")
    if any(os.path.exists(f) for f in deleted):
        raise AssertionError("vacuum reported files it did not delete")
    live = read_manifest(table, 3)["files"]
    if not all(os.path.exists(f) for f in live):
        raise AssertionError("vacuum deleted a retained file")
    for expired in (1, 2):
        try:
            read_manifest(table, expired)
        except FileNotFoundError:
            continue
        raise AssertionError(f"expired manifest v{expired} survived vacuum")
    return (
        read_snapshot(spark, table)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("revenue"),
        )
    )


def q_bow_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-of-words dedup — order-insensitive exact dedup (catches
    shuffled/reordered copies that content-hash dedup misses while
    staying one groupBy, unlike similarity joins): fingerprint =
    md5(sorted token list). Corpus plants a token-REVERSED copy of every
    5th doc (different text, identical bag) — each must collapse onto
    its source. Per doc: the group\'s canonical keep_id, copy count, and
    the reordered-dup flag."""
    from m13_sparkstreaming_python_azure_spark.operators.text import tokens

    base = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    reordered = base.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.array_join(F.reverse(F.split(F.col("text"), r"\s+")), " ").alias(
            "text"
        ),
    )
    corpus = base.unionByName(reordered)
    fp = F.md5(F.array_join(F.array_sort(tokens("text")), " "))
    w = Window.partitionBy("fp")
    return (
        corpus.withColumn("fp", fp)
        .select(
            "doc_id",
            F.min("doc_id").over(w).alias("keep_id"),
            F.count(F.lit(1)).over(w).alias("n_copies"),
        )
        .withColumn(
            "is_reordered_dup",
            (F.col("doc_id") != F.col("keep_id")).cast("int"),
        )
    )


def q_ann_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ ANN (the FAISS-standard composition, operators/similarity
    train_ivfpq/ivfpq_encode/ivfpq_topk): coarse cells + PQ codes of the
    RESIDUALS (4 + m bytes/vector); queries probe nprobe cells, ADC over
    residual codes shortlists, exact rerank answers. HASH gate since r10
    (VERDICT r9 #4) via the derived-invariant shape: exact squared-L2
    top-10 summaries replayed by DuckDB array SQL + the in-gate recall
    invariant (IVF-PQ∩exact ≥ 50%; measured 70–76%). The k-means
    codebooks stay un-replayed; recall/determinism also pinned by
    tests/test_pq.py."""
    from m13_sparkstreaming_python_azure_spark.operators import (
        similarity as sim,
    )

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    cent, books = sim.train_ivfpq(
        emb, n_cells=8, m=16, kq=16, sample_size=400, seed=3
    )
    index = sim.ivfpq_encode(emb, cent, books)
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    ann = sim.ivfpq_topk(
        index, emb, queries, cent, books, k=10, nprobe=4, shortlist=100
    )
    exact = sim.brute_force_l2_topk(emb, queries, k=10)
    return sim.ann_recall_summary(
        exact, ann, "l2_dist", best_is_max=False, floor_pct=50
    )


def q_merge_into_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full conditional MERGE INTO (operators/merge.merge_into): one
    null-safe full-outer join resolves the complete Delta-style clause
    matrix — exercised here with all five clause types in one statement:

      MERGE INTO orders t USING changes s ON t.key = s.key
      WHEN MATCHED AND s.status='F' AND s.cents%2=0  THEN DELETE
      WHEN MATCHED                                   THEN UPDATE
           SET cents = t.cents + s.cents % 1000, status = 'M'
      WHEN NOT MATCHED AND s.cents % 3 != 1          THEN INSERT *
      WHEN NOT MATCHED BY SOURCE AND t.cents<1000000 THEN UPDATE
           SET status = 'S'
      WHEN NOT MATCHED BY SOURCE AND t.status='P'
           AND t.cents % 5 = 0                       THEN DELETE

    Clause order is semantic (first match wins per row category); the
    source is deterministic (%3-key repriced rows + %11-key shifted
    inserts). Prices travel as exact integer cents.
    """
    from m13_sparkstreaming_python_azure_spark.operators.merge import (
        MatchedDelete,
        MatchedUpdate,
        NotMatchedBySourceDelete,
        NotMatchedBySourceUpdate,
        NotMatchedInsert,
        merge_into,
    )

    target = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_orderstatus").alias("status"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    k = F.col("o_orderkey")
    source = (
        target.filter(k % 3 == 0)
        .withColumn("cents", F.col("cents") + k % 100)
        .unionByName(
            target.filter(k % 11 == 0).withColumn(
                "o_orderkey", k + 10_000_000
            )
        )
    )
    out = merge_into(
        target,
        source,
        ["o_orderkey"],
        [
            MatchedDelete("s.status = 'F' AND s.cents % 2 = 0"),
            MatchedUpdate(
                {"cents": "t.cents + s.cents % 1000", "status": "'M'"}
            ),
            NotMatchedInsert(condition="s.cents % 3 != 1"),
            NotMatchedBySourceUpdate(
                {"status": "'S'"}, condition="t.cents < 1000000"
            ),
            NotMatchedBySourceDelete(
                "t.status = 'P' AND t.cents % 5 = 0"
            ),
        ],
    )
    return out


def q_replace_where_backfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selective backfill via ``overwrite + replaceWhere``
    (sources/snapshots.replace_where — the Delta idiom for "recompute
    this slice"): orders land as mixed-status files plus a pure-P
    append, then the O slice is atomically replaced with a re-priced
    copy (cents·9/10 — exact integer math). Kept files carry over
    untouched, mixed files rewrite to their non-O survivors, and the
    inserted rows are validated against the predicate before commit.
    The oracle states the final table directly: non-O originals ∪
    discounted O rows."""
    import os
    import tempfile

    from m13_sparkstreaming_python_azure_spark.sources.snapshots import (
        append_snapshot,
        read_snapshot,
        replace_where,
        write_snapshot,
    )

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    root = tempfile.mkdtemp(prefix="replwhere-")
    table = os.path.join(root, "t")
    s = F.col("o_orderstatus")
    write_snapshot(orders.filter(s != "P").coalesce(4), table)  # mixed F/O
    append_snapshot(orders.filter(s == "P").coalesce(2), table)  # pure P
    repriced = orders.filter(s == "O").select(
        "o_orderkey",
        "o_orderstatus",
        F.floor((F.col("cents") * 9) / 10).cast("long").alias("cents"),
    )
    replace_where(repriced, table, "o_orderstatus = 'O'")
    return (
        read_snapshot(spark, table)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("cents").alias("total_cents"),
        )
    )


_REPLACE_WHERE_SQL = """
    WITH base AS (
        SELECT o_orderstatus,
               CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        FROM orders
    ), final AS (
        SELECT o_orderstatus, cents FROM base WHERE o_orderstatus <> 'O'
        UNION ALL
        SELECT o_orderstatus, (cents * 9) // 10 AS cents
        FROM base WHERE o_orderstatus = 'O'
    )
    SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(cents) AS BIGINT) AS total_cents
    FROM final GROUP BY o_orderstatus
"""


PIPELINE_QUERIES = {
    "replace_where_backfill": q_replace_where_backfill,
    "ppjoin_pairs": q_ppjoin_pairs,
    "containment_pairs": q_containment_pairs,
    "skew_profile": q_skew_profile,
    "mutual_information": q_mutual_information,
    "benford_digits": q_benford_digits,
    "kfold_assignment": q_kfold_assignment,
    "sequence_pattern_match": q_sequence_pattern_match,
    "passage_dedup": q_passage_dedup,
    "retrieval_eval": q_retrieval_eval,
    "jaro_winkler_pairs": q_jaro_winkler_pairs,
    "geo_radius_join": q_geo_radius_join,
    "pmi_phrases": q_pmi_phrases,
    "feature_hashing": q_feature_hashing,
    "link_prediction": q_link_prediction,
    "lexicon_sentiment": q_lexicon_sentiment,
    "ann_pq": q_ann_pq,
    "zonemap_pruned_scan": q_zonemap_pruned_scan,
    "bucketed_join_revenue": q_bucketed_join,
    "snapshot_vacuum": q_snapshot_vacuum,
    "bloom_point_lookup": q_bloom_point_lookup,
    "snapshot_restore": q_snapshot_restore,
    "bow_dedup": q_bow_dedup,
    "ann_ivfpq": q_ann_ivfpq,
}

_ANN_L2_SUMMARY_SQL = """
    WITH q AS (
        SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
        FROM embeddings WHERE vec_id < 10
    ), b AS (
        SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS bv
        FROM embeddings
    ), scored AS (
        SELECT q.query_id, b.neighbor_id,
               round(list_sum(list_transform(range(1, len(qv) + 1),
                     i -> (bv[i] - qv[i]) * (bv[i] - qv[i]))), 6) AS m
        FROM b CROSS JOIN q
    ), ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY query_id
            ORDER BY m ASC, neighbor_id ASC
        ) AS rank
        FROM scored
    )
    SELECT query_id,
           CAST(count(*) AS BIGINT) AS n_exact,
           CAST(sum(neighbor_id) AS BIGINT) AS sum_exact_ids,
           max(m) AS kth_l2_dist,
           TRUE AS recall_ok
    FROM ranked WHERE rank <= 10
    GROUP BY query_id
"""

PIPELINE_ORACLES = {
    # derived-invariant ANN oracles (VERDICT r9 #4): exact squared-L2
    # top-10 summaries in array SQL; recall_ok pinned as literal TRUE
    "ann_pq": _ANN_L2_SUMMARY_SQL,
    "ann_ivfpq": _ANN_L2_SUMMARY_SQL,
    "replace_where_backfill": _REPLACE_WHERE_SQL,
    "ppjoin_pairs": f"""
        WITH {_GRAMS_CTE}
        SELECT id_a, id_b, n_inter,
               sa.n + sb.n - n_inter AS n_union,
               CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter)
                   AS jaccard_sim
        FROM inter
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter)
                  >= CAST(0.6 AS DOUBLE)
    """,
    "containment_pairs": f"""
        WITH {_GRAMS_CTE}
        SELECT id_a, id_b, n_inter,
               CAST(n_inter AS DOUBLE) / least(sa.n, sb.n) AS containment,
               CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter)
                   AS jaccard_sim
        FROM inter
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE CAST(n_inter AS DOUBLE) / least(sa.n, sb.n)
                  >= CAST(0.6 AS DOUBLE)
    """,
    "skew_profile": """
        WITH src AS (
            SELECT 'orders.o_custkey' AS key_label, CAST(o_custkey AS VARCHAR) AS k FROM orders
            UNION ALL
            SELECT 'lineitem.l_partkey', CAST(l_partkey AS VARCHAR) FROM lineitem
            UNION ALL
            SELECT 'events.user_id', CAST(user_id AS VARCHAR) FROM events
        ), counts AS (
            SELECT key_label, k, count(*) AS c FROM src GROUP BY key_label, k
        ), totals AS (
            SELECT key_label, CAST(sum(c) AS BIGINT) AS n_rows, count(*) AS n_keys,
                   max(c) AS top1
            FROM counts GROUP BY key_label
        ), ranked AS (
            SELECT key_label, c,
                   row_number() OVER (PARTITION BY key_label ORDER BY c DESC, k ASC) AS rd,
                   row_number() OVER (PARTITION BY key_label ORDER BY c ASC, k ASC) AS ra
            FROM counts
        ), top10 AS (
            SELECT key_label, sum(c) AS top10 FROM ranked WHERE rd <= 10
            GROUP BY key_label
        ), gini AS (
            SELECT key_label, sum(ra * c) AS s_ic FROM ranked GROUP BY key_label
        ), ent AS (
            SELECT counts.key_label,
                   sum(CAST(floor((c / n_rows) * ln(c / n_rows) * 1e9
                                  + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS s_ent
            FROM counts JOIN totals ON counts.key_label = totals.key_label
            GROUP BY counts.key_label
        )
        SELECT t.key_label, t.n_rows, t.n_keys,
               CAST(t.top1 AS DOUBLE) / t.n_rows AS top1_share,
               CAST(top10.top10 AS DOUBLE) / t.n_rows AS top10_share,
               -CAST(ent.s_ent AS DOUBLE) / 1e9 AS entropy_nats,
               floor((-CAST(ent.s_ent AS DOUBLE) / 1e9)
                     / ln(CAST(t.n_keys AS DOUBLE)) * 1e6
                     + CAST(0.5 AS DOUBLE)) / 1e6 AS norm_entropy,
               CAST(2 AS DOUBLE) * gini.s_ic / (t.n_keys * t.n_rows)
                   - (t.n_keys + CAST(1 AS DOUBLE)) / t.n_keys AS gini
        FROM totals t
        JOIN top10 USING (key_label)
        JOIN gini USING (key_label)
        JOIN ent USING (key_label)
    """,
    "mutual_information": """
        WITH cells AS (
            SELECT c_mktsegment AS a, c_nationkey AS b, count(*) AS n
            FROM customer GROUP BY 1, 2
        ), m AS (
            SELECT a, b, n,
                   sum(n) OVER (PARTITION BY a) AS na,
                   sum(n) OVER (PARTITION BY b) AS nb,
                   sum(n) OVER () AS nn
            FROM cells
        ), mi AS (
            SELECT CAST(max(nn) AS BIGINT) AS n_rows,
                   sum(CAST(floor((n / nn)
                       * ln((n * nn) / (CAST(na AS DOUBLE) * nb)) * 1e9
                       + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS s_mi
            FROM m
        ), ha AS (
            SELECT sum(CAST(floor((na / nn) * ln(na / nn) * 1e9
                                  + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS s_ha
            FROM (SELECT DISTINCT a, na, nn FROM m)
        ), hb AS (
            SELECT sum(CAST(floor((nb / nn) * ln(nb / nn) * 1e9
                                  + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS s_hb
            FROM (SELECT DISTINCT b, nb, nn FROM m)
        )
        SELECT n_rows,
               CAST(s_mi AS DOUBLE) / 1e9 AS mi_nats,
               -CAST(s_ha AS DOUBLE) / 1e9 AS h_a,
               -CAST(s_hb AS DOUBLE) / 1e9 AS h_b,
               floor((CAST(s_mi AS DOUBLE) / 1e9)
                     / sqrt((CAST(s_ha AS DOUBLE) / 1e9)
                            * (CAST(s_hb AS DOUBLE) / 1e9)) * 1e6
                     + CAST(0.5 AS DOUBLE)) / 1e6 AS nmi
        FROM mi CROSS JOIN ha CROSS JOIN hb
    """,
    "benford_digits": """
        WITH d AS (
            SELECT CAST(substring(CAST(CAST(floor(o_totalprice) AS BIGINT)
                                       AS VARCHAR), 1, 1) AS INT) AS digit
            FROM orders
        ), per AS (
            SELECT digit, count(*) AS n_orders FROM d GROUP BY digit
        ), tot AS (SELECT sum(n_orders) AS n_total FROM per)
        SELECT digit, n_orders,
               CAST(n_orders AS DOUBLE) / n_total AS obs_share,
               floor(ln(CAST(1 AS DOUBLE) + CAST(1 AS DOUBLE) / digit)
                     / ln(CAST(10 AS DOUBLE)) * 1e6
                     + CAST(0.5 AS DOUBLE)) / 1e6 AS benford_share,
               floor((CAST(n_orders AS DOUBLE) / n_total
                      - floor(ln(CAST(1 AS DOUBLE) + CAST(1 AS DOUBLE) / digit)
                              / ln(CAST(10 AS DOUBLE)) * 1e6
                              + CAST(0.5 AS DOUBLE)) / 1e6) * 1e6
                     + CAST(0.5 AS DOUBLE)) / 1e6 AS deviation
        FROM per CROSS JOIN tot
    """,
    "kfold_assignment": """
        SELECT doc_id, lang, source,
               (row_number() OVER (
                    PARTITION BY lang, source
                    ORDER BY md5('kf:' || CAST(doc_id AS VARCHAR)), doc_id
                ) - 1) % 5 AS fold
        FROM documents
    """,
    "sequence_pattern_match": """
        WITH e AS (
            SELECT user_id, ts, event_id,
                   CASE event_type
                       WHEN 'signup' THEN 's' WHEN 'view' THEN 'v'
                       WHEN 'click' THEN 'c' WHEN 'purchase' THEN 'p'
                       ELSE 'e' END AS ch
            FROM events
        ), seqs AS (
            SELECT user_id,
                   string_agg(ch, '' ORDER BY ts, event_id) AS seq
            FROM e GROUP BY user_id
        )
        SELECT user_id, length(seq) AS seq_len,
               CAST(regexp_matches(seq, 's.*v[^c]*p') AS INT)
                   AS matched_no_click_funnel,
               len(regexp_extract_all(seq, 'vp'))
                   AS n_direct_view_purchase,
               len(regexp_extract_all(seq, 'e')) AS n_errors
        FROM seqs
    """,
    "passage_dedup": f"""
        WITH corpus AS (
            SELECT doc_id, text FROM documents
            UNION ALL
            SELECT doc_id + 100000, text FROM documents WHERE doc_id % 7 = 0
        ), toks AS (
            SELECT doc_id, {_TOKS_SQL} AS t FROM corpus
        ), passages AS (
            SELECT doc_id, i - 1 AS idx,
                   array_to_string(t[(i-1)*20+1:(i-1)*20+20], ' ') AS passage
            FROM toks, unnest(range(1, CAST(ceil(len(t) / 20.0) AS BIGINT) + 1)) AS u(i)
        ), flagged AS (
            SELECT doc_id,
                   CAST(row_number() OVER (
                       PARTITION BY passage ORDER BY doc_id, idx
                   ) > 1 AS INT) AS is_dup
            FROM passages
        )
        SELECT doc_id, count(*) AS n_passages,
               CAST(sum(is_dup) AS BIGINT) AS n_dup_passages,
               CAST(sum(is_dup) AS DOUBLE) / count(*) AS dup_frac
        FROM flagged GROUP BY doc_id
    """,
    "retrieval_eval": f"""
        WITH toks AS (
            SELECT doc_id, {_TOKS_SQL} AS t FROM documents
        ), qterms AS (
            SELECT DISTINCT query_id, term FROM (
                SELECT doc_id AS query_id, unnest([t[1], t[4], t[7]]) AS term
                FROM toks WHERE doc_id < 10
            )
        ), posting AS (
            SELECT doc_id, len(t) AS dl, unnest(t) AS term FROM toks
        ), matched AS (
            SELECT qt.query_id, p.doc_id, p.dl, p.term
            FROM posting p JOIN qterms qt USING (term)
        ), tf AS (
            SELECT query_id, doc_id, dl, term, count(*) AS tf
            FROM matched GROUP BY query_id, doc_id, dl, term
        ), stats AS (
            SELECT count(*) AS n_docs, avg(len(t)) AS avgdl FROM toks
        ), dft AS (
            SELECT term, count(*) AS df
            FROM (SELECT DISTINCT term, doc_id FROM matched) GROUP BY term
        ), contrib AS (
            SELECT tf.query_id, tf.doc_id,
                   ln(CAST(1 AS DOUBLE)
                      + (stats.n_docs - dft.df + CAST(0.5 AS DOUBLE))
                        / (dft.df + CAST(0.5 AS DOUBLE)))
                   * (tf.tf * CAST(2.2 AS DOUBLE))
                   / (tf.tf + CAST(1.2 AS DOUBLE)
                       * (CAST(0.25 AS DOUBLE)
                          + CAST(0.75 AS DOUBLE) * tf.dl / stats.avgdl))
                       AS c
            FROM tf JOIN dft USING (term) CROSS JOIN stats
        ), scores AS (
            SELECT query_id, doc_id,
                   floor(sum(c) * 1e4 + CAST(0.5 AS DOUBLE)) / 1e4 AS bm25
            FROM contrib GROUP BY query_id, doc_id
        ), top AS (
            SELECT * FROM (
                SELECT query_id, doc_id, bm25,
                       row_number() OVER (
                           PARTITION BY query_id ORDER BY bm25 DESC, doc_id
                       ) AS rnk
                FROM scores WHERE doc_id <> query_id
            ) WHERE rnk <= 10
        ), rel AS (
            SELECT t.query_id, t.rnk,
                   CAST(ql.label = dl.label AS INT) AS rel
            FROM top t
            JOIN embeddings ql ON ql.vec_id = t.query_id
            JOIN embeddings dl ON dl.vec_id = t.doc_id
        ), per AS (
            SELECT query_id, count(*) AS n_ret,
                   CAST(sum(rel) AS BIGINT) AS n_rel_at10,
                   min(CASE WHEN rel = 1 THEN rnk END) AS fr,
                   CAST(sum(CAST(floor(rel / log2(rnk + CAST(1 AS DOUBLE))
                                       * 1e9 + CAST(0.5 AS DOUBLE))
                                 AS BIGINT)) AS BIGINT) AS s_dcg
            FROM rel GROUP BY query_id
        ), relcnt AS (
            SELECT ql.vec_id AS query_id, count(*) AS n_relevant
            FROM embeddings ql
            JOIN embeddings dl
              ON dl.label = ql.label AND dl.vec_id <> ql.vec_id
            WHERE ql.vec_id < 10 GROUP BY 1
        ), g AS (
            SELECT i,
                   CAST(floor(CAST(1 AS DOUBLE) / log2(i + CAST(1 AS DOUBLE))
                              * 1e9 + CAST(0.5 AS DOUBLE)) AS BIGINT) AS w_i
            FROM unnest(range(1, 11)) AS u(i)
        ), cum AS (
            SELECT i, CAST(sum(w_i) OVER (ORDER BY i) AS BIGINT) AS idcg
            FROM g
        )
        SELECT p.query_id, p.n_ret, p.n_rel_at10,
               p.n_rel_at10 / CAST(10 AS DOUBLE) AS precision_at10,
               CASE WHEN p.fr IS NULL THEN CAST(0 AS DOUBLE)
                    ELSE CAST(1 AS DOUBLE) / p.fr END AS mrr,
               CASE WHEN c.idcg > 0
                    THEN CAST(p.s_dcg AS DOUBLE) / CAST(c.idcg AS DOUBLE)
                    ELSE CAST(0 AS DOUBLE) END AS ndcg_at10
        FROM per p
        JOIN relcnt rc USING (query_id)
        JOIN cum c ON c.i = least(rc.n_relevant, 10)
    """,
    "jaro_winkler_pairs": """
        WITH n AS (SELECT DISTINCT p_name FROM part),
        t AS (
            SELECT p_name, string_split(p_name, ' ')[2] AS noun FROM n
        )
        SELECT a.p_name AS name_a, b.p_name AS name_b,
               floor(jaro_winkler_similarity(a.p_name, b.p_name) * 1e6
                     + CAST(0.5 AS DOUBLE)) / 1e6 AS jw
        FROM t a JOIN t b ON a.noun = b.noun AND a.p_name < b.p_name
        WHERE floor(jaro_winkler_similarity(a.p_name, b.p_name) * 1e6
                    + CAST(0.5 AS DOUBLE)) / 1e6 >= CAST(0.85 AS DOUBLE)
    """,
    "geo_radius_join": """
        WITH sup AS (
            SELECT s_suppkey,
                   ('0x' || substring(md5('slat:' || CAST(s_suppkey AS VARCHAR)), 1, 8))::BIGINT
                       / CAST(4294967296 AS DOUBLE) * CAST(120 AS DOUBLE)
                       - CAST(60 AS DOUBLE) AS s_lat,
                   ('0x' || substring(md5('slon:' || CAST(s_suppkey AS VARCHAR)), 1, 8))::BIGINT
                       / CAST(4294967296 AS DOUBLE) * CAST(360 AS DOUBLE)
                       - CAST(180 AS DOUBLE) AS s_lon
            FROM supplier
        ), cust AS (
            SELECT c_custkey,
                   ('0x' || substring(md5('clat:' || CAST(c_custkey AS VARCHAR)), 1, 8))::BIGINT
                       / CAST(4294967296 AS DOUBLE) * CAST(120 AS DOUBLE)
                       - CAST(60 AS DOUBLE) AS c_lat,
                   ('0x' || substring(md5('clon:' || CAST(c_custkey AS VARCHAR)), 1, 8))::BIGINT
                       / CAST(4294967296 AS DOUBLE) * CAST(360 AS DOUBLE)
                       - CAST(180 AS DOUBLE) AS c_lon
            FROM customer
        ), d AS (
            SELECT s_suppkey, c_custkey,
                   floor(CAST(12742 AS DOUBLE) * asin(sqrt(
                       sin((c_lat - s_lat) * (pi() / CAST(180 AS DOUBLE)) / 2)
                       * sin((c_lat - s_lat) * (pi() / CAST(180 AS DOUBLE)) / 2)
                       + cos(s_lat * (pi() / CAST(180 AS DOUBLE)))
                         * cos(c_lat * (pi() / CAST(180 AS DOUBLE)))
                         * sin((c_lon - s_lon) * (pi() / CAST(180 AS DOUBLE)) / 2)
                         * sin((c_lon - s_lon) * (pi() / CAST(180 AS DOUBLE)) / 2)
                   )) * 1e6 + CAST(0.5 AS DOUBLE)) / 1e6 AS dist_km
            FROM sup CROSS JOIN cust
        )
        SELECT s_suppkey, c_custkey, dist_km FROM d
        WHERE dist_km < CAST(300 AS DOUBLE)
    """,
    "pmi_phrases": f"""
        WITH d AS (
            SELECT {_TOKS_SQL} AS t FROM documents
        ), arr AS (
            SELECT t FROM d WHERE len(t) >= 2
        ), uni AS (
            SELECT w, count(*) AS c_w FROM (
                SELECT unnest(t) AS w FROM arr
            ) GROUP BY w
        ), nu AS (SELECT CAST(sum(c_w) AS BIGINT) AS n_uni FROM uni),
        bi AS (
            SELECT unnest(list_transform(range(1, len(t)),
                          i -> struct_pack(x := t[i], y := t[i+1]))) AS b
            FROM arr
        ), cxy AS (
            SELECT b.x AS x, b.y AS y, count(*) AS n_xy FROM bi GROUP BY 1, 2
        ), nb AS (SELECT CAST(sum(n_xy) AS BIGINT) AS n_bi FROM cxy)
        SELECT x, y, n_xy,
               floor(ln((n_xy / n_bi)
                        / ((ux.c_w / nu.n_uni) * (uy.c_w / nu.n_uni)))
                     * 1e6 + CAST(0.5 AS DOUBLE)) / 1e6 AS pmi
        FROM cxy
        JOIN uni ux ON ux.w = cxy.x
        JOIN uni uy ON uy.w = cxy.y
        CROSS JOIN nu CROSS JOIN nb
        WHERE n_xy >= 5
    """,
    "feature_hashing": f"""
        WITH toks AS (
            SELECT doc_id, unnest({_TOKS_SQL}) AS term FROM documents
        )
        SELECT doc_id,
               ('0x' || substring(md5('fh:' || term), 1, 8))::BIGINT % 256
                   AS feature_idx,
               CAST(sum(CASE WHEN ('0x' || substring(md5('fs:' || term), 1, 8))::BIGINT % 2 = 0
                        THEN 1 ELSE -1 END) AS BIGINT) AS value,
               count(*) AS n_terms
        FROM toks GROUP BY doc_id, feature_idx
    """,
    "link_prediction": """
        WITH ks AS (
            SELECT CAST(c_custkey AS BIGINT) AS k FROM customer
        ), raw AS (
            SELECT k AS src, k // 2 AS dst FROM ks WHERE k >= 2
            UNION ALL
            SELECT k, k - 1 FROM ks WHERE k >= 1
        ), sym AS (
            SELECT DISTINCT src, dst FROM (
                SELECT src, dst FROM raw UNION ALL SELECT dst, src FROM raw
            ) WHERE src <> dst
        ), deg AS (
            SELECT src AS z, count(*) AS deg FROM sym GROUP BY src
        ), centers AS (
            SELECT z, deg FROM deg WHERE deg <= 64
        ), spokes AS (
            SELECT s.dst AS z, s.src AS e, c.deg
            FROM sym s JOIN centers c ON c.z = s.dst
        ), pairs AS (
            SELECT l.e AS node_a, r.e AS node_b,
                   count(*) AS common_neighbors,
                   CAST(sum(CAST(floor(CAST(1 AS DOUBLE) / ln(CAST(l.deg AS DOUBLE))
                                       * 1e9 + CAST(0.5 AS DOUBLE)) AS BIGINT))
                        AS BIGINT) AS s_aa
            FROM spokes l JOIN spokes r ON l.z = r.z AND l.e < r.e
            GROUP BY l.e, r.e
        )
        SELECT node_a, node_b, common_neighbors,
               CAST(s_aa AS DOUBLE) / 1e9 AS adamic_adar
        FROM pairs p
        WHERE common_neighbors >= 2
          AND NOT EXISTS (
              SELECT 1 FROM sym s
              WHERE s.src = p.node_a AND s.dst = p.node_b
          )
    """,
    "lexicon_sentiment": f"""
        WITH lex(term, weight) AS (
            VALUES ('fast', 2), ('slow', -2), ('big', 1), ('small', -1),
                   ('merge', 1)
        ), toks AS (
            SELECT doc_id, unnest({_TOKS_SQL}) AS term FROM documents
        )
        SELECT doc_id, count(*) AS n_matched,
               CAST(sum(weight) AS BIGINT) AS sentiment_score,
               CAST(sign(CAST(sum(weight) AS BIGINT)) AS INT) AS label
        FROM toks JOIN lex USING (term)
        GROUP BY doc_id
    """,
    "snapshot_vacuum": """
        SELECT o_orderstatus,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2)
                    AS DOUBLE) AS revenue
        FROM orders WHERE o_orderstatus IN ('F', 'O')
        GROUP BY o_orderstatus
    """,
    "bucketed_join_revenue": """
        SELECT o.o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_items,
               CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                                   AS DECIMAL(18,6))), 2) AS DOUBLE)
                   AS revenue
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderpriority
    """,
    "snapshot_restore": """
        SELECT o_orderstatus, count(*) AS n_orders,
               CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2)
                    AS DOUBLE) AS revenue
        FROM orders GROUP BY o_orderstatus
    """,
    "bloom_point_lookup": """
        SELECT o_orderkey, o_custkey,
               CAST(round(CAST(o_totalprice AS DECIMAL(18,6)), 2) AS DOUBLE)
                   AS total_price
        FROM orders
        WHERE o_orderkey % 2999 = 0
    """,
    "zonemap_pruned_scan": """
        SELECT o_orderstatus, count(*) AS n_orders,
               CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2)
                    AS DOUBLE) AS revenue
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <= TIMESTAMP '1996-12-31'
        GROUP BY o_orderstatus
    """,
    "bow_dedup": r"""
        WITH corpus AS (
            SELECT doc_id, text FROM documents
            UNION ALL
            SELECT doc_id + 100000,
                   array_to_string(list_reverse(
                       string_split_regex(text, '\s+')), ' ')
            FROM documents WHERE doc_id % 5 = 0
        ), fps AS (
            SELECT doc_id,
                   md5(array_to_string(list_sort(
                       list_filter(string_split_regex(lower(text), '\s+'),
                                   x -> x <> '')), ' ')) AS fp
            FROM corpus
        )
        SELECT doc_id,
               min(doc_id) OVER (PARTITION BY fp) AS keep_id,
               count(*) OVER (PARTITION BY fp) AS n_copies,
               CAST(doc_id <> min(doc_id) OVER (PARTITION BY fp) AS INT)
                   AS is_reordered_dup
        FROM fps
    """,
}
