"""Physical-plan audit: verify the scale-critical plan properties of every
registered query and write PLANS.md.

Checked invariants (the things that break silently at 100 TB):
- filter pushdown reaches the parquet scan (PushedFilters non-empty where a
  selective filter exists);
- column pruning (ReadSchema strictly narrower than the table when the
  query projects a subset);
- dimension joins broadcast (BroadcastHashJoin) instead of shuffling the
  fact side;
- no accidental CartesianProduct (the brute-force ANN cross join is
  declared, broadcast, and intentional);
- whole-stage codegen coverage on the JVM-expression paths.

Additionally (VERDICT r1 #8), the five most expensive queries are
re-audited against a 10×-replicated fixture: AQE's broadcast-vs-shuffle
and skew decisions depend on observed sizes, so an invariant that holds at
sf0.01 can silently flip as stats grow — asserting at both sizes catches
broadcast choices that only worked because the fixture was small.

Usage: python tools/plan_audit.py [sf_dir] [--no-scale] — writes PLANS.md
at repo root.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from m13_sparkstreaming_python_azure_spark.session import get_spark

# queries where a pushed parquet filter is part of the design
EXPECT_PUSHDOWN = {
    "pricing_summary",
    "semi_join_building",
    "in_list_filter",
    "window_lag_lead",
    "shipping_priority",
    "returned_items",
    "local_supplier_volume",
    "nation_market_share",
    "volume_shipping",
    "promo_bracket_revenue",
    "ann_bruteforce",
    "ann_lsh",
    "ann_ivf",
    "order_priority_count",
    "discount_revenue_forecast",
    "product_type_profit",
    "customer_order_distribution",
    "promo_revenue_ratio",
    "top_supplier_revenue",
    "supplier_part_variety",
    "small_quantity_revenue",
    "waiting_suppliers",
    "idle_customer_balance",
}
# top-k must plan as TakeOrderedAndProject (heap per partition + merge),
# never a global range-partitioned sort of the full table
EXPECT_TAKE_ORDERED = {"topk_orders", "best_day_top10", "weighted_sample_docs"}
# per-group top-k must plan the WindowGroupLimit rewrite (local top-k per
# map task before the window shuffle), not a full window sort
EXPECT_WINDOW_GROUP_LIMIT = {"frequent_users", "sample_per_source"}
# queries whose joins should broadcast a small side
EXPECT_BROADCAST = {
    "revenue_by_nation",
    "semi_join_building",
    "anti_join_no_recent_orders",
    "shipping_priority",
    "returned_items",
    "local_supplier_volume",
    "nation_market_share",
    "volume_shipping",
    "promo_bracket_revenue",
    "ann_bruteforce",
    "ann_lsh",
    "ann_ivf",
    "hard_negative_mining",
    "order_priority_count",
    "product_type_profit",
    "top_supplier_revenue",
    "supplier_part_variety",
    "waiting_suppliers",
    "idle_customer_balance",
    "mixture_resample",
    "bm25_search",
    "scd2_pit_join",  # SCD2 dim versions broadcast under the fact scan
}
# Unpartitioned WindowExec moves the WHOLE input to one task — the class
# of plan that dies at 100 TB (VERDICT r6 #1/#2: rfm_segments and
# price_decile_stats were rebuilt on operators.window.exact_ntile for
# exactly this reason). The invariant below FAILS any query that plans an
# unpartitioned Window unless it is whitelisted here with the reason its
# windowed keyspace stays bounded as facts grow. Two legitimate classes:
#   (a) distinct-value / reduced keyspaces: the window runs AFTER a
#       groupBy that collapses facts to distinct values, days, vocab
#       terms, bins, or contingency cells — cardinality-bounded, not
#       row-bounded;
#   (b) candidate sets already cut to a constant (top-k lists, probe
#       results, per-query ranks).
UNPARTITIONED_WINDOW_OK = {
    # (a) distinct-value / reduced keyspaces
    # roc_auc / ks_test / kruskal_wallis / auc_by_segment left the
    # whitelist in r10 (VERDICT r9 #1): their "bounded DISTINCT value"
    # claims were fixture artifacts — on continuous scores distinct ≈ n
    # — so their cumulative CDFs/rank sums were rebuilt on operators/
    # window.global_cumsum (distributed quantile-bucket running sums);
    # their plans now contain ZERO unpartitioned windows, measured flat
    # on the continuous-score probe below.
    "psi_drift": "windows over fixed-width n_chars bins, hard-capped at"
    " _PSI_MAX_BIN+1 cells by least() BEFORE the groupBy — bin count is"
    " input-independent (verified by the continuous probe)",
    "mann_kendall_sen": "ranks over daily series (bounded by days)",
    "kaplan_meier": "event-table window over distinct durations",
    "log_rank_test": "event-table window over distinct durations",
    "woe_iv": "window over category x class contingency cells",
    "chi_square_independence": "contingency-cell windows",
    "mutual_information": "contingency-cell windows",
    "ece_calibration": "ONE window over the <= 10 calibration bins"
    " (bin = millis//100, millis in [0,999] by construction); the"
    " distinct-score cumsum moved to global_cumsum in r10",
    "ccf_lag": "daily-series windows (bounded by days)",
    "acf_daily_events": "daily-series windows (bounded by days)",
    "seasonal_decompose": "daily-series windows (bounded by days)",
    "zipf_slope": "window over vocab ranks (vocab-bounded)",
    "oov_rate": "vocab rank window (top-K vocab cut)",
    "textrank_keywords": "window over keyword-graph nodes (vocab)",
    "skyline_orders": "running min over the grid-cell summary table"
    " (bounded at n_cells=256 rows regardless of data; r9 grid prune)",
    "topn_with_other": "rank over group aggregates (group-bounded)",
    "negative_sampling": "cumulative window over the VOCAB weight table",
    # (b) constant-size candidate sets
    "retrieval_eval": "per-query rank lists (k-bounded)",
    "ql_dirichlet_search": "final top-n cut over scored candidates",
    "bm25_prf_search": "per-pass PRF windows INSIDE the checkpointed"
    " rounds (surfaced by the r10 checkpoint-capture audit): expansion-"
    "term rank over the terms of the k seed docs + final top-n cut over"
    " posting-probed candidates — both candidate-bounded, the"
    " ql_dirichlet_search class",
    # sorted_neighborhood_pairs left the whitelist in r8: rebuilt on
    # operators/linkage.sorted_neighborhood (global_rank + dense-rank
    # equi-join) — its plan no longer contains any unpartitioned Window.
    # 19 further entries left in r8 when the counter's 2-bracket-group
    # heuristic was fixed: they only ever had PARTITIONED-but-unordered
    # windows, which the old count misread as unpartitioned (verified
    # against executed-plan partitionSpec() by the measured walker).
}

# Whitelisted entries whose windowed set is a SELECTION of the input
# (a filtered tail) rather than a cardinality-bounded keyspace: the
# measured-bound audit below reports their growth but does not fail
# them — each documents why the selection stays small in practice and
# what the 100 TB path is.
UNPARTITIONED_WINDOW_GROWS_WITH_SELECTION = {
    # EMPTY as of r9: skyline_orders left when skyline_2d gained the
    # lossless grid-prune pre-pass — its only unpartitioned window now
    # runs over the <= n_cells cell-summary table (see operators/
    # skyline.py docstring), measured flat at 10x.
}
# intentional cross join: ann probes are broadcast against the corpus;
# idle_customer_balance broadcasts a single-row stats aggregate (the
# decorrelated scalar avg subquery) under every customer row; bm25's
# N/avgdl corpus stats are the same single-row broadcast shape
ALLOW_CARTESIAN = {
    "ann_bruteforce",
    "hard_negative_mining",  # bounded anchor-set broadcast (ann shape)
    "seasonal_decompose",    # single-row seasonal-mean scalar broadcast
    "idle_customer_balance",
    "important_stock",
    "bm25_search",
    "mixture_resample",  # single-row n_domains scalar broadcast
    "temperature_resample",  # single-row weight-sum scalar broadcast
    "perplexity_scores",  # single-row N/V model-stats scalar broadcast
    "theta_sketch_audiences",  # two single-row sketch scalars cross-joined
    "chi_square_independence",  # single-row moment × single-row dims scalars
    "bigram_perplexity",  # single-row N/V model-stats scalar broadcast
    "hybrid_rrf_search",  # single-row query-vector broadcast (+ bm25 stats)
    "skew_profile",       # single-row totals/top10/gini/entropy scalars
    "mutual_information",  # single-row marginal-entropy scalars
    "benford_digits",     # single-row total-count scalar broadcast
    "retrieval_eval",     # 10-row IDCG lookup joined on least(R,10)=i
    "pmi_phrases",        # single-row N_uni/N_bi scalar broadcasts
    "kaplan_meier",       # single-row max_day horizon scalar broadcast
    "kn_perplexity",      # single-row N1+(··) continuation-total scalar
    "log_rank_test",      # single-row max_day horizon scalar broadcast
    "rfm_segments",       # single-row max_day horizon scalar broadcast
    "acf_daily_events",   # single-row Σz² denominator scalar broadcast
    "cv_regression",      # single-row total-sufficient-stats scalar
    "conformal_intervals",  # single-row fit + 2-row radii scalar broadcasts
    "huber_regression",   # single-row IRLS fit scalar broadcast per pass
    "lsh_recall_eval",    # three single-row count scalars cross-joined
    "logistic_gd",        # single-row GD weight-row scalar broadcast per step
    "lad_regression",     # single-row IRLS fit scalar broadcast per pass
    "tfidf_cosine_pairs",  # single-row corpus-N scalar broadcast
    "jm_trigram_perplexity",  # single-row N_tot scalar broadcast
    "source_jsd",         # vocab × n_tot scalar broadcasts onto the source grid
    "kruskal_wallis",     # single-row grand-mean/tie scalar broadcasts
    "kendall_tau",        # day-grain (~30-row) broadcast pairwork + scalars
    "mann_kendall_sen",   # day-grain broadcast pairwork + scalar totals
    # round-6 additions
    "nb_domain_classifier",  # vocab × classes smoothing grid + single-row
                             # prior scalars (bounded class count)
    "bm25_prf_search",    # single-row corpus-stats scalar broadcast per pass
    "ql_dirichlet_search",  # single-row |C| scalar; candidates × query terms
    "ccf_lag",            # single-row Σz² denominator scalar broadcast
    "quantile_regression_p90",  # single-row IRLS fit scalar per pass
    "binary_ann_search",  # 10-probe bounded word-table broadcast (ann shape)
    "hits_scores",        # per-round single-row L1-total scalar broadcasts
    "info_gain_features",  # single-row base-entropy scalar broadcast
    "random_projection",  # explode, not cartesian (listed defensively: the
                          # dims explode can plan as a 16-row broadcast NLJ)
    "domain_mixture_weights",  # single-row base/total scalar broadcasts
    "personalized_pagerank",   # broadcast seed vector full-outer per round
    "embedding_isotropy",      # (none expected; defensive)
    "cluster_purity_nmi",      # single-row MI/entropy/purity scalars
    "unseen_mass_good_turing",  # (none expected; defensive)
    "negative_sampling",  # interval probe of the broadcast cum-weight
                          # vocab table (alias-table shape): non-equi →
                          # BroadcastNestedLoopJoin over a bounded side
    "price_decile_stats",  # exact_ntile offsets: P-row triangle join +
                           # single-row total broadcast (both bounded by
                           # partition count, not data)
    "rfm_segments",        # same exact_ntile shape ×3 quintiles
    # r10: global_cumsum rewires (VERDICT r9 #1) — the same P-row offset
    # triangle join + single-row grand-total scalar broadcast shape
    "roc_auc",
    "ks_test",
    "ece_calibration",
    "auc_by_segment",
    "kruskal_wallis",
    # r10: ann_recall_summary gates (VERDICT r9 #4) — exact brute-force
    # baseline (declared broadcast cross join, ann_bruteforce shape) +
    # single-row recall-flag scalar broadcast
    "ann_ivf",
    "ann_pq",
    "ann_ivfpq",
    "streaming_ann_index",
    # r10: PCA invariant gates — single-row flag scalar broadcasts
    "pca_embedding_projection",
    "pca_explained_variance",
    # r10: BPE segmentation audit — single-row roundtrip-flag broadcast
    "bpe_token_counts",
    "record_linkage",      # global_rank P-row offset triangle join
    "sorted_neighborhood_pairs",  # same global_rank shape
    "null_semantics",      # global_rank triangle join (r8 rewire)
    "conversion_latency",  # global_rank triangle join (r8 rewire)
    "streaming_holt_level",  # 7-row forecast-horizon broadcast cross join
    "matryoshka_recall",   # single-row query-vector broadcast (ann shape)
    "snapshot_commit_group",  # two single-row census scalars cross-joined
    "skyline_orders",      # single-row [lo,hi] x-range scalar broadcast
                           # under the distinct-x set (grid binning)
    "kruskal_wallis",      # single-row N+1 scalar broadcast (r8 rewire)
}


def _walk_plan(node):
    """Yield every physical node in an EXECUTED plan tree, descending
    through the AQE wrappers (AdaptiveSparkPlanExec → executedPlan,
    QueryStageExec → plan, ReusedExchange/Subquery → child)."""
    cls = node.getClass().getSimpleName()
    yield node, cls
    if "AdaptiveSparkPlan" in cls:
        yield from _walk_plan(node.executedPlan())
        return
    if "QueryStage" in cls:
        yield from _walk_plan(node.plan())
        return
    if cls.startswith("Reused"):
        yield from _walk_plan(node.child())
        return
    ch = node.children()
    for i in range(ch.size()):
        yield from _walk_plan(ch.apply(i))


_ROW_METRICS = ("numOutputRows", "recordsRead", "shuffleRecordsWritten")


def _rows_out(node) -> int | None:
    """Best-effort output row count of an executed physical node: the
    first row metric found on the node or its nearest descendant
    (WindowExec itself only exposes spillSize; its Sort child exposes
    nothing — the exchange/scan below does)."""
    for n, _cls in _walk_plan(node):
        m = n.metrics()
        for key in _ROW_METRICS:
            if m.contains(key):
                return int(m.apply(key).value())
    return None


def unpartitioned_window_inputs(df) -> list[int]:
    """Measured row counts entering each unpartitioned Window node of an
    EXECUTED plan (ascending). -1 = no row metric found below the node."""
    out = []
    for node, cls in _walk_plan(df._jdf.queryExecution().executedPlan()):
        if cls == "WindowExec" and node.partitionSpec().size() == 0:
            v = _rows_out(node.children().apply(0))
            out.append(-1 if v is None else v)
    return sorted(out)


def formatted_plan(df) -> str:
    jvm = df.sparkSession._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def unpartitioned_windows(plan: str) -> int:
    """Count Window nodes with NO partition spec. In formatted explain a
    Window node's Arguments print the non-empty specs as bracket groups:

    - ``[funcs], [partition], [order]`` (3 groups) — partitioned+ordered;
    - ``[funcs], [partition]``          (2 groups, no sort direction) —
      partitioned, unordered;
    - ``[funcs], [order]``              (2 groups, ``ASC``/``DESC`` in
      the last) — UNPARTITIONED, ordered (the single-task sort);
    - ``[funcs]``                       (1 group) — UNPARTITIONED whole-
      table frame (also single-task).

    r8 fix: the original count-only heuristic flagged every 2-group
    window, misclassifying partitioned-but-unordered windows (min/count
    OVER (PARTITION BY k)) as unpartitioned — a third of the whitelist
    existed to appease that false positive. Disambiguate on the sort
    direction tokens, verified against executed-plan ``partitionSpec()``
    by the measured-bounds walker."""
    hits = 0
    for m in re.finditer(
        r"\(\d+\) Window\n(?:[^\n]*\n)*?Arguments: ([^\n]*)", plan
    ):
        args = m.group(1)
        groups = args.count("], [") + 1
        if groups >= 3:
            continue
        if groups == 1:
            hits += 1
            continue
        last = args.rsplit("], [", 1)[-1]
        if " ASC" in last or " DESC" in last:
            hits += 1
    return hits


def audit_one(name: str, df) -> tuple[list[str], str]:
    plan = formatted_plan(df)
    problems: list[str] = []
    n_up = unpartitioned_windows(plan)
    if n_up and name not in UNPARTITIONED_WINDOW_OK:
        problems.append(
            f"{n_up} unpartitioned WindowExec (single-partition sort of "
            f"the full input — whitelist in UNPARTITIONED_WINDOW_OK only "
            f"if the windowed keyspace is cardinality-bounded)"
        )
    if name in EXPECT_PUSHDOWN and not re.search(
        r"PushedFilters: \[(?!\])", plan
    ):
        problems.append("expected PushedFilters at the scan, found none")
    if name in EXPECT_BROADCAST and "Broadcast" not in plan:
        problems.append("expected a broadcast join, found none")
    if "CartesianProduct" in plan and name not in ALLOW_CARTESIAN:
        problems.append("unexpected CartesianProduct")
    if (
        "BroadcastNestedLoopJoin" in plan
        and name not in ALLOW_CARTESIAN
    ):
        problems.append("unexpected BroadcastNestedLoopJoin")
    if name in EXPECT_TAKE_ORDERED and "TakeOrderedAndProject" not in plan:
        problems.append("expected TakeOrderedAndProject for the top-k")
    if name in EXPECT_WINDOW_GROUP_LIMIT and "WindowGroupLimit" not in plan:
        problems.append("expected WindowGroupLimit for per-group top-k")
    return problems, plan


def scan_summary(plan: str) -> list[str]:
    """One line per parquet scan: table, #cols read, pushed filters."""
    out = []
    for m in re.finditer(
        r"Location: InMemoryFileIndex \[[^\]]*?(\w+)\.parquet\]\s*"
        r"(?:PartitionFilters: [^\n]*\s*)?"
        r"(?:PushedFilters: (\[[^\n]*\])\s*)?"
        r"ReadSchema: struct<([^\n]*)>",
        plan,
    ):
        table, pushed, schema = m.group(1), m.group(2) or "[]", m.group(3)
        ncols = schema.count(":")
        out.append(f"scan {table}: {ncols} cols, pushed={pushed}")
    return out


# the suite's most expensive queries (BENCH r01/r02) — the ones whose
# join/shuffle choices must be re-verified as input stats grow
SCALE_AUDIT_QUERIES = [
    "minhash_dedup_pairs",
    "simhash_pairs",
    "ngram_jaccard_pairs",
    "near_dup_clusters",
    "ann_lsh",
    "fuzzy_name_pairs",  # most expensive round-2 addition
    # round-2 heavies (VERDICT r2 #6)
    "bloom_pruned_revenue",   # fact-side prune must precede the shuffle
    "k_core_customers",       # iterative peel — per-round plan stays keyed
    "repeated_spans",         # positional shingle join
    "association_rules",     # in-basket pair explode, no self-join
    # round-4 heavies
    "ppjoin_pairs",          # prefix index join must stay equi + bounded
    "containment_pairs",     # probe-prefix x full-index join
    "geo_radius_join",       # cell equi-join, never a cross product
    # round-5 heavies
    "kn_perplexity",         # vocab-keyed count joins must not flip to SMJ-on-fact
    "token_heavy_hitters",   # candidate semi-join must stay broadcast
    "model_quality_scores",  # explode -> partial agg shape
    "label_propagation",     # per-round edge x label join stays keyed
    # round-5b heavies
    "phrase_search",         # positional adjacency joins stay equi-keyed
    "entity_clusters",       # blocked pair-gen + CC rounds stay keyed
    # round-6 heavies
    "fuzzy_decontamination",  # banded corpus x benchmark equi-join only
    "ngram_novelty",         # gram-keyed df join, never doc x doc
    "binary_ann_search",     # Hamming prefilter stays broadcast, rerank bounded
    "nb_domain_classifier",  # token-keyed scoring join stays equi
    # round-7 heavies
    "winnowing_fingerprints",  # gram explode -> doc-partitioned window ->
                               # fingerprint-keyed equi-join, never all-pairs
    "triangle_clustering",     # degree-ordered wedge join stays equi-keyed
    # round-8 (VERDICT r7 #1/#3): the rewired entity-resolution gates and
    # the degree-ordered k_truss must keep their bounded-join shapes as
    # the graph/corpus grows (entity_clusters already listed above)
    "record_linkage",          # global_rank + dense-rank equi-join
    "sorted_neighborhood_pairs",
    "k_truss",                 # degree-ordered wedges on the 10x graph
]


def skew_audit(spark, lines: list[str]) -> int:
    """AQE skew-join proof (VERDICT r6 #7): a deliberately skewed
    equi-join (90% of fact rows on ONE key, broadcast disabled) must
    plan ``SortMergeJoin ... (skew=true)`` once AQE sees the runtime
    sizes, and the explicit ``salted_join`` fallback must spread the hot
    key evenly across output partitions.

    Fixture notes that took debugging to learn (keep them true):
    - the pad column must be INCOMPRESSIBLE (md5 chains) — a constant
      pad compresses below skewedPartitionThresholdInBytes and the
      optimizer correctly sees no skew;
    - no same-key aggregate directly on the join output —
      OptimizeSkewedJoin refuses to split when the parent requires the
      join's hash partitioning (splitting would break co-partitioning).
    """
    from pyspark.sql import functions as F

    from m13_sparkstreaming_python_azure_spark.operators.skew import (
        salted_join,
    )

    conf = spark.conf
    saved = {
        k: conf.get(k, None)  # None = key unset → restore via unset()
        for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        )
    }
    failures = 0
    try:
        conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "1m",
        )
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "256k")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        fact = spark.range(400_000).select(
            F.when(F.pmod(F.col("id"), 10) < 9, 0)
            .otherwise(F.pmod(F.col("id"), 1000))
            .cast("long")
            .alias("k"),
            F.concat(
                F.md5(F.col("id").cast("string")),
                F.md5((F.col("id") + 1).cast("string")),
                F.md5((F.col("id") + 2).cast("string")),
            ).alias("pad"),
        )
        dim = spark.range(1000).select(
            F.col("id").alias("k"),
            F.md5(F.col("id").cast("string")).alias("attr"),
        )
        j = fact.join(dim, "k").select("k", "pad", "attr")
        j._jdf.queryExecution().executedPlan().execute().count()
        plan = j._jdf.queryExecution().executedPlan().toString()
        n_skew = plan.count("skew=true")
        if n_skew:
            lines.append(
                f"- skewed equi-join @90%-hot-key: OK — AQE "
                f"OptimizeSkewedJoin fired ({n_skew} skew=true join side)"
            )
            print("OK   skew_audit: AQE skew-split fired")
        else:
            lines.append(
                "- skewed equi-join: FAIL — no skew=true in the final plan"
            )
            print("FAIL skew_audit: AQE skew-split did not fire")
            failures += 1
        # the explicit fallback: salt spreads the hot key evenly. Measure
        # at the LOGICAL level (per-salt row counts of the hot key) — a
        # physical spark_partition_id probe is misleading here because
        # the probe query itself gets column-pruned down to the join
        # keys, lands under the advisory size, and AQE coalesces it to
        # one partition (learned the hard way).
        salted = salted_join(fact, dim, "k", salt=16, keep_salt=True)
        per_salt = (
            salted.filter(F.col("k") == 0)
            .groupBy("__salt")
            .count()
            .collect()
        )
        hot = 360_000
        n_subkeys = len(per_salt)
        mx = max(r["count"] for r in per_salt) if per_salt else 0
        parity = (
            salted.count() == fact.join(dim, "k").count()
        )
        if parity and n_subkeys == 16 and mx < hot // 8:
            lines.append(
                f"- salted_join fallback: OK — row parity with the plain "
                f"join; the {hot}-row hot key spread over {n_subkeys} "
                f"sub-keys (max {mx} rows ≈ hot/16)"
            )
            print("OK   skew_audit: salted fallback spreads the hot key")
        else:
            lines.append(
                f"- salted_join fallback: FAIL (parity={parity}, "
                f"subkeys={n_subkeys}, max={mx})"
            )
            print("FAIL skew_audit: salted fallback")
            failures += 1
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)
    return failures


def build_scaled_fixture(spark, sf_dir: str, replicas: int = 10) -> str:
    """Materialize a ``replicas``× fixture into a temp dir: documents and
    embeddings replicate with perturbed ids (+ perturbed text, so near-dup
    probes face almost-duplicates, not exact copies); other tables copy
    through unchanged. Returns the fixture dir (usable as any sf_dir)."""
    import tempfile

    from pyspark.sql import functions as F

    from m13_sparkstreaming_python_azure_spark.catalog import TABLES, load_table

    out = tempfile.mkdtemp(prefix="plan-audit-scaled-")
    for t in TABLES:
        if not os.path.exists(os.path.join(sf_dir, f"{t}.parquet")):
            continue
        df = load_table(spark, sf_dir, t)
        if t == "orders":
            df = _replicate(df, "o_orderkey", replicas, 10_000_000)
        elif t == "lineitem":
            df = _replicate(df, "l_orderkey", replicas, 10_000_000)
        elif t == "customer":
            df = _replicate(df, "c_custkey", replicas, 1_000_000)
        elif t == "documents":
            df = _replicate(df, "doc_id", replicas, 1_000_000).withColumn(
                "text",
                F.concat(
                    F.col("text"),
                    F.lit(" rep"),
                    (F.col("doc_id") / 1_000_000).cast("int").cast("string"),
                ),
            )
        elif t == "embeddings":
            df = _replicate(df, "vec_id", replicas, 1_000_000)
        elif t == "events":
            # same timestamps/users/values — day count, distinct users and
            # value grids stay CONSTANT while rows grow 10×, which is
            # exactly what the measured unpartitioned-window bounds below
            # must demonstrate
            df = _replicate(df, "event_id", replicas, 10_000_000)
        df.write.mode("overwrite").parquet(os.path.join(out, f"{t}.parquet"))
    return out


def _replicate(df, id_col: str, n: int, id_stride: int):
    # explode-based (r9): a 100× replication as a union chain would
    # bloat the plan 100 deep; one sequence+explode scales to any n
    from pyspark.sql import functions as F

    return (
        df.withColumn(
            "__r", F.explode(F.sequence(F.lit(0), F.lit(n - 1)))
        )
        .withColumn(
            id_col, F.col(id_col) + F.col("__r").cast("long") * id_stride
        )
        .drop("__r")
    )


def window_bound_audit(
    spark, qs, sf_dir: str, scaled_dir: str, base_inputs: dict, lines: list
) -> int:
    """VERDICT r7 #7: replace the whitelist's hand-argued boundedness
    claims with MEASUREMENT. For every whitelisted query, re-run at 10×
    input, read the actual row count entering each unpartitioned Window
    node from the executed plan's metrics, and fail any window whose
    input grew more than 3× (+1000 rows slack for vocab drift) unless
    the entry is in UNPARTITIONED_WINDOW_GROWS_WITH_SELECTION (a
    documented filtered-tail selection, reported but not failed)."""
    failures = 0
    lines.append("### Measured unpartitioned-window bounds (VERDICT r7 #7)")
    lines.append("")
    lines.append(
        "| query | rows into window @1× | @10× | verdict |"
    )
    lines.append("|---|---|---|---|")
    for name in sorted(UNPARTITIONED_WINDOW_OK):
        if name not in qs:
            continue
        base = base_inputs.get(name)
        if not base:
            lines.append(
                f"| {name} | — | — | no unpartitioned window planned at 1× "
                f"(whitelist entry unused) |"
            )
            continue
        try:
            df = qs[name](spark, scaled_dir)
            df._jdf.queryExecution().executedPlan().execute().count()
            scaled = unpartitioned_window_inputs(df)
        except Exception as e:  # noqa: BLE001
            print(f"ERROR window-bound {name} @10x: {e}")
            lines.append(f"| {name} | {base} | ERROR {e} | FAIL |")
            failures += 1
            continue
        # pad BOTH sides (ADVICE r8): if AQE/plan drift gives the 10×
        # plan MORE unpartitioned windows than the 1× plan, the extras
        # must surface as an anomaly, not be silently zip-truncated.
        n = max(len(base), len(scaled))
        pairs = list(
            zip(
                base + [-1] * (n - len(base)),
                scaled + [-1] * (n - len(scaled)),
            )
        )
        grew = [
            (b, s)
            for b, s in pairs
            if b >= 0 and s >= 0 and s > 3 * b + 1000
        ]
        if len(base) != len(scaled):
            verdict = (
                f"FAIL — window count drifted between 1× ({len(base)}) "
                f"and 10× ({len(scaled)}) plans; unmatched windows "
                "cannot be bound-checked"
            )
            failures += 1
        elif not grew:
            verdict = "OK — bounded"
        elif name in UNPARTITIONED_WINDOW_GROWS_WITH_SELECTION:
            verdict = (
                "grows (documented selection: "
                f"{UNPARTITIONED_WINDOW_GROWS_WITH_SELECTION[name]})"
            )
        else:
            verdict = "FAIL — window input grows with the table"
            failures += 1
        lines.append(f"| {name} | {base} | {scaled} | {verdict} |")
        tag = "OK  " if "FAIL" not in verdict else "FAIL"
        print(f"{tag} window-bound {name}: {base} -> {scaled}")
    lines.append("")
    return failures


# Queries whose window-boundedness claim historically leaned on a VALUE
# domain ("distinct score cents") rather than a structural cap. The
# standard scaled fixture replicates rows with IDENTICAL values, so its
# measured bounds can't distinguish "bounded keyspace" from "saturated
# fixture domain" (VERDICT r9 #1 — roc_auc measured flat at 10× only
# because the price grid saturates). The continuous probe rebuilds the
# score columns as UNIQUE-per-row (distinct = n) and re-measures: a
# query is scale-safe only if its unpartitioned-window inputs stay flat
# even then.
CONTINUOUS_SCORE_QUERIES = [
    "roc_auc",
    "ks_test",
    "ece_calibration",
    "auc_by_segment",
    "kruskal_wallis",
    "psi_drift",
]


def build_continuous_fixture(spark, sf_dir: str, replicas: int = 1) -> str:
    """Fixture where every probed score domain is CONTINUOUS: after
    replication, o_totalprice/c_acctbal/n_chars are derived from the
    (perturbed) primary key, so distinct score values == row count."""
    import tempfile

    from pyspark.sql import functions as F

    from m13_sparkstreaming_python_azure_spark.catalog import load_table

    out = tempfile.mkdtemp(prefix="plan-audit-cont-")
    orders = _replicate(
        load_table(spark, sf_dir, "orders"), "o_orderkey", replicas,
        10_000_000,
    ).withColumn("o_totalprice", F.col("o_orderkey") * F.lit(0.01))
    customer = _replicate(
        load_table(spark, sf_dir, "customer"), "c_custkey", replicas,
        1_000_000,
    ).withColumn("c_acctbal", F.col("c_custkey") * F.lit(0.01))
    documents = _replicate(
        load_table(spark, sf_dir, "documents"), "doc_id", replicas,
        1_000_000,
    ).withColumn("n_chars", F.col("doc_id").cast("int"))
    for t, df in (
        ("orders", orders),
        ("customer", customer),
        ("documents", documents),
    ):
        df.write.mode("overwrite").parquet(os.path.join(out, f"{t}.parquet"))
    return out


def continuous_probe_audit(spark, qs, sf_dir: str, lines: list) -> int:
    """VERDICT r9 #1 (second half): test the distinct-value boundedness
    claims where the value domain does NOT saturate. Every query in
    CONTINUOUS_SCORE_QUERIES runs on the continuous fixture at 1× and
    10×; any unpartitioned-window input growing >3×+1000 rows FAILS —
    no GROWS-with-selection escape hatch here, because a window over a
    continuous score domain has no documented ceiling."""
    failures = 0
    lines.append(
        "### Continuous-score probe (VERDICT r9 #1 — distinct = n)"
    )
    lines.append("")
    lines.append(
        "Scores rebuilt UNIQUE-per-row (distinct values == rows), so a "
        "window whose 1×→10× bound relied on a saturated value grid has "
        "nowhere to hide."
    )
    lines.append("")
    lines.append("| query | rows into window @1× | @10× | verdict |")
    lines.append("|---|---|---|---|")
    dir1 = build_continuous_fixture(spark, sf_dir, 1)
    dir10 = build_continuous_fixture(spark, sf_dir, 10)
    for name in CONTINUOUS_SCORE_QUERIES:
        if name not in qs:
            continue
        try:
            d1 = qs[name](spark, dir1)
            d1._jdf.queryExecution().executedPlan().execute().count()
            w1 = unpartitioned_window_inputs(d1)
            d10 = qs[name](spark, dir10)
            d10._jdf.queryExecution().executedPlan().execute().count()
            w10 = unpartitioned_window_inputs(d10)
        except Exception as e:  # noqa: BLE001
            print(f"ERROR continuous-probe {name}: {e}")
            lines.append(f"| {name} | ERROR {e} | | FAIL |")
            failures += 1
            continue
        if len(w1) != len(w10):
            verdict = (
                f"FAIL — window count drifted ({len(w1)} vs {len(w10)})"
            )
            failures += 1
        elif any(
            b >= 0 and s >= 0 and s > 3 * b + 1000
            for b, s in zip(w1, w10)
        ):
            verdict = "FAIL — window input grows with continuous scores"
            failures += 1
        else:
            verdict = "OK — flat under distinct=n"
        lines.append(f"| {name} | {w1} | {w10} | {verdict} |")
        tag = "OK  " if "FAIL" not in verdict else "FAIL"
        print(f"{tag} continuous-probe {name}: {w1} -> {w10}")
    lines.append("")
    return failures


def hot_value_probe_audit(spark, lines: list) -> int:
    """VERDICT r10 #2: a hot LEADING sort value used to land its whole
    tie group in ONE quantile bucket of global_rank/global_cumsum —
    re-creating the single window task the r10 rewire removed. The
    operator now sub-buckets a hot value's ties by the SECOND sort
    column (when the lead surrogate is injective). This probe builds a
    skewed fixture (85% of rows tied on the leading score) at two
    sizes and measures the MAX bucket input via the operator's own
    bucket census: it must stay ≈ n/p (bound 4·n/p), i.e. NOT grow
    toward 0.85·n.

    VERDICT r11 #2 closed the string-lead hole: a hot string value
    whose tie group is ONE exact string (min == max in the bounded hot
    job) is pinned, so it sub-buckets by the second sort column like an
    injective numeric — the string row is now BOUND-CHECKED, not a
    documented fallback. A hot 6-byte prefix shared by several distinct
    strings splits along the second-LEVEL surrogate (bytes 7-12) to
    per-string granularity; the residual (one exact string dominating a
    mixed prefix family is pinned only at 12 bytes) is asserted at that
    looser bound. ADVICE r11: far-range timestamps (|unix_micros| >
    2^53) MERGE in the double surrogate, so the probe also asserts the
    magnitude check REFUSES to sub-bucket there — the safe direction,
    a split could invert the total order."""
    from pyspark.sql import functions as F

    from m13_sparkstreaming_python_azure_spark.operators.window import (
        rank_bucket_census,
    )

    failures = 0
    lines.append(
        "### Hot-leading-value probe (VERDICT r10 #2 — 85% tied lead)"
    )
    lines.append("")
    lines.append(
        "Skewed fixture: 85% of rows share one leading score; unique id "
        "tie-break. Max bucket input measured by the operator's own "
        "census at p=32 — sub-bucketing by the second sort key must hold "
        "it ≈ n/p at both sizes (bound 4·n/p)."
    )
    lines.append("")
    lines.append("| fixture | rows n | max bucket rows | bound 4·n/p | verdict |")
    lines.append("|---|---|---|---|---|")
    p = 32
    for n in (20_000, 200_000):
        df = spark.range(n).select(
            F.col("id"),
            F.when(F.col("id") % 100 < 85, F.lit(1.0))
            .otherwise((F.col("id") % 100).cast("double"))
            .alias("score"),
        )
        census = rank_bucket_census(
            df, [F.asc("score"), F.asc("id")], num_partitions=p
        ).collect()
        mx = max(r["rows"] for r in census)
        bound = 4 * n // p
        ok = mx <= bound
        failures += not ok
        verdict = "OK — tie group split" if ok else "FAIL — hot bucket"
        lines.append(f"| double lead | {n} | {mx} | {bound} | {verdict} |")
        print(f"{'OK  ' if ok else 'FAIL'} hot-value probe n={n}: "
              f"max bucket {mx} (bound {bound})")
    # string lead, pinned hot value (VERDICT r11 #2): 85% of rows are
    # ONE exact string — min == max pins it, second-column sub-split
    # must bound the bucket exactly like the numeric rows above
    n = 20_000
    dfs = spark.range(n).select(
        F.col("id"),
        F.when(F.col("id") % 100 < 85, F.lit("hot-shared-key"))
        .otherwise(F.concat(F.lit("k"), F.col("id") % 100))
        .alias("score"),
    )
    census = rank_bucket_census(
        dfs, [F.asc("score"), F.asc("id")], num_partitions=p
    ).collect()
    mx = max(r["rows"] for r in census)
    bound = 4 * n // p
    ok = mx <= bound
    failures += not ok
    lines.append(
        f"| string lead (pinned hot value) | {n} | {mx} | {bound} | "
        f"{'OK — pinned string split by 2nd column' if ok else 'FAIL — hot bucket'} |"
    )
    print(f"{'OK  ' if ok else 'FAIL'} hot-value probe string-pinned: "
          f"max bucket {mx} (bound {bound})")
    # string lead, mixed 6-byte-prefix family: 85% spread over 30
    # distinct strings sharing the prefix "prefix" — second-LEVEL
    # surrogate (bytes 7-12) splits to per-string granularity; the
    # documented residual bound is ONE string's rows (0.85n/30), not
    # 4n/p, because a 12-byte-pinned sub-group is not split further
    dfm = spark.range(n).select(
        F.col("id"),
        F.when(
            F.col("id") % 100 < 85,
            F.concat(
                F.lit("prefix-"),
                F.lpad((F.col("id") % 30).cast("string"), 3, "0"),
            ),
        )
        .otherwise(F.concat(F.lit("z"), F.col("id") % 100))
        .alias("score"),
    )
    census = rank_bucket_census(
        dfm, [F.asc("score"), F.asc("id")], num_partitions=p
    ).collect()
    mx = max(r["rows"] for r in census)
    bound = int(0.85 * n / 30) + 4 * n // p
    ok = mx <= bound
    failures += not ok
    lines.append(
        f"| string lead (mixed prefix family ×30) | {n} | {mx} | {bound} "
        f"(per-string residual) | "
        f"{'OK — split on bytes 7-12' if ok else 'FAIL'} |"
    )
    print(f"{'OK  ' if ok else 'FAIL'} hot-value probe string-family: "
          f"max bucket {mx} (bound {bound})")
    # far-range timestamp (ADVICE r11): |unix_micros| > 2^53 merges
    # distinct instants in the double surrogate — the magnitude check
    # must REFUSE sub-bucketing (a split could invert the total order),
    # so the hot group staying WHOLE is the pass condition here
    dft = spark.range(n).select(
        F.col("id"),
        F.when(
            F.col("id") % 100 < 85,
            F.lit("3000-01-01 00:00:00").cast("timestamp"),
        )
        .otherwise(F.timestamp_micros((F.col("id") % 100) * 1_000_000))
        .alias("ts"),
    )
    census = rank_bucket_census(
        dft, [F.asc("ts"), F.asc("id")], num_partitions=p
    ).collect()
    mx = max(r["rows"] for r in census)
    ok = mx >= int(0.8 * n)
    failures += not ok
    lines.append(
        f"| timestamp lead beyond 2^53 µs | {n} | {mx} | must stay "
        f"whole (≥ {int(0.8 * n)}) | "
        f"{'OK — magnitude check refused split' if ok else 'FAIL — unsafe split'} |"
    )
    print(f"{'OK  ' if ok else 'FAIL'} hot-value probe far-timestamp "
          f"refusal: max bucket {mx} (refusal expected)")
    lines.append("")
    return failures


def bucket_compile_audit(spark, lines: list) -> int:
    """VERDICT r10 #3: the r10 bucket expression chained p−1 when()
    additions — measured java.lang.StackOverflowError at p=2000 during
    column→expression conversion, 7.7 s/2M rows evaluation at p=200.
    The binary-search rewrite must keep plan construction+compile FLAT
    in p (O(1) expression size). This probe times build→executedPlan→
    first execution of global_rank at p=200 and p=2000 on the same
    input and fails if the p=2000 wall exceeds 5× the p=200 wall + 2 s."""
    import time

    from pyspark.sql import functions as F

    from m13_sparkstreaming_python_azure_spark.operators.window import (
        global_rank,
    )

    lines.append("### Bucket-expression compile probe (VERDICT r10 #3)")
    lines.append("")
    lines.append(
        "r10's O(p)-term when-chain: StackOverflowError at p=2000 "
        "(column→expression conversion), 7.7 s/2M rows at p=200. The "
        "O(log p)-eval binary search (measured on the same 2M-row rig: "
        "1.8 s at p=200, 1.3 s at p=2000) must keep plan build+compile "
        "flat in p:"
    )
    lines.append("")
    lines.append("| p | build+compile+first-run wall (s) |")
    lines.append("|---|---|")
    df = spark.range(50_000).select(
        F.col("id"), (F.col("id") % 991 * 1.7).alias("x")
    )
    walls = {}
    for p in (200, 2000):
        t0 = time.perf_counter()
        out = global_rank(df, [F.asc("x"), F.asc("id")], num_partitions=p)
        out._jdf.queryExecution().executedPlan().execute().count()
        walls[p] = time.perf_counter() - t0
        lines.append(f"| {p} | {walls[p]:.2f} |")
    ok = walls[2000] <= 5 * walls[200] + 2.0
    lines.append("")
    lines.append(
        f"verdict: {'OK — compile flat in p' if ok else 'FAIL — compile grows with p'}"
    )
    lines.append("")
    print(f"{'OK  ' if ok else 'FAIL'} bucket compile probe: "
          f"p=200 {walls[200]:.2f}s, p=2000 {walls[2000]:.2f}s")
    return 0 if ok else 1


def candidate_growth_audit(
    spark, sf_dir: str, lines: list, replicas: int = 10, bound: float = 20.0
) -> int:
    """VERDICT r7 #1 (extended to 100× by r8 #4): prove the entity-
    resolution candidate generators grow ~linearly. The scaled name
    corpus is built by suffix-perturbed replication (replicas of the
    same base name sit within edit distance 2 of each other but not of
    unrelated names), so a linear generator lands near ~1.5×replicas
    candidates while a key-block join would land near replicas². The
    asserted bound is ``bound`` (2×replicas by default)."""
    from pyspark.sql import functions as F

    from m13_sparkstreaming_python_azure_spark.catalog import load_table
    from m13_sparkstreaming_python_azure_spark.operators.fuzzy import (
        fuzzy_pairs,
    )
    from m13_sparkstreaming_python_azure_spark.operators.linkage import (
        sorted_neighborhood,
    )

    failures = 0
    names = load_table(spark, sf_dir, "customer").select(
        F.col("c_name").alias("name")
    )
    # replica suffixes must be PAIRWISE-FAR (md5-derived 4-char tags):
    # numeric suffixes like " r1".." r99" sit within edit distance 2 of
    # each other, which makes the TRUE pair set itself quadratic in the
    # replica count and would mis-measure the generator (r9: surfaced by
    # the 100× run — ×319 "growth" that was entirely fixture artifact)
    scaled_names = (
        names.withColumn(
            "__r", F.explode(F.sequence(F.lit(0), F.lit(replicas - 1)))
        )
        .select(
            F.when(F.col("__r") == 0, F.col("name"))
            .otherwise(
                F.concat(
                    "name",
                    F.lit(" "),
                    F.substring(F.md5(F.col("__r").cast("string")), 1, 4),
                )
            )
            .alias("name")
        )
    )
    lines.append(
        f"### Candidate-generator growth @{replicas}× (VERDICT r7 #1 / r8 #4)"
    )
    lines.append("")
    for label, gen in (
        (
            "symmetric-delete fuzzy_pairs(d=2) [entity_clusters]",
            lambda d: fuzzy_pairs(d, "name", max_dist=2).count(),
        ),
        (
            "sorted_neighborhood(w=10) [record_linkage]",
            lambda d: sorted_neighborhood(
                d.distinct(), [F.col("name")], window=10
            ).count(),
        ),
    ):
        n1 = gen(names)
        n_s = gen(scaled_names)
        ratio = n_s / max(n1, 1)
        ok = ratio <= bound
        verdict = "OK — ~linear" if ok else "FAIL — super-linear"
        lines.append(
            f"- {label}: {n1} candidates @1× → {n_s} @{replicas}× names "
            f"(×{ratio:.1f}, bound ×{bound:g}) — {verdict}"
        )
        print(
            f"{'OK  ' if ok else 'FAIL'} candidate-growth @{replicas}x "
            f"{label}: ×{ratio:.1f}"
        )
        failures += 0 if ok else 1
    lines.append("")
    return failures


def history_growth_audit(
    spark, sf_dir: str, lines: list, replicas: int = 10
) -> int:
    """VERDICT r11 #1: measure — don't argue from plan shape — that the
    streaming index sinks' per-batch cost is O(batch), not O(history).

    For each sink (minhash-LSH dedup, exact-fingerprint dedup, IVF ANN
    index), history is seeded at 1× and ``replicas``× with PAIRWISE-
    UNRELATED synthetic docs/vectors (md5-derived words/components, so
    bigger history adds index rows, not extra near-dup partners for the
    probe — partner growth would measure fixture artifact, the r9
    candidate-growth lesson), the keyed tables are REBUCKET-compacted
    proportionally (the documented maintenance invariant:
    ``compact_keyed_snapshot(n_buckets=...)`` / an IVF rebuild with
    proportional n_cells), and then ONE identical measurement batch runs
    through the sink with ``read_keyed_buckets`` instrumented to record
    probe-side scan volume. Asserted: measurement-batch wall ≤
    2.5×+1.5s and probe bytes ≤ 3×+256KB across the 10× history jump.
    An uncompacted-delta contrast row documents what the probe costs
    WITHOUT the compaction cadence (reads the whole delta) — context,
    not a gate."""
    import tempfile
    import time

    from pyspark.sql import functions as F

    from m13_sparkstreaming_python_azure_spark.catalog import load_table
    from m13_sparkstreaming_python_azure_spark.operators import dedup as D
    from m13_sparkstreaming_python_azure_spark.operators import (
        similarity as SIM,
    )
    from m13_sparkstreaming_python_azure_spark.sources import snapshots as S

    failures = 0
    lines.append(
        f"### Streaming-index history growth @{replicas}× (VERDICT r11 #1)"
    )
    lines.append("")
    lines.append(
        "One fixed measurement batch against pre-seeded history; probes "
        "instrumented at `read_keyed_buckets`. `bytes` = probe-side file "
        "bytes actually selected; rebucketing compaction scales "
        "n_buckets with history (256 → 2560; IVF rebuild 8 → 80 cells)."
    )
    lines.append("")

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def synth_history(n_copies: int):
        """doc count × n_copies, every text pairwise-unrelated (30
        md5-derived words), ids strided clear of the originals."""
        return (
            docs.withColumn(
                "__r", F.explode(F.sequence(F.lit(0), F.lit(n_copies - 1)))
            )
            .select(
                (F.col("doc_id") + F.col("__r").cast("long") * 1_000_000)
                .alias("doc_id"),
                F.concat_ws(
                    " ",
                    F.transform(
                        F.sequence(F.lit(1), F.lit(30)),
                        lambda i: F.substring(
                            F.md5(
                                F.concat_ws(
                                    ":",
                                    F.col("doc_id").cast("string"),
                                    F.col("__r").cast("string"),
                                    i.cast("string"),
                                )
                            ),
                            1,
                            8,
                        ),
                    ),
                ).alias("text"),
            )
        )

    # measurement batch: 12 near-dup variants of ORIGINAL docs (present
    # at both scales → constant partner count) with ids above history
    meas = (
        docs.orderBy("doc_id")
        .limit(12)
        .select(
            (F.col("doc_id") + F.lit(100_000_000)).alias("doc_id"),
            F.concat(
                F.col("text"), F.lit(" zz"), F.substring(F.md5("text"), 1, 4)
            ).alias("text"),
        )
    )
    probe_stats = {"bytes": 0, "files": 0}
    real_rkb = S.read_keyed_buckets

    def recording_rkb(sp, table_dir, buckets):
        df = real_rkb(sp, table_dir, buckets)
        if df is not None:
            # the reader's OWN scan file list (df.inputFiles()) — not a
            # re-derivation of its selection logic, which could silently
            # drift from what the reader actually opens (review r12)
            files = [
                f.removeprefix("file:") for f in df.inputFiles()
            ]
            probe_stats["bytes"] += sum(os.path.getsize(f) for f in files)
            probe_stats["files"] += len(files)
        return df

    def measure(build_sink, seed_df, rebucket):
        """Seed history, optionally rebucket-compact, run the fixed
        measurement batch; return (wall, bytes, files)."""
        S.read_keyed_buckets = recording_rkb
        try:
            sink = build_sink()  # binds the recording reader
            sink(seed_df, 0)
            for td, nb in (rebucket or {}).items():
                S.compact_keyed_snapshot(spark, td, n_buckets=nb)
            probe_stats["bytes"] = probe_stats["files"] = 0
            t0 = time.perf_counter()
            sink(meas, 1)
            wall = time.perf_counter() - t0
        finally:
            S.read_keyed_buckets = real_rkb
        return wall, probe_stats["bytes"], probe_stats["files"]

    def check(label, w1, b1, f1, w10, b10, f10):
        nonlocal failures
        ok_w = w10 <= w1 * 2.5 + 1.5
        ok_b = b10 <= b1 * 3 + 256 * 1024
        verdict = (
            "OK — flat"
            if ok_w and ok_b
            else "FAIL — grows with history"
        )
        lines.append(
            f"- {label}: 1× {w1:.2f}s / {b1 / 1024:.0f}KB / {f1}f → "
            f"{replicas}× {w10:.2f}s / {b10 / 1024:.0f}KB / {f10}f "
            f"(wall ×{w10 / max(w1, 1e-9):.2f}, bytes "
            f"×{b10 / max(b1, 1):.2f}) — {verdict}"
        )
        print(
            f"{'OK  ' if ok_w and ok_b else 'FAIL'} history-growth "
            f"{label}: wall ×{w10 / max(w1, 1e-9):.2f} bytes "
            f"×{b10 / max(b1, 1):.2f}"
        )
        failures += 0 if ok_w and ok_b else 1

    # ---- minhash LSH dedup sink ----------------------------------
    res = {}
    for scale, n_copies, nb in ((1, 1, 256), (replicas, replicas, 2560)):
        root = tempfile.mkdtemp(prefix=f"hg-mh{scale}-")
        c, b, s = (os.path.join(root, d) for d in ("c", "b", "s"))
        res[scale] = measure(
            lambda: D.streaming_minhash_dedup_sink(c, b, s),
            synth_history(n_copies),
            {b: nb, s: nb},
        )
    check("minhash_dedup sink (bands+shingles probes)", *res[1], *res[replicas])

    # uncompacted contrast at 10× — delta is the whole history
    root = tempfile.mkdtemp(prefix="hg-mhu-")
    c, b, s = (os.path.join(root, d) for d in ("c", "b", "s"))
    wu, bu, fu = measure(
        lambda: D.streaming_minhash_dedup_sink(c, b, s),
        synth_history(replicas),
        None,
    )
    lines.append(
        f"- (contrast) minhash @{replicas}× WITHOUT compaction: "
        f"{wu:.2f}s / {bu / 1024:.0f}KB / {fu}f — the probe reads the "
        "whole append delta; compaction cadence is the maintenance "
        "invariant, not an optimization"
    )

    # ---- exact-fingerprint dedup sink ----------------------------
    res = {}
    for scale, n_copies, nb in ((1, 1, 256), (replicas, replicas, 2560)):
        root = tempfile.mkdtemp(prefix=f"hg-fp{scale}-")
        c, fp = os.path.join(root, "c"), os.path.join(root, "fp")
        res[scale] = measure(
            lambda: D.incremental_dedup_sink(c, fp),
            synth_history(n_copies),
            {fp: nb},
        )
    check("incremental_dedup sink (fingerprint probe)", *res[1], *res[replicas])

    # ---- IVF ANN index sink (append is history-blind; probe scales
    # with cell size unless the rebuild grows n_cells — measure both
    # under the maintenance invariant: 10× corpus, 10× cells) -------
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    dim = len(emb.select("embedding").first()[0])
    meas_emb = emb.orderBy("vec_id").limit(200).select(
        (F.col("vec_id") + F.lit(100_000_000)).alias("vec_id"), "embedding"
    )
    probes = emb.orderBy("vec_id").limit(8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    def synth_emb(n_copies: int):
        return (
            emb.withColumn(
                "__r", F.explode(F.sequence(F.lit(0), F.lit(n_copies - 1)))
            )
            .select(
                (F.col("vec_id") + F.col("__r").cast("long") * 1_000_000)
                .alias("vec_id"),
                F.transform(
                    F.sequence(F.lit(1), F.lit(dim)),
                    lambda i: (
                        F.conv(
                            F.substring(
                                F.md5(
                                    F.concat_ws(
                                        ":",
                                        F.col("vec_id").cast("string"),
                                        F.col("__r").cast("string"),
                                        i.cast("string"),
                                    )
                                ),
                                1,
                                8,
                            ),
                            16,
                            10,
                        ).cast("double")
                        / F.lit(4294967296.0).cast("double")
                        - F.lit(0.5)
                    ),
                ).alias("embedding"),
            )
        )

    res = {}
    for scale, n_copies, ncells in ((1, 1, 8), (replicas, replicas, 80)):
        root = tempfile.mkdtemp(prefix=f"hg-ivf{scale}-")
        idx = os.path.join(root, "idx")
        sink = SIM.ivf_index_sink(idx, n_cells=ncells)
        sink(synth_emb(n_copies), 0)
        t0 = time.perf_counter()
        sink(meas_emb, 1)
        wall = time.perf_counter() - t0
        # probe under the same instrumentation (reads via
        # read_keyed_buckets inside ivf_probe_snapshot)
        S.read_keyed_buckets = recording_rkb
        try:
            probe_stats["bytes"] = probe_stats["files"] = 0
            t0 = time.perf_counter()
            SIM.ivf_probe_snapshot(
                spark, idx, probes, k=5, nprobe=2
            ).count()
            pwall = time.perf_counter() - t0
        finally:
            S.read_keyed_buckets = real_rkb
        res[scale] = (wall, probe_stats["bytes"], probe_stats["files"], pwall)
    w1, b1, f1, p1 = res[1]
    w10, b10, f10, p10 = res[replicas]
    check(
        "ivf_index sink append + probe @10× cells (nprobe=2)",
        w1, b1, f1, w10, b10, f10,
    )
    lines.append(
        f"- ivf probe wall: 1× {p1:.2f}s → {replicas}× {p10:.2f}s "
        "(cell-count growth is the IVF maintenance invariant — an "
        "offline rebuild, like rebucketing for hash-keyed tables)"
    )
    lines.append("")
    return failures


# VERDICT r8 #4: the top-10 most expensive NON-streaming queries by
# BENCH_FULL median, re-asserted at 100× replication (sf0.01 × 100 ≈
# sf1). Streaming replay gates are excluded by design: their cost is
# micro-batch machinery (fixed per gate), their returned DataFrame is a
# memory-sink aggregate — not the scan/join plan the audit reads — and
# their state-store shapes are covered by the streaming suites.
SCALE100_QUERIES = [
    "entity_clusters",
    "lsh_recall_eval",
    "hits_scores",
    "bm25_prf_search",
    "supplier_pagerank",
    "fuzzy_decontamination",
    "containment_pairs",
    "k_core_customers",
    "ppjoin_pairs",
    "retrieval_eval",
]


import contextlib


@contextlib.contextmanager
def capture_checkpoints():
    """Scoped hook on DataFrame.localCheckpoint (VERDICT r9 #2): the
    iterative operators (connected components, PageRank/HITS, symmetric
    -delete ER, PRF retrieval) do their real work DURING query
    construction, executing each round eagerly and truncating lineage —
    so the final plan the audit sees is a scan of checkpointed RDDs and
    the per-round join strategies escape both the wall timer and the
    plan assertions. This context manager captures every DataFrame at
    the moment it is checkpointed so the audit can read the executed
    per-round plans as well."""
    # pyspark>=4: the concrete class (with its own localCheckpoint
    # override) is pyspark.sql.classic.dataframe.DataFrame — patching
    # the re-exported abstract base never intercepts instance calls
    try:
        from pyspark.sql.classic.dataframe import DataFrame
    except ImportError:  # pragma: no cover — pyspark<4
        from pyspark.sql import DataFrame

    captured: list = []
    orig = DataFrame.localCheckpoint

    def wrapper(self, eager=True, *args, **kwargs):
        res = orig(self, eager, *args, **kwargs)
        captured.append(self)
        return res

    DataFrame.localCheckpoint = wrapper
    try:
        yield captured
    finally:
        DataFrame.localCheckpoint = orig


_JOIN_RE = (
    r"(\w*(?:HashJoin|NestedLoopJoin|SortMergeJoin|CartesianProduct)\w*)"
)


def _audit_intermediates(name: str, captured: list) -> tuple[list, set, list]:
    """Join-strategy + unpartitioned-window checks over the captured
    pre-checkpoint plans (executed eagerly, so metrics are real)."""
    problems: list[str] = []
    joins: set[str] = set()
    win_rows: list[int] = []
    for d in captured:
        try:
            plan = d._jdf.queryExecution().executedPlan().toString()
        except Exception:  # noqa: BLE001
            continue
        joins |= set(re.findall(_JOIN_RE, plan))
        try:
            win_rows += unpartitioned_window_inputs(d)
        except Exception:  # noqa: BLE001
            pass
    bad = {j for j in joins if "CartesianProduct" in j or "NestedLoopJoin" in j}
    if bad and name not in ALLOW_CARTESIAN:
        problems.append(
            f"checkpointed intermediate plans contain {sorted(bad)}"
        )
    if win_rows and name not in UNPARTITIONED_WINDOW_OK:
        problems.append(
            f"checkpointed intermediate plans contain unpartitioned "
            f"windows (input rows {win_rows})"
        )
    return problems, joins, win_rows


def scale100_audit(spark, qs, sf_dir: str, lines: list) -> int:
    """Re-assert join-strategy, cartesian, and unpartitioned-window
    invariants against a 100×-replicated fixture for SCALE100_QUERIES.
    Window inputs are measured at BOTH sizes here (the 1× measurement in
    main() only covers whitelist entries); bound: ≤ 5× + 5000 rows (the
    doc-replication suffixes grow vocab-keyed sets slightly — anything
    near ×100 is a real scaling defect). r10 (VERDICT r9 #2): the wall
    timer starts BEFORE construction and every localCheckpoint'ed
    intermediate's executed plan is captured and audited, so iterative
    queries can no longer do their real work in a blind spot."""
    import time

    failures = 0
    lines.append("## Scale audit @100× — top-10 most expensive non-streaming queries (VERDICT r8 #4)")
    lines.append("")
    lines.append(
        "Fixture: sf0.01 replicated ×100 (≈ sf1) with perturbed ids/text. "
        "Invariants: same join strategies (no broadcast→cartesian flips), "
        "no unlisted CartesianProduct/BNLJ, unpartitioned-window inputs "
        "bounded (≤ 5× + 5000 vs 1×)."
    )
    lines.append("")
    scaled_dir = build_scaled_fixture(spark, sf_dir, replicas=100)
    lines.append("| query | wall s @100× (incl. construction) | joins @100× (final + ckpt rounds) | unpartitioned-window rows 1×→100× | verdict |")
    lines.append("|---|---|---|---|---|")
    for name in SCALE100_QUERIES:
        if name not in qs:
            continue
        try:
            with capture_checkpoints() as cap1:
                df1 = qs[name](spark, sf_dir)
                df1._jdf.queryExecution().executedPlan().execute().count()
            base = unpartitioned_window_inputs(df1)
            t0 = time.time()
            with capture_checkpoints() as cap100:
                df = qs[name](spark, scaled_dir)
                df._jdf.queryExecution().executedPlan().execute().count()
            wall = time.time() - t0
            problems, plan = audit_one(name, df)
            ck_problems, ck_joins, _ck_wins = _audit_intermediates(
                name, cap100
            )
            problems = problems + ck_problems
            scaled = unpartitioned_window_inputs(df)
        except Exception as e:  # noqa: BLE001
            print(f"ERROR {name} @100x: {e}")
            lines.append(f"| {name} | ERROR | {e} | — | FAIL |")
            failures += 1
            continue
        joins = sorted(
            set(re.findall(_JOIN_RE, plan))
            | {f"{j} (ckpt)" for j in ck_joins}
        )
        n = max(len(base), len(scaled))
        pairs = list(
            zip(
                base + [-1] * (n - len(base)),
                scaled + [-1] * (n - len(scaled)),
            )
        )
        grew = [
            (b, s) for b, s in pairs if b >= 0 and s >= 0 and s > 5 * b + 5000
        ]
        wverdict = "OK"
        if len(base) != len(scaled):
            wverdict = (
                f"window count drift ({len(base)}→{len(scaled)})"
            )
            problems = problems + [wverdict]
        elif grew:
            wverdict = f"GROWS {grew}"
            problems = problems + [wverdict]
        status = "OK" if not problems else "FAIL: " + "; ".join(problems)
        lines.append(
            f"| {name} | {wall:.1f} | {', '.join(joins) or '-'} | "
            f"{base}→{scaled} | {status} |"
        )
        print(
            f"{'OK  ' if not problems else 'FAIL'} {name} @100x: "
            f"{wall:.1f}s windows {base}->{scaled}"
        )
        failures += bool(problems)
    lines.append("")
    failures += candidate_growth_audit(
        spark, sf_dir, lines, replicas=100, bound=150.0
    )
    return failures


def main(sf_dir: str = "/root/testdata/sf0.01", *flags: str) -> int:
    run_scale = "--no-scale" not in flags
    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    failures = 0
    lines = [
        "# PLANS — physical-plan audit",
        "",
        f"Generated by `tools/plan_audit.py` at `{sf_dir}`. For every query:",
        "scan shape (column pruning + predicate pushdown) and join strategy,",
        "with the scale invariants asserted (see module docstring).",
        "",
    ]
    base_window_inputs: dict[str, list[int]] = {}
    for name, fn in qs.items():
        try:
            df = fn(spark, sf_dir)
            # Execute THIS df's own plan tree in place (an RDD action on
            # executedPlan): df.count() would build a separate aggregate
            # plan and leave this one's AQE root unfinalized. After this,
            # explain shows isFinalPlan=true — real codegen spans, real
            # AQE join conversions — which is what the audit must read.
            df._jdf.queryExecution().executedPlan().execute().count()
            if name in UNPARTITIONED_WINDOW_OK:
                base_window_inputs[name] = unpartitioned_window_inputs(df)
            problems, plan = audit_one(name, df)
        except Exception as e:  # noqa: BLE001
            print(f"ERROR {name}: {e}")
            failures += 1
            continue
        joins = sorted(
            set(re.findall(r"(\w*(?:HashJoin|NestedLoopJoin|SortMergeJoin|CartesianProduct)\w*)", plan))
        )
        # codegen stage markers (*(n)) only appear in simple explain mode
        jvm = df.sparkSession._jvm
        simple = df._jdf.queryExecution().explainString(
            jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
        )
        codegen = len(set(re.findall(r"\*\((\d+)\)", simple)))
        status = "OK" if not problems else "FAIL: " + "; ".join(problems)
        print(f"{'OK  ' if not problems else 'FAIL'} {name}: joins={joins or '-'}")
        lines.append(f"## {name} — {status}")
        for s in scan_summary(plan):
            lines.append(f"- {s}")
        if joins:
            lines.append(f"- joins: {', '.join(joins)}")
        lines.append(f"- whole-stage codegen spans: {codegen}")
        lines.append("")
        failures += bool(problems)

    if run_scale:
        lines.append("## Scale audit — invariants re-asserted at 10× input")
        lines.append("")
        lines.append(
            "AQE join/skew choices depend on observed sizes; the five most "
            "expensive queries are re-planned against a 10×-replicated "
            "fixture and must keep their invariants."
        )
        lines.append("")
        scaled_dir = build_scaled_fixture(spark, sf_dir)
        for name in SCALE_AUDIT_QUERIES:
            if name not in qs:
                continue
            try:
                df = qs[name](spark, scaled_dir)
                df._jdf.queryExecution().executedPlan().execute().count()
                problems, plan = audit_one(name, df)
            except Exception as e:  # noqa: BLE001
                print(f"ERROR {name} @10x: {e}")
                failures += 1
                lines.append(f"- {name} @10×: ERROR {e}")
                continue
            status = "OK" if not problems else "FAIL: " + "; ".join(problems)
            print(f"{'OK  ' if not problems else 'FAIL'} {name} @10x")
            joins = sorted(
                set(
                    re.findall(
                        r"(\w*(?:HashJoin|NestedLoopJoin|SortMergeJoin|CartesianProduct)\w*)",
                        plan,
                    )
                )
            )
            lines.append(f"- {name} @10×: {status} (joins={joins or '-'})")
            failures += bool(problems)
        lines.append("")
        failures += window_bound_audit(
            spark, qs, sf_dir, scaled_dir, base_window_inputs, lines
        )
        failures += continuous_probe_audit(spark, qs, sf_dir, lines)
        failures += hot_value_probe_audit(spark, lines)
        failures += bucket_compile_audit(spark, lines)
        failures += candidate_growth_audit(spark, sf_dir, lines)
        failures += history_growth_audit(spark, sf_dir, lines)
        if "--no-100x" not in flags:
            failures += scale100_audit(spark, qs, sf_dir, lines)
        lines.append("### Skew handling (VERDICT r6 #7)")
        lines.append("")
        failures += skew_audit(spark, lines)
        lines.append("")

    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"), "w") as f:
        f.write("\n".join(lines))
    print(f"\n{len(qs) - failures}/{len(qs)} plans clean; PLANS.md written")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
