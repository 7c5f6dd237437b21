"""Assembled query + oracle registry consumed by __spark_entry__."""

from __future__ import annotations

from m13_sparkstreaming_python_azure_spark.queries.analytics_ext import (
    ANALYTICS_ORACLES,
    ANALYTICS_QUERIES,
)
from m13_sparkstreaming_python_azure_spark.queries.behavior import (
    BEHAVIOR_ORACLES,
    BEHAVIOR_QUERIES,
)
from m13_sparkstreaming_python_azure_spark.queries.core import (
    CORE_ORACLES,
    CORE_QUERIES,
)
from m13_sparkstreaming_python_azure_spark.queries.llm import (
    LLM_ORACLES,
    LLM_QUERIES,
)
from m13_sparkstreaming_python_azure_spark.queries.pipeline_ext import (
    PIPELINE_ORACLES,
    PIPELINE_QUERIES,
)
from m13_sparkstreaming_python_azure_spark.queries.relational_ext import (
    EXT_ORACLES,
    EXT_QUERIES,
)
from m13_sparkstreaming_python_azure_spark.queries.round6_ext import (
    R6_ORACLES,
    R6_QUERIES,
)
from m13_sparkstreaming_python_azure_spark.queries.science_ext import (
    SCIENCE_ORACLES,
    SCIENCE_QUERIES,
)
from m13_sparkstreaming_python_azure_spark.queries.tpch_ext import (
    TPCH_EXT_ORACLES,
    TPCH_EXT_QUERIES,
)

def _narrow_shuffle(fn, n: int = 8):
    """Run a STREAMING gate with a narrow shuffle width. Stateful
    micro-batch operators keep one state-store instance per shuffle
    partition per batch; at gate volume 32 partitions bound the state
    bookkeeping, not the data. Warm-session A/B at sf0.1 shows modest
    wins (~10% on the state-heavy gates, larger on cold first runs
    where 32-way state-store init dominates); the real point is the
    principle the two hand-tuned gates already applied — streaming
    width is pinned by the FIRST micro-batch and AQE can't fix it later,
    so it must be right before the stream starts. Session width is
    restored on exit; the returned sink-table aggregation runs at the
    restored width."""

    import functools

    @functools.wraps(fn)  # keep docstring/module for QUERIES.md generation
    def wrapped(spark, sf_dir):
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(n))
        try:
            return fn(spark, sf_dir)
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)

    return wrapped


_STREAMING_GATES = [
    "streaming_daily_stats", "streaming_append_windows",
    "streaming_interval_join", "streaming_latest_state",
    "streaming_dedup", "streaming_histogram_quantiles",
    "streaming_view_maintenance", "streaming_ewma",
    "streaming_sessions", "streaming_outer_join",
    "streaming_late_data_drop", "streaming_ann_index",
    "streaming_incremental_dedup", "streaming_minhash_dedup",
    "streaming_sliding_windows",
    "streaming_full_outer_dedup",
    "streaming_topk_tokens",
    "streaming_dim_refresh",
    "streaming_semi_join",
    "streaming_cdc_upsert",
    "streaming_expectations",
]

_ALL_QUERIES = {
    **CORE_QUERIES,
    **EXT_QUERIES,
    **TPCH_EXT_QUERIES,
    **BEHAVIOR_QUERIES,
    **LLM_QUERIES,
    **ANALYTICS_QUERIES,
    **PIPELINE_QUERIES,
    **SCIENCE_QUERIES,
    **R6_QUERIES,
}
for _name in _STREAMING_GATES:
    _ALL_QUERIES[_name] = _narrow_shuffle(_ALL_QUERIES[_name])
ORACLES = {
    **CORE_ORACLES,
    **EXT_ORACLES,
    **TPCH_EXT_ORACLES,
    **BEHAVIOR_ORACLES,
    **LLM_ORACLES,
    **ANALYTICS_ORACLES,
    **PIPELINE_ORACLES,
    **SCIENCE_ORACLES,
    **R6_ORACLES,
}

# Registry ORDER is part of the external contract: the driver checks only
# the FIRST 50 entries per round (VERDICT r1/r2). The prefix therefore
# carries ONLY hash-gated queries (a rows-only entry burns a slot the
# driver cannot verify — VERDICT r2 #2) and covers every subsystem with at
# least one representative (core, relational-ext, TPC-H-ext, behavior,
# LLM, analytics, plus every streaming/CDC/snapshot gate — ADVICE r2),
# ordered newest-/highest-risk-first. Rows-only queries and everything
# else follow after slot 50; the full local gate replica
# (tools/check_correctness.py) still runs all of them.
_head = [
    "pricing_summary",  # flagship — must stay first
    # ROUND-5c additions (this session — newest code, zero driver history)
    "holt_winters",             # new: seasonal triple smoothing, list-state CTE oracle
    "ivm_join_refresh",         # new: join-view IVM, fact+dim same-batch changes
    "logistic_gd",              # new: GD-trained logistic classifier
    "tfidf_cosine_pairs",       # new: shingle TF-IDF cosine posting join
    "streaming_semi_join",      # new: stream-stream LEFT SEMI interval join
    "bucketed_join_revenue",    # new: exchange-free co-located bucket join
    "snapshot_vacuum",          # new: retention vacuum, content-only hash
    "textrank_keywords",        # new: PageRank keyword extraction
    "bellman_ford_paths",       # new: weighted shortest paths
    "item_cf_recommend",        # new: item-item cosine CF top-k
    "dp_sum_clipped",           # new: DP clipped-sum release
    "readability_scores",       # new: Flesch/FK readability
    "weighted_median",          # new: exact weighted median, pure integers
    "jm_trigram_perplexity",    # new: JM-interpolated trigram LM
    "change_feed_images",       # new: CDF pre/post images
    "lad_regression",           # new: L1/median regression via IRLS
    "source_jsd",               # new: per-source Jensen-Shannon drift
    # ROUND-5 new code (least driver history)
    "streaming_minhash_dedup",      # new: LSH near-dup streaming dedup
    "streaming_full_outer_dedup",   # new: full-outer join + in-stream dedup
    "kaplan_meier",  # r4's one gate failure — NTZ fix must prove green
    "bloom_point_lookup",       # new: per-file bloom point-lookup skipping
    "model_quality_scores",     # new: hashed-feature linear classifier inference
    "ece_calibration",          # new: reliability bins + integer-exact ECE
    "streaming_sliding_windows",  # new: hopping-window finalization gate
    "snapshot_restore",         # new: RESTORE + shallow CLONE
    "token_heavy_hitters",      # new: Misra-Gries + exact verify
    "kn_perplexity",            # new: Kneser-Ney bigram LM
    "label_propagation",        # new: LPA communities, recursive-CTE oracle
    "auc_by_segment",           # new: per-slice tie-aware AUC
    # ROUND-5b additions (this session — newest code, zero driver history)
    "log_rank_test",            # new: two-group survival chi-square
    "spearman_corr",            # new: tie-aware doubled-rank Spearman
    "welch_ttest",              # new: unequal-variance t + W-S df
    "gini_concentration",       # new: pure-BIGINT-ratio Gini
    "acf_daily_events",         # new: exact-integer ACF lags 1-14
    "phrase_search",            # new: positional phrase postings
    "k_anonymity",              # new: QI equivalence-class privacy audit
    "rfm_segments",             # new: ntile(5) RFM cell census
    "holt_forecast",            # new: IEEE-bit-equal Holt recursion
    "replace_where_backfill",   # new: Delta replaceWhere parity
    "anova_oneway",             # new: shift-centered exact-int ANOVA F
    "streaming_topk_tokens",    # new: streaming additive-count top-k
    "cv_regression",            # new: k-fold CV via sufficient stats
    "conformal_intervals",      # new: split-conformal coverage
    "entity_clusters",          # new: ER transitive-closure census
    "huber_regression",         # new: IRLS robust fit, quantized sums
    "lsh_recall_eval",          # new: measured LSH precision/recall
    "streaming_dim_refresh",    # new: per-batch dim snapshot re-read
    # (dp_group_counts and curation_pipeline rotated out for the two
    # newest gates; dp_sum_clipped exercises the same md5-Laplace
    # machinery plus clipping, and both remain replica-checked.)
    # subsystem regression anchors (driver-green before, keep one each):
    "streaming_daily_stats",   # reference-shape streaming gate
    "cdc_apply",               # CDC/merge layer
]
# Dropped from the head this session to make room for the 12 round-5b
# gates (all remain registry queries checked by the local replica; all
# are row-local ops with the lowest breakage risk of the rotation set):
# text_stats, lang_id, quality_score, hash_split, chunk_documents,
# sample_per_source, weighted_sample_docs, mixture_resample,
# temperature_resample, pii_redaction, embedding_quantize,
# multimodal_resize, string_functions, datetime_functions, map_functions,
# ann_bruteforce, embedding_pairs_exact, pivot_status_priority.
# ADVICE r3 #1: _head IS the 50-slot prefix — no silent [:50] slice. Adding
# a name requires dropping one, and the length assert fails otherwise.
# (Rotated out over r3/r4, all driver-verified green in earlier rounds:
# chi_square_independence, skyline_orders, bfs_shortest_paths,
# json_dlq_routing, hybrid_rrf_search, ab_test_zscore, week_over_week,
# topn_with_other, record_linkage, bigram_perplexity,
# winsorized_value_stats, hard_negative_mining, leakage_safe_split,
# best_quality_survivors, loo_target_encoding, quantile_normalize,
# quality_prune_floors, lateral_top_orders, k_core_customers,
# pca_covariance, scd2_history — the last ten are r3-green
# CORRECTNESS_r03 rows; scd2_pit_join keeps SCD2 semantics in the head.
# Rotated out in r5 — ALL driver-green in CORRECTNESS_r04: ppjoin_pairs,
# containment_pairs, skew_profile, mutual_information, benford_digits,
# kfold_assignment, sequence_pattern_match, passage_dedup, retrieval_eval,
# jaro_winkler_pairs, geo_radius_join, pmi_phrases, feature_hashing,
# link_prediction, lexicon_sentiment, zonemap_pruned_scan, bow_dedup,
# scd2_pit_join, cohens_kappa, poisson_bootstrap_ci, embedding_drift,
# woe_iv, roc_auc, ks_test, cuped_lift, psi_drift, and the r2-r4
# streaming/CDC gates not kept as anchors below; the r5 head instead
# leads with 13 round-5 gates + 34 never-driver-checked hash gates per
# VERDICT r4 #5 + 3 anchors.)
_PRIORITY_50 = _head
assert len(_PRIORITY_50) == 50, f"priority head has {len(_PRIORITY_50)} entries"
assert len(set(_PRIORITY_50)) == len(_PRIORITY_50), "duplicate priority name"
assert set(_PRIORITY_50) <= set(_ALL_QUERIES), "priority name missing from registry"
assert set(_PRIORITY_50) <= set(ORACLES), (
    "rows-only query in the driver-checked prefix: "
    f"{sorted(set(_PRIORITY_50) - set(ORACLES))}"
)

QUERIES = {name: _ALL_QUERIES[name] for name in _PRIORITY_50}
QUERIES.update({k: v for k, v in _ALL_QUERIES.items() if k not in QUERIES})

assert set(ORACLES) <= set(QUERIES), "oracle without a query"
