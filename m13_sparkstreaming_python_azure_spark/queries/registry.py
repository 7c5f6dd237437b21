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
    "streaming_gdpr_erasure",
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
    # ROUND-6 gates (newest code, zero driver history)
    "deletion_vector_delete",      # new: positional soft deletes + purge
    "partitioned_snapshot_prune",  # new: manifest-level partition pruning
    "check_constraints",           # new: one-pass CHECK constraint report
    "streaming_cdc_upsert",        # new: ordered I/U/D foreachBatch merge
    "streaming_expectations",      # new: expect_or_drop + quarantine
    "nb_domain_classifier",        # new: multinomial NB, integer-grid scores
    "hits_scores",                 # new: HITS, exact BIGINT L1 normalize
    "info_gain_features",          # new: IG feature ranking, ln grid
    "majority_vote_labels",        # new: two-round Dawid-Skene-style vote
    "bm25_prf_search",             # new: RM3 pseudo-relevance feedback
    "ql_dirichlet_search",         # new: query-likelihood retrieval
    "ngram_novelty",               # new: df=1 8-gram novelty
    "oov_rate",                    # new: top-1000-vocab OOV per doc
    "fuzzy_decontamination",       # new: MinHash-LSH benchmark leakage
    "ccf_lag",                     # new: exact-integer CCF lead/lag
    "quantile_regression_p90",     # new: pinball IRLS fit
    "random_projection",           # new: JL md5-sign projection
    "binary_ann_search",           # new: sign-bit Hamming + exact rerank
    "tokenizer_fertility",         # new: BPE-per-word cost by language
    "domain_mixture_weights",      # new: DoReMi-lite mixture reweighting
    "personalized_pagerank",       # new: random walk with restart
    "streaming_gdpr_erasure",      # new: DV semi-join erasure feed
    "unseen_mass_good_turing",     # new: N1/N missing-mass per source
    "embedding_isotropy",          # new: centroid-norm anisotropy
    "cluster_purity_nmi",          # new: external kmeans evaluation
    "cohort_ltv",                  # new: cumulative cohort value curves
    "conversion_latency",          # new: exact-rank latency percentiles
    # never-driver-checked hash gates (VERDICT r4 #5 rotation, continued):
    # LLM-pipeline workhorses first, then the r5c statistics tail
    "perplexity_scores",
    "decontamination",
    "curation_pipeline",
    "sequence_packing",
    "hash_split",
    "sample_per_source",
    "weighted_sample_docs",
    "mixture_resample",
    "temperature_resample",
    "ngram_jaccard_pairs",
    "near_dup_clusters",
    "exact_dedup_survivors",
    "chunk_documents",
    "text_stats",
    "lang_id",
    "quality_score",
    "repetition_stats",
    "pii_redaction",
    "ann_bruteforce",
    "kmeans_clusters",
    # subsystem regression anchors (driver-green before, keep one each):
    "streaming_daily_stats",   # reference-shape streaming gate
    "cdc_apply",               # CDC/merge layer
]
# r6 rotation: the r5 head's round-5 gates all went driver-green in
# CORRECTNESS_r05 and rotate out; the 18 round-6 gates lead, followed by
# 29 hash gates the driver has NEVER checked (86 remained before this
# round; the rest stay replica-checked and rotate in next rounds).
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
