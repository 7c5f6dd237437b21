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
from m13_sparkstreaming_python_azure_spark.queries.round7_ext import (
    R7_ORACLES,
    R7_QUERIES,
)
from m13_sparkstreaming_python_azure_spark.queries.round8_ext import (
    R8_ORACLES,
    R8_QUERIES,
)
from m13_sparkstreaming_python_azure_spark.queries.round9_ext import (
    R9_ORACLES,
    R9_QUERIES,
)
from m13_sparkstreaming_python_azure_spark.queries.science_ext import (
    SCIENCE_ORACLES,
    SCIENCE_QUERIES,
)
from m13_sparkstreaming_python_azure_spark.queries.tpch_ext import (
    TPCH_EXT_ORACLES,
    TPCH_EXT_QUERIES,
)

def _narrow_shuffle(fn, n: int = 8, nodata_batches: bool = False):
    """Run a STREAMING gate with a narrow shuffle width and without
    no-data micro-batches. Stateful micro-batch operators keep one
    state-store instance per shuffle partition per batch; at gate volume
    32 partitions bound the state bookkeeping, not the data. Warm-session
    A/B at sf0.1 shows modest wins (~10% on the state-heavy gates, larger
    on cold first runs where 32-way state-store init dominates); the real
    point is the principle the two hand-tuned gates already applied —
    streaming width is pinned by the FIRST micro-batch and AQE can't fix
    it later, so it must be right before the stream starts.

    ``noDataMicroBatchesEnabled=false`` (VERDICT r7 #4): by default every
    data batch is FOLLOWED by an empty batch whose only job is advancing
    the watermark and evicting state — under the replay harness that
    doubles the batch count, and the gates don't need it: every gate
    already pushes the watermark with explicit far-future SENTINEL DATA
    batches (the chunked-replay contract), so eviction/flush happens on
    those real batches. Gate outputs are hash-verified unchanged. The
    exception (``nodata_batches=True``): append-mode window gates whose
    FINAL windows only emit on the trailing watermark-advance batch —
    ``_NODATA_GATES`` keeps the default for exactly those. Session confs
    are restored on exit; the returned sink-table aggregation runs at
    the restored width."""

    import functools

    @functools.wraps(fn)  # keep docstring/module for QUERIES.md generation
    def wrapped(spark, sf_dir):
        nodata = "spark.sql.streaming.noDataMicroBatches.enabled"
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        prev_nodata = spark.conf.get(nodata, None)
        spark.conf.set("spark.sql.shuffle.partitions", str(n))
        spark.conf.set(nodata, "true" if nodata_batches else "false")
        try:
            return fn(spark, sf_dir)
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
            if prev_nodata is None:
                spark.conf.unset(nodata)
            else:
                spark.conf.set(nodata, prev_nodata)

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
    "streaming_holt_level",
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
    **R7_QUERIES,
    **R8_QUERIES,
    **R9_QUERIES,
}
# append-mode window gates whose final windows emit ONLY on the trailing
# no-data watermark-advance batch (their replay scripts end on real data,
# not far-future sentinels) — keep the default for these three
_NODATA_GATES = {
    "streaming_append_windows",
    "streaming_late_data_drop",
    "streaming_sliding_windows",
}
for _name in _STREAMING_GATES:
    _ALL_QUERIES[_name] = _narrow_shuffle(
        _ALL_QUERIES[_name], nodata_batches=_name in _NODATA_GATES
    )
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
    **R7_ORACLES,
    **R8_ORACLES,
    **R9_ORACLES,
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
    # r13 OPTIMIZATION round 2: gates whose implementing code changed in
    # this perf pass lead the prefix.
    # ANN/codebook family — shared scored relation for the IVF recall
    # gate + the JVM TakeOrderedAndProject hash sample (the mapInPandas
    # pre-pass shipped the whole corpus to Python):
    "ann_ivf",
    "ann_pq",
    "ann_ivfpq",
    "streaming_ann_index",
    "semantic_dedup",
    # k_truss: one degree-keyed oriented edge relation shared across the
    # peeling rounds (two key-attach joins removed per round):
    "k_truss",
    # bloom predicate built as one JVM-parsed array literal (the
    # per-word F.lit shape cost ~5 s of driver time per query):
    "bloom_pruned_revenue",
    "bloom_point_lookup",
    # conformal: fit collected once as literals; calibration slice
    # checkpointed once for n_cal + the rank:
    "conformal_intervals",
    # global_rank string-lead construction: job B folded into job A for
    # short NUL-free string leads (speculative global second-column
    # sketch) — every gate through plan_rank_bounds/_plan_items_bounds:
    "null_semantics",
    "roc_auc",
    "ks_test",
    "ece_calibration",
    "auc_by_segment",
    "kruskal_wallis",
    "rfm_segments",
    "price_decile_stats",
    "conversion_latency",
    "hybrid_rrf_search",
    "record_linkage",
    "sorted_neighborhood_pairs",
    # ngram_novelty: one gram-keyed shuffle instead of two (min-owner
    # fold in the df aggregate):
    "ngram_novelty",
    # r12 carry-over (still-recent churn, kept leading one more round):
    "entity_clusters",
    "near_dup_clusters",
    "fuzzy_name_pairs",
    "label_propagation",
    "supplier_pagerank",
    "personalized_pagerank",
    "textrank_keywords",
    "k_core_customers",
    "bm25_prf_search",
    "bm25_search",
    "retrieval_eval",
    "ql_dirichlet_search",
    "domain_mixture_weights",
    "streaming_minhash_dedup",
    "streaming_incremental_dedup",
    "gdpr_delete",
    "streaming_latest_state",
    "streaming_view_maintenance",
    # snapshot/CDC family representatives (LSM keyed layout, r12):
    "fuzzy_decontamination",
    "snapshot_commit_group",
    "streaming_cdc_upsert",
    "hits_scores",
    # release_local_checkpoint fallback became debug-logged (util.py) —
    # its closure covers every iterative-graph gate; the two not already
    # leading:
    "bfs_shortest_paths",
    "bellman_ford_paths",
]
# The last head slots are RANDOM tail gates (r13, VERDICT r12 #3 of
# "What's wrong": the driver independently re-proves only the prefix-50,
# and a builder-curated prefix could in principle park a broken gate in
# the tail for a round). Seeding the picks from a sha256 over every
# package source file makes them deterministic for a given tree — the
# driver's gate and the local replica agree — while re-rolling whenever
# ANY code changes, so tail gates rotate through the driver-checked set
# without anyone hand-picking them. Picks are restricted to hash-gated
# tail entries (a rows-only pick would burn an unverifiable slot).
_N_RANDOM_TAIL = 3
# Two oracles are generated LAZILY in __spark_entry__.oracle_sql() (live
# scalar reference recomputations — too slow for import time), so they
# are absent from the static ORACLES dict but still hash-checked by the
# driver and eligible for the prefix:
_LAZY_ORACLE_GATES = {
    "multimodal_features", "multimodal_phash_dedup", "bpe_merges",
}


def _random_tail_gates(n: int, exclude: list[str]) -> list[str]:
    import hashlib
    import os

    pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    h = hashlib.sha256()
    for root, dirs, files in sorted(os.walk(pkg)):
        dirs[:] = sorted(d for d in dirs if d != "__pycache__")
        for fname in sorted(f for f in files if f.endswith(".py")):
            p = os.path.join(root, fname)
            h.update(os.path.relpath(p, pkg).encode())
            with open(p, "rb") as fh:
                h.update(fh.read())
    pool = sorted(
        ((set(ORACLES) | _LAZY_ORACLE_GATES) - set(exclude))
        & set(_ALL_QUERIES)
    )
    x = int.from_bytes(h.digest(), "big")
    picks: list[str] = []
    for _ in range(min(n, len(pool))):
        i = x % len(pool)
        x //= max(len(pool), 1)
        picks.append(pool.pop(i))
    return picks


_PRIORITY_50 = _head + _random_tail_gates(_N_RANDOM_TAIL, _head)
assert len(_PRIORITY_50) == 50, f"priority head has {len(_PRIORITY_50)} entries"
assert len(set(_PRIORITY_50)) == len(_PRIORITY_50), "duplicate priority name"
assert set(_PRIORITY_50) <= set(_ALL_QUERIES), "priority name missing from registry"
# The prefix is 100% hash-gated (see _LAZY_ORACLE_GATES above):
assert set(_PRIORITY_50) <= set(ORACLES) | _LAZY_ORACLE_GATES, (
    "rows-only query in the driver-checked prefix: "
    f"{sorted(set(_PRIORITY_50) - set(ORACLES) - _LAZY_ORACLE_GATES)}"
)

QUERIES = {name: _ALL_QUERIES[name] for name in _PRIORITY_50}
QUERIES.update({k: v for k, v in _ALL_QUERIES.items() if k not in QUERIES})

assert set(ORACLES) <= set(QUERIES), "oracle without a query"
