"""Shared operator utilities."""

from __future__ import annotations

import logging
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_log = logging.getLogger(__name__)


def release_local_checkpoint(df: DataFrame) -> None:
    """Free an eager ``localCheckpoint``'s storage blocks NOW instead of
    whenever the ContextCleaner gets around to it (the blocks otherwise
    linger until a JVM GC makes the dropped reference weakly reachable —
    across a 300+-query bench session the lingering checkpoints of every
    iterative operator accumulate into real executor-storage pressure;
    ``spark.catalog.clearCache()`` cannot touch them because they are
    RDD-level persists, not CacheManager entries).

    ONLY call this when no live or returned plan references the
    checkpoint — a localCheckpoint has no lineage to recompute from, so
    a released block that is read again fails the query outright
    (CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND). Best-effort: the LogicalRDD
    handle is internal API, so failures degrade to the old GC-timed
    release."""
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:  # noqa: BLE001 — hygiene only, never correctness
        # ADVICE r12: make the silent fallback observable — a Spark
        # upgrade moving the internal handle would otherwise turn every
        # release into a no-op and quietly re-open the storage-pressure
        # issue (tests/test_advice_r6.py's canary asserts a release
        # really drops a block, so CI catches it too)
        _log.debug("release_local_checkpoint fell back to GC-timed "
                   "release", exc_info=True)


def bind(value: Column, body: Callable[[Column], Column]) -> Column:
    """Let-binding for Column expressions: evaluate ``value`` once per row
    and reference it many times inside ``body``.

    Implemented as ``transform`` over a single-element array — the lambda
    variable is bound to the evaluated value, so however many times (or
    inside whatever nested lambdas) ``body`` references it, the underlying
    expression is computed exactly once. Without this, an expression
    referenced inside a higher-order-function lambda is re-evaluated once
    per array element (and Catalyst's CollapseProject happily inlines
    aliased expressions into lambdas, so a ``withColumn`` does NOT protect
    against it).
    """
    return F.element_at(F.transform(F.array(value), body), 1)


def spread(
    df: DataFrame,
    min_partitions: int | None = None,
    target_bytes_per_partition: int = 8 << 20,
) -> DataFrame:
    """Ensure enough input partitions for heavy per-row map compute.

    Heavy per-row compute (sketching, hashing, feature extraction) placed
    before the first shuffle runs with the scan's parallelism. A corpus
    stored as a few small parquet files — like the test fixtures — scans as
    1-2 partitions, so the whole map stage runs on one core regardless of
    cluster size. A round-robin repartition up front fixes that. At real
    scale (thousands of input files) the partition count already exceeds
    the default parallelism and this is a no-op — no shuffle is added.

    Size-aware: fanning a few-hundred-KB input out to N cores costs more in
    shuffle latency and Python-worker spin-up than the parallelism buys
    (measured 3.3s vs 0.4s on the 500-row fixture), so the partition count
    is capped at optimizer-estimated size / ``target_bytes_per_partition``
    (8 MB default — sized for map stages ~100× heavier per byte than a
    scan; cf. the 128 MB scan-partition rule in cluster_scale_conf).
    """
    spark = df.sparkSession
    if min_partitions is None:
        min_partitions = spark.sparkContext.defaultParallelism
    try:
        est_bytes = int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
        min_partitions = max(
            1, min(min_partitions, est_bytes // target_bytes_per_partition)
        )
    except Exception:  # noqa: BLE001 — stats are best-effort (internal API)
        pass
    if min_partitions <= 1 or df.rdd.getNumPartitions() >= min_partitions:
        return df
    return df.repartition(min_partitions)


def stable_ids(df: DataFrame, id_col: str = "row_id") -> DataFrame:
    """Dense unique BIGINT ids 0..n-1 WITHOUT a global sort — the
    zipWithIndex pattern, DataFrame-native.

    Two bounded passes:
    1. per-partition row counts (one tiny aggregate on
       spark_partition_id) collect to the driver and fold into exclusive
       prefix offsets — executors × 1 row, broadcast back;
    2. each partition assigns offset + local position in one vectorized
       mapInPandas sweep (no shuffle at all).

    The assignment follows the CURRENT partition layout: ids are dense
    and unique for this materialization but change if the partitioning
    changes — the contract every zipWithIndex has. The tagged input is
    pinned internally (MEMORY_AND_DISK persist — spills, never evicts in
    local mode) so the count pass and the assignment pass observe the
    SAME materialization even when the upstream plan is nondeterministic
    (repartition / sample / shuffle retry); it stays persisted because
    the returned DataFrame reads it. For fully deterministic ids
    independent of layout, sort on a unique key and pay the range
    shuffle, or hash the natural key (operators/chunking hash_split
    pattern)."""
    from typing import Iterator

    import pandas as pd
    from pyspark import StorageLevel

    tagged = df.withColumn("__pid", F.spark_partition_id()).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    counts = {
        r["__pid"]: r["cnt"]
        for r in tagged.groupBy("__pid")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    b_off = df.sparkSession.sparkContext.broadcast(offsets)

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pos = None
        for pdf in batches:
            if not len(pdf):
                continue
            if pos is None:
                pos = b_off.value[int(pdf["__pid"].iloc[0])]
            out = pdf.drop(columns=["__pid"])
            out[id_col] = range(pos, pos + len(pdf))
            pos += len(pdf)
            yield out

    schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields]
        + [f"{id_col} bigint"]
    )
    return tagged.mapInPandas(assign, schema=schema)
