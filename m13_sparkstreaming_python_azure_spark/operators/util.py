"""Shared operator utilities."""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


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


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Ensure at least ``min_partitions`` input partitions.

    Heavy per-row compute (sketching, hashing, feature extraction) placed
    before the first shuffle runs with the scan's parallelism. A corpus
    stored as a few small parquet files — like the test fixtures — scans as
    1-2 partitions, so the whole map stage runs on one core regardless of
    cluster size. A round-robin repartition up front fixes that. At real
    scale (thousands of input files) the partition count already exceeds
    the default parallelism and this is a no-op — no shuffle is added.
    """
    spark = df.sparkSession
    if min_partitions is None:
        min_partitions = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= min_partitions:
        return df
    return df.repartition(min_partitions)
