"""Bucketed-table storage for co-located joins (SURVEY §7 scale design).

Two fact tables bucketed by the same key into the same bucket count join
WITHOUT a shuffle: each task reads matching bucket files from both sides
(Exchange disappears from the plan; with ``sortBy`` the Sort goes too).
At 100 TB this converts the recurring join's full-table shuffle — the
dominant cost of a star-join pipeline — into a one-time cost at write.

Bucket count guidance: ``table_size / (bucket_count × replication)`` should
land near the target partition size (128-512 MB); both join sides MUST use
the same count (Spark won't coalesce mismatched bucket counts without
re-shuffling one side).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: Sequence[str],
    num_buckets: int,
    sort_cols: Sequence[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (optionally sorted) table. ``path``
    makes it an external table (tests use tmp dirs); bucketing metadata
    lives in the session catalog either way — ``spark.table(name)`` reads
    get the no-shuffle join."""
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)


def co_located_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str | Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-key same-count bucketed tables — planner output has no
    Exchange on either side (assert via tools/plan_audit-style checks)."""
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)
