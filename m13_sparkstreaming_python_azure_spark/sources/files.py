"""Batch file sources & sinks (SURVEY.md §2.1 S1/S2/S4/S7).

The reference reads parquet day-dirs (``upload.py:66``), stamps a
``processed_date`` (``upload.py:67``) and rewrites them partitioned by
``year=/month=/day=`` paths built by hand (``upload.py:68-74``). Here the
path arithmetic is replaced by Spark's own ``partitionBy`` writer, which
also gives dynamic partition overwrite at scale.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_parquet(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """S1/S2: batch parquet scan with Hive partition discovery (built-in).
    Passing an explicit schema skips footer reads — at 100 TB the footer
    listing alone is a job, so production callers should pass one."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(path)


def stamp_processed_date(
    df: DataFrame, when: dt.datetime | None = None, col: str = "processed_date"
) -> DataFrame:
    """S7: ingest-time stamp. ``when=None`` → ``current_timestamp()`` (the
    at-scale idiom); a literal datetime reproduces upload.py:67 exactly."""
    value = F.current_timestamp() if when is None else F.lit(when)
    return df.withColumn(col, value)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str] = ("year", "month", "day"),
    mode: str = "overwrite",
) -> None:
    """S4: partitioned parquet sink. ``partitionBy`` to one root replaces the
    reference's manual ``{out}/year=…/month=…/day=…`` string building."""
    df.write.mode(mode).partitionBy(*partition_by).parquet(path)


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).parquet(path)


def write_parquet_sized(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    codec: str = "zstd",
    max_records_per_file: int | None = None,
    sort_within_partitions: list[str] | None = None,
) -> None:
    """Size- and layout-tuned parquet write — the knobs that matter at
    100 TB:

    - ``codec``: zstd ≈ gzip-level ratio at snappy-level read speed — the
      modern default for large archival/scan tables (snappy remains fine
      for hot intermediate data).
    - ``max_records_per_file`` caps file size so single files never exceed
      a task's comfortable input (~128-512 MB); without it, coalesced
      writers can emit multi-GB files that serialize downstream scans.
    - ``sort_within_partitions``: clustering columns sorted per file give
      parquet min/max row-group statistics real pruning power — a scan
      with a filter on the sort key skips whole row groups (poor man's
      Z-order for the single-column case).
    """
    if sort_within_partitions:
        df = df.sortWithinPartitions(*sort_within_partitions)
    writer = df.write.mode(mode).option("compression", codec)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer.parquet(path)


def compact_parquet(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    target_file_bytes: int = 256 * (1 << 20),
    codec: str = "zstd",
    sort_within_partitions: list[str] | None = None,
) -> int:
    """Small-file compaction: rewrite a directory of many small parquet
    files (the natural exhaust of streaming sinks and fine-grained
    partitioned ingest) into ~``target_file_bytes`` files. Returns the
    output file count.

    File count is sized from the ACTUAL on-disk bytes (cheap: file status
    listing, no data read), so compaction is one round-robin shuffle +
    write regardless of input layout. At 100 TB this runs per-partition
    (compact yesterday's partition after the stream moves on), never over
    the whole table at once.
    """
    import os

    total = 0
    for root, _dirs, names in os.walk(src_dir):
        for n in names:
            if n.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, n))
    n_files = max(1, -(-total // target_file_bytes))
    df = spark.read.parquet(src_dir)
    write_parquet_sized(
        df.repartition(n_files),
        dst_dir,
        codec=codec,
        sort_within_partitions=sort_within_partitions,
    )
    return n_files
