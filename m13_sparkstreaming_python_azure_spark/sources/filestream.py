"""Streaming file source — OSS stand-in for Databricks Auto Loader.

The reference uses the proprietary ``cloudFiles`` format
(``stream.ipynb:111-114``); for directory-listing discovery of parquet
files the open-source equivalent is the built-in file stream source with a
rate cap (SURVEY.md §2.1 S3). Semantics for this workload are identical:
newly arrived files become micro-batch input exactly once.

Scale note: directory-listing discovery is O(files) per trigger; at very
large file counts, production swaps to notification-based discovery or
Delta CDF — the consuming pipeline is unchanged because it only sees a
streaming DataFrame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def parquet_file_stream(
    spark: SparkSession,
    path: str,
    schema: StructType,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """S3: incremental parquet ingest. The file stream source requires an
    explicit schema — same constraint the reference satisfied with
    ``.schema(df.schema)`` (stream.ipynb:113)."""
    reader = spark.readStream.format("parquet").schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(path)
