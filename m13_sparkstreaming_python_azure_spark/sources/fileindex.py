"""File-level secondary index: per-file min/max of a key column, used to
prune the file list BEFORE the scan for point/range lookups on
non-partition keys.

Partition pruning only helps keys the layout was partitioned by; parquet
row-group stats help only after a file is opened. For "fetch one id from
100 TB", the win is not opening 99.99% of files at all: a tiny index table
(one row per file) turns a full-corpus scan into a handful of file reads —
provided the writer clustered the key (`write_parquet_sized(...,
sort_within_partitions=[key])` or a z-order layout; on random layouts
every file's [min,max] spans the domain and nothing prunes).

The index is itself a DataFrame — persist it as parquet next to the data
(rebuild on compaction) and it costs one aggregate over the corpus,
reusable by every subsequent lookup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def build_file_index(
    spark: SparkSession, path: str, key_col: str
) -> DataFrame:
    """One scan → (file, key_min, key_max, n_rows) per data file."""
    df = spark.read.parquet(path)
    return (
        df.groupBy(F.input_file_name().alias("file"))
        .agg(
            F.min(key_col).alias("key_min"),
            F.max(key_col).alias("key_max"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


def prune_files(index: DataFrame, lo, hi) -> list[str]:
    """Files whose [key_min, key_max] intersects [lo, hi] — the candidate
    list for a range lookup (a point lookup is lo == hi)."""
    return [
        r["file"]
        for r in index.filter(
            (F.col("key_max") >= F.lit(lo)) & (F.col("key_min") <= F.lit(hi))
        ).collect()
    ]


def indexed_lookup(
    spark: SparkSession,
    index: DataFrame,
    key_col: str,
    lo,
    hi=None,
) -> DataFrame:
    """Range/point lookup through the index: read ONLY intersecting files,
    then apply the exact predicate (the index over-approximates; parquet
    row-group stats refine further inside each opened file). Returns an
    empty, correctly-typed DataFrame when nothing intersects."""
    hi = lo if hi is None else hi
    files = prune_files(index, lo, hi)
    if not files:
        any_file = [r["file"] for r in index.limit(1).collect()]
        empty = spark.read.parquet(*any_file).filter(F.lit(False))
        return empty
    return spark.read.parquet(*files).filter(
        (F.col(key_col) >= F.lit(lo)) & (F.col(key_col) <= F.lit(hi))
    )
