"""Table catalog over driver-provided parquet fixtures (TESTDATA.md).

Loads the star schema (+ events/documents/embeddings) from an sf dir and
registers temp views so both the DataFrame API and ``spark.sql`` entry
points (SURVEY.md §2.11 C4) see the same tables.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Batch parquet scan (SURVEY.md §2.1 S1/S2) for one fixture table.

    ``events.ts`` is written as parquet TIMESTAMP(NANOS); with
    ``spark.sql.legacy.parquet.nanosAsLong`` Spark surfaces it as
    nanos-since-epoch long, converted here back to a timestamp (micros).
    """
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # Sessions not built by our factory (e.g. the driver's) infer parquet
    # isAdjustedToUTC=false timestamps as TIMESTAMP_NTZ (Spark >= 3.4
    # default); functions like unix_micros/watermarks reject NTZ. Normalize
    # EVERY ntz column on EVERY table to TIMESTAMP (wall-clock preserving
    # under the session tz, which our factory pins to UTC) so queries
    # behave identically under any session.
    ntz_cols = [c for c, t in df.dtypes if t == "timestamp_ntz"]
    for c in ntz_cols:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Register each table as a temp view (SQL entry point parity)."""
    dfs = load_tables(spark, sf_dir, names)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
