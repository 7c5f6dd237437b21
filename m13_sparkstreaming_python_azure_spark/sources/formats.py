"""Additional source/sink formats (SURVEY §2.1 GAP row: CSV/JSON/ORC).

Thin, schema-explicit wrappers over the built-in readers. The engine
default stays parquet (columnar, predicate pushdown, splittable); these
exist for ingest/interchange edges. Scale notes per format:
- CSV/JSON: schema REQUIRED in production paths — inference scans the data
  twice and types drift between runs. Not splittable when compressed with
  gzip; prefer many medium files.
- JSON: ``lines=True`` (JSONL) only — multi-line JSON parses on one core.
- ORC: columnar peer of parquet; kept for interchange with Hive-era lakes.

Kafka (`spark.readStream.format("kafka")`) is the streaming ingest peer of
these — untestable in this environment (no broker), so it stays
deliberately unwrapped rather than shipped unexercised.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    header: bool = True,
    **options: str,
) -> DataFrame:
    return (
        spark.read.format("csv")
        .schema(schema)
        .option("header", str(header).lower())
        .options(**options)
        .load(path)
    )


def read_jsonl(
    spark: SparkSession, path: str, schema: StructType, **options: str
) -> DataFrame:
    return (
        spark.read.format("json").schema(schema).options(**options).load(path)
    )


def read_orc(
    spark: SparkSession, path: str, schema: StructType | None = None
) -> DataFrame:
    reader = spark.read.format("orc")
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


def write_csv(df: DataFrame, path: str, header: bool = True) -> None:
    df.write.mode("overwrite").option("header", str(header).lower()).csv(path)


def write_jsonl(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)


def write_orc(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").orc(path)
