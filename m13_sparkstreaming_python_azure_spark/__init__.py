"""m13_sparkstreaming_python_azure_spark — PySpark-native analytics engine.

A brand-new, Spark-first re-engineering of the capabilities of the reference
repo ``Mamba369x/M13_SparkStreaming_PYTHON_AZURE`` (an Azure Databricks
Structured Streaming pipeline: incremental file ingest → streaming
groupBy aggregation → windowed top-k SQL analytics; see SURVEY.md).

Design principles (100 TB scale):
- DataFrame/SQL everywhere; Catalyst does pruning/pushdown/reorder.
- No row-at-a-time Python UDFs in hot paths; JVM built-ins or Arrow-batched
  Pandas UDFs only.
- Broadcast small dims; AQE on (coalesce + skew join); configurable shuffle
  partitions.
- Streaming = Structured Streaming with availableNow quiesce for tests,
  watermark/update-mode variants for unbounded scale.
"""

from m13_sparkstreaming_python_azure_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
