"""Streaming progress metrics (streaming/metrics) and dynamic partition
pruning coverage (the optimizer feature the plan audit can't see without
a partitioned source)."""

from __future__ import annotations

import datetime as dt
import os
import tempfile
import uuid

from pyspark.sql import functions as F

from m13_sparkstreaming_python_azure_spark.sources.filestream import (
    parquet_file_stream,
)
from m13_sparkstreaming_python_azure_spark.streaming.metrics import (
    history_summary,
    progress_summary,
)


def test_progress_summary_tolerates_empty():
    assert progress_summary(None) == {}
    assert progress_summary({})["batch_id"] is None


def test_streaming_metrics_capture_state_and_watermark(spark):
    root = tempfile.mkdtemp(prefix="metrics-")
    land, ck = (os.path.join(root, d) for d in ("land", "ck"))
    rows = [
        (i, dt.datetime(2024, 1, 1 + i // 4, 9, i % 4, 0), float(i))
        for i in range(12)
    ]
    df = spark.createDataFrame(rows, "id long, ts timestamp, v double")
    df.write.mode("append").parquet(land)
    stream = parquet_file_stream(spark, land, df.schema)
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    name = f"metrics_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ck)
        .start()
    )
    q.processAllAvailable()
    last = progress_summary(q.lastProgress)
    hist = history_summary(q)
    q.stop()
    assert last["state_rows"] and last["state_rows"] > 0
    assert hist["total_input_rows"] == 12
    assert hist["n_triggers"] >= 1
    assert hist["total_rows_dropped_by_watermark"] == 0  # ordered input


def test_dynamic_partition_pruning_fires(spark):
    """Joining a partitioned fact with a selectively-filtered dim must
    inject a dynamic pruning subquery at the fact scan — the optimizer
    behavior that keeps partitioned-table joins from scanning every
    partition at 100 TB."""
    root = tempfile.mkdtemp(prefix="dpp-")
    fact = spark.range(0, 2000).select(
        F.col("id"), (F.col("id") % 20).alias("part_key")
    )
    fact.write.mode("overwrite").partitionBy("part_key").parquet(root)
    dim_rows = [(k, "keep" if k in (3, 7) else "drop") for k in range(20)]
    dim = spark.createDataFrame(dim_rows, ["part_key", "flag"])
    prev = spark.conf.get("spark.sql.optimizer.dynamicPartitionPruning.enabled")
    spark.conf.set(
        "spark.sql.optimizer.dynamicPartitionPruning.enabled", "true"
    )
    try:
        joined = (
            spark.read.parquet(root)
            .join(dim.filter(F.col("flag") == "keep"), on="part_key")
        )
        plan = joined._jdf.queryExecution().toString()
        assert "dynamicpruning" in plan.lower()
        # and the result is correct: only partitions 3 and 7 survive
        assert joined.count() == 200
    finally:
        spark.conf.set(
            "spark.sql.optimizer.dynamicPartitionPruning.enabled", prev
        )
