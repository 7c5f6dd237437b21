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


def test_state_rows_stay_bounded_under_watermark(spark):
    """The gauges as asserted invariants (VERDICT r2 #8): across a LONG
    ordered replay of a watermarked windowed aggregation, the state-store
    row count must track only the windows still inside the watermark
    horizon — NOT grow with total data processed. 20 day-chunks, 1-day
    tumbling windows, 2-day delay => at most ~4 windows of state alive at
    any trigger; unbounded growth here is the first operational failure
    mode at scale."""
    from m13_sparkstreaming_python_azure_spark.sources.replay import (
        publish_chunk,
    )

    root = tempfile.mkdtemp(prefix="state-bound-")
    land, ck = (os.path.join(root, d) for d in ("land", "ck"))
    days = 20
    chunks = [
        spark.createDataFrame(
            [
                (d * 100 + i, dt.datetime(2024, 2, 1 + d, 9, i, 0), float(i))
                for i in range(5)
            ],
            "id long, ts timestamp, v double",
        )
        for d in range(days)
    ]
    publish_chunk(chunks[0], land)
    stream = parquet_file_stream(spark, land, chunks[0].schema)
    agg = (
        stream.withWatermark("ts", "2 days")
        .groupBy(F.window("ts", "1 day"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    name = f"bound_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ck)
        .start()
    )
    q.processAllAvailable()
    max_state = 0
    for ch in chunks[1:]:
        publish_chunk(ch, land)
        q.processAllAvailable()
        s = progress_summary(q.lastProgress)
        if s.get("state_rows"):
            max_state = max(max_state, s["state_rows"])
    totals = history_summary(q)
    q.stop()
    # every chunk was on time — the watermark dropped nothing
    assert totals["total_rows_dropped_by_watermark"] == 0
    # all 20 windows flowed through, but state never held more than the
    # watermark horizon's worth (2-day delay + open window + slack)
    assert max_state > 0
    assert max_state <= 5, f"state grew to {max_state} rows (horizon is ~4)"
    assert spark.table(name).count() >= days - 3  # closed windows emitted
