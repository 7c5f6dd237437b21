"""Streaming semantics tests (SURVEY.md §5.3): complete-mode monotonicity,
streaming↔batch parity, windowed+watermark variant, replay harness."""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import functions as F

from m13_sparkstreaming_python_azure_spark.catalog import load_table
from m13_sparkstreaming_python_azure_spark.operators.aggregate import grouped_stats
from m13_sparkstreaming_python_azure_spark.sources.replay import (
    discover_day_partitions,
    replay_dataframe_by_key,
    replay_partitions,
)
from m13_sparkstreaming_python_azure_spark.streaming.pipeline import (
    StreamingAggPipeline,
    windowed_event_aggregate,
)


def _events_with_date(spark, sf_dir):
    return load_table(spark, sf_dir, "events").withColumn(
        "event_date", F.date_format("ts", "yyyy-MM-dd")
    )


def _agg(stream):
    return grouped_stats(
        stream,
        ["event_type", "event_date"],
        "user_id",
        "value",
        distinct_alias="distinct_users",
        approx=True,
    )


def test_streaming_batch_parity(spark, sf_dir, tmp_path):
    """THE core invariant of the reference workload: quiesced complete-mode
    streaming aggregate == one-shot batch aggregate over the same files."""
    ev = _events_with_date(spark, sf_dir)
    days = sorted(r.event_date for r in ev.select("event_date").distinct().collect())
    src = str(tmp_path / "arrivals")
    for _ in replay_dataframe_by_key(ev, days, "event_date", src):
        pass
    pipe = StreamingAggPipeline(
        spark, src, ev.schema, _agg, query_name="parity_sink", max_files_per_trigger=4
    )
    sink = pipe.run_available_now()
    stream_rows = sorted(tuple(r) for r in sink.collect())
    batch_rows = sorted(tuple(r) for r in _agg(ev).collect())
    assert stream_rows == batch_rows


def test_complete_mode_monotonicity(spark, sf_dir, tmp_path):
    """Aggregate after N+1 arrival batches ⊇ (group-keys of) after N: the
    complete-mode table only folds data in, never drops it (§2.9 T2/T3)."""
    ev = _events_with_date(spark, sf_dir)
    days = sorted(r.event_date for r in ev.select("event_date").distinct().collect())[:6]
    src = str(tmp_path / "inc")
    seen_keys: set = set()
    arrivals = replay_dataframe_by_key(ev, days, "event_date", src)
    for i, _ in enumerate(arrivals):
        pipe = StreamingAggPipeline(
            spark, src, ev.schema, _agg, query_name=f"mono_{i}"
        )
        sink = pipe.run_available_now()
        keys = {
            (r.event_type, r.event_date)
            for r in sink.select("event_type", "event_date").collect()
        }
        assert seen_keys <= keys, f"batch {i} lost keys"
        seen_keys = keys
    assert len(seen_keys) > 0


def test_windowed_watermark_aggregate(spark, sf_dir, tmp_path):
    """Scale-path variant: event-time tumbling window + watermark, update
    mode — runs and produces per-window rows bounded by the event span."""
    ev = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "win")
    ev.write.mode("overwrite").parquet(src)
    from m13_sparkstreaming_python_azure_spark.sources.filestream import (
        parquet_file_stream,
    )

    stream = parquet_file_stream(spark, src, ev.schema)
    agg = windowed_event_aggregate(
        stream, window_duration="1 day", watermark_delay="2 days"
    )
    q = (
        agg.writeStream.outputMode("update")
        .format("memory")
        .queryName("win_sink")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.table("win_sink")
    n_days = ev.select(F.date_format("ts", "yyyy-MM-dd")).distinct().count()
    n_types = ev.select("event_type").distinct().count()
    assert 0 < out.count() <= n_days * n_types
    assert {"time_window", "event_type", "distinct_users", "n_events"} <= set(
        out.columns
    )


def test_foreach_batch_parquet_sink(spark, sf_dir, tmp_path):
    """Durable-sink variant (§2.9 T5): foreachBatch writes the complete-mode
    aggregate to parquet with a checkpoint; the final files equal the
    one-shot batch aggregate."""
    from m13_sparkstreaming_python_azure_spark.sources.filestream import (
        parquet_file_stream,
    )
    from m13_sparkstreaming_python_azure_spark.streaming.pipeline import (
        write_foreach_batch_parquet,
    )

    ev = _events_with_date(spark, sf_dir)
    dates = sorted(r[0] for r in ev.select("event_date").distinct().collect())[:3]
    ev = ev.filter(F.col("event_date").isin(dates))
    src = str(tmp_path / "src")
    for _ in replay_dataframe_by_key(ev, dates, "event_date", src):
        pass
    batch = spark.read.parquet(src)
    stream = parquet_file_stream(spark, src, batch.schema)
    sink = str(tmp_path / "sink")
    q = (
        write_foreach_batch_parquet(
            _agg(stream), sink, str(tmp_path / "ckpt")
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()
    got = sorted(tuple(r) for r in spark.read.parquet(sink).collect())
    want = sorted(tuple(r) for r in _agg(batch).collect())
    assert got == want
    assert len(got) > 0


def test_asof_join_ignores_null_keys(spark):
    """Null join keys must not match (equi-join semantics) — the
    union-window implementation filters them from the right side."""
    from m13_sparkstreaming_python_azure_spark.operators.join import asof_join

    left = spark.createDataFrame(
        [(1, 10.0, "l1"), (None, 10.0, "l2")],
        "k int, ts double, lv string",
    )
    right = spark.createDataFrame(
        [(1, 5.0, "r1"), (None, 5.0, "r_null"), (1, None, "r_null_ts")],
        "k int, ts double, rv string",
    )
    out = asof_join(left, right, on=["k"], left_ts="ts", right_ts="ts")
    by_lv = {r["lv"]: r["rv"] for r in out.collect()}
    # l1 matches r1; the null-key left row matches nothing (not r_null)
    assert by_lv == {"l1": "r1", "l2": None}


def test_replay_partitions_harness(spark, sf_dir, tmp_path):
    """The upload.py:80-106 pattern: write a day-partitioned dataset, replay
    it day-by-day with processed_date stamping, verify discovery order."""
    ev = _events_with_date(spark, sf_dir)
    source_root = str(tmp_path / "hive_src")
    (
        ev.withColumn("year", F.year("ts"))
        .withColumn("month", F.month("ts"))
        .withColumn("day", F.dayofmonth("ts"))
        .write.mode("overwrite")
        .partitionBy("year", "month", "day")
        .parquet(source_root)
    )
    days = discover_day_partitions(source_root)
    assert days == sorted(days)
    assert len(days) > 0

    target = str(tmp_path / "replayed")
    replayed = list(replay_partitions(spark, source_root, target, limit=3))
    assert len(replayed) == 3
    out = spark.read.parquet(target)
    assert "processed_date" in out.columns
    first_day = replayed[0][0]
    stamped = out.select("processed_date").distinct().collect()
    assert dt.datetime(first_day.year, first_day.month, first_day.day) in {
        r.processed_date for r in stamped
    }


def test_checkpoint_restart_exactly_once(spark, sf_dir, tmp_path):
    """Exactly-once across a stop/restart: run 1 drains the first two day
    files through an append foreachBatch sink with a checkpoint; more
    files land; run 2 resumes from the SAME checkpoint and must process
    only the new files — the union equals the batch result, no row
    duplicated or lost."""
    from m13_sparkstreaming_python_azure_spark.sources.filestream import (
        parquet_file_stream,
    )

    ev = _events_with_date(spark, sf_dir)
    dates = sorted(r[0] for r in ev.select("event_date").distinct().collect())[:4]
    ev = ev.filter(F.col("event_date").isin(dates))
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def write_days(days):
        for d in days:
            ev.filter(F.col("event_date") == d).write.mode("overwrite").parquet(
                os.path.join(src, f"batch={d}")
            )

    def run_once():
        schema = spark.read.parquet(src).schema
        stream = parquet_file_stream(spark, src, schema)

        def _append(batch_df, batch_id):
            batch_df.write.mode("append").parquet(sink)

        q = (
            stream.select("event_id").writeStream.outputMode("append")
            .foreachBatch(_append)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()

    write_days(dates[:2])
    run_once()
    n_first = spark.read.parquet(sink).count()
    assert n_first == ev.filter(F.col("event_date").isin(dates[:2])).count()

    write_days(dates[2:])
    run_once()
    got = sorted(r["event_id"] for r in spark.read.parquet(sink).collect())
    want = sorted(r["event_id"] for r in ev.select("event_id").collect())
    assert got == want  # every row exactly once across the restart


def test_streaming_histogram_replay_idempotent(spark, tmp_path):
    """A replayed micro-batch (same batch_id, same rows — the restart
    case) must leave the merged sketch unchanged; a NEW batch id adds."""
    from pyspark.sql import functions as F

    from m13_sparkstreaming_python_azure_spark.streaming.pipeline import (
        read_merged_histogram,
        write_batch_histogram,
    )

    sink = str(tmp_path / "sketches")
    b0 = spark.createDataFrame([("a", 1.0), ("a", 7.0), ("b", 3.0)], "k string, v double")
    b1 = spark.createDataFrame([("a", 7.0)], "k string, v double")
    args = ("v", ["k"], 0.0, 10.0, 10)
    write_batch_histogram(b0, 0, sink, *args)
    write_batch_histogram(b1, 1, sink, *args)
    before = sorted(map(tuple, read_merged_histogram(spark, sink, ["k"]).collect()))
    # restart replays batch 1
    write_batch_histogram(b1, 1, sink, *args)
    after = sorted(map(tuple, read_merged_histogram(spark, sink, ["k"]).collect()))
    assert before == after
    assert dict(((k, b), n) for k, b, n in after)[("a", 7)] == 2  # merged across batches


def test_python_streaming_datasource_exactly_once(spark, tmp_path):
    """Spark 4 Python streaming data source (SimpleDataSourceStreamReader):
    offset-deterministic batches land exactly-once through availableNow,
    and the total equals max_rows regardless of batch sizing."""
    from m13_sparkstreaming_python_azure_spark.sources.python_datasource import (
        SyntheticEventsStreamDataSource,
    )

    spark.dataSource.register(SyntheticEventsStreamDataSource)
    stream = (
        spark.readStream.format("synthetic_events_stream")
        .option("rows_per_batch", 120)
        .option("max_rows", 500)
        .load()
    )
    # availableNow only drains the one prefetched batch for simple stream
    # readers; run the default trigger and processAllAvailable() — it blocks
    # until the source stops advancing (read() returns an unchanged offset
    # at max_rows), which is this source's completion condition.
    q = (
        stream.writeStream.format("memory")
        .queryName("pyds_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.sql(
        "SELECT count(*) AS n, count(DISTINCT event_id) AS d FROM pyds_stream"
    ).collect()[0]
    assert rows["n"] == 500 and rows["d"] == 500


def test_stream_snapshot_sink_exactly_once_across_restart(spark, tmp_path):
    """foreachBatch → versioned-snapshot sink: each micro-batch commits one
    table version; a restart with the same checkpoint re-commits nothing,
    new arrivals commit incrementally, and a replayed batch_id is a no-op
    (the crash-recovery path, driven directly)."""
    from pyspark.sql import functions as F

    from m13_sparkstreaming_python_azure_spark.catalog import load_table
    from m13_sparkstreaming_python_azure_spark.sources.snapshots import (
        read_manifest,
        read_snapshot,
        latest_version,
        write_stream_snapshots,
    )

    src = str(tmp_path / "src")
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    ev = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "user_id", "value"
    )
    first, second = ev.filter("event_id % 2 = 0"), ev.filter("event_id % 2 = 1")
    first.write.parquet(src)

    def run():
        stream = spark.readStream.schema(first.schema).parquet(src)
        q = (
            write_stream_snapshots(stream, table, ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    v_after_first = latest_version(table)
    assert read_snapshot(spark, table).count() == first.count()

    # restart, no new data → no new commits
    run()
    assert latest_version(table) == v_after_first

    # new arrivals → incremental commit only
    second.write.mode("append").parquet(src)
    run()
    assert latest_version(table) > v_after_first
    assert read_snapshot(spark, table).count() == ev.count()

    # crash-replay: re-delivering an already-committed batch_id is a no-op
    from m13_sparkstreaming_python_azure_spark.sources.snapshots import (
        snapshot_batch_sink,
    )

    committed = read_manifest(table)["batch_id"]
    before = latest_version(table)
    snapshot_batch_sink(table)(first.limit(5), committed)
    assert latest_version(table) == before
    # a genuinely new batch_id still commits
    snapshot_batch_sink(table)(first.limit(5), committed + 1)
    assert latest_version(table) == before + 1


def test_day_lister_touches_only_unsealed_days(spark, tmp_path):
    """Scale guard for directory-listing ingest (VERDICT r1 #6): once a
    newer day exists, completed day dirs are sealed and NEVER re-listed —
    per-poll listing cost is bound to the current/unseen days. Files are
    returned exactly once, across polls and across lister restarts."""
    from m13_sparkstreaming_python_azure_spark.sources.fileindex import (
        DayPartitionedLister,
        incremental_snapshot_ingest,
    )
    from m13_sparkstreaming_python_azure_spark.sources.snapshots import (
        read_snapshot,
    )

    root = tmp_path / "landing"
    nation = spark.range(0, 30).selectExpr("id", "id * 2 as v")

    def land(day, lo, hi, part):
        d = root / f"date={day}"
        d.mkdir(parents=True, exist_ok=True)
        nation.filter(f"id >= {lo} and id < {hi}").coalesce(1).toPandas().to_parquet(
            str(d / f"part-{part}.parquet")
        )

    land("2024-01-01", 0, 10, 0)
    land("2024-01-02", 10, 20, 0)

    lister = DayPartitionedLister(str(root))
    first = lister.poll()
    assert len(first) == 2
    assert sorted(lister.last_listed_days) == ["date=2024-01-01", "date=2024-01-02"]

    # day 1 sealed (newer day exists) → never listed again; a new file in
    # the CURRENT day and a new day are both picked up
    land("2024-01-02", 20, 25, 1)
    land("2024-01-03", 25, 30, 0)
    second = lister.poll()
    assert len(second) == 2
    assert "date=2024-01-01" not in lister.last_listed_days
    assert sorted(lister.last_listed_days) == ["date=2024-01-02", "date=2024-01-03"]

    # restart: manifest persists, nothing re-delivered, old days stay sealed
    lister2 = DayPartitionedLister(str(root))
    assert lister2.poll() == []
    assert "date=2024-01-01" not in lister2.last_listed_days
    assert "date=2024-01-02" not in lister2.last_listed_days  # sealed by poll 2

    # end-to-end: day-pruned ingest into a snapshot table is exactly-once
    root2 = tmp_path / "landing2"
    table = str(tmp_path / "ingest_table")
    for day, lo, hi in [("2024-01-01", 0, 10), ("2024-01-02", 10, 20)]:
        d = root2 / f"date={day}"
        d.mkdir(parents=True, exist_ok=True)
        nation.filter(f"id >= {lo} and id < {hi}").coalesce(1).toPandas().to_parquet(
            str(d / "part-0.parquet")
        )
    l3 = DayPartitionedLister(str(root2))
    v1 = incremental_snapshot_ingest(spark, l3, table, batch_id=0)
    assert v1 == 1 and read_snapshot(spark, table).count() == 20
    # nothing new → no commit at all
    assert incremental_snapshot_ingest(spark, l3, table, batch_id=1) is None
    assert read_snapshot(spark, table).count() == 20


def test_snapshot_stream_source_appends_exactly_once(spark, tmp_path):
    """snapshot_stream (Python DataSourceStreamReader over the manifest
    layer): streams exactly the files newly committed per version — across
    appends, a restart from checkpoint, and a data-neutral compaction (no
    duplicates) — and fails fast on in-place-rewrite commits unless
    ignore_changes is set (the Delta streaming-source contract)."""
    import m13_sparkstreaming_python_azure_spark.sources.snapshots as snap
    from m13_sparkstreaming_python_azure_spark.sources.python_datasource import (
        SnapshotStreamDataSource,
    )

    spark.dataSource.register(SnapshotStreamDataSource)
    table = str(tmp_path / "stream_table")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    df1 = spark.range(0, 5).selectExpr("id", "id * 10 as v")
    snap.write_snapshot(df1, table)
    snap.append_snapshot(spark.range(5, 9).selectExpr("id", "id * 10 as v"), table)

    def drain():
        q = (
            spark.readStream.format("snapshot_stream")
            .option("table_dir", table)
            .load()
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    got = {r["id"]: r["v"] for r in spark.read.parquet(sink).collect()}
    assert got == {i: i * 10 for i in range(9)}

    # compaction is data-neutral: restart sees no new rows
    snap.compact_snapshot(spark, table)
    drain()
    assert spark.read.parquet(sink).count() == 9

    # a fresh append after the compaction streams only the delta
    snap.append_snapshot(spark.range(9, 12).selectExpr("id", "id * 10 as v"), table)
    drain()
    got = {r["id"]: r["v"] for r in spark.read.parquet(sink).collect()}
    assert got == {i: i * 10 for i in range(12)}

    # merge commit: fail fast by default...
    snap.merge_snapshot(
        spark, table, spark.range(0, 2).selectExpr("id", "id * 99 as v"), keys=["id"]
    )
    q = (
        spark.readStream.format("snapshot_stream")
        .option("table_dir", table)
        .load()
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    import pytest

    with pytest.raises(Exception, match="ignore_changes|StreamingQueryException|merge"):
        q.awaitTermination(120)
        if q.exception() is not None:
            raise q.exception()
    # ...and skip cleanly with ignore_changes
    q2 = (
        spark.readStream.format("snapshot_stream")
        .option("table_dir", table)
        .option("ignore_changes", "true")
        .load()
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    assert q2.exception() is None
