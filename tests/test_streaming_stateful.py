"""Tests for the stateful/advanced streaming surface (SURVEY §2.9 GAP rows):
streaming dedup, stream-static join, session windows,
applyInPandasWithState, RocksDB state store."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from m13_sparkstreaming_python_azure_spark.catalog import load_table
from m13_sparkstreaming_python_azure_spark.sources.filestream import (
    parquet_file_stream,
)
from m13_sparkstreaming_python_azure_spark.sources.replay import (
    replay_dataframe_by_key,
)
from m13_sparkstreaming_python_azure_spark.streaming.stateful import (
    rocksdb_state_conf,
    running_totals_with_state,
    session_window_aggregate,
    stream_static_join,
    stream_stream_interval_join,
    streaming_dedup,
)


def _events(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


def _replayed_stream(spark, sf_dir, tmp_path, n_batches=3, max_files=None):
    """Events split into date files on disk + a file stream over them."""
    ev = _events(spark, sf_dir).withColumn(
        "event_date", F.date_format("ts", "yyyy-MM-dd")
    )
    dates = sorted(
        r[0] for r in ev.select("event_date").distinct().collect()
    )[:n_batches]
    ev = ev.filter(F.col("event_date").isin(dates))
    root = str(tmp_path / "stream_src")
    for _ in replay_dataframe_by_key(ev, dates, "event_date", root):
        pass
    batch = spark.read.parquet(root)
    stream = parquet_file_stream(
        spark, root, batch.schema, max_files_per_trigger=max_files
    )
    return ev, batch, stream


def _run_to_memory(query_name, stream_df, output_mode="append", timeout=120):
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout)
    q.stop()


def test_streaming_dedup_matches_batch(spark, sf_dir, tmp_path):
    ev, batch, stream = _replayed_stream(spark, sf_dir, tmp_path)
    # duplicate the input by unioning it with itself → dedup must collapse
    dup_stream = streaming_dedup(stream.unionByName(stream), ["event_id"])
    _run_to_memory("dedup_sink", dup_stream.select("event_id"))
    got = spark.table("dedup_sink").count()
    assert got == batch.select("event_id").distinct().count()


def test_stream_static_join_parity(spark, sf_dir, tmp_path):
    ev, batch, stream = _replayed_stream(spark, sf_dir, tmp_path)
    dim = spark.createDataFrame(
        [("click", "engagement"), ("view", "engagement"), ("purchase", "revenue")],
        ["event_type", "category"],
    )
    joined = stream_static_join(stream, dim, on="event_type")
    _run_to_memory("ssjoin_sink", joined.select("event_id", "category"))
    got = sorted(tuple(r) for r in spark.table("ssjoin_sink").collect())
    want = sorted(
        tuple(r) for r in batch.join(dim, "event_type").select("event_id", "category").collect()
    )
    assert got == want
    assert len(got) > 0


def test_session_window_streaming_batch_parity(spark, sf_dir, tmp_path):
    ev, batch, stream = _replayed_stream(spark, sf_dir, tmp_path)
    agg_stream = session_window_aggregate(
        stream, gap="30 minutes", watermark_delay="10 days"
    )
    _run_to_memory("session_sink", agg_stream, output_mode="complete")
    got = sorted(
        (r["session"]["start"], r["session"]["end"], r["user_id"], r["n_events"], r["sum_value"])
        for r in spark.table("session_sink").collect()
    )
    agg_batch = session_window_aggregate(batch, gap="30 minutes")
    want = sorted(
        (r["session"]["start"], r["session"]["end"], r["user_id"], r["n_events"], r["sum_value"])
        for r in agg_batch.collect()
    )
    assert got == want
    assert len(got) > 0


def test_streaming_dedup_within_watermark(spark, sf_dir, tmp_path):
    """Watermarked dedup (dropDuplicatesWithinWatermark) — the bounded-state
    scale mode. With a delay larger than the replayed span, nothing is
    evicted early, so the result must equal batch distinct."""
    ev, batch, stream = _replayed_stream(spark, sf_dir, tmp_path)
    dup = streaming_dedup(
        stream.unionByName(stream),
        ["event_id"],
        ts_col="ts",
        watermark_delay="30 days",
    )
    _run_to_memory("wm_dedup_sink", dup.select("event_id"))
    got = spark.table("wm_dedup_sink").count()
    assert got == batch.select("event_id").distinct().count()


def test_stream_stream_interval_join_parity(spark, sf_dir, tmp_path):
    """Two file streams over the same replayed events joined stream-stream:
    each purchase matched to same-user clicks in the preceding 24 h (the sf0.001 slice is sparse); the
    watermarked interval join must equal the batch interval join."""
    ev, batch, stream = _replayed_stream(spark, sf_dir, tmp_path)
    root = str(tmp_path / "stream_src")
    stream2 = parquet_file_stream(spark, root, batch.schema)

    purchases = stream.filter(F.col("event_type") == "purchase")
    clicks = stream2.filter(F.col("event_type") == "click")
    joined = stream_stream_interval_join(
        purchases, clicks, key="user_id", max_lag="24 hours",
        watermark_delay="30 days",
    ).select(
        F.col("l.event_id").alias("purchase_id"),
        F.col("r.event_id").alias("click_id"),
    )
    _run_to_memory("ssj_sink", joined)
    got = sorted(tuple(r) for r in spark.table("ssj_sink").collect())

    bp = batch.filter(F.col("event_type") == "purchase").alias("l")
    bc = batch.filter(F.col("event_type") == "click").alias("r")
    cond = (
        (F.col("l.user_id") == F.col("r.user_id"))
        & (F.col("r.ts") >= F.col("l.ts") - F.expr("INTERVAL 24 HOURS"))
        & (F.col("r.ts") <= F.col("l.ts"))
    )
    want = sorted(
        tuple(r)
        for r in bp.join(bc, cond)
        .select(
            F.col("l.event_id").alias("purchase_id"),
            F.col("r.event_id").alias("click_id"),
        )
        .collect()
    )
    assert got == want
    assert len(got) > 0


def test_apply_in_pandas_with_state_accumulates(spark, sf_dir, tmp_path):
    """Force multiple micro-batches (one file per trigger) and check the
    per-key counter accumulates across them to the batch total."""
    ev, batch, stream = _replayed_stream(spark, sf_dir, tmp_path, max_files=1)
    totals = running_totals_with_state(stream)
    _run_to_memory("state_sink", totals, output_mode="update")
    sink = spark.table("state_sink")
    # multiple batches → at least one user has more than one update row
    multi = sink.groupBy("user_id").count().filter(F.col("count") > 1).count()
    assert multi > 0
    final = (
        sink.groupBy("user_id")
        .agg(F.max("n_events_total").alias("n_events_total"))
        .collect()
    )
    want = {
        r["user_id"]: r["cnt"]
        for r in batch.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    got = {r["user_id"]: r["n_events_total"] for r in final}
    assert got == want


def test_rocksdb_state_store_provider(spark, sf_dir, tmp_path):
    """Streaming agg runs (and matches batch) with the RocksDB state store
    provider — the at-scale state backend (§2.9 T4)."""
    ev, batch, stream = _replayed_stream(spark, sf_dir, tmp_path, max_files=1)
    before = {
        k: spark.conf.get(k, None) for k in rocksdb_state_conf()
    }
    for k, v in rocksdb_state_conf().items():
        spark.conf.set(k, v)
    try:
        agg = stream.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
        _run_to_memory("rocksdb_sink", agg, output_mode="complete")
        got = sorted(tuple(r) for r in spark.table("rocksdb_sink").collect())
        want = sorted(
            tuple(r)
            for r in batch.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
        )
        assert got == want
    finally:
        for k, v in before.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_transform_with_state_accumulates(spark, sf_dir, tmp_path):
    """transformWithStateInPandas (the Spark 4 stateful API) accumulates
    per-key totals across micro-batches to the batch ground truth, same
    contract as the applyInPandasWithState operator.

    Runs UNSKIPPED since r9: the vendored mini protobuf runtime
    (vendor/google/protobuf) satisfies the state-server protocol, and
    the query runs on the RocksDB provider (transformWithState uses
    multiple column families, which the HDFS-backed provider rejects).
    """
    pytest.importorskip(
        "google.protobuf.descriptor",
        reason="transformWithState needs protobuf for its state protocol",
    )
    from m13_sparkstreaming_python_azure_spark.streaming.stateful import (
        rocksdb_state_conf,
        running_totals_transform_with_state,
    )

    ev, batch, stream = _replayed_stream(spark, sf_dir, tmp_path, max_files=1)
    totals = running_totals_transform_with_state(stream)
    before = {k: spark.conf.get(k, None) for k in rocksdb_state_conf()}
    for k, v in rocksdb_state_conf().items():
        spark.conf.set(k, v)
    try:
        _run_to_memory("tws_sink", totals, output_mode="update")
    finally:
        for k, v in before.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    sink = spark.table("tws_sink")
    final = (
        sink.groupBy("user_id")
        .agg(F.max("n_events_total").alias("n_events_total"))
        .collect()
    )
    want = {
        r["user_id"]: r["cnt"]
        for r in batch.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    got = {r["user_id"]: r["n_events_total"] for r in final}
    assert got == want


def test_transform_with_state_list_and_map_state(spark, sf_dir, tmp_path):
    """transformWithState LIST + MAP named-state variables across
    micro-batches — exercises the state-server protocol paths the
    value-state test doesn't (AppendList, ListStateGet iteration,
    MapState updateValue/getValue/iterator with KeyAndValuePair
    responses), all through the vendored mini protobuf runtime."""
    pytest.importorskip(
        "google.protobuf.descriptor",
        reason="transformWithState needs protobuf for its state protocol",
    )
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from m13_sparkstreaming_python_azure_spark.streaming.stateful import (
        rocksdb_state_conf,
    )

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("n_ids_seen", LongType()),
            StructField("n_types", LongType()),
            StructField("sum_type_counts", LongType()),
        ]
    )

    class Profile(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._ids = handle.getListState("ids", "event_id BIGINT")
            self._by_type = handle.getMapState(
                "by_type", "event_type STRING", "n BIGINT"
            )

        def handleInputRows(self, key, rows, timerValues):  # noqa: ANN001
            for pdf in rows:
                self._ids.appendList(
                    [(int(v),) for v in pdf["event_id"]]
                )
                for t, n in pdf.groupby("event_type").size().items():
                    prev = (
                        self._by_type.getValue((t,))
                        if self._by_type.containsKey((t,))
                        else None
                    )
                    self._by_type.updateValue(
                        (t,), (int(n) + (prev[0] if prev else 0),)
                    )
            n_ids = sum(1 for _ in self._ids.get())
            pairs = list(self._by_type.iterator())
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_ids_seen": [n_ids],
                    "n_types": [len(pairs)],
                    "sum_type_counts": [sum(v[0] for _k, v in pairs)],
                }
            )

        def close(self) -> None:
            pass

    ev, batch, stream = _replayed_stream(spark, sf_dir, tmp_path, max_files=1)
    profiled = stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=Profile(),
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="None",
    )
    before = {k: spark.conf.get(k, None) for k in rocksdb_state_conf()}
    for k, v in rocksdb_state_conf().items():
        spark.conf.set(k, v)
    try:
        _run_to_memory("tws_lm_sink", profiled, output_mode="update")
    finally:
        for k, v in before.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    final = (
        spark.table("tws_lm_sink")
        .groupBy("user_id")
        .agg(
            F.max("n_ids_seen").alias("n_ids_seen"),
            F.max("n_types").alias("n_types"),
            F.max("sum_type_counts").alias("sum_type_counts"),
        )
        .collect()
    )
    want = {
        r["user_id"]: (r["n"], r["nt"])
        for r in batch.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("event_type").alias("nt"),
        )
        .collect()
    }
    got = {
        r["user_id"]: (r["n_ids_seen"], r["n_types"], r["sum_type_counts"])
        for r in final
    }
    assert got.keys() == want.keys()
    for u, (n, nt) in want.items():
        assert got[u] == (n, nt, n), u


def test_foreach_batch_merge_upsert_sink(spark, sf_dir, tmp_path):
    """Streaming CDC apply: update-mode aggregate emissions merged into a
    keyed parquet target per micro-batch; the final target equals the
    one-shot batch aggregate."""
    from m13_sparkstreaming_python_azure_spark.sources.snapshots import (
        read_snapshot,
    )
    from m13_sparkstreaming_python_azure_spark.streaming.pipeline import (
        write_foreach_batch_merge,
    )

    ev, batch, stream = _replayed_stream(spark, sf_dir, tmp_path, max_files=1)
    agg = stream.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("value").alias("sum_value"),
    )
    target = str(tmp_path / "merge_target")
    ckpt = str(tmp_path / "merge_ckpt")
    q = (
        write_foreach_batch_merge(agg, target, ckpt, keys=["event_type"])
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    q.stop()

    got = {
        r["event_type"]: (r["n"], round(r["sum_value"], 6))
        for r in read_snapshot(spark, target).collect()
    }
    want = {
        r["event_type"]: (r["n"], round(r["sum_value"], 6))
        for r in batch.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
        .collect()
    }
    assert got == want
    assert len(got) > 0


def test_state_data_source_reads_aggregate_state(spark, tmp_path):
    """Spark 4 state data source: the checkpointed keyed state of a
    streaming aggregate is externally readable and equals the sink-visible
    aggregate — the ops surface for hot-key inspection and state audits."""
    from pyspark.sql import functions as F

    from m13_sparkstreaming_python_azure_spark.catalog import load_table
    from m13_sparkstreaming_python_azure_spark.streaming.stateful import (
        read_state,
        read_state_metadata,
    )

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    ev = load_table(spark, "/root/testdata/sf0.001", "events").limit(500)
    ev.write.parquet(src)
    stream = (
        spark.readStream.schema(ev.schema)
        .parquet(src)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        stream.writeStream.outputMode("complete")
        .format("memory")
        .queryName("state_ds_probe")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    sink = {
        r["event_type"]: r["n"]
        for r in spark.sql("SELECT * FROM state_ds_probe").collect()
    }
    state = {
        r["key"]["event_type"]: r["value"]["count"]
        for r in read_state(spark, ckpt).collect()
    }
    assert state == sink and len(state) > 0

    md = read_state_metadata(spark, ckpt).collect()
    assert md[0]["operatorName"] == "stateStoreSave"
    assert md[0]["numPartitions"] == int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )


def test_streaming_near_dup_flags_match_batch_candidates(spark, tmp_path):
    """Streaming near-dup detection: arriving documents probe a static
    MinHash band index via a broadcast stream-static join. Two invariants:
    (1) the row-wise band expression (streaming-legal, no aggregate) equals
    the explode/groupBy index form bucket-for-bucket; (2) the streamed
    candidate pairs equal the batch band-collision candidates."""
    from pyspark.sql import functions as F

    from m13_sparkstreaming_python_azure_spark.catalog import load_table
    from m13_sparkstreaming_python_azure_spark.operators.dedup import (
        minhash_band_index,
        minhash_bands_rowwise,
    )
    from m13_sparkstreaming_python_azure_spark.streaming.stateful import (
        stream_static_join,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(200)
    # arriving batch: half exact dupes, half perturbed near-dupes
    arriving = (
        docs.limit(60)
        .select(
            (F.col("doc_id") + 1_000_000).alias("new_id"),
            F.when(
                F.col("doc_id") % 2 == 0, F.col("text")
            ).otherwise(F.concat(F.col("text"), F.lit(" tail tweak"))).alias(
                "text"
            ),
        )
    )

    # invariant 1: row-wise bands == agg-form index on the same rows
    agg_index = minhash_band_index(arriving, "new_id")
    row_index = arriving.select(
        "new_id",
        F.explode(minhash_bands_rowwise("text")).alias("bb"),
    ).select("new_id", "bb.band", "bb.bucket")
    assert sorted(map(tuple, agg_index.collect())) == sorted(
        map(tuple, row_index.collect())
    )

    # invariant 2: streamed probe == batch band-collision candidates
    corpus_index = minhash_band_index(docs, "doc_id")
    expected = sorted(
        map(
            tuple,
            row_index.join(corpus_index, on=["band", "bucket"])
            .select("new_id", "doc_id")
            .distinct()
            .collect(),
        )
    )

    src = str(tmp_path / "arrivals")
    arriving.write.parquet(src)
    stream = spark.readStream.schema(arriving.schema).parquet(src)
    flagged = stream_static_join(
        stream.select(
            "new_id", F.explode(minhash_bands_rowwise("text")).alias("bb")
        ).select("new_id", "bb.band", "bb.bucket"),
        corpus_index,
        on=["band", "bucket"],
    ).select("new_id", "doc_id")
    q = (
        flagged.writeStream.format("memory")
        .queryName("near_dup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        map(
            tuple,
            spark.sql(
                "SELECT DISTINCT new_id, doc_id FROM near_dup_stream"
            ).collect(),
        )
    )
    assert got == expected and len(got) > 0


def test_stream_stream_interval_join_left_outer(spark, sf_dir, tmp_path):
    """Outer stream-stream interval join: matched pairs equal the batch
    inner join, and unmatched purchases whose interval the advancing
    watermark has closed emit with a null right side. (The final batch's
    unmatched rows can stay buffered — no later batch advances the
    watermark past them — so the assertion is on closed intervals only.)"""
    ev, batch, stream = _replayed_stream(spark, sf_dir, tmp_path, max_files=1)
    root = str(tmp_path / "stream_src")
    stream2 = parquet_file_stream(spark, root, batch.schema, max_files_per_trigger=1)

    purchases = stream.filter(F.col("event_type") == "purchase")
    clicks = stream2.filter(F.col("event_type") == "click")
    joined = stream_stream_interval_join(
        purchases,
        clicks,
        key="user_id",
        max_lag="2 hours",
        watermark_delay="1 hour",
        how="left_outer",
    ).select(
        F.col("l.event_id").alias("purchase_id"),
        F.col("l.ts").alias("purchase_ts"),
        F.col("r.event_id").alias("click_id"),
    )
    _run_to_memory("ssj_outer_sink", joined)
    out = spark.table("ssj_outer_sink")

    bp = batch.filter(F.col("event_type") == "purchase").alias("l")
    bc = batch.filter(F.col("event_type") == "click").alias("r")
    cond = (
        (F.col("l.user_id") == F.col("r.user_id"))
        & (F.col("r.ts") >= F.col("l.ts") - F.expr("INTERVAL 2 HOURS"))
        & (F.col("r.ts") <= F.col("l.ts"))
    )
    want_inner = sorted(
        (r["purchase_id"], r["click_id"])
        for r in bp.join(bc, cond)
        .select(
            F.col("l.event_id").alias("purchase_id"),
            F.col("r.event_id").alias("click_id"),
        )
        .collect()
    )
    got_inner = sorted(
        (r["purchase_id"], r["click_id"])
        for r in out.filter(F.col("click_id").isNotNull()).collect()
    )
    assert got_inner == want_inner

    # purchases with NO click in range, restricted to intervals the final
    # watermark closed (ts + lag < max event ts - delay), must have a
    # null-click row
    max_ts = batch.agg(F.max("ts")).first()[0]
    import datetime as dt

    closed_before = max_ts - dt.timedelta(hours=3)  # delay 1h + lag 2h
    matched_ids = {p for p, _ in want_inner}
    want_unmatched = sorted(
        r["event_id"]
        for r in batch.filter(
            (F.col("event_type") == "purchase") & (F.col("ts") < closed_before)
        ).collect()
        if r["event_id"] not in matched_ids
    )
    got_unmatched = sorted(
        r["purchase_id"]
        for r in out.filter(
            F.col("click_id").isNull() & (F.col("purchase_ts") < closed_before)
        ).collect()
    )
    assert got_unmatched == want_unmatched
    assert len(got_unmatched) > 0


def test_streaming_ewma_matches_batch_across_chunks(spark, tmp_path):
    """ewma_with_state over a 2-chunk ordered replay must equal the batch
    ewma_control_chart row-for-row — the state buffer carries the window
    across the micro-batch boundary."""
    import datetime as dt
    import os
    import uuid

    from m13_sparkstreaming_python_azure_spark.operators.timeseries import (
        ewma_control_chart,
    )
    from m13_sparkstreaming_python_azure_spark.sources.filestream import (
        parquet_file_stream,
    )
    from m13_sparkstreaming_python_azure_spark.sources.replay import publish_chunk
    from m13_sparkstreaming_python_azure_spark.streaming.stateful import (
        ewma_with_state,
    )

    base = dt.datetime(2024, 3, 1)
    rows = [
        (i, base + dt.timedelta(minutes=i), "k" if i % 2 else "j", float((i * 37) % 100))
        for i in range(60)
    ]
    ev = spark.createDataFrame(rows, ["event_id", "ts", "event_type", "value"])
    land = os.path.join(str(tmp_path), "land")
    ck = os.path.join(str(tmp_path), "ck")
    first = ev.filter(F.col("event_id") < 30)
    second = ev.filter(F.col("event_id") >= 30)
    publish_chunk(first, land)
    stream = parquet_file_stream(spark, land, ev.schema)
    name = f"ewma_t_{uuid.uuid4().hex[:8]}"
    q = (
        ewma_with_state(stream, max_lag=5)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ck)
        .start()
    )
    q.processAllAvailable()
    publish_chunk(second, land)
    q.processAllAvailable()
    q.stop()
    got = {
        r["event_id"]: r["ewma"] for r in spark.table(name).collect()
    }
    want = {
        r["event_id"]: r["ewma"]
        for r in ewma_control_chart(ev, "event_type", max_lag=5).collect()
    }
    assert got == want
    assert len(got) == 60
