"""End-to-end tour of the manifest lakehouse layer (sources/snapshots.py +
sources/python_datasource.py) — the Delta-less durable-table path:

  1. land a batch as table version 1                (write_snapshot)
  2. stream micro-batches in exactly-once           (write_stream_snapshots)
  3. MERGE a CDC correction as a new version        (merge_snapshot)
  4. compact small files without breaking readers   (compact_snapshot)
  5. commit history + timestamp time travel         (history / read_snapshot_as_of)
  6. key-level change feed between versions         (snapshot_changes)
  7. stream-the-table: new versions as micro-batches (snapshot_stream source)
  8. keyed latest-state sink (bucketed, incremental) (keyed_batch_sink)
  9. vacuum expired versions                        (vacuum_snapshots)

Every step commits through the same atomic manifest pointer swap; on a real
deployment each call maps 1:1 onto Delta/Iceberg (see README "Snapshots vs
Delta/Iceberg").

Run: python examples/lakehouse_tour.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from m13_sparkstreaming_python_azure_spark.catalog import load_table
from m13_sparkstreaming_python_azure_spark.session import get_spark
from m13_sparkstreaming_python_azure_spark.sources import snapshots as snap
from m13_sparkstreaming_python_azure_spark.sources.filestream import (
    parquet_file_stream,
)
from m13_sparkstreaming_python_azure_spark.sources.python_datasource import (
    SnapshotStreamDataSource,
)


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark("lakehouse-tour")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="lakehouse-")
    table = os.path.join(root, "orders_table")

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", F.round("o_totalprice", 2).alias("o_totalprice")
    )

    # 1. batch landing → version 1
    half = orders.filter(F.col("o_orderkey") % 2 == 0)
    snap.write_snapshot(half, table)
    print(f"v1: {snap.read_snapshot(spark, table).count()} rows")

    # 2. stream the other half in, exactly-once (file stream → snapshot sink)
    landing = os.path.join(root, "landing")
    orders.filter(F.col("o_orderkey") % 2 == 1).write.parquet(landing)
    stream = parquet_file_stream(
        spark, landing, orders.schema, max_files_per_trigger=8
    )
    q = (
        snap.write_stream_snapshots(stream, table, os.path.join(root, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    print(f"after stream: {snap.read_snapshot(spark, table).count()} rows "
          f"(= {orders.count()} batch rows)")
    t_before_merge = time.time()

    # 3. CDC correction: zero out every 100th order's price
    fix = orders.filter(F.col("o_orderkey") % 100 == 0).withColumn(
        "o_totalprice", F.lit(0.0)
    )
    snap.merge_snapshot(spark, table, fix, keys=["o_orderkey"])

    # 4. compaction — old versions stay readable
    snap.compact_snapshot(spark, table)

    # 5. history + timestamp time travel
    for h in snap.history(table):
        print(f"  v{h['version']}: {h['rows']} rows, {h['n_files']} files, "
              f"batch_id={h['batch_id']}")
    pre_merge = snap.read_snapshot_as_of(spark, table, t_before_merge)
    assert pre_merge.filter(
        (F.col("o_orderkey") % 100 == 0) & (F.col("o_totalprice") == 0.0)
    ).count() == 0, "time travel must predate the merge"
    print("time travel to pre-merge state: OK")

    # 6. change feed across the merge
    merge_v = next(
        h["version"] for h in snap.history(table) if h["version"] >= 2
    )
    changes = snap.snapshot_changes(
        spark, table, ["o_orderkey"], merge_v - 1, merge_v + 1
    )
    changes.groupBy("_change_type").count().show()

    # 7. stream-the-table: a fresh consumer replays appends incrementally
    spark.dataSource.register(SnapshotStreamDataSource)
    append_table = os.path.join(root, "append_only")
    snap.write_snapshot(half.limit(100), append_table)
    snap.append_snapshot(half.limit(50), append_table)
    sink = os.path.join(root, "stream_sink")
    q2 = (
        spark.readStream.format("snapshot_stream")
        .option("table_dir", append_table)
        .load()
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", os.path.join(root, "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    print(f"snapshot_stream drained {spark.read.parquet(sink).count()} rows "
          "(150 expected)")

    # 8. keyed latest-state table: bucketed, partition-incremental upserts
    keyed = os.path.join(root, "keyed_state")
    sink_fn = snap.keyed_batch_sink(
        keyed, keys=["o_orderkey"], mode="latest", order_cols=["o_totalprice"]
    )
    sink_fn(orders.limit(1000), 0)
    sink_fn(orders.limit(100).withColumn("o_totalprice", F.lit(9e9)), 1)
    top = snap.read_snapshot(spark, keyed).filter(F.col("o_totalprice") == 9e9)
    print(f"keyed latest-state: {top.count()} rows took the newer price")

    # 9. data skipping: zone maps (ranges) + blooms (point lookups)
    snap.attach_zone_maps(table, ["o_orderkey"])
    snap.attach_bloom_maps(table, ["o_orderkey"], num_bits=65536)
    some_key = orders.select("o_orderkey").first()[0]
    m = snap.read_manifest(table)
    kept = snap.prune_files_bloom(m, "o_orderkey", some_key)
    print(f"bloom point lookup opens {len(kept)}/{len(m['files'])} files; "
          f"rows={snap.read_snapshot_point(spark, table, 'o_orderkey', some_key).count()}")

    # 10. incident recovery: RESTORE rolls content back as a NEW commit
    before = snap.latest_version(table)
    snap.write_snapshot(orders.limit(1), table)  # the bad overwrite
    snap.restore_snapshot(table, before)
    print(f"restored to v{before}: "
          f"{snap.read_snapshot(spark, table).count()} rows, history intact "
          f"({len(snap.history(table))} versions)")

    # 11. shallow clone for a dev sandbox (zero copy)
    clone = os.path.join(root, "orders_clone")
    snap.clone_snapshot(table, clone)
    print(f"clone reads {snap.read_snapshot(spark, clone).count()} rows "
          "without copying a byte")

    # 12. vacuum everything but the latest two versions
    dead = snap.vacuum_snapshots(table, keep_last=2)
    print(f"vacuumed {len(dead)} expired files; latest still reads "
          f"{snap.read_snapshot(spark, table).count()} rows")
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:])
