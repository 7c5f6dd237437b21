"""Hive-partitioned snapshots: manifest-level partition pruning,
partition-grain replace, partitioned append, layout guards, DV interplay."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from m13_sparkstreaming_python_azure_spark.sources.snapshots import (
    add_check_constraint,
    append_snapshot_partitioned,
    compact_snapshot,
    delete_where,
    prune_files_partitions,
    read_manifest,
    read_snapshot,
    read_snapshot_partitioned,
    read_snapshot_partitions,
    replace_partition,
    replace_where,
    write_snapshot_partitioned,
)


def _mk(spark, lo, hi):
    return spark.range(lo, hi).select(
        "id",
        (F.col("id") % 3).cast("string").alias("bucket"),
        (F.col("id") * 10).alias("v"),
    )


def test_partition_pruned_read_plans_subset(spark, tmp_path):
    table = str(tmp_path / "t")
    write_snapshot_partitioned(_mk(spark, 0, 90), table, "bucket")
    m = read_manifest(table)
    assert m["partition_col"] == "bucket"
    pruned = prune_files_partitions(m, ["1"])
    assert pruned and len(pruned) < len(m["files"])
    got = read_snapshot_partitions(spark, table, ["1"])
    assert sorted(r["id"] for r in got.collect()) == [
        i for i in range(90) if i % 3 == 1
    ]
    # partition column survives the basePath read
    assert set(got.columns) == {"id", "v", "bucket"}
    # pruning equals the filter contract
    full = read_snapshot_partitioned(spark, table)
    assert full.count() == 90


def test_replace_partition_is_atomic_and_scoped(spark, tmp_path):
    table = str(tmp_path / "t")
    write_snapshot_partitioned(_mk(spark, 0, 30), table, "bucket")
    newp = spark.range(100, 105).select(
        "id", F.lit("1").alias("bucket"), F.lit(0).alias("v")
    )
    replace_partition(newp, table, "1")
    full = read_snapshot_partitioned(spark, table)
    ids = sorted(r["id"] for r in full.collect())
    assert ids == [i for i in range(30) if i % 3 != 1] + list(range(100, 105))
    assert read_manifest(table)["rows"] == len(ids)
    # rows outside the target partition are rejected before commit
    bad = spark.range(1, 3).select(
        "id", F.lit("2").alias("bucket"), F.lit(0).alias("v")
    )
    with pytest.raises(ValueError, match="outside partition"):
        replace_partition(bad, table, "1")
    # time travel sees the pre-replace content
    assert read_snapshot_partitioned(spark, table, version=1).count() == 30


def test_partitioned_append_and_constraints(spark, tmp_path):
    table = str(tmp_path / "t")
    write_snapshot_partitioned(_mk(spark, 0, 30), table, "bucket")
    add_check_constraint(spark, table, "v_nonneg", "v >= 0")
    append_snapshot_partitioned(_mk(spark, 30, 45), table)
    assert read_snapshot_partitioned(spark, table).count() == 45
    m = read_manifest(table)
    assert set(m["partitions"].values()) == {"0", "1", "2"}
    from m13_sparkstreaming_python_azure_spark.sources.snapshots import (
        ConstraintViolation,
    )

    bad = spark.createDataFrame(
        [(999, "0", -1)], "id long, bucket string, v long"
    )
    with pytest.raises(ConstraintViolation):
        append_snapshot_partitioned(bad, table)


def test_layout_guards_and_dv_read(spark, tmp_path):
    table = str(tmp_path / "t")
    write_snapshot_partitioned(_mk(spark, 0, 60), table, "bucket")
    with pytest.raises(ValueError, match="per partition"):
        compact_snapshot(spark, table)
    with pytest.raises(ValueError, match="replace_partition"):
        replace_where(_mk(spark, 0, 5), table, "bucket = '0'")
    # DV delete keeps the layout; pruned + full reads apply it
    delete_where(spark, table, "id % 10 = 0")
    m = read_manifest(table)
    assert m["partition_col"] == "bucket" and m["partitions"]  # inherited
    got = read_snapshot_partitions(spark, table, ["0"])
    assert sorted(r["id"] for r in got.collect()) == [
        i for i in range(60) if i % 3 == 0 and i % 10 != 0
    ]
    # generic read_snapshot also reconstructs the partition column
    assert "bucket" in read_snapshot(spark, table).columns


def test_compact_partition_materializes_dvs_and_keeps_layout(
    spark, tmp_path
):
    from m13_sparkstreaming_python_azure_spark.sources.snapshots import (
        compact_partition,
    )

    table = str(tmp_path / "t")
    write_snapshot_partitioned(_mk(spark, 0, 90), table, "bucket")
    append_snapshot_partitioned(_mk(spark, 90, 120), table)
    delete_where(spark, table, "id % 5 = 0")  # hits every bucket
    before = read_manifest(table)
    n_b1_files = sum(1 for v in before["partitions"].values() if v == "1")
    assert n_b1_files >= 2 and before["dv_files"]
    compact_partition(spark, table, "1")
    m = read_manifest(table)
    # bucket-1 files merged; other buckets carried over by reference
    n_b1_after = sum(1 for v in m["partitions"].values() if v == "1")
    assert n_b1_after < n_b1_files
    kept = set(before["files"]) & set(m["files"])
    assert kept and all(before["partitions"][f] != "1" for f in kept)
    # DVs for bucket 1 materialized; others still apply; counts exact
    expect = [i for i in range(120) if i % 5 != 0]
    got = sorted(r["id"] for r in read_snapshot_partitioned(spark, table).collect())
    assert got == expect and m["rows"] == len(expect)
    b1 = read_snapshot_partitions(spark, table, ["1"])
    assert sorted(r["id"] for r in b1.collect()) == [
        i for i in expect if i % 3 == 1
    ]
