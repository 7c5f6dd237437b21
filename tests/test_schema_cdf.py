"""Schema evolution tracking + incremental change-data-feed on the
snapshot layer (round 7)."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from m13_sparkstreaming_python_azure_spark.sources.snapshots import (
    append_snapshot,
    compact_snapshot,
    delete_where,
    read_snapshot,
    restore_snapshot,
    schema_history,
    snapshot_changes_incremental,
    write_snapshot,
)


def _base(spark, lo, hi):
    return spark.range(lo, hi).select("id", (F.col("id") * 2).alias("v"))


def test_schema_history_tracks_column_arrival(spark, tmp_path):
    table = str(tmp_path / "t")
    write_snapshot(_base(spark, 0, 10).coalesce(1), table)
    append_snapshot(
        _base(spark, 10, 20)
        .withColumn("extra", F.lit("x"))
        .coalesce(1),
        table,
    )
    delete_where(spark, table, "id = 3")  # schema inherits unchanged
    hist = schema_history(table)
    assert "extra" not in hist[0]["schema"]
    assert "extra" in hist[1]["schema"]
    assert hist[2]["schema"] == hist[1]["schema"]
    # previous columns keep their position (history reads as appearance)
    assert hist[1]["schema"].index("id:") < hist[1]["schema"].index("extra:")
    merged = read_snapshot(spark, table, merge_schema=True)
    assert merged.filter(F.col("extra").isNull()).count() == 9  # id=3 gone


def test_incremental_cdf_inserts_and_deletes(spark, tmp_path):
    table = str(tmp_path / "t")
    write_snapshot(_base(spark, 0, 10).coalesce(1), table)  # v1
    append_snapshot(_base(spark, 10, 15).coalesce(1), table)  # v2
    delete_where(spark, table, "id IN (2, 12)")  # v3
    feed = snapshot_changes_incremental(spark, table, 1, 3).collect()
    got = {(r["id"], r["_change_type"], r["_commit_version"]) for r in feed}
    want = {(i, "insert", 2) for i in range(10, 15)} | {
        (2, "delete", 3),
        (12, "delete", 3),
    }
    assert got == want
    # a row inserted AND deleted in range appears as both (CDC semantics)
    assert (12, "insert", 2) in got and (12, "delete", 3) in got


def test_incremental_cdf_partial_range_and_empty(spark, tmp_path):
    table = str(tmp_path / "t")
    write_snapshot(_base(spark, 0, 10).coalesce(1), table)
    append_snapshot(_base(spark, 10, 12).coalesce(1), table)
    only_v2 = snapshot_changes_incremental(spark, table, 1, 2)
    assert only_v2.count() == 2
    empty = snapshot_changes_incremental(spark, table, 2, 2)
    assert empty.count() == 0 and "_change_type" in empty.columns
    with pytest.raises(ValueError):
        snapshot_changes_incremental(spark, table, 3, 2)


def test_incremental_cdf_refuses_rewrites_and_restores(spark, tmp_path):
    table = str(tmp_path / "t")
    write_snapshot(_base(spark, 0, 50).repartition(4), table)  # v1
    compact_snapshot(spark, table, target_file_bytes=1 << 30)  # v2 rewrite
    with pytest.raises(ValueError, match="snapshot_changes"):
        snapshot_changes_incremental(spark, table, 1, 2)
    delete_where(spark, table, "id = 1")  # v3
    restore_snapshot(table, 2)  # v4: resurrects id=1
    with pytest.raises(ValueError, match="snapshot_changes"):
        snapshot_changes_incremental(spark, table, 3, 4)
    # the DV-only hop inside the same table still feeds incrementally
    feed = snapshot_changes_incremental(spark, table, 2, 3).collect()
    assert [(r["id"], r["_change_type"]) for r in feed] == [(1, "delete")]


def test_consume_table_feed_cursor_and_replay(spark, tmp_path):
    from m13_sparkstreaming_python_azure_spark.sources.snapshots import (
        consume_table_feed,
        read_snapshot,
    )

    src, sink = str(tmp_path / "src"), str(tmp_path / "sink")
    assert consume_table_feed(spark, src + "x", sink) is None  # no table
    write_snapshot(_base(spark, 0, 10).coalesce(1), src)
    assert consume_table_feed(spark, src, sink) == 1
    assert consume_table_feed(spark, src, sink) is None  # caught up
    append_snapshot(_base(spark, 10, 14).coalesce(1), src)
    delete_where(spark, src, "id = 11")
    assert consume_table_feed(spark, src, sink) == 3  # one poll, 2 versions
    rows = {
        (r["id"], r["_change_type"], r["_commit_version"])
        for r in read_snapshot(spark, sink).collect()
    }
    assert (11, "insert", 2) in rows and (11, "delete", 3) in rows
    assert len([r for r in rows if r[1] == "insert"]) == 14
    # transform applied per poll
    append_snapshot(_base(spark, 20, 22).coalesce(1), src)
    assert (
        consume_table_feed(
            spark,
            src,
            sink,
            transform=lambda feed: feed.filter(F.col("id") % 2 == 0),
        )
        == 4
    )
    final = read_snapshot(spark, sink).filter("_commit_version = 4")
    assert sorted(r["id"] for r in final.collect()) == [20]


def test_generated_columns_lifecycle(spark, tmp_path):
    from m13_sparkstreaming_python_azure_spark.sources.snapshots import (
        ConstraintViolation,
        add_generated_column,
    )

    table = str(tmp_path / "t")
    write_snapshot(_base(spark, 0, 10).coalesce(1), table)  # no 'double_v'
    add_generated_column(spark, table, "double_v", "v * 2")
    # pre-declaration files complete at READ
    got = {r["id"]: r["double_v"] for r in read_snapshot(spark, table).collect()}
    assert got[3] == 12  # v = 6 → 12
    # appends omitting the column materialize it at write
    append_snapshot(_base(spark, 10, 12).coalesce(1), table)
    got = {
        r["id"]: r["double_v"]
        for r in read_snapshot(spark, table, merge_schema=True).collect()
    }
    assert got[11] == 44 and len(got) == 12
    # a writer contradicting the definition is rejected
    bad = _base(spark, 20, 22).withColumn("double_v", F.lit(0)).coalesce(1)
    with pytest.raises(ConstraintViolation, match="generated:double_v"):
        append_snapshot(bad, table)
    # a writer agreeing with it passes (null-safe equality)
    ok = _base(spark, 20, 22).withColumn(
        "double_v", F.col("v") * 2
    ).coalesce(1)
    append_snapshot(ok, table)
    assert read_snapshot(spark, table, merge_schema=True).count() == 14
    # declaring over contradicting EXISTING content is rejected
    t2 = str(tmp_path / "t2")
    write_snapshot(
        _base(spark, 0, 5).withColumn("w", F.lit(1)).coalesce(1), t2
    )
    with pytest.raises(ConstraintViolation):
        add_generated_column(spark, t2, "w", "v * 3")
    # definitions inherit through unrelated commits
    delete_where(spark, table, "id = 0")
    from m13_sparkstreaming_python_azure_spark.sources.snapshots import (
        read_manifest,
    )

    assert "double_v" in (read_manifest(table).get("generated") or {})
