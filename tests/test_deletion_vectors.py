"""Deletion vectors (Delta DV / Iceberg position-delete parity): soft
deletes via positional sidecars — no data-file rewrite, stable time
travel, accumulate + purge, NULL-predicate semantics, and interaction
with append / compact / merge / restore / vacuum / point reads."""
from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from m13_sparkstreaming_python_azure_spark.sources.snapshots import (
    append_snapshot,
    attach_bloom_maps,
    attach_zone_maps,
    compact_snapshot,
    delete_where,
    dv_stats,
    merge_snapshot,
    purge_deletes,
    read_manifest,
    read_snapshot,
    read_snapshot_point,
    read_snapshot_pruned,
    replace_where,
    restore_snapshot,
    vacuum_snapshots,
    write_snapshot,
)


def _mk(spark, lo, hi, tag="a"):
    return spark.range(lo, hi).select(
        "id", F.lit(tag).alias("tag"), (F.col("id") * 10).alias("v")
    )


def _ids(spark, table):
    return sorted(
        r["id"] for r in read_snapshot(spark, table).select("id").collect()
    )


def test_delete_hides_rows_without_rewriting_files(spark, tmp_path):
    table = str(tmp_path / "t")
    write_snapshot(_mk(spark, 0, 100).coalesce(4), table)
    files_before = read_manifest(table)["files"]
    sizes_before = {f: os.path.getsize(f) for f in files_before}
    v = delete_where(spark, table, "id % 10 = 3")
    m = read_manifest(table)
    assert m["version"] == v and m["op"] == "delete"
    # data files are byte-identical and still all referenced
    assert m["files"] == files_before
    assert {f: os.path.getsize(f) for f in files_before} == sizes_before
    assert m["rows"] == 90 and m["n_deleted"] == 10
    assert _ids(spark, table) == [i for i in range(100) if i % 10 != 3]
    st = dv_stats(table)
    assert st["n_deleted"] == 10 and st["live_rows"] == 90


def test_time_travel_sees_pre_delete_content(spark, tmp_path):
    table = str(tmp_path / "t")
    write_snapshot(_mk(spark, 0, 40).coalesce(2), table)
    delete_where(spark, table, "id < 10")
    assert len(_ids(spark, table)) == 30
    old = read_snapshot(spark, table, version=1)
    assert old.count() == 40  # v1 has no dv_files — full content


def test_deletes_accumulate_and_overlap_does_not_double_count(
    spark, tmp_path
):
    table = str(tmp_path / "t")
    write_snapshot(_mk(spark, 0, 100).coalesce(3), table)
    delete_where(spark, table, "id < 30")
    # overlapping predicate: 20..49 — rows 20..29 are ALREADY deleted
    delete_where(spark, table, "id >= 20 AND id < 50")
    m = read_manifest(table)
    assert m["rows"] == 50
    assert dv_stats(table)["n_deleted"] == 50
    assert _ids(spark, table) == list(range(50, 100))


def test_null_predicate_rows_survive(spark, tmp_path):
    table = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "EU"), (2, None), (3, "US"), (4, None)], "id long, region string"
    )
    write_snapshot(df.coalesce(1), table)
    delete_where(spark, table, "region = 'EU'")
    kept = sorted(r["id"] for r in read_snapshot(spark, table).collect())
    assert kept == [2, 3, 4]  # NULL-region rows are NOT deleted


def test_zero_match_delete_commits_nothing(spark, tmp_path):
    table = str(tmp_path / "t")
    write_snapshot(_mk(spark, 0, 10), table)
    v = delete_where(spark, table, "id > 1000")
    assert v == 1 and read_manifest(table)["version"] == 1
    assert not read_manifest(table).get("dv_files")


def test_append_after_delete_does_not_resurrect(spark, tmp_path):
    table = str(tmp_path / "t")
    write_snapshot(_mk(spark, 0, 50).coalesce(2), table)
    delete_where(spark, table, "id < 20")
    append_snapshot(_mk(spark, 100, 110), table)
    m = read_manifest(table)
    assert m["op"] == "append" and m.get("dv_files")  # inherited
    assert m["rows"] == 40
    assert _ids(spark, table) == list(range(20, 50)) + list(range(100, 110))


def test_purge_rewrites_only_affected_files(spark, tmp_path):
    table = str(tmp_path / "t")
    write_snapshot(_mk(spark, 0, 50).coalesce(2), table)  # files A
    append_snapshot(_mk(spark, 50, 100).coalesce(2), table)  # files B
    delete_where(spark, table, "id < 25")  # touches only A's files
    before = set(read_manifest(table)["files"])
    ids_before = _ids(spark, table)
    purge_deletes(spark, table)
    m = read_manifest(table)
    assert m["op"] == "purge_deletes" and not m.get("dv_files")
    assert m["rows"] == 75
    # the untouched (B + unaffected-A) files carry over by reference
    assert before & set(m["files"])
    assert _ids(spark, table) == ids_before
    # idempotent no-op on a clean table
    assert purge_deletes(spark, table) == m["version"]


def test_compact_materializes_deletes(spark, tmp_path):
    table = str(tmp_path / "t")
    write_snapshot(_mk(spark, 0, 60).coalesce(3), table)
    delete_where(spark, table, "id % 2 = 0")
    compact_snapshot(spark, table)
    m = read_manifest(table)
    assert not m.get("dv_files") and m["rows"] == 30
    assert _ids(spark, table) == list(range(1, 60, 2))


def test_merge_applies_deletes_first(spark, tmp_path):
    table = str(tmp_path / "t")
    write_snapshot(_mk(spark, 0, 10), table)
    delete_where(spark, table, "id = 5")
    src = spark.createDataFrame([(5, "new", 999)], "id long, tag string, v long")
    merge_snapshot(spark, table, src, ["id"])
    out = {r["id"]: r["v"] for r in read_snapshot(spark, table).collect()}
    assert out[5] == 999 and len(out) == 10  # 5 re-inserted, not resurrected
    assert not read_manifest(table).get("dv_files")


def test_restore_restores_target_dv_state(spark, tmp_path):
    table = str(tmp_path / "t")
    write_snapshot(_mk(spark, 0, 30).coalesce(1), table)  # v1
    delete_where(spark, table, "id < 10")  # v2
    delete_where(spark, table, "id < 20")  # v3
    restore_snapshot(table, 2)  # back to "only id<10 deleted"
    assert _ids(spark, table) == list(range(10, 30))
    restore_snapshot(table, 1)  # back to everything (explicit empty DVs)
    assert _ids(spark, table) == list(range(30))


def test_replace_where_guard_on_dv_table(spark, tmp_path):
    table = str(tmp_path / "t")
    write_snapshot(_mk(spark, 0, 20, "a"), table)
    delete_where(spark, table, "id = 0")
    with pytest.raises(ValueError, match="purge_deletes"):
        replace_where(_mk(spark, 0, 5, "a"), table, "tag = 'a'")
    purge_deletes(spark, table)
    replace_where(
        _mk(spark, 100, 105, "a"), table, "tag = 'a'"
    )  # usable again
    assert _ids(spark, table) == list(range(100, 105))


def test_pruned_and_point_reads_apply_dvs(spark, tmp_path):
    table = str(tmp_path / "t")
    write_snapshot(_mk(spark, 0, 100).coalesce(4), table)
    attach_zone_maps(table, ["id"])
    attach_bloom_maps(table, ["id"])
    delete_where(spark, table, "id = 7 OR id = 70")
    got = sorted(
        r["id"]
        for r in read_snapshot_pruned(spark, table, "id", 0, 10).collect()
    )
    assert got == [0, 1, 2, 3, 4, 5, 6, 8, 9, 10]
    assert read_snapshot_point(spark, table, "id", 70).count() == 0
    assert read_snapshot_point(spark, table, "id", 71).count() == 1


def test_vacuum_reclaims_expired_dv_sidecars(spark, tmp_path):
    table = str(tmp_path / "t")
    write_snapshot(_mk(spark, 0, 40).coalesce(1), table)  # v1
    delete_where(spark, table, "id < 5")  # v2 (dv sidecar S1)
    purge_deletes(spark, table)  # v3 — S1 no longer referenced
    s1 = read_manifest(table, 2)["dv_files"]
    assert all(os.path.exists(p) for p in s1)
    vacuum_snapshots(table, keep_last=1)
    assert not any(os.path.exists(p) for p in s1)
    assert _ids(spark, table) == list(range(5, 40))


def test_delete_matching_semi_join_and_repeat_noop(spark, tmp_path):
    from m13_sparkstreaming_python_azure_spark.sources.snapshots import (
        delete_matching,
    )

    table = str(tmp_path / "t")
    write_snapshot(_mk(spark, 0, 40).coalesce(2), table)
    kill = spark.createDataFrame([(3,), (7,), (999,)], "id long")
    v = delete_matching(spark, table, kill, ["id"])
    assert read_manifest(table)["n_deleted"] == 2  # 999 absent
    assert _ids(spark, table) == [i for i in range(40) if i not in (3, 7)]
    # repeating the same kill list is a no-op commit
    assert delete_matching(spark, table, kill, ["id"]) == v
    assert read_manifest(table)["version"] == v
