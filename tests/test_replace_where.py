"""replace_where (Delta overwrite+replaceWhere parity) mechanics:
file-grain classify (keep / drop / rewrite), predicate validation of
inserted rows, lost-update guard, and time-travel preservation."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from m13_sparkstreaming_python_azure_spark.sources.snapshots import (
    CommitConflict,
    append_snapshot,
    read_manifest,
    read_snapshot,
    replace_where,
    write_snapshot,
)


def _mk(spark, lo, hi, tag):
    return spark.range(lo, hi).select(
        "id", F.lit(tag).alias("tag"), (F.col("id") * 10).alias("v")
    )


def test_pure_files_kept_or_dropped_without_rewrite(spark, tmp_path):
    """A file with no matching rows survives BYTE-IDENTICAL (same path in
    the new manifest); a file of only matching rows is dropped from the
    manifest but kept on disk for time travel."""
    table = str(tmp_path / "t")
    write_snapshot(_mk(spark, 0, 50, "a").coalesce(1), table)   # pure a
    append_snapshot(_mk(spark, 50, 80, "b").coalesce(1), table)  # pure b
    m_before = read_manifest(table)
    a_files = set(read_manifest(table, 1)["files"])

    v = replace_where(
        _mk(spark, 100, 110, "b"), table, "tag = 'b'"
    )
    m = read_manifest(table, v)
    # the pure-'a' file is carried over untouched
    assert a_files <= set(m["files"])
    # the pure-'b' file left the manifest but old versions still read
    assert read_snapshot(spark, table, version=2).count() == 80
    got = read_snapshot(spark, table)
    assert got.filter("tag = 'a'").count() == 50
    assert sorted(
        r["id"] for r in got.filter("tag = 'b'").collect()
    ) == list(range(100, 110))
    assert m["rows"] == 60
    assert m["op"] == "replace_where" and m["predicate"] == "tag = 'b'"
    assert m_before["version"] + 1 == v


def test_mixed_files_rewrite_only_survivors(spark, tmp_path):
    table = str(tmp_path / "t")
    both = _mk(spark, 0, 40, "a").unionByName(_mk(spark, 40, 60, "b"))
    write_snapshot(both.coalesce(1), table)  # ONE mixed file
    replace_where(_mk(spark, 200, 205, "b"), table, "tag = 'b'")
    got = read_snapshot(spark, table)
    assert got.count() == 45
    assert got.filter("tag = 'a'").count() == 40
    assert got.filter("id >= 200").count() == 5
    # the original mixed file is no longer referenced
    assert not set(read_manifest(table, 1)["files"]) & set(
        read_manifest(table)["files"]
    )


def test_insert_violating_predicate_refused(spark, tmp_path):
    table = str(tmp_path / "t")
    write_snapshot(_mk(spark, 0, 10, "a"), table)
    before = read_manifest(table)
    with pytest.raises(ValueError, match="violate"):
        replace_where(_mk(spark, 0, 3, "c"), table, "tag = 'b'")
    # nothing committed
    assert read_manifest(table)["version"] == before["version"]


def test_null_predicate_rows_survive_mixed_rewrite(spark, tmp_path):
    """Delta replaceWhere keeps every NON-matching row — including rows
    where the predicate evaluates to NULL. A NULL-region row sharing a
    file with a matching row must survive the rewrite (a bare
    ``NOT (pred)`` filter would null-eliminate it), and the committed
    manifest row count must equal what a full read sees."""
    table = str(tmp_path / "t")
    rows = spark.createDataFrame(
        [(0, "EU", 1), (1, None, 2), (2, "US", 3), (3, None, 4)],
        "id long, region string, v long",
    )
    write_snapshot(rows.coalesce(1), table)  # ONE mixed file w/ NULLs

    ins = spark.createDataFrame([(10, "EU", 99)], "id long, region string, v long")
    v = replace_where(ins, table, "region = 'EU'")
    got = read_snapshot(spark, table)
    # NULL-region rows (ids 1, 3) and the US row survive; EU replaced
    assert sorted(r["id"] for r in got.collect()) == [1, 2, 3, 10]
    assert got.filter("region IS NULL").count() == 2
    # manifest row count matches reality (was overstated pre-fix)
    assert read_manifest(table, v)["rows"] == got.count() == 4


def test_null_predicate_insert_rejected(spark, tmp_path):
    """An inserted row whose predicate evaluates to NULL does NOT satisfy
    it — validation must refuse it, not let it slip through a
    null-eliminating NOT filter."""
    table = str(tmp_path / "t")
    write_snapshot(_mk(spark, 0, 10, "a"), table)
    bad = spark.createDataFrame(
        [(50, None, 1)], "id long, tag string, v long"
    )
    with pytest.raises(ValueError, match="violate"):
        replace_where(bad, table, "tag = 'b'")


def test_concurrent_commit_raises_conflict(spark, tmp_path, monkeypatch):
    """A commit landing between classify and publish must fail the
    replace (lost-update guard), not silently drop the interleaved
    writer's rows."""
    import m13_sparkstreaming_python_azure_spark.sources.snapshots as snap

    table = str(tmp_path / "t")
    write_snapshot(_mk(spark, 0, 20, "a").coalesce(1), table)
    orig = snap._write_data_files
    state = {"raced": False}

    def racing(df, td):
        if not state["raced"]:
            state["raced"] = True
            append_snapshot(_mk(spark, 500, 510, "x").coalesce(1), table)
        return orig(df, td)

    monkeypatch.setattr(snap, "_write_data_files", racing)
    with pytest.raises(CommitConflict):
        replace_where(_mk(spark, 100, 103, "a"), table, "tag = 'a'")
