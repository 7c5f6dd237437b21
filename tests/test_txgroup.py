"""sources/txgroup — multi-table atomic commit groups: prepared table
versions stay invisible until the group commits, partial re-pins inherit,
group time travel works, and concurrent group commits serialize."""

from __future__ import annotations

import threading

import pytest
from pyspark.sql import functions as F

from m13_sparkstreaming_python_azure_spark.sources.snapshots import (
    append_snapshot,
    latest_version,
    write_snapshot,
)
from m13_sparkstreaming_python_azure_spark.sources.txgroup import (
    group_commit,
    group_history,
    latest_group_version,
    read_group,
    read_group_table,
)


@pytest.fixture()
def two_tables(spark, tmp_path):
    t_a, t_b = str(tmp_path / "a"), str(tmp_path / "b")
    gdir = str(tmp_path / "_group")
    write_snapshot(spark.range(10).select(F.col("id").alias("k")), t_a)
    write_snapshot(spark.range(5).select(F.col("id").alias("k")), t_b)
    group_commit(gdir, tables=[t_a, t_b], op="initial")
    return t_a, t_b, gdir


def test_prepared_versions_invisible_until_commit(spark, two_tables):
    t_a, t_b, gdir = two_tables
    append_snapshot(spark.range(10, 20).select(F.col("id").alias("k")), t_a)
    append_snapshot(spark.range(5, 9).select(F.col("id").alias("k")), t_b)
    # tables have advanced, the group has not: readers see the old pair
    assert latest_version(t_a) == 2 and latest_version(t_b) == 2
    assert read_group(gdir)["pins"] == {t_a: 1, t_b: 1}
    assert read_group_table(spark, gdir, t_a).count() == 10
    assert read_group_table(spark, gdir, t_b).count() == 5
    g2 = group_commit(gdir, tables=[t_a, t_b])
    assert read_group_table(spark, gdir, t_a).count() == 20
    assert read_group_table(spark, gdir, t_b).count() == 9
    # group time travel: the old consistent cut stays readable
    assert read_group_table(spark, gdir, t_a, version=1).count() == 10
    assert g2 == 2


def test_partial_repin_inherits_other_members(spark, two_tables):
    t_a, t_b, gdir = two_tables
    append_snapshot(spark.range(10, 12).select(F.col("id").alias("k")), t_a)
    group_commit(gdir, pins={t_a: 2})  # transaction touches only A
    pins = read_group(gdir)["pins"]
    assert pins == {t_a: 2, t_b: 1}  # B's pin inherited, not dropped


def test_unpinned_table_rejected(spark, two_tables):
    t_a, _, gdir = two_tables
    with pytest.raises(KeyError):
        read_group_table(spark, gdir, t_a + "-nope")


def test_commit_validation(spark, two_tables):
    t_a, t_b, gdir = two_tables
    with pytest.raises(ValueError, match="exactly one"):
        group_commit(gdir, pins={t_a: 1}, tables=[t_b])
    with pytest.raises(ValueError, match="no committed version"):
        group_commit(gdir, tables=[t_a + "-empty"])


def test_orphaned_manifest_no_livelock(spark, two_tables):
    """A committer that crashes AFTER the exclusive manifest create but
    BEFORE the _latest pointer swap must not livelock every successor
    (ADVICE r8): the next group_commit derives its version from the
    directory listing, adopts the orphan's pins, and publishes both."""
    import json
    import os

    t_a, t_b, gdir = two_tables
    append_snapshot(spark.range(10, 12).select(F.col("id").alias("k")), t_a)
    # simulate the crash: durable g2 manifest, _latest still at 1
    orphan = {
        "version": 2,
        "op": "crashed",
        "pins": {t_a: 2, t_b: 1},
        "committed_at": 0.0,
    }
    with open(os.path.join(gdir, "g00002.json"), "x") as f:
        f.write(json.dumps(orphan))
    assert latest_group_version(gdir) == 1
    # successor must claim 3 (not retry 2 forever) and adopt g2's pins
    v = group_commit(gdir, pins={t_b: 1}, op="successor")
    assert v == 3
    assert latest_group_version(gdir) == 3
    assert read_group(gdir)["pins"] == {t_a: 2, t_b: 1}  # orphan adopted


def test_concurrent_group_commits_serialize(spark, two_tables):
    t_a, t_b, gdir = two_tables
    barrier = threading.Barrier(2)
    got = []

    def committer(tag):
        barrier.wait()
        got.append(group_commit(gdir, pins={t_a: 1}, op=tag))

    ts = [threading.Thread(target=committer, args=(t,)) for t in ("x", "y")]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert sorted(got) == [2, 3]  # distinct versions, no clobber
    assert latest_group_version(gdir) == 3
    assert [h["version"] for h in group_history(gdir)] == [1, 2, 3]
