"""Tests for BFS distances (operators/graph), 2-D skyline
(operators/skyline), and GDPR delete_keys (sources/snapshots)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from m13_sparkstreaming_python_azure_spark.operators.graph import bfs_distances
from m13_sparkstreaming_python_azure_spark.operators.skyline import skyline_2d
from m13_sparkstreaming_python_azure_spark.sources.snapshots import (
    delete_keys,
    keyed_batch_sink,
    read_manifest,
    read_snapshot,
    vacuum_snapshots,
)


def _edges(spark, pairs):
    sym = pairs + [(b, a) for a, b in pairs]
    return spark.createDataFrame(sym, ["src", "dst"])


def test_bfs_path_graph(spark):
    # 1-2-3-4-5 path: dist(k) = k-1
    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    out = {r["node"]: r["dist"] for r in bfs_distances(e, 1, 10).collect()}
    assert out == {1: 0, 2: 1, 3: 2, 4: 3, 5: 4}


def test_bfs_max_hops_bound(spark):
    e = _edges(spark, [(1, 2), (2, 3), (3, 4)])
    out = {r["node"]: r["dist"] for r in bfs_distances(e, 1, 2).collect()}
    assert out == {1: 0, 2: 1, 3: 2}  # node 4 is 3 hops away


def test_bfs_shortest_wins_over_longer_path(spark):
    # two routes 1->4: direct edge (1 hop) and 1-2-3-4 (3 hops)
    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (1, 4)])
    out = {r["node"]: r["dist"] for r in bfs_distances(e, 1, 5).collect()}
    assert out[4] == 1


def test_skyline_matches_bruteforce(spark):
    pts = [(3.0, 5), (1.0, 9), (4.0, 2), (4.0, 2), (2.0, 7), (5.0, 1),
           (3.0, 6), (1.0, 9), (6.0, 1), (2.0, 9)]
    df = spark.createDataFrame(pts, ["x", "y"])
    out = {(r["x"], r["y"]): r["n_rows"] for r in skyline_2d(df, "x", "y").collect()}

    def dominated(a):
        return any(
            b[0] <= a[0] and b[1] <= a[1] and (b[0] < a[0] or b[1] < a[1])
            for b in pts
        )

    expect = {}
    for p in pts:
        if not dominated(p):
            expect[p] = expect.get(p, 0) + 1
    assert out == expect


def test_skyline_equal_points_not_mutually_dominating(spark):
    df = spark.createDataFrame([(1.0, 1), (1.0, 1)], ["x", "y"])
    out = skyline_2d(df, "x", "y").collect()
    assert len(out) == 1 and out[0]["n_rows"] == 2


def test_delete_keys_incremental_and_vacuum(spark, tmp_path):
    tdir = str(tmp_path / "keyed")
    rows = [(k, f"v{k}") for k in range(40)]
    df = spark.createDataFrame(rows, ["id", "val"])
    sink = keyed_batch_sink(tdir, ["id"], mode="merge", n_buckets=8)
    sink(df, 0)
    before = read_manifest(tdir)

    dels = spark.createDataFrame([(3,), (17,)], ["id"])
    v = delete_keys(spark, tdir, dels)
    after = read_manifest(tdir)
    assert after["version"] == v == before["version"] + 1
    assert after["op"] == "delete"
    # untouched buckets carry over BY REFERENCE (same file paths)
    touched = {
        r["__bucket"]
        for r in dels.withColumn(
            "__bucket", F.pmod(F.xxhash64("id"), F.lit(8)).cast("int")
        ).collect()
    }
    for b in range(8):
        bs = str(b)
        if b not in touched:
            assert after["parts"][bs]["files"] == before["parts"][bs]["files"]
        else:
            assert after["parts"][bs]["files"] != before["parts"][bs]["files"]
    # survivors correct
    got = {r["id"] for r in read_snapshot(spark, tdir).collect()}
    assert got == set(range(40)) - {3, 17}
    # batch_id high-water mark survives the delete commit (exactly-once)
    assert after.get("batch_id") == 0
    # vacuum physically removes the pre-delete files of touched buckets
    old_touched_files = [
        f
        for b in touched
        for f in before["parts"][str(b)]["files"]
    ]
    deleted = vacuum_snapshots(tdir, keep_last=1)
    assert set(old_touched_files) <= set(deleted)
    for f in old_touched_files:
        assert not os.path.exists(f)
    # table still reads correctly after vacuum
    assert {r["id"] for r in read_snapshot(spark, tdir).collect()} == got


def test_delete_keys_noop_on_absent_keys(spark, tmp_path):
    tdir = str(tmp_path / "keyed2")
    df = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "val"])
    keyed_batch_sink(tdir, ["id"], mode="merge", n_buckets=4)(df, 0)
    v1 = read_manifest(tdir)["version"]
    delete_keys(spark, tdir, spark.createDataFrame([(99,)], ["id"]))
    # a delete of absent keys still commits (their bucket rewrites), but
    # table contents are unchanged
    got = {r["id"] for r in read_snapshot(spark, tdir).collect()}
    assert got == {1, 2}
    assert read_manifest(tdir)["version"] >= v1
