"""Incremental view maintenance (operators/ivm.py): the refresh must be
row-identical to a full recompute for every change kind — inserts,
deletes, in-group updates, group-crossing updates, group birth/death."""

from __future__ import annotations

from pyspark.sql import functions as F

from m13_sparkstreaming_python_azure_spark.operators.ivm import (
    grouped_view,
    incremental_refresh,
    table_changes_images,
)


def _rows(df):
    return sorted(
        tuple(str(v) for v in r) for r in df.collect()
    )


def _refresh_equals_recompute(spark, v1_rows, v2_rows):
    cols = ["id", "grp", "val"]
    v1 = spark.createDataFrame(v1_rows, cols)
    v2 = spark.createDataFrame(v2_rows, cols)
    prev = grouped_view(v1, ["grp"], ["val"])
    images = table_changes_images(v1, v2, ["id"])
    got = incremental_refresh(prev, images, ["grp"], ["val"])
    want = grouped_view(v2, ["grp"], ["val"])
    assert _rows(got) == _rows(want)


def test_refresh_covers_all_change_kinds(spark):
    v1 = [
        (1, "a", 10.0),
        (2, "a", 20.0),
        (3, "b", 30.0),
        (4, "b", 40.0),
        (5, "c", 50.0),
    ]
    v2 = [
        (1, "a", 11.0),  # in-group update
        (2, "b", 20.0),  # group-crossing update
        (3, "b", 30.0),  # untouched
        # 4 deleted
        # 5 deleted -> group c dies
        (6, "d", 60.0),  # insert -> group d born
    ]
    _refresh_equals_recompute(spark, v1, v2)


def test_refresh_group_death_filters_zero_rows(spark):
    v1 = [(1, "a", 1.0), (2, "b", 2.0)]
    v2 = [(2, "b", 2.0)]
    cols = ["id", "grp", "val"]
    sv1 = spark.createDataFrame(v1, cols)
    sv2 = spark.createDataFrame(v2, cols)
    out = incremental_refresh(
        grouped_view(sv1, ["grp"], ["val"]),
        table_changes_images(sv1, sv2, ["id"]),
        ["grp"],
        ["val"],
    )
    assert {r["grp"] for r in out.collect()} == {"b"}


def test_refresh_is_chainable(spark):
    # v1 -> v2 -> v3: refreshing twice equals recomputing at v3
    cols = ["id", "grp", "val"]
    v1 = [(i, "g" + str(i % 3), float(i)) for i in range(12)]
    v2 = [(i, "g" + str(i % 4), float(i * 2)) for i in range(2, 14)]
    v3 = [(i, "g" + str(i % 2), float(i * 3)) for i in range(5, 20)]
    s1, s2, s3 = (spark.createDataFrame(v, cols) for v in (v1, v2, v3))
    view = grouped_view(s1, ["grp"], ["val"])
    view = incremental_refresh(
        view, table_changes_images(s1, s2, ["id"]), ["grp"], ["val"]
    )
    view = incremental_refresh(
        view, table_changes_images(s2, s3, ["id"]), ["grp"], ["val"]
    )
    assert _rows(view) == _rows(grouped_view(s3, ["grp"], ["val"]))


def test_empty_change_feed_is_identity(spark):
    cols = ["id", "grp", "val"]
    v1 = spark.createDataFrame([(1, "a", 1.5), (2, "b", 2.5)], cols)
    out = incremental_refresh(
        grouped_view(v1, ["grp"], ["val"]),
        table_changes_images(v1, v1, ["id"]),
        ["grp"],
        ["val"],
    )
    assert _rows(out) == _rows(grouped_view(v1, ["grp"], ["val"]))


def test_view_snapshot_maintenance_end_to_end(spark, tmp_path):
    """Stream micro-batches into a keyed snapshot table, refresh the
    materialized view after each commit, and require the view to equal a
    full recompute at every step — with the refresh path (not bootstrap)
    doing the work after the first batch."""
    import m13_sparkstreaming_python_azure_spark.sources.snapshots as snap
    from m13_sparkstreaming_python_azure_spark.operators.ivm import (
        refresh_view_snapshot,
    )

    base = str(tmp_path / "base")
    view = str(tmp_path / "view")
    sink = snap.keyed_batch_sink(base, keys=["k"], mode="merge", n_buckets=4)
    schema = "k int, grp string, val double"

    batches = [
        [(i, "g" + str(i % 3), float(i)) for i in range(30)],
        [(i, "g" + str(i % 2), float(i * 10)) for i in range(10, 40)],
        [(7, "g9", 7.5), (100, "g9", 100.0)],
    ]
    for bid, rows in enumerate(batches):
        sink(spark.createDataFrame(rows, schema), bid)
        refresh_view_snapshot(spark, base, view, ["k"], ["grp"], ["val"])
        want = _rows(
            grouped_view(
                snap.read_snapshot(spark, base), ["grp"], ["val"]
            )
        )
        assert _rows(snap.read_snapshot(spark, view)) == want

    ops = [
        snap.read_manifest(view, v).get("op")
        for v in range(1, snap.latest_version(view) + 1)
    ]
    assert ops[0] == "view_bootstrap"
    assert "view_refresh" in ops[1:]

    # idempotent: nothing new committed → no-op, same version
    v = snap.latest_version(view)
    assert refresh_view_snapshot(
        spark, base, view, ["k"], ["grp"], ["val"]
    ) == v
    assert snap.latest_version(view) == v


def test_view_refresh_rebootstraps_after_base_vacuum(spark, tmp_path):
    import m13_sparkstreaming_python_azure_spark.sources.snapshots as snap
    from m13_sparkstreaming_python_azure_spark.operators.ivm import (
        refresh_view_snapshot,
    )

    base = str(tmp_path / "base")
    view = str(tmp_path / "view")
    schema = "k int, grp string, val double"
    sink = snap.keyed_batch_sink(base, keys=["k"], mode="merge", n_buckets=2)
    sink(spark.createDataFrame([(1, "a", 1.0), (2, "b", 2.0)], schema), 0)
    refresh_view_snapshot(spark, base, view, ["k"], ["grp"], ["val"])
    sink(spark.createDataFrame([(3, "a", 3.0)], schema), 1)
    sink(spark.createDataFrame([(4, "b", 4.0)], schema), 2)
    # drop every base version but the newest, including the synced-to one
    snap.vacuum_snapshots(base, keep_last=1)
    refresh_view_snapshot(spark, base, view, ["k"], ["grp"], ["val"])
    assert snap.read_manifest(view).get("op") == "view_bootstrap"
    want = _rows(grouped_view(snap.read_snapshot(spark, base), ["grp"], ["val"]))
    assert _rows(snap.read_snapshot(spark, view)) == want


def test_refresh_equals_recompute_property(spark):
    """Property (hypothesis): for ANY pair of table states — arbitrary
    inserts, deletes, value updates, and group moves — incremental
    refresh equals full recompute row-for-row."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    row = st.tuples(
        st.integers(min_value=0, max_value=15),          # id (collisions)
        st.sampled_from(["a", "b", "c"]),                # group
        st.floats(min_value=-100, max_value=100,
                  allow_nan=False, allow_infinity=False, width=32),
    )

    def dedup_by_id(rows):
        return list({r[0]: r for r in rows}.values())

    tables = st.lists(row, min_size=0, max_size=14).map(dedup_by_id)

    @settings(
        max_examples=5,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(v1_rows=tables, v2_rows=tables)
    def run(v1_rows, v2_rows):
        cols = "id int, grp string, val double"
        v1 = spark.createDataFrame(v1_rows, cols) if v1_rows else (
            spark.createDataFrame([], cols)
        )
        v2 = spark.createDataFrame(v2_rows, cols) if v2_rows else (
            spark.createDataFrame([], cols)
        )
        got = incremental_refresh(
            grouped_view(v1, ["grp"], ["val"]),
            table_changes_images(v1, v2, ["id"]),
            ["grp"],
            ["val"],
        )
        assert _rows(got) == _rows(grouped_view(v2, ["grp"], ["val"]))

    run()


def test_streaming_view_maintenance_refreshes_incrementally(spark):
    """The gate query's stream must produce 2+ base commits with the view
    advancing via view_refresh (not re-bootstrapping per batch)."""
    import m13_sparkstreaming_python_azure_spark.sources.snapshots as snap
    from m13_sparkstreaming_python_azure_spark.queries.core import (
        q_streaming_view_maintenance,
    )

    out = q_streaming_view_maintenance(spark, "/root/testdata/sf0.001")
    assert out.count() > 0
    # the tmp dirs live under the most recent view-maint- root
    import glob
    import os
    import tempfile

    roots = sorted(
        glob.glob(os.path.join(tempfile.gettempdir(), "view-maint-*")),
        key=os.path.getmtime,
    )
    base, view = os.path.join(roots[-1], "base"), os.path.join(roots[-1], "view")
    assert snap.latest_version(base) >= 2, "stream must span 2+ micro-batches"
    ops = [
        snap.read_manifest(view, v).get("op")
        for v in range(1, snap.latest_version(view) + 1)
    ]
    assert ops[0] == "view_bootstrap"
    assert all(op == "view_refresh" for op in ops[1:]) and len(ops) >= 2
