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
