"""CHECK constraints (Delta ADD CONSTRAINT parity): existing-content
validation, enforcement on append / merge / replace_where, NULL-evaluates-
as-violation semantics, inheritance across commits, one-pass reporting."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from m13_sparkstreaming_python_azure_spark.sources.snapshots import (
    ConstraintViolation,
    add_check_constraint,
    append_snapshot,
    compact_snapshot,
    constraint_report,
    delete_where,
    merge_snapshot,
    read_manifest,
    read_snapshot,
    replace_where,
    write_snapshot,
)


def _mk(spark, lo, hi, tag="a"):
    return spark.range(lo, hi).select(
        "id", F.lit(tag).alias("tag"), (F.col("id") * 10).alias("v")
    )


def test_add_validates_existing_content(spark, tmp_path):
    table = str(tmp_path / "t")
    write_snapshot(_mk(spark, 0, 20), table)
    add_check_constraint(spark, table, "v_nonneg", "v >= 0")
    assert read_manifest(table)["constraints"] == {"v_nonneg": "v >= 0"}
    with pytest.raises(ConstraintViolation, match="id_small"):
        add_check_constraint(spark, table, "id_small", "id < 10")


def test_append_enforces_and_null_violates(spark, tmp_path):
    table = str(tmp_path / "t")
    write_snapshot(_mk(spark, 0, 10), table)
    add_check_constraint(spark, table, "v_nonneg", "v >= 0")
    append_snapshot(_mk(spark, 10, 15), table)  # fine
    bad = spark.createDataFrame(
        [(100, "a", -5), (101, "a", None)], "id long, tag string, v long"
    )
    with pytest.raises(ConstraintViolation) as ei:
        append_snapshot(bad, table)
    # -5 violates AND the NULL row violates (CHECK must evaluate TRUE)
    assert ei.value.counts == {"v_nonneg": 2}
    assert read_snapshot(spark, table).count() == 15  # nothing committed


def test_constraints_inherit_across_commits(spark, tmp_path):
    table = str(tmp_path / "t")
    write_snapshot(_mk(spark, 0, 30).coalesce(3), table)
    add_check_constraint(spark, table, "v_nonneg", "v >= 0")
    compact_snapshot(spark, table)
    delete_where(spark, table, "id = 0")
    m = read_manifest(table)
    assert m["constraints"] == {"v_nonneg": "v >= 0"}
    with pytest.raises(ConstraintViolation):
        append_snapshot(
            spark.createDataFrame([(1, "a", -1)], "id long, tag string, v long"),
            table,
        )


def test_merge_and_replace_where_enforce(spark, tmp_path):
    table = str(tmp_path / "t")
    write_snapshot(_mk(spark, 0, 10, "a"), table)
    add_check_constraint(spark, table, "v_cap", "v < 1000")
    bad_src = spark.createDataFrame(
        [(3, "a", 5000)], "id long, tag string, v long"
    )
    with pytest.raises(ConstraintViolation):
        merge_snapshot(spark, table, bad_src, ["id"])
    with pytest.raises(ConstraintViolation):
        replace_where(bad_src, table, "tag = 'a'")
    # valid source goes through
    ok_src = spark.createDataFrame(
        [(3, "a", 999)], "id long, tag string, v long"
    )
    merge_snapshot(spark, table, ok_src, ["id"])
    assert (
        read_snapshot(spark, table).filter("id = 3").collect()[0]["v"] == 999
    )


def test_report_counts_multiple_constraints_one_pass(spark):
    df = spark.createDataFrame(
        [(1, 10), (2, -1), (3, None), (4, 200)], "id long, v long"
    )
    rep = constraint_report(
        df, {"nonneg": "v >= 0", "cap": "v < 100", "id_pos": "id > 0"}
    )
    assert rep == {"nonneg": 2, "cap": 2, "id_pos": 0}
