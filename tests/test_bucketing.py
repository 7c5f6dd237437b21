"""Bucketed co-located join: results match the plain join AND the physical
plan contains no Exchange (the point of bucketing)."""

from __future__ import annotations

from pyspark.sql import functions as F

from m13_sparkstreaming_python_azure_spark.catalog import load_table
from m13_sparkstreaming_python_azure_spark.sources.bucketing import (
    co_located_join,
    write_bucketed,
)


def test_bucketed_join_no_shuffle_and_matches_plain(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
    )
    write_bucketed(
        orders, "b_orders", ["o_orderkey"], 4,
        sort_cols=["o_orderkey"], path=str(tmp_path / "bo"),
    )
    write_bucketed(
        lineitem, "b_lineitem", ["o_orderkey"], 4,
        sort_cols=["o_orderkey"], path=str(tmp_path / "bl"),
    )
    threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = co_located_join(spark, "b_orders", "b_lineitem", "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        got = sorted(tuple(r) for r in joined.collect())
        want = sorted(tuple(r) for r in orders.join(lineitem, "o_orderkey").collect())
        assert got == want
        assert len(got) > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
