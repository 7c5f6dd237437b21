"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Queries exercise the SURVEY.md §2 inventory over the driver fixtures
(TESTDATA.md). Aggregate doubles are rounded in BOTH Spark and SQL so the
value-hash is stable across summation orders.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from m13_sparkstreaming_python_azure_spark.catalog import load_table
from m13_sparkstreaming_python_azure_spark.operators.aggregate import (
    distinct_values,
    grouped_stats,
    rollup_stats,
)
from m13_sparkstreaming_python_azure_spark.operators.join import (
    anti_join,
    enrich_join,
    semi_join,
)
from m13_sparkstreaming_python_azure_spark.operators.window import (
    top1_per_group,
    topk,
)

SF0001 = "/root/testdata/sf0.001"


def _events_daily(spark: SparkSession, sf_dir: str, approx: bool) -> DataFrame:
    """The reference's signature aggregate (stream.ipynb:117-121) mapped onto
    the events fixture: (event_type, day) ← (city, wthr_date), user_id ← id,
    value ← avg_tmpr_c."""
    events = load_table(spark, sf_dir, "events").withColumn(
        "event_date", F.date_format("ts", "yyyy-MM-dd")
    )
    distinct_expr = (
        F.approx_count_distinct("user_id")
        if approx
        else F.countDistinct("user_id")
    )
    # avg is derived as round(sum,2)/count: the 2-decimal-rounded sum is
    # bit-identical between Spark and DuckDB regardless of summation order,
    # so the oracle value-hash is stable (raw avg() differs in the last ulp).
    return events.groupBy("event_type", "event_date").agg(
        distinct_expr.alias("distinct_users"),
        F.round(F.round(F.sum("value"), 2) / F.count("value"), 4).alias("avg_value"),
        F.round(F.max("value"), 4).alias("max_value"),
        F.round(F.min("value"), 4).alias("min_value"),
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's notebook pipeline (agg → best-day-per-key →
    top-10, stream.ipynb:117-187) on sf0.001 events, approx distinct (HLL++)
    for reference parity."""
    agg = _events_daily(spark, SF0001, approx=True)
    best = top1_per_group(
        agg, ["event_type"], [F.desc("distinct_users"), F.desc("event_date")]
    )
    return topk(best, [F.desc("distinct_users"), F.asc("event_type")], 10)


# ---------------------------------------------------------------------------
# queries / oracles
# ---------------------------------------------------------------------------


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A3-A5 + P1/P4 batch flavor: TPC-H Q1-style grouped stats with a
    pushed-down date filter."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q_daily_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference aggregate (A1-A5), exact-distinct flavor for the oracle."""
    return _events_daily(spark, sf_dir, approx=False)


def q_daily_event_stats_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference-parity flavor: approx_count_distinct (HLL++ rsd 0.05,
    stream.ipynb:118). No SQL oracle (approximation is engine-specific);
    driver records rows-only; tests assert rsd tolerance vs exact."""
    return _events_daily(spark, sf_dir, approx=True)


def q_best_day_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1+P5+O1: the flagship window query (stream.ipynb:178-187) on events:
    per event_type the day with most distinct users (ties → latest day),
    top-10 types by that peak. Deterministic full-key tie-break."""
    agg = _events_daily(spark, sf_dir, approx=False)
    best = top1_per_group(
        agg, ["event_type"], [F.desc("distinct_users"), F.desc("event_date")]
    )
    return topk(best, [F.desc("distinct_users"), F.asc("event_type")], 10)


def q_semi_join_building(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 idiomatic: orders of BUILDING-segment customers via left-semi join
    (replaces the reference's collect()+isin, stream.ipynb:255-258)."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    return semi_join(
        orders, cust.select(F.col("c_custkey").alias("o_custkey")), "o_custkey"
    ).select("o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("o_totalprice"))


def q_anti_join_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: customers that never ordered."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return anti_join(
        cust, orders.select(F.col("o_custkey").alias("c_custkey")), "c_custkey"
    ).select("c_custkey", "c_name", "c_mktsegment")


def q_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1-style enrichment chain (fact ⋈ broadcast dims): revenue per nation,
    lineitem⋈orders⋈customer⋈nation⋈region."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
    )
    joined = enrich_join(
        joined, nation, on=[joined.c_nationkey == nation.n_nationkey]
    )
    joined = enrich_join(
        joined, region, on=[nation.n_regionkey == region.r_regionkey]
    )
    return joined.groupBy("r_name", "n_name").agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


def q_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1: global top-k via TakeOrderedAndProject, full-key tie-break."""
    orders = load_table(spark, sf_dir, "orders")
    return topk(
        orders, [F.desc("o_totalprice"), F.asc("o_orderkey")], 10
    ).select("o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("o_totalprice"))


def q_distinct_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: distinct set projection."""
    return distinct_values(load_table(spark, sf_dir, "customer"), ["c_mktsegment"])


def q_rollup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rollup subtotals (§2.4 GAP coverage): order counts/totals by
    (orderstatus, orderpriority) hierarchy."""
    orders = load_table(spark, sf_dir, "orders")
    out = rollup_stats(orders, ["o_orderstatus", "o_orderpriority"], "o_totalprice")
    return out.select(
        "o_orderstatus",
        "o_orderpriority",
        "n_rows",
        F.round("sum_o_totalprice", 2).alias("sum_total"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "pricing_summary": q_pricing_summary,
        "daily_event_stats": q_daily_event_stats,
        "daily_event_stats_approx": q_daily_event_stats_approx,
        "best_day_top10": q_best_day_top10,
        "semi_join_building": q_semi_join_building,
        "anti_join_no_orders": q_anti_join_no_orders,
        "revenue_by_nation": q_revenue_by_nation,
        "topk_orders": q_topk_orders,
        "distinct_segments": q_distinct_segments,
        "rollup_orders": q_rollup_orders,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   round(avg(l_quantity), 4) AS avg_qty,
                   round(avg(l_extendedprice), 4) AS avg_price,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
        "daily_event_stats": """
            SELECT event_type,
                   strftime(ts, '%Y-%m-%d') AS event_date,
                   count(DISTINCT user_id) AS distinct_users,
                   round(round(sum(value), 2) / count(value), 4) AS avg_value,
                   round(max(value), 4) AS max_value,
                   round(min(value), 4) AS min_value
            FROM events
            GROUP BY event_type, strftime(ts, '%Y-%m-%d')
        """,
        "best_day_top10": """
            WITH agg AS (
                SELECT event_type,
                       strftime(ts, '%Y-%m-%d') AS event_date,
                       count(DISTINCT user_id) AS distinct_users,
                       round(round(sum(value), 2) / count(value), 4) AS avg_value,
                       round(max(value), 4) AS max_value,
                       round(min(value), 4) AS min_value
                FROM events
                GROUP BY event_type, strftime(ts, '%Y-%m-%d')
            ), ranked AS (
                SELECT *, row_number() OVER (
                    PARTITION BY event_type
                    ORDER BY distinct_users DESC, event_date DESC
                ) AS row_num
                FROM agg
            )
            SELECT event_type, event_date, distinct_users,
                   avg_value, max_value, min_value
            FROM ranked WHERE row_num = 1
            ORDER BY distinct_users DESC, event_type ASC
            LIMIT 10
        """,
        "semi_join_building": """
            SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice
            FROM orders
            WHERE o_custkey IN (
                SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
            )
        """,
        "anti_join_no_orders": """
            SELECT c_custkey, c_name, c_mktsegment
            FROM customer c
            WHERE NOT EXISTS (
                SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
            )
        """,
        "revenue_by_nation": """
            SELECT r_name, n_name,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
                   count(*) AS n_items
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name, n_name
        """,
        "topk_orders": """
            SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice
            FROM orders
            ORDER BY o_totalprice DESC, o_orderkey ASC
            LIMIT 10
        """,
        "distinct_segments": """
            SELECT DISTINCT c_mktsegment FROM customer
        """,
        "rollup_orders": """
            SELECT o_orderstatus, o_orderpriority,
                   count(*) AS n_rows,
                   round(sum(o_totalprice), 2) AS sum_total
            FROM orders
            GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        """,
    }
