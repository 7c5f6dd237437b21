"""Round-2 analytics extensions — sequence/interval/frequency analytics a
production telemetry + training-data pipeline needs beyond the reference's
daily-aggregate surface (stream.ipynb:117-121 is its only aggregate).

Every query here is oracle-gated (DuckDB twin in ANALYTICS_ORACLES).
Float discipline follows the repo rule (core.py header): ratios of
identically-derived integers are bit-equal across engines and need no
rounding; anything touching ln/pow/sqrt gets a 1e-4/1e-6 floor-snap grid
on BOTH sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from m13_sparkstreaming_python_azure_spark.catalog import load_table
from m13_sparkstreaming_python_azure_spark.operators.intervals import (
    merge_intervals,
)


def q_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of per-user event sequences:
    for each (current, next) event_type bigram, the transition count and
    conditional probability P(next | current).

    Scale: one shuffle on user_id for the lead() window (the same shuffle
    sessionization needs), then a map-side-combining groupBy on the tiny
    (type, type) key space. Probabilities are ratios of identically-
    derived BIGINTs — bit-equal across engines, no rounding grid needed.
    """
    ev = load_table(spark, sf_dir, "events")
    seq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    bigrams = (
        ev.withColumn("next_type", F.lead("event_type").over(seq))
        .filter(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("cur_type"), "next_type"
        )
        .agg(F.count(F.lit(1)).alias("n_trans"))
    )
    totals = Window.partitionBy("cur_type")
    return bigrams.withColumn(
        "prob",
        F.col("n_trans") / F.sum("n_trans").over(totals),
    )


def q_interval_merge_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands sessionization via general interval merge
    (operators/intervals.merge_intervals): each event spans
    [ts, ts+10min]; overlapping-or-touching spans per user collapse into
    maximal sessions. Unlike session_windows (fixed-gap builtin), this is
    the general interval-algebra operator (bookings, locks, GPU
    reservations)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 10 MINUTES")).alias("e"),
    )
    merged = merge_intervals(ev, "user_id", "s", "e", "event_id")
    return merged.select(
        "user_id",
        F.date_format("island_start", "yyyy-MM-dd HH:mm:ss").alias(
            "session_start"
        ),
        F.date_format("island_end", "yyyy-MM-dd HH:mm:ss").alias(
            "session_end"
        ),
        F.col("n_merged").alias("n_events"),
    )


def q_price_decile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile binning (feature-engineering primitive): ntile(10) deciles
    of order totalprice with per-bin counts and exact-decimal revenue.
    Ties broken by o_orderkey so decile assignment is engine-independent.

    Scale note: ntile needs a TOTAL order — a single-partition sort of the
    bin column only (project first!). At 100 TB the right form is
    approx_percentile cut-points broadcast back as bin edges; ntile is
    kept here because the gate demands exact, engine-identical bins.
    """
    orders = load_table(spark, sf_dir, "orders")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    binned = orders.select(
        "o_totalprice", F.ntile(10).over(w).alias("decile")
    )
    dec_sum = F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
    return binned.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
        F.round(dec_sum, 2).cast("double").alias("sum_price"),
    )


ANALYTICS_QUERIES = {
    "markov_transitions": q_markov_transitions,
    "interval_merge_sessions": q_interval_merge_sessions,
    "price_decile_stats": q_price_decile_stats,
}

ANALYTICS_ORACLES = {
    "markov_transitions": """
        WITH seq AS (
            SELECT event_type AS cur_type,
                   lead(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS next_type
            FROM events
        ), bigrams AS (
            SELECT cur_type, next_type,
                   CAST(count(*) AS BIGINT) AS n_trans
            FROM seq WHERE next_type IS NOT NULL
            GROUP BY cur_type, next_type
        )
        SELECT cur_type, next_type, n_trans,
               CAST(n_trans AS DOUBLE)
                   / sum(n_trans) OVER (PARTITION BY cur_type) AS prob
        FROM bigrams
    """,
    "interval_merge_sessions": """
        WITH iv AS (
            SELECT user_id, event_id, ts AS s,
                   ts + INTERVAL 10 MINUTE AS e
            FROM events
        ), pm AS (
            SELECT user_id, event_id, s, e,
                   max(e) OVER (
                       PARTITION BY user_id ORDER BY s, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ) AS prev_max_e
            FROM iv
        ), flagged AS (
            SELECT user_id, s, e,
                   CASE WHEN prev_max_e IS NULL OR s > prev_max_e
                        THEN 1 ELSE 0 END AS ni,
                   event_id
            FROM pm
        ), isl AS (
            SELECT user_id, s, e,
                   sum(ni) OVER (
                       PARTITION BY user_id ORDER BY s, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS island
            FROM flagged
        )
        SELECT user_id,
               strftime(min(s), '%Y-%m-%d %H:%M:%S') AS session_start,
               strftime(max(e), '%Y-%m-%d %H:%M:%S') AS session_end,
               CAST(count(*) AS BIGINT) AS n_events
        FROM isl GROUP BY user_id, island
    """,
    "price_decile_stats": """
        WITH binned AS (
            SELECT o_totalprice,
                   ntile(10) OVER (
                       ORDER BY o_totalprice, o_orderkey
                   ) AS decile
            FROM orders
        )
        SELECT decile,
               CAST(count(*) AS BIGINT) AS n_orders,
               round(min(o_totalprice), 2) AS min_price,
               round(max(o_totalprice), 2) AS max_price,
               CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2)
                    AS DOUBLE) AS sum_price
        FROM binned GROUP BY decile
    """,
}
