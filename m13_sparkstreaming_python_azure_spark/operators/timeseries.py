"""Time-series regularization: resample onto a dense bucket spine and
forward-fill — the hypertable/rollup-class operator family (gap-filled
hourly/daily series from irregular event streams).

Plan shape: one bucket aggregate (single shuffle on (key, bucket)), a
per-key min/max + generated spine (explode of a sequence — no shuffle
beyond the agg), a left join back, and one window for the fill. At scale
the spine is tiny relative to events (buckets, not rows) and the window
sort rides the join's (key) partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resample_ffill(
    df: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    value_col: str = "value",
    step: str = "1 hour",
    trunc_unit: str = "hour",
) -> DataFrame:
    """Dense per-key ``step`` buckets from each key's first to last event,
    zero-filling empty buckets' counts/sums and forward-filling the last
    observed bucket sum (``ffill_sum``).

    Sums go through decimal(18,6) so engines agree bit-for-bit (the
    fold-order rule from queries/core.py)."""
    dec_sum = F.round(F.sum(F.col(value_col).cast("decimal(18,6)")), 2).cast(
        "double"
    )
    buckets = df.groupBy(
        key_col, F.date_trunc(trunc_unit, ts_col).alias("bucket_start")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        dec_sum.alias("sum_value"),
    )
    spine = (
        buckets.groupBy(key_col)
        .agg(F.min("bucket_start").alias("__lo"), F.max("bucket_start").alias("__hi"))
        .select(
            key_col,
            F.explode(
                F.sequence("__lo", "__hi", F.expr(f"INTERVAL {step}"))
            ).alias("bucket_start"),
        )
    )
    j = spine.join(buckets, on=[key_col, "bucket_start"], how="left")
    w = (
        Window.partitionBy(key_col)
        .orderBy("bucket_start")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return j.select(
        key_col,
        F.date_format("bucket_start", "yyyy-MM-dd HH:mm:ss").alias("bucket_start"),
        F.coalesce(F.col("n_events"), F.lit(0)).alias("n_events"),
        F.coalesce(F.col("sum_value"), F.lit(0.0)).alias("sum_value"),
        F.last("sum_value", ignorenulls=True).over(w).alias("ffill_sum"),
    )
