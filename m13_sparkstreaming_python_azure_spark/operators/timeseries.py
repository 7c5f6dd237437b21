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


def ewma_control_chart(
    df: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
    max_lag: int = 20,
    sigma_mult: float = 3.0,
) -> DataFrame:
    """EWMA control chart per key: smoothed level, one-step-ahead
    residual, and an anomaly flag when |residual| exceeds
    ``sigma_mult``× the key's stddev — the classic streaming-monitoring
    statistic, here in its oracle-checkable batch form.

    Determinism contract (cross-engine): the decay is fixed at α = 0.5 so
    every weight is an EXACT power of two (2^-lag — no pow(), whose
    rounding is engine-specific), the weighted sum folds left over the
    frame-ordered window list identically in both engines, the EWMA is
    truncated at ``max_lag`` lags (weights below 2^-20 are < 1e-6 of the
    level — also what keeps the window frame bounded at scale), and
    outputs are grid-snapped at 1e-6 before the threshold compare.

    Plan shape: ONE shuffle on the key serves the windowed list, the lag,
    and (via a tiny per-key aggregate joined back) the sigma threshold.
    """
    val = F.col(value_col).cast("double")
    order = [F.col(ts_col), F.col(tiebreak_col)]
    w_frame = (
        Window.partitionBy(key_col)
        .orderBy(*order)
        .rowsBetween(-max_lag, 0)
    )
    w_lag = Window.partitionBy(key_col).orderBy(*order)

    def shl_double(bits):
        return F.call_function(
            "shiftleft", F.lit(1).cast("long"), bits.cast("int")
        ).cast("double")

    vals = F.collect_list(val).over(w_frame)
    m = F.size(vals)
    num = F.aggregate(
        F.sequence(F.lit(1), m),
        F.lit(0.0),
        lambda acc, i: acc + F.element_at(vals, i) / shl_double(m - i),
    )
    den = F.lit(2.0) - F.lit(1.0) / shl_double(m - 1)
    snap = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731

    scored = df.select(
        F.col(tiebreak_col),
        F.col(key_col),
        F.col(ts_col),
        val.alias("__v"),
        snap(num / den).alias("ewma"),
    ).withColumn("__prev", F.lag("ewma").over(w_lag))

    stats = df.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(val.cast("decimal(18,6)")).cast("double").alias("__sv"),
        F.sum((val * val).cast("decimal(27,12)")).cast("double").alias("__sv2"),
    )
    sigma = F.sqrt(
        (F.col("__sv2") - F.col("__sv") * F.col("__sv") / F.col("__n"))
        / (F.col("__n") - 1)
    )
    resid = snap(F.abs(F.col("__v") - F.col("__prev")))
    return (
        scored.join(stats, on=key_col)
        .select(
            tiebreak_col,
            key_col,
            "ewma",
            F.coalesce(
                resid > snap(F.lit(sigma_mult) * sigma), F.lit(False)
            ).alias("is_anomaly"),
        )
    )


def subsequence_search(
    df: DataFrame,
    key_col: str,
    pattern: list[float],
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Time-series subsequence similarity search: per key, the offset of
    the length-m window of its (time-ordered) value series closest to
    ``pattern`` in squared Euclidean distance — the UCR-suite-style
    pattern-matching primitive, distributed as one groupBy per key plus
    row-local array HOFs (no window shuffle; each key's series scans its
    own windows inside codegen).

    Determinism contract (cross-engine oracle): the series order is the
    full (ts, tiebreak) key; per-window distance sums decimal(18,6)-cast
    squared diffs (fold-order independent); argmin tie-breaks on the
    earliest window start. Returns (key, n_points, best_start [1-based],
    best_dist2).

    Scale: the array per key must fit a row (~millions of points); beyond
    that, switch to fixed-size chunked windows with (m-1)-point overlap
    between chunks — same math, bounded rows.
    """
    m = len(pattern)
    pat = F.array(*[F.lit(float(v)) for v in pattern])
    ordered = (
        df.select(
            F.col(key_col).alias("key"),
            F.struct(
                F.col(ts_col).alias("ts"),
                F.col(tiebreak_col).alias("tb"),
                F.col(value_col).cast("double").alias("v"),
            ).alias("s"),
        )
        .groupBy("key")
        .agg(F.array_sort(F.collect_list("s")).alias("series"))
        .select("key", F.col("series.v").alias("vals"))
        .filter(F.size("vals") >= m)
    )

    def dist2(vals, start):
        sq = F.transform(
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda j: (
                (F.element_at(vals, start + j) - F.element_at(pat, j + 1))
                * (F.element_at(vals, start + j) - F.element_at(pat, j + 1))
            ).cast("decimal(18,6)"),
        )
        # re-cast each partial sum: decimal + decimal widens the type and
        # aggregate() requires the merge result to keep the accumulator type
        return F.aggregate(
            sq,
            F.lit(0).cast("decimal(28,6)"),
            lambda acc, x: (acc + x).cast("decimal(28,6)"),
        )

    scored = ordered.select(
        "key",
        F.size("vals").alias("n_points"),
        F.transform(
            F.sequence(F.lit(1), F.size("vals") - (m - 1)),
            lambda i: F.struct(
                dist2(F.col("vals"), i).alias("d2"), i.alias("start")
            ),
        ).alias("wins"),
    )
    # array_min on struct orders lexicographically (d2, start): the argmin
    # with earliest-start tie-break, no explode and no extra shuffle
    best = scored.select(
        "key",
        "n_points",
        F.array_min("wins").alias("best"),
    )
    return best.select(
        F.col("key").alias(key_col),
        "n_points",
        F.col("best.start").alias("best_start"),
        F.col("best.d2").cast("double").alias("best_dist2"),
    )
