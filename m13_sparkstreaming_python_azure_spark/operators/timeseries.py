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


def changepoint_mean_shift(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    min_segment: int = 2,
) -> DataFrame:
    """Single-changepoint detection per key (binary segmentation, one
    level): the split point t that maximizes |mean(x[..t]) - mean(x[t+1..])|
    over the key's ordered series, both segments >= ``min_segment`` long.

    Determinism contract (cross-engine): prefix sums accumulate as
    decimal(18,6) — EXACT and fold-order independent, where a double
    running sum could differ by engine fold order — and each mean is the
    exact decimal sum cast to double over an integer count, so the shift
    statistic is bit-equal across engines. Ties on |shift| break to the
    earliest split.

    Plan shape: ONE shuffle on the key; prefix sums, totals, and the
    argmax rank all ride the same per-key sort (three window specs over
    one partitioning, no joins). At 100 TB the per-key series is the
    unit of work — keys parallelize; a single monster key degrades to
    one sorted partition (same caveat as any per-key window).
    """
    dval = F.col(value_col).cast("decimal(18,6)")
    w_order = Window.partitionBy(key_col).orderBy(order_col)
    w_run = w_order.rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy(key_col)
    prefixed = df.select(
        F.col(key_col),
        F.col(order_col),
        F.row_number().over(w_order).alias("__t"),
        F.sum(dval).over(w_run).alias("__psum"),
        F.sum(dval).over(w_all).alias("__tsum"),
        F.count(F.lit(1)).over(w_all).alias("__n"),
    )
    mean_before = F.col("__psum").cast("double") / F.col("__t")
    mean_after = (F.col("__tsum") - F.col("__psum")).cast("double") / (
        F.col("__n") - F.col("__t")
    )
    scored = prefixed.filter(
        (F.col("__t") >= min_segment)
        & (F.col("__n") - F.col("__t") >= min_segment)
    ).select(
        key_col,
        order_col,
        mean_before.alias("mean_before"),
        mean_after.alias("mean_after"),
        F.abs(mean_after - mean_before).alias("shift"),
    )
    w_best = Window.partitionBy(key_col).orderBy(
        F.col("shift").desc(), F.col(order_col)
    )
    return (
        scored.withColumn("__rk", F.row_number().over(w_best))
        .filter(F.col("__rk") == 1)
        .drop("__rk")
        .withColumnRenamed(order_col, "split_point")
    )


def interpolate_linear(
    df: DataFrame,
    key_col: str,
    idx_col: str,
    value_col: str,
) -> DataFrame:
    """Linear interpolation of null values over a dense integer-indexed
    series per key: v = prev + (next - prev) * (i - i_prev)/(i_next -
    i_prev); before the first / after the last observation it clamps to
    the nearest observed value (ffill/bfill).

    Determinism: the gap fraction is a ratio of identically-derived
    BIGINT index deltas (bit-equal, repo float rule) and prev/next are
    untouched input doubles, so interpolated values are bit-equal across
    engines.

    Plan shape: one shuffle on the key, two window passes (backward
    last-non-null, forward first-non-null) over the same per-key sort.
    """
    w = Window.partitionBy(key_col).orderBy(idx_col)
    w_back = w.rowsBetween(Window.unboundedPreceding, -1)
    w_fwd = w.rowsBetween(1, Window.unboundedFollowing)
    v = F.col(value_col)
    prev_v = F.last(v, ignorenulls=True).over(w_back)
    next_v = F.first(v, ignorenulls=True).over(w_fwd)
    prev_i = F.last(
        F.when(v.isNotNull(), F.col(idx_col)), ignorenulls=True
    ).over(w_back)
    next_i = F.first(
        F.when(v.isNotNull(), F.col(idx_col)), ignorenulls=True
    ).over(w_fwd)
    frac = (F.col(idx_col) - prev_i) / (next_i - prev_i)
    interp = prev_v + (next_v - prev_v) * frac
    return df.withColumn(
        "filled",
        F.when(v.isNotNull(), v).otherwise(
            F.coalesce(interp, prev_v, next_v)
        ),
    )


def rolling_correlation(
    df: DataFrame,
    key_col: str,
    order_col: str,
    x_col: str,
    y_col: str,
    window_rows: int = 7,
) -> DataFrame:
    """Rolling Pearson correlation of (x, y) over the trailing
    ``window_rows`` rows per key.

    Determinism contract: built-in corr() folds its online update in an
    engine-specific order, so this computes the five moment sums as
    EXACT decimals over the frame (order-independent), applies the
    closed-form corr in doubles, and grid-snaps at 1e-6 — bit-equal
    across engines. Windows shorter than 2 rows or with zero variance
    yield null.

    Plan shape: one shuffle on the key; all five moment sums share one
    frame spec (single window pass).
    """
    x = F.col(x_col).cast("decimal(18,6)")
    y = F.col(y_col).cast("decimal(18,6)")
    w = (
        Window.partitionBy(key_col)
        .orderBy(order_col)
        .rowsBetween(-(window_rows - 1), 0)
    )
    n = F.count(F.lit(1)).over(w).cast("double")
    sx = F.sum(x).over(w).cast("double")
    sy = F.sum(y).over(w).cast("double")
    sxx = F.sum((x * x).cast("decimal(38,12)")).over(w).cast("double")
    syy = F.sum((y * y).cast("decimal(38,12)")).over(w).cast("double")
    sxy = F.sum((x * y).cast("decimal(38,12)")).over(w).cast("double")
    var_x = n * sxx - sx * sx
    var_y = n * syy - sy * sy
    denom = F.sqrt(var_x * var_y)
    corr = F.when(
        (n >= 2) & (denom > 0), (n * sxy - sx * sy) / denom
    )
    snap = F.floor(corr * 1e6 + F.lit(0.5)) / 1e6
    return df.select(
        key_col, order_col, x_col, y_col
    ).withColumn("rolling_corr", snap)


def seasonal_decompose(
    df: DataFrame,
    t_col: str,
    value_col: str,
    period: int = 7,
) -> DataFrame:
    """Classic additive seasonal decomposition of a regular series —
    value = trend + seasonal + remainder (the moving-average STL
    ancestor every ops dashboard runs on daily metrics):

    - trend: centered ``period``-point moving average (odd period; rows
      without a full window emit NULL trend/seasonal/remainder),
    - seasonal: per-phase (t mod period) mean of the detrended values,
      centered so the ``period`` seasonal effects sum to ~0,
    - remainder: what's left.

    Input must be one row per ``t_col`` tick (an upstream aggregate —
    which is the distributed-heavy part; the decomposition itself runs
    on the tiny aggregated series, so the unpartitioned windows here
    are bounded by the series length, not the data volume).

    Float contract (hash-gate-ready): window and phase sums accumulate
    in DECIMAL(18,6) (exact, fold-order independent), divisions happen
    in doubles on identically-derived operands, every emitted component
    snaps to the 1e-6 grid.
    """
    if period % 2 == 0:
        raise ValueError("seasonal_decompose: period must be odd")
    half = period // 2
    snap = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731

    base = df.select(
        F.col(t_col).alias("t"),
        F.col(value_col).cast("double").alias("value"),
        F.col(value_col).cast("decimal(18,6)").alias("__vdec"),
        F.pmod(F.col(t_col), F.lit(period)).alias("__phase"),
    )
    w = Window.orderBy("t").rowsBetween(-half, half)
    with_trend = base.select(
        "t",
        "value",
        "__phase",
        F.when(
            F.count(F.lit(1)).over(w) == period,
            F.sum("__vdec").over(w).cast("double") / float(period),
        ).alias("trend"),
    )
    detr = with_trend.withColumn(
        "__ddec", snap(F.col("value") - F.col("trend")).cast("decimal(18,6)")
    )
    seas = (
        detr.filter(F.col("trend").isNotNull())
        .groupBy("__phase")
        .agg(
            (
                F.sum("__ddec").cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("__sraw")
        )
        .withColumn("__sdec", snap(F.col("__sraw")).cast("decimal(18,6)"))
    )
    # center the period effects: subtract their own mean (tiny aggregate)
    center = seas.agg(
        (F.sum("__sdec").cast("double") / F.count(F.lit(1)).cast("double"))
        .alias("__m")
    )
    seasonal = seas.crossJoin(F.broadcast(center)).select(
        "__phase", snap(F.col("__sraw") - F.col("__m")).alias("seasonal")
    )
    out = detr.join(F.broadcast(seasonal), on="__phase", how="left")
    return out.select(
        "t",
        "value",
        snap(F.col("trend")).alias("trend"),
        F.when(F.col("trend").isNotNull(), F.col("seasonal")).alias(
            "seasonal"
        ),
        F.when(
            F.col("trend").isNotNull(),
            snap(F.col("value") - F.col("trend") - F.col("seasonal")),
        ).alias("remainder"),
    )


def holt_forecast(
    df: DataFrame,
    key_col: str,
    t_col: str,
    value_col: str,
    alpha: float = 0.2,
    beta: float = 0.1,
    horizon: int = 7,
) -> DataFrame:
    """Holt double exponential smoothing (level + linear trend) per
    series, forecasting ``horizon`` steps past the last observation —
    the trending complement to ``ewma_control_chart`` (EWMA assumes a
    flat mean; Holt tracks a drifting one):

        l_t = α·y_t + (1 − α)·(l_{t−1} + b_{t−1})
        b_t = β·(l_t − l_{t−1}) + (1 − β)·b_{t−1}
        ŷ_{T+h} = l_T + h·b_T

    initialized l_0 = y_0, b_0 = y_1 − y_0. The recursion is inherently
    sequential IN t but embarrassingly parallel ACROSS series, so this
    is the documented applyInPandas escape hatch (SURVEY §2.10): one
    Arrow batch per key, float64 recursion in plain numpy order. At
    scale the upstream per-(key, tick) aggregate is the distributed
    pass; each grouped series is bounded by the tick count, not data
    volume.

    Float contract: y values arrive as exact integers (counts/cents),
    α/β and (1 − α)/(1 − β) are evaluated as the same double subtraction
    in any mirroring engine, and the recursion performs identical IEEE
    ops in identical order, so forecasts are bit-equal; outputs snap to
    the 1e-6 grid anyway (memory rule: output-boundary snap).

    Returns (key, h, forecast, level, trend) for h = 1..horizon.
    """
    import pandas as pd

    out_schema = (
        f"{key_col} string, h long, forecast double, "
        "level double, trend double"
    )

    def _holt(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(t_col)
        y = pdf[value_col].to_numpy(dtype="float64")
        key = pdf[key_col].iloc[0]
        if len(y) < 2:
            return pd.DataFrame(
                columns=[key_col, "h", "forecast", "level", "trend"]
            )
        lvl = y[0]
        trend = y[1] - y[0]
        for t in range(1, len(y)):
            prev = lvl
            lvl = alpha * y[t] + (1.0 - alpha) * (lvl + trend)
            trend = beta * (lvl - prev) + (1.0 - beta) * trend

        def _snap(x: float) -> float:
            import math

            return math.floor(x * 1e6 + 0.5) / 1e6

        hs = list(range(1, horizon + 1))
        return pd.DataFrame(
            {
                key_col: [key] * horizon,
                "h": hs,
                "forecast": [_snap(lvl + h * trend) for h in hs],
                "level": [_snap(lvl)] * horizon,
                "trend": [_snap(trend)] * horizon,
            }
        )

    return df.groupBy(key_col).applyInPandas(_holt, schema=out_schema)


def holt_winters_forecast(
    df: DataFrame,
    key_col: str,
    t_col: str,
    value_col: str,
    alpha: float = 0.3,
    beta: float = 0.1,
    gamma: float = 0.05,
    period: int = 7,
    horizon: int = 7,
) -> DataFrame:
    """Holt-Winters ADDITIVE triple exponential smoothing (level + trend
    + seasonality) per series — the seasonal completion of
    ``holt_forecast`` (which ignores the weekly shape every daily ops
    metric actually has):

        l_t = α·(y_t − s_{t−m}) + (1 − α)·(l_{t−1} + b_{t−1})
        b_t = β·(l_t − l_{t−1}) + (1 − β)·b_{t−1}
        s_t = γ·(y_t − l_t) + (1 − γ)·s_{t−m}
        ŷ_{T+h} = l_T + h·b_T + s_{T+h−m}        (h ≤ m = horizon)

    initialized with l_m = mean(y_1..y_m), b_m = (mean(y_{m+1}..y_{2m})
    − l_m)/m, s_i = y_i − l_m for i = 1..m. Series shorter than 2m rows
    emit nothing (the init needs two full seasons).

    Same execution shape as ``holt_forecast``: sequential IN t,
    embarrassingly parallel ACROSS series via one applyInPandas Arrow
    batch per key (SURVEY §2.10 escape hatch); the distributed-heavy
    pass is the upstream per-(key, tick) aggregate, so each grouped
    series is bounded by the tick count, not data volume.

    Float contract (hash-gate): initial means divide EXACT integer sums
    (Python ints, no numpy partial-sum folding) by float(m); the
    recursion is plain-Python IEEE doubles in the exact expression order
    the DuckDB recursive-CTE oracle mirrors (state = (l, b) plus a
    length-m seasonal list that shifts one slot per step); outputs snap
    to the 1e-6 grid at the boundary.

    Returns (key, h, forecast, level, trend, seasonal) for h = 1..horizon.
    """
    import math

    import pandas as pd

    if horizon > period:
        raise ValueError("holt_winters_forecast: horizon must be <= period")

    out_schema = (
        f"{key_col} string, h long, forecast double, "
        "level double, trend double, seasonal double"
    )

    def _hw(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(t_col)
        y = [int(v) for v in pdf[value_col]]
        key = pdf[key_col].iloc[0]
        m = period
        if len(y) < 2 * m:
            return pd.DataFrame(
                columns=[
                    key_col, "h", "forecast", "level", "trend", "seasonal"
                ]
            )
        lvl = sum(y[:m]) / float(m)
        trend = (sum(y[m : 2 * m]) / float(m) - lvl) / float(m)
        seas = [y[i] - lvl for i in range(m)]
        for t in range(m, len(y)):
            s_old = seas[0]
            prev = lvl
            lvl = alpha * (y[t] - s_old) + (1.0 - alpha) * (prev + trend)
            trend = beta * (lvl - prev) + (1.0 - beta) * trend
            s_new = gamma * (y[t] - lvl) + (1.0 - gamma) * s_old
            seas = seas[1:] + [s_new]

        def _snap(x: float) -> float:
            return math.floor(x * 1e6 + 0.5) / 1e6

        hs = list(range(1, horizon + 1))
        return pd.DataFrame(
            {
                key_col: [key] * horizon,
                "h": hs,
                "forecast": [
                    _snap(lvl + h * trend + seas[(h - 1) % m]) for h in hs
                ],
                "level": [_snap(lvl)] * horizon,
                "trend": [_snap(trend)] * horizon,
                "seasonal": [_snap(seas[(h - 1) % m]) for h in hs],
            }
        )

    return df.groupBy(key_col).applyInPandas(_hw, schema=out_schema)


def ccf_lags(
    series_a: DataFrame,
    series_b: DataFrame,
    max_lag: int = 7,
) -> DataFrame:
    """Cross-correlation function between two integer daily series
    ``(day, y)`` at lags −max_lag..+max_lag: CCF(k) correlates A(t) with
    B(t−k), so a peak at POSITIVE k means B's series shows A's pattern k
    positions earlier — B leads A by k. Lead/lag detection between two
    event streams — which metric moves first.

    Exact-integer construction (the ACF trick, two-series form): each
    series centers as ``z = N·y − S`` over the ALIGNED positions present
    in both series; numerators Σ z_a(t)·z_b(t−k) and the full-series
    denominators Σz_a²·Σz_b² are exact BIGINTs, so
    ``ccf = num / sqrt(da·db)`` is a pure-IEEE expression — bit-equal
    across engines with no grid. One row per day before the lag join."""
    a = series_a.select(F.col("day").cast("long"), F.col("y").alias("ya"))
    b = series_b.select(F.col("day").cast("long"), F.col("y").alias("yb"))
    j = a.join(b, "day")  # aligned days only — one N for both series
    w_all = Window.partitionBy()
    z = j.select(
        F.row_number().over(Window.orderBy("day")).cast("long").alias("idx"),
        (
            F.count(F.lit(1)).over(w_all) * F.col("ya")
            - F.sum("ya").over(w_all)
        ).alias("za"),
        (
            F.count(F.lit(1)).over(w_all) * F.col("yb")
            - F.sum("yb").over(w_all)
        ).alias("zb"),
    )
    den = z.agg(
        F.sum(F.col("za") * F.col("za")).alias("da"),
        F.sum(F.col("zb") * F.col("zb")).alias("db"),
    )
    lags = z.select(
        "idx",
        "za",
        F.explode(
            F.sequence(F.lit(-max_lag), F.lit(max_lag))
        ).alias("lag"),
    )
    num = (
        lags.join(
            z.select(F.col("idx").alias("jdx"), "zb"),
            lags["idx"] - lags["lag"] == F.col("jdx"),
        )
        .groupBy("lag")
        .agg(F.sum(F.col("za") * F.col("zb")).alias("num"))
    )
    return num.crossJoin(F.broadcast(den)).select(
        "lag",
        (
            F.col("num")
            / F.sqrt(
                F.col("da").cast("double") * F.col("db").cast("double")
            )
        ).alias("ccf"),
    )
