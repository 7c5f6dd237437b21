"""Statistical tests and robust summaries beyond plain moments —
chi-square independence (the categorical drift/association test a data-
quality pipeline runs between a feature and a label or time bucket) and
winsorized statistics (outlier-resistant means).

Cross-engine float discipline (repo rule): expected counts are ratios of
identically-derived BIGINTs (bit-equal); each chi-square term is computed
in doubles from bit-equal inputs, then accumulated as DECIMAL so the SUM
is fold-order independent; final statistics grid-snap at 1e-6.

Scale: the contingency table is one groupBy on (a, b) — key space is the
category-pair cross product, tiny; marginals derive from the table
itself (window sums), never a second scan of the input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _snap6(c):
    return F.floor(c * 1e6 + F.lit(0.5)) / 1e6


def chi_square_independence(
    df: DataFrame, a_col: str, b_col: str
) -> DataFrame:
    """Pearson chi-square test of independence between two categorical
    columns. Returns one row: chi2, dof, n_rows, cramers_v.

    chi2 = sum (observed - expected)^2 / expected over the contingency
    cells; cells with zero observed count contribute their expected mass
    via the identity sum = N * (sum over observed cells of n^2/(r*c)) - N
    — so ABSENT cells need no generation (the closed form absorbs them),
    keeping the plan one groupBy + window marginals."""
    cells = df.groupBy(
        F.col(a_col).alias("a"), F.col(b_col).alias("b")
    ).agg(F.count(F.lit(1)).alias("n"))
    wa = Window.partitionBy("a")
    wb = Window.partitionBy("b")
    wall = Window.partitionBy()
    with_marg = cells.select(
        "n",
        F.sum("n").over(wa).alias("ra"),
        F.sum("n").over(wb).alias("cb"),
        F.sum("n").over(wall).alias("nn"),
    )
    # chi2 = N * sum(n^2/(ra*cb)) - N  (algebraic form of sum((n-e)^2/e)
    # including empty cells); each term is a ratio of exact BIGINT
    # products -> bit-equal doubles; decimal accumulation kills fold-order
    term = (
        (F.col("n") * F.col("n")) / (F.col("ra") * F.col("cb"))
    ).cast("decimal(28,12)")
    agg = with_marg.agg(
        F.sum(term).cast("double").alias("s"),
        F.max("nn").alias("n_rows"),
    )
    # dof needs the distinct category counts, derivable from the cells
    dims = cells.agg(
        F.count_distinct("a").alias("r"),
        F.count_distinct("b").alias("c"),
    )
    out = agg.crossJoin(F.broadcast(dims))
    chi2 = F.col("n_rows") * F.col("s") - F.col("n_rows")
    min_dim = F.least(F.col("r") - 1, F.col("c") - 1)
    cramers = F.sqrt(chi2 / (F.col("n_rows") * min_dim))
    return out.select(
        _snap6(chi2).alias("chi2"),
        ((F.col("r") - 1) * (F.col("c") - 1)).alias("dof"),
        F.col("n_rows"),
        _snap6(cramers).alias("cramers_v"),
    )


def winsorized_stats(
    df: DataFrame,
    key_col: str,
    value_col: str,
    lo_p: float = 0.05,
    hi_p: float = 0.95,
) -> DataFrame:
    """Per-key winsorized mean: values clip to the [lo_p, hi_p] exact
    interpolated percentiles before averaging — the outlier-resistant
    mean a metrics pipeline reports next to the raw one.

    Two passes over one shuffle's partitioning: percentile bounds per key
    (exact interpolated — both engines use lower + frac*(upper-lower)),
    grid-snapped, joined back (tiny build side, broadcast), then a
    decimal-summed clipped mean.

    Scale note: exact percentile buffers each key's values in the
    aggregation — fine while per-key cardinality fits an executor; for
    monster keys swap in approx_percentile (the bounds become
    approximate, the clip semantics unchanged). The gate uses the exact
    form because the oracle must agree bit-for-bit."""
    v = F.col(value_col)
    bounds = df.groupBy(key_col).agg(
        _snap6(F.percentile(v, F.lit(lo_p))).alias("lo"),
        _snap6(F.percentile(v, F.lit(hi_p))).alias("hi"),
    )
    clipped = df.join(F.broadcast(bounds), on=key_col).withColumn(
        "__w", F.least(F.greatest(v, F.col("lo")), F.col("hi"))
    )
    dec = F.sum(F.col("__w").cast("decimal(18,6)"))
    return clipped.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_values"),
        F.min("lo").alias("p_lo"),
        F.min("hi").alias("p_hi"),
        (
            F.round(dec, 2).cast("double") / F.count(F.lit(1))
        ).alias("winsorized_mean"),
    )
