"""Mergeable fixed-bin histogram sketch — the deterministic scale path for
percentiles (SURVEY.md §2.4 GAP: mergeable aggregation state; north-star
percentile class alongside ``value_percentiles[_approx]``).

Why a histogram and not KLL/t-digest: those sketches are randomized and
engine-specific, so no cross-engine oracle can hash-check them. A
fixed-bin histogram has exactly the same operational profile — O(bins)
state per group, build once per partition of raw data, merge by
element-wise addition, estimate quantiles from the merged state without
rescanning — while staying bit-deterministic and ANSI-SQL-expressible.
At 100 TB this is the pattern for percentile dashboards: sketch each
ingest batch once (one scan), persist the tiny per-batch histograms, and
answer any later quantile query from the sketches alone.

Representation: LONG-FORM (group_keys..., bin, n) rows — the Spark-native
mergeable form. Merging sketches IS ``groupBy(keys, bin).sum(n)``: pure
built-in aggregation with map-side partial combine, no UDAF, no
collect_list ordering hazards, and AQE-coalescible at any scale.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def build_histogram(
    df: DataFrame,
    value_col: str,
    keys: Sequence[str],
    lo: float,
    hi: float,
    n_bins: int,
) -> DataFrame:
    """One scan → per-group long-form histogram (keys..., bin, n).

    Out-of-range values clamp into the edge bins, so the sketch is total
    (no dropped rows) and the row count invariant sum(n) == count(*)
    holds exactly.
    """
    width = (hi - lo) / n_bins
    raw_bin = F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width))
    bin_ = F.least(
        F.lit(n_bins - 1), F.greatest(F.lit(0), raw_bin)
    ).cast("int")
    return (
        df.groupBy(*keys, bin_.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def merge_histograms(hist: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Merge any union of compatible sketches: element-wise sum per bin.
    This is the whole mergeability story — partial histograms from
    different days/files/partitions union in and fold with one aggregate.
    """
    return hist.groupBy(*keys, "bin").agg(F.sum("n").alias("n"))


def histogram_quantiles(
    hist: DataFrame,
    keys: Sequence[str],
    quantiles: Sequence[float],
    lo: float,
    hi: float,
    n_bins: int,
) -> DataFrame:
    """Estimate quantiles from a (merged) histogram with linear
    interpolation inside the containing bin.

    For each q: target = q * total; the answer bin is the FIRST bin whose
    running count reaches target; the estimate interpolates by how far
    into that bin the target lands. Max error is one bin width — a
    resolution the caller picks, not a probabilistic bound.

    Pure window + filter plan: cumulative sums partition by group, the
    quantile list cross-joins as a literal array (|qs| rows per group),
    and first-bin selection is a row_number()=1 filter. Works identically
    in ANSI SQL, which is how the oracle checks it bit-for-bit.
    """
    width = (hi - lo) / n_bins
    w = Window.partitionBy(*keys).orderBy("bin")
    cum = (
        hist.withColumn(
            "cum",
            F.sum("n").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .withColumn("total", F.sum("n").over(Window.partitionBy(*keys)))
    )
    qs = F.explode(
        F.array(*[F.lit(float(q)) for q in quantiles])
    ).alias("q")
    hit = (
        cum.select("*", qs)
        .withColumn("target", F.col("q") * F.col("total"))
        .filter(F.col("cum") >= F.col("target"))
    )
    first = Window.partitionBy(*keys, "q").orderBy("bin")
    est = (
        F.lit(lo)
        + F.lit(width)
        * (
            F.col("bin")
            + (F.col("target") - (F.col("cum") - F.col("n"))) / F.col("n")
        )
    )
    return (
        hit.withColumn("rn", F.row_number().over(first))
        .filter(F.col("rn") == 1)
        .select(
            *keys,
            "q",
            (F.floor(est * 10000 + F.lit(0.5)) / 10000).alias("quantile_est"),
        )
    )


def distribution_drift(
    a: DataFrame,
    b: DataFrame,
    value_col: str,
    keys: Sequence[str],
    lo: float,
    hi: float,
    n_bins: int,
) -> DataFrame:
    """Per-group distribution drift between two corpus slices (versions,
    time windows, sources): Jensen-Shannon divergence over the shared
    binned histogram — the data-quality monitor that catches a pipeline
    silently changing what it feeds training.

    Plan: one histogram scan per side (mergeable sketches), a full outer
    join on (keys, bin) — missing bins are zero — then a per-group
    aggregate of the JS terms. Cost is O(groups × bins), independent of
    row count beyond the two scans.

    Cross-engine determinism: probabilities are ratios of exact bin counts
    (IEEE division is correctly rounded), the log terms snap to a 1e-4
    grid via floor(x*1e4+0.5) (JVM log and C ln can differ in the last
    ulp — same rule as tfidf_top_terms). JS is bounded [0, ln 2]."""
    ha = build_histogram(a, value_col, keys, lo, hi, n_bins).withColumnRenamed(
        "n", "n_a"
    )
    hb = build_histogram(b, value_col, keys, lo, hi, n_bins).withColumnRenamed(
        "n", "n_b"
    )
    keys = list(keys)
    joined = ha.join(hb, on=[*keys, "bin"], how="full_outer").select(
        *keys,
        "bin",
        F.coalesce("n_a", F.lit(0)).alias("n_a"),
        F.coalesce("n_b", F.lit(0)).alias("n_b"),
    )
    w_tot = joined.groupBy(*keys).agg(
        F.sum("n_a").alias("tot_a"), F.sum("n_b").alias("tot_b")
    )
    j = joined.join(w_tot, on=keys)
    p = F.col("n_a") / F.col("tot_a")
    q = F.col("n_b") / F.col("tot_b")
    mid = (p + q) / 2
    # 0·log(0/x) ≡ 0 — guard both sides
    term = (
        F.when(p > 0, p * F.log(p / mid)).otherwise(F.lit(0.0))
        + F.when(q > 0, q * F.log(q / mid)).otherwise(F.lit(0.0))
    ) / 2
    snapped = F.floor(term * 1e4 + F.lit(0.5)) / 1e4
    return (
        j.withColumn("__t", snapped)
        .groupBy(*keys)
        .agg(
            F.round(F.sum("__t"), 4).alias("js_divergence"),
            F.max("tot_a").alias("n_a"),
            F.max("tot_b").alias("n_b"),
        )
    )
