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


def key_skew_profile(df: DataFrame, key_col: str, label: str) -> DataFrame:
    """Join-key distribution diagnostics — the profile that decides
    whether a shuffle on this key needs salting / AQE skew handling
    BEFORE the job runs at full scale. One row:
    (key_label, n_rows, n_keys, top1_share, top10_share, entropy_nats,
    norm_entropy, gini).

    Scale shape: one groupBy collapses the input to its key-count table
    (size = |keys|, the only data-sized shuffle); top-10 is a TakeOrdered
    (per-partition heads, no global sort); entropy terms grid-snap at
    1e-9 pre-sum and accumulate as exact BIGINTs (fold-order
    independent); gini's global rank uses repartitionByRange +
    sortWithinPartitions + the zipWithIndex offset pattern
    (operators/util.stable_ids) — a distributed range sort, NOT a
    single-partition window.

    gini over ascending-ranked counts c_1..c_K:
    G = 2*sum(i*c_i)/(K*n) - (K+1)/K — exact integer sums, so the final
    value is a ratio of identically-derived BIGINTs (bit-equal, no
    rounding grid)."""
    from m13_sparkstreaming_python_azure_spark.operators.util import (
        stable_ids,
    )

    counts = (
        df.groupBy(F.col(key_col).alias("k"))
        .agg(F.count(F.lit(1)).alias("c"))
        .persist()
    )
    totals = counts.agg(
        F.sum("c").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("c").alias("top1"),
    )
    top10 = (
        counts.orderBy(F.desc("c"), F.asc("k"))
        .limit(10)
        .agg(F.sum("c").alias("top10"))
    )

    # ranked ascending by (c, k): range-partitioned sort keeps the global
    # order while every partition works independently; stable_ids turns
    # partition-local positions into the global 0-based rank
    ranked = stable_ids(
        counts.repartitionByRange(F.asc("c"), F.asc("k"))
        .sortWithinPartitions(F.asc("c"), F.asc("k")),
        "rank0",
    )
    gini_sum = ranked.agg(
        F.sum((F.col("rank0") + 1) * F.col("c")).alias("s_ic")
    )

    n = F.col("n_rows")
    ent_term = F.floor(
        (F.col("c") / n) * F.log(F.col("c") / n) * 1e9 + F.lit(0.5)
    ).cast("decimal(28,0)")
    entropy = (
        counts.crossJoin(F.broadcast(totals))
        .agg(F.sum(ent_term).alias("s_ent"))
        .select(
            (-F.col("s_ent").cast("double") / 1e9).alias("entropy_nats")
        )
    )

    return (
        totals.crossJoin(F.broadcast(top10))
        .crossJoin(F.broadcast(gini_sum))
        .crossJoin(F.broadcast(entropy))
        .select(
            F.lit(label).alias("key_label"),
            "n_rows",
            "n_keys",
            (F.col("top1") / F.col("n_rows")).alias("top1_share"),
            (F.col("top10") / F.col("n_rows")).alias("top10_share"),
            "entropy_nats",
            (
                F.col("entropy_nats")
                / F.log(F.col("n_keys").cast("double"))
            ).alias("norm_entropy"),
            (
                F.lit(2.0) * F.col("s_ic") / (F.col("n_keys") * F.col("n_rows"))
                - (F.col("n_keys") + F.lit(1.0)) / F.col("n_keys")
            ).alias("gini"),
        )
    )


def mutual_information(df: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """Mutual information (nats) between two categorical columns, with
    the marginal entropies and the normalized variant
    NMI = MI / sqrt(H(a)*H(b)) — the feature-association measure that,
    unlike chi-square, is directly comparable across category
    cardinalities. One row: (n_rows, mi_nats, h_a, h_b, nmi).

    Same plan shape as chi_square_independence: one groupBy builds the
    contingency table (cells = category cross product, tiny), marginals
    are window sums over it, and every log term grid-snaps at 1e-9
    pre-sum into exact BIGINT accumulation. Absent cells contribute 0 to
    MI by convention (p_xy = 0), so no cell generation is needed."""
    cells = df.groupBy(
        F.col(a_col).alias("a"), F.col(b_col).alias("b")
    ).agg(F.count(F.lit(1)).alias("n"))
    wa, wb = Window.partitionBy("a"), Window.partitionBy("b")
    wall = Window.partitionBy()
    with_m = (
        cells.withColumn("na", F.sum("n").over(wa))
        .withColumn("nb", F.sum("n").over(wb))
        .withColumn("nn", F.sum("n").over(wall))
    )
    p_xy = F.col("n") / F.col("nn")
    mi_term = F.floor(
        p_xy
        * F.log(
            (F.col("n") * F.col("nn"))
            / (F.col("na").cast("double") * F.col("nb"))
        )
        * 1e9
        + F.lit(0.5)
    ).cast("decimal(28,0)")
    # marginal entropy terms must count each category ONCE, not once per
    # cell — compute them over the distinct marginal tables (tiny)
    ha_term = F.floor(
        (F.col("na") / F.col("nn"))
        * F.log(F.col("na") / F.col("nn"))
        * 1e9
        + F.lit(0.5)
    ).cast("decimal(28,0)")
    hb_term = F.floor(
        (F.col("nb") / F.col("nn"))
        * F.log(F.col("nb") / F.col("nn"))
        * 1e9
        + F.lit(0.5)
    ).cast("decimal(28,0)")
    ma = with_m.select("a", "na", "nn").distinct().agg(
        F.sum(ha_term).alias("s_ha")
    )
    mb = with_m.select("b", "nb", "nn").distinct().agg(
        F.sum(hb_term).alias("s_hb")
    )
    mi = with_m.agg(
        F.max("nn").alias("n_rows"), F.sum(mi_term).alias("s_mi")
    )
    return (
        mi.crossJoin(F.broadcast(ma))
        .crossJoin(F.broadcast(mb))
        .select(
            "n_rows",
            (F.col("s_mi").cast("double") / 1e9).alias("mi_nats"),
            (-F.col("s_ha").cast("double") / 1e9).alias("h_a"),
            (-F.col("s_hb").cast("double") / 1e9).alias("h_b"),
            (
                (F.col("s_mi").cast("double") / 1e9)
                / F.sqrt(
                    (F.col("s_ha").cast("double") / 1e9)
                    * (F.col("s_hb").cast("double") / 1e9)
                )
            ).alias("nmi"),
        )
    )


def key_skew_profile_multi(keyed: DataFrame) -> DataFrame:
    """Multi-column flavor of ``key_skew_profile``: input is one unioned
    (key_label, k) frame; ALL labels profile in a single pass — one
    groupBy to the per-label key-count tables, one global range sort for
    every gini rank (per-label rank = global dense position minus the
    label's minimum position, a tiny broadcast join), per-label
    aggregates for totals/top-10/entropy. Same output schema and values
    as N separate ``key_skew_profile`` calls, at 1/N the job count —
    the shape a 100 TB diagnostic sweep wants (each extra label adds
    rows to existing shuffles, not whole new stages).

    The top-10 rank windows over the per-label KEY-COUNT table (already
    one row per key, not per input row). For extreme key cardinality
    where even that table strains one partition per label, pre-prune
    with a salted local top-10 — groupBy(label, salt) heads first — or
    fall back to the single-label operator's TakeOrdered path."""
    from m13_sparkstreaming_python_azure_spark.operators.util import (
        stable_ids,
    )

    counts = (
        keyed.groupBy("key_label", "k")
        .agg(F.count(F.lit(1)).alias("c"))
        .persist()
    )
    totals = counts.groupBy("key_label").agg(
        F.sum("c").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("c").alias("top1"),
    )
    w10 = Window.partitionBy("key_label").orderBy(F.desc("c"), F.asc("k"))
    top10 = (
        counts.withColumn("rd", F.row_number().over(w10))
        .filter(F.col("rd") <= 10)
        .groupBy("key_label")
        .agg(F.sum("c").alias("top10"))
    )
    ranked = stable_ids(
        counts.repartitionByRange(
            F.asc("key_label"), F.asc("c"), F.asc("k")
        ).sortWithinPartitions(F.asc("key_label"), F.asc("c"), F.asc("k")),
        "pos",
    )
    base = ranked.groupBy("key_label").agg(F.min("pos").alias("pos0"))
    gini_sum = (
        ranked.join(F.broadcast(base), "key_label")
        .select(
            "key_label",
            ((F.col("pos") - F.col("pos0") + 1) * F.col("c")).alias("ic"),
        )
        .groupBy("key_label")
        .agg(F.sum("ic").alias("s_ic"))
    )
    n = F.col("n_rows")
    ent_term = F.floor(
        (F.col("c") / n) * F.log(F.col("c") / n) * 1e9 + F.lit(0.5)
    ).cast("decimal(28,0)")
    entropy = (
        counts.join(F.broadcast(totals), "key_label")
        .groupBy("key_label")
        .agg(F.sum(ent_term).alias("s_ent"))
        .select(
            "key_label",
            (-F.col("s_ent").cast("double") / 1e9).alias("entropy_nats"),
        )
    )
    return (
        totals.join(top10, "key_label")
        .join(gini_sum, "key_label")
        .join(entropy, "key_label")
        .select(
            "key_label",
            "n_rows",
            "n_keys",
            (F.col("top1") / F.col("n_rows")).alias("top1_share"),
            (F.col("top10") / F.col("n_rows")).alias("top10_share"),
            "entropy_nats",
            (
                F.col("entropy_nats")
                / F.log(F.col("n_keys").cast("double"))
            ).alias("norm_entropy"),
            (
                F.lit(2.0) * F.col("s_ic") / (F.col("n_keys") * F.col("n_rows"))
                - (F.col("n_keys") + F.lit(1.0)) / F.col("n_keys")
            ).alias("gini"),
        )
    )


def info_gain(
    df: DataFrame,
    features: list[str],
    target: str,
    grid: int = 1_000_000,
) -> DataFrame:
    """Information gain IG(Y; X) = H(Y) − H(Y|X) per categorical feature,
    on an exact integer grid: ``Σ_xy n_xy·⌊ln(n_xy/n_x)·G⌋ −
    Σ_y n_y·⌊ln(n_y/N)·G⌋`` (units G·N·nats — divide by G·N for nats).
    Each ln is snapped to the grid BEFORE the count-weighted sum, so the
    total is an exact BIGINT — fold-order independent and hash-equal
    across engines (the repo-wide float rule for data-dependent sums).
    Zero cells contribute nothing (n_xy ≥ 1 wherever a row exists); a
    constant feature scores exactly 0 because ln(n_y/N) terms cancel.

    Scale: one groupBy per feature over (feature, target) — map-side
    combinable counts; cardinality = |X|·|Y| rows per feature. Overflow:
    |term| ≤ N·ln(N)·G — at N=1e9, ≈ 2·1e16 < 2^63."""
    n_total = df.count()
    base = (
        df.groupBy(F.col(target).alias("y"))
        .agg(F.count(F.lit(1)).alias("n_y"))
        .select(
            (
                F.col("n_y")
                * F.floor(
                    F.log(F.col("n_y") / F.lit(n_total)) * grid + F.lit(0.5)
                ).cast("long")
            ).alias("t")
        )
        .agg(F.sum("t").alias("g0"))
        .collect()[0]["g0"]
    )
    parts = []
    for feat in features:
        cells = df.groupBy(
            F.col(feat).alias("x"), F.col(target).alias("y")
        ).agg(F.count(F.lit(1)).alias("n_xy"))
        nx = cells.groupBy("x").agg(F.sum("n_xy").alias("n_x"))
        g1 = cells.join(nx, "x").select(
            F.lit(feat).alias("feature"),
            (
                F.col("n_xy")
                * F.floor(
                    F.log(F.col("n_xy") / F.col("n_x")) * grid + F.lit(0.5)
                ).cast("long")
            ).alias("t"),
        )
        parts.append(
            g1.groupBy("feature").agg(
                (F.sum("t") - F.lit(int(base))).alias("ig_scaled")
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
