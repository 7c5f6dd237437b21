"""Deterministic sampling & data-mixing operators for corpus curation.

The curation steps between dedup and training: draw an exact-k uniform
sample per group (eval-set carving, per-domain spot checks), a weighted
global sample (importance sampling by quality/length), and resample a
corpus to a target domain mixture (data-mixing, the DoReMi/Pile-style
reweighting step). The reference has no sampling surface (SURVEY §2 —
its only reduction is an aggregate, stream.ipynb:116-119); these extend
the engine the way its north-star pipeline needs.

Determinism contract (same as operators.chunking.hash_split): every
random draw is `md5(salt:id)` — engine-independent, stable under
re-partitioning and re-runs, redrawable by changing ``salt``. That makes
each operator hash-checkable against a SQL oracle, unlike `rand()`-based
sampling which is engine- and partitioning-specific.

Scale shape:
- per-group exact-k orders by the hash WITHIN a window partition;
  Spark ≥3.5 plans the rank-filter as WindowGroupLimit (per-partition
  top-k before the shuffle), so the shuffle carries ≤ k rows per group
  per input partition, not the whole group.
- the weighted global sample is a TakeOrderedAndProject (per-partition
  heap of k, then a k-row merge on the driver-side single reducer) —
  no global sort materializes.
- mixture resampling is one count aggregate (tiny: |domains| rows,
  broadcast back) + a stateless per-row Bernoulli filter — one shuffle
  total regardless of corpus size, and the filter prunes BEFORE any
  downstream shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_TWO32 = float(1 << 32)


def md5_uniform(col: Column, salt: str) -> Column:
    """Uniform-[0,1) draw from the first 32 bits of md5(salt:value) —
    engine-independent (DuckDB twin:
    ``('0x' || substring(md5(salt || ':' || v), 1, 8))::BIGINT / 2^32``)."""
    h = F.substring(
        F.md5(F.concat(F.lit(f"{salt}:"), col.cast("string"))), 1, 8
    )
    return F.conv(h, 16, 10).cast("double") / F.lit(_TWO32)


def sample_exact_per_group(
    df: DataFrame,
    group_cols: list[str],
    id_col: str,
    k: int,
    salt: str = "seed42",
) -> DataFrame:
    """Exactly ``min(k, |group|)`` uniform rows per group, without
    replacement: rank rows by md5(salt:id) within each group and keep the
    first k. Adds ``sample_rank`` (1-based). Unlike ``sampleBy`` this is
    exact-count (no Bernoulli variance) and engine-reproducible."""
    u = md5_uniform(F.col(id_col), salt)
    w = Window.partitionBy(*group_cols).orderBy(u, F.col(id_col))
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k)
    )


def weighted_sample_global(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    salt: str = "seed42",
) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis–Spirakis A-Res):
    each row draws u = md5-uniform and gets key ln(u)/w; the k LARGEST
    keys win — inclusion probability proportional to ``weight_col``
    without ever materializing a global sort.

    The key is snapped to a 1e-12 grid (floor(x*1e12+0.5), ties broken by
    id) so the float ordering is engine-comparable: bare ln() may differ
    in the last ulp between libm implementations, and an ulp at the
    selection boundary would flip row k vs k+1."""
    u = md5_uniform(F.col(id_col), salt)
    # u is 0 only on a 2^-32 hash collision with 0; clamp to keep ln finite
    key = F.log(F.greatest(u, F.lit(2.0 ** -33))) / F.col(weight_col).cast(
        "double"
    )
    key = F.floor(key * F.lit(1e12) + F.lit(0.5)) / F.lit(1e12)
    return (
        df.withColumn("sample_key", key)
        .orderBy(F.desc("sample_key"), F.asc(id_col))
        .limit(k)
    )


def mixture_resample(
    df: DataFrame,
    domain_col: str,
    total_rows: int,
    id_col: str,
    targets: dict[str, float] | None = None,
    salt: str = "seed42",
) -> DataFrame:
    """Resample a corpus toward a target domain mixture: domain d keeps
    each row with probability min(1, share_d * total_rows / |d|), where
    ``targets`` maps domain → share (defaults to uniform over observed
    domains). The expected output is ``total_rows`` rows distributed per
    the target shares — the data-mixing step that rebalances a web-heavy
    corpus before training.

    One aggregate computes per-domain counts (|domains| rows, broadcast
    back onto the corpus); the keep decision is a stateless md5-Bernoulli
    per row, so the whole operator costs one tiny shuffle + one map pass.
    Domains below their quota keep everything (fraction capped at 1) —
    upsampling duplicates is a training-loader concern, not an engine one.
    """
    counts = df.groupBy(domain_col).agg(F.count(F.lit(1)).alias("__n"))
    if targets is None:
        n_domains = counts.select(
            F.count(F.lit(1)).alias("__n_domains")
        )
        counts = counts.crossJoin(F.broadcast(n_domains)).withColumn(
            "__share", F.lit(1.0) / F.col("__n_domains")
        ).drop("__n_domains")
    else:
        share = None
        for dom, s in targets.items():
            share = (
                F.when(F.col(domain_col) == dom, F.lit(float(s)))
                if share is None
                else share.when(F.col(domain_col) == dom, F.lit(float(s)))
            )
        counts = counts.withColumn("__share", share.otherwise(F.lit(0.0)))
    counts = counts.withColumn(
        "keep_fraction",
        F.least(
            F.lit(1.0),
            F.col("__share") * F.lit(float(total_rows)) / F.col("__n"),
        ),
    ).select(domain_col, "keep_fraction")
    u = md5_uniform(F.col(id_col), salt)
    return (
        df.join(F.broadcast(counts), on=domain_col)
        .filter(u < F.col("keep_fraction"))
    )


def temperature_resample(
    df: DataFrame,
    domain_col: str,
    total_rows: int,
    id_col: str,
    tau: float = 0.5,
    salt: str = "seed42",
) -> DataFrame:
    """Mixture resampling with TEMPERATURE-derived target shares:
    share_d ∝ |d|^tau (the multilingual/DoReMi-style rebalance — tau=1
    keeps natural proportions, tau=0 is uniform, tau∈(0,1) upweights
    small domains sublinearly). Shares come from the same tiny count
    aggregate the uniform path uses — one window-less normalization over
    |domains| rows — then the identical md5-Bernoulli keep decision."""
    counts = df.groupBy(domain_col).agg(F.count(F.lit(1)).alias("__n"))
    w = F.pow(F.col("__n").cast("double"), F.lit(float(tau)))
    tot = counts.select(
        F.sum(F.pow(F.col("__n").cast("double"), F.lit(float(tau)))).alias(
            "__wsum"
        )
    )
    counts = (
        counts.crossJoin(F.broadcast(tot))
        .withColumn("__share", w / F.col("__wsum"))
        .withColumn(
            "keep_fraction",
            F.least(
                F.lit(1.0),
                F.col("__share") * F.lit(float(total_rows)) / F.col("__n"),
            ),
        )
        .select(domain_col, "keep_fraction")
    )
    u = md5_uniform(F.col(id_col), salt)
    return (
        df.join(F.broadcast(counts), on=domain_col)
        .filter(u < F.col("keep_fraction"))
    )


def epoch_shuffle(
    df: DataFrame,
    id_col: str,
    epoch: int,
    n_shards: int = 8,
) -> DataFrame:
    """Deterministic per-epoch global shuffle of a training corpus
    WITHOUT a global sort: md5(epoch:id) assigns each row a shard
    (top bits) and an in-shard position (row_number within the shard,
    ordered by the same hash) — reading shards in order yields a
    reproducible epoch-specific permutation, a different one each
    epoch. This is the at-scale layout trainers consume (shard files,
    shuffled within and across): the only wide op is the shard-keyed
    window, which parallelizes across ``n_shards`` partitions; a true
    global row_number would serialize on one partition.

    Every engine with md5 reproduces the same permutation — data order
    for run N of a training job stops depending on Spark partition
    layout, file order, or rand() seeds."""
    h = F.md5(
        F.concat(F.lit(f"{epoch}:"), F.col(id_col).cast("string"))
    )
    shard = F.pmod(
        F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint"),
        F.lit(n_shards),
    ).cast("int")
    w = Window.partitionBy("shard").orderBy(
        F.col("__h").asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("__h", h)
        .withColumn("shard", shard)
        .withColumn("pos_in_shard", F.row_number().over(w))
        .drop("__h")
    )


def negative_sampling(
    docs: DataFrame,
    n_samples: int,
    text_col: str = "text",
    salt: str = "neg",
    alpha_power_34: bool = True,
) -> DataFrame:
    """word2vec-style negative sampling (Mikolov et al. 2013): draw
    ``n_samples`` tokens from the unigram distribution raised to the 3/4
    power — the noise distribution skip-gram/contrastive losses sample
    from. Returns the draw census ``(token, n_draws)``.

    Every piece is engine-exact:
    - weights: ``w = floor(sqrt(sqrt(n³)) · 1000)`` — n^0.75 via two
      IEEE-correctly-rounded sqrts of an exact integer cube (``pow(n,
      .75)`` is NOT correctly rounded and differs across libms). n is
      capped at 100k so n³ stays under 2^53 (beyond the cap the 3/4-power
      curve is flat enough that the cap is the standard truncation).
    - draw targets: ``t_s = md5_16(salt:s) · W div 2¹⁶`` — exact BIGINT
      (a 16-bit draw keeps u·W under 2^63 for any W < 2^47; a 32-bit
      draw would overflow on billion-scale cumulative weights).
    - the draw lands on the vocab slot whose cumulative-weight interval
      [cum−w, cum) contains t — an interval join against the BROADCAST
      cumulative vocab table (vocab-bounded, the alias-table shape).

    The cumulative window is over the VOCAB (cardinality-bounded — the
    whitelisted unpartitioned-window class), never over the corpus."""
    from m13_sparkstreaming_python_azure_spark.operators.text import tokens

    spark = docs.sparkSession
    vocab = (
        docs.select(F.explode(tokens(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    if alpha_power_34:
        capped = F.least(F.col("n"), F.lit(100_000)).cast("double")
        w = F.floor(
            F.sqrt(F.sqrt(capped * capped * capped)) * F.lit(1000.0)
        ).cast("long")
    else:
        w = F.col("n").cast("long")
    cum = (
        vocab.withColumn("w", w)
        .withColumn(
            "cum",
            F.sum("w").over(
                Window.orderBy("token").rowsBetween(
                    Window.unboundedPreceding, 0
                )
            ),
        )
    )
    total = cum.agg(F.max("cum").alias("t")).collect()[0]["t"]
    if total is None:
        raise ValueError(
            "negative_sampling: empty corpus — no tokens to weight"
        )
    if int(total) >= 1 << 47:
        # the 16-bit md5 draw u is multiplied by total; u*total must fit a
        # signed 64-bit long (2^16 * 2^47 = 2^63), otherwise draw targets
        # silently overflow negative
        raise ValueError(
            f"negative_sampling: cumulative unigram^0.75 weight {total} "
            f">= 2^47 overflows the 16-bit-draw * total BIGINT product; "
            "rescale the weights (larger quantization grid) first"
        )
    draws = spark.range(n_samples).select(
        F.col("id").alias("s"),
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit(f"{salt}:"), F.col("id").cast("string")
                        )
                    ),
                    1,
                    4,
                ),
                16,
                10,
            ).cast("long")
            * F.lit(int(total))
        ).alias("__num"),
    ).select("s", F.expr(f"__num DIV {1 << 16}").alias("t"))
    hit = draws.join(
        F.broadcast(cum),
        (F.col("t") >= F.col("cum") - F.col("w"))
        & (F.col("t") < F.col("cum")),
    )
    return hit.groupBy("token").agg(F.count(F.lit(1)).alias("n_draws"))
