"""Window / ranking operators (SURVEY.md §2.5 W1, §2.6 O1-O2).

The reference's headline analytic is a SQL window query over the live
streaming aggregate (stream.ipynb:178-187):

    ROW_NUMBER() OVER (PARTITION BY city
                       ORDER BY distinct_hotels DESC, wthr_date DESC)
    ... WHERE row_num = 1 ORDER BY distinct_hotels DESC LIMIT 10

Re-expressed as composable DataFrame operators. Scale notes:
- ``top1_per_group`` filters on ``row_number() == 1``; Spark ≥3.5 rewrites
  this to WindowGroupLimit (per-partition top-k before the shuffle), so it
  does NOT materialize the full ranked table.
- ``topk`` compiles to TakeOrderedAndProject — a per-partition heap + driver
  merge, never a full global sort.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def ranked(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    rank_col: str = "row_num",
) -> DataFrame:
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return df.withColumn(rank_col, F.row_number().over(w))


def top1_per_group(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
) -> DataFrame:
    """W1 + P5: best row per group with a deterministic tie-break order."""
    return ranked(df, partition_by, order_by).filter(F.col("row_num") == 1).drop(
        "row_num"
    )


def topk_per_group(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    keep_rank: bool = True,
) -> DataFrame:
    """Top-k rows per group (heavy hitters / best-N). rank ≤ k over a
    window compiles to WindowGroupLimit in Spark ≥3.5: each map task keeps
    only its local top-k per group BEFORE the window shuffle, so shuffle
    volume is O(groups × k), not O(rows)."""
    out = ranked(df, partition_by, order_by).filter(F.col("row_num") <= k)
    return out if keep_rank else out.drop("row_num")


def topk(df: DataFrame, order_by: Sequence[Column], k: int) -> DataFrame:
    """O1: global top-k (ORDER BY ... LIMIT k → TakeOrderedAndProject)."""
    return df.orderBy(*order_by).limit(k)


def best_day_per_city_top10(agg_df: DataFrame) -> DataFrame:
    """The reference's flagship query (stream.ipynb:178-187) verbatim:
    per city, the day with the most distinct hotels (ties → latest day),
    then the 10 cities with the highest such peak."""
    best = top1_per_group(
        agg_df,
        ["city"],
        [F.desc("distinct_hotels"), F.desc("wthr_date")],
    )
    return topk(best, [F.desc("distinct_hotels")], 10)


import re as _re

_SORT_RE = _re.compile(r"^(.*) (ASC|DESC) NULLS (FIRST|LAST)$", _re.DOTALL)
_IDENT_RE = _re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def _lead_spec(col: Column) -> tuple[Column, bool, bool]:
    """Leading sort spec (value column, ascending, nulls_first) from a
    sort Column. A SortOrder prints as ``expr ASC|DESC NULLS
    FIRST|LAST``; a bare column prints as its expression (Spark sort
    default: ASC NULLS FIRST). Only the BUCKET assignment needs this —
    the within-bucket sort uses the original Column, directions intact
    — so a mis-parse would surface as load imbalance or a test failure,
    never a silent wrong rank; non-identifier expressions that fail to
    re-parse raise, and the caller passes ``lead=`` explicitly."""
    s = str(col)
    if s.startswith("Column<'") and s.endswith("'>"):
        s = s[len("Column<'") : -2]
    m = _SORT_RE.match(s)
    if m:
        expr_s, direction, nulls = m.groups()
        asc, nulls_first = direction == "ASC", nulls == "FIRST"
    else:
        expr_s, asc, nulls_first = s, True, True
    if _IDENT_RE.match(expr_s):
        return F.col(expr_s), asc, nulls_first
    try:
        return F.expr(expr_s), asc, nulls_first
    except Exception as e:  # noqa: BLE001
        raise ValueError(
            f"cannot infer the leading sort column from {s!r}; pass "
            "lead=(column, ascending, nulls_first) explicitly"
        ) from e


def _surrogate(df: DataFrame, lead: Column, ascending: bool) -> Column:
    """Numeric, order-monotone surrogate of the leading sort value (the
    quantile-bucket axis). Strings map to their first 6 UTF-8 bytes as
    a 48-bit integer (zero-right-padded hex, so place value aligns —
    monotone in Spark's binary string order; ties merge, never invert);
    temporals to epoch numbers; numerics cast to double. Descending
    orders negate, so bucket ids always rise with rank. Null iff the
    lead value is null."""
    dtype = df.select(lead.alias("__l")).schema[0].dataType.simpleString()
    if dtype == "string":
        eff = F.conv(F.rpad(F.hex(lead), 12, "0"), 16, 10).cast("double")
    elif dtype == "date":
        eff = F.unix_date(lead).cast("double")
    elif dtype.startswith("timestamp"):
        eff = F.unix_micros(lead.cast("timestamp")).cast("double")
    elif dtype == "boolean":
        eff = lead.cast("int").cast("double")
    else:
        eff = lead.cast("double")
    return eff if ascending else -eff


def _quantile_bounds(df: DataFrame, eff: Column, p: int) -> list[float]:
    """p−1 even quantile boundaries of ``eff`` — ONE bounded
    construction-time action (≤ p−1 scalars collected, the repo's
    bounded-scalar class), embedded as literals so every DAG branch
    computes the SAME bucket for a row by construction. Boundaries only
    steer load balance; correctness never depends on where they fall."""
    if p <= 1:
        return []
    row = df.select(
        F.percentile_approx(eff, [i / p for i in range(1, p)], 10_000).alias(
            "__b"
        )
    ).first()
    return sorted({b for b in (row["__b"] or []) if b is not None})


def _bucket_col(
    eff: Column, bounds: list[float], nulls_first: bool, p: int
) -> Column:
    """#(boundaries strictly below eff), with nulls routed to a
    sentinel bucket at the correct end of the order. Ties AT a boundary
    stay in the lower bucket — every set of lead-ties lands in exactly
    one bucket, so within-bucket sorting by the full key is exact."""
    bkt = F.lit(0)
    for b in bounds:
        bkt = bkt + F.when(eff > F.lit(b), 1).otherwise(0)
    return F.when(
        eff.isNull(), F.lit(-1 if nulls_first else p)
    ).otherwise(bkt).cast("int")


def global_rank(
    df: DataFrame,
    order_by: Sequence[Column],
    out_col: str = "rank",
    num_partitions: int | None = None,
    total_col: str | None = None,
    lead: tuple[Column, bool, bool] | None = None,
    materialize: bool = False,
) -> DataFrame:
    """EXACT 1-based global rank over a total order — without the
    single-partition sort an unpartitioned ``Window.orderBy`` forces
    (``WindowExec: No Partition Defined`` moves the whole table to ONE
    task; at 100 TB that is a straight OOM).

    Distributed-rank construction over DATA-DERIVED quantile buckets
    (r10 rebuild — the r7 version range-partitioned and tagged with
    ``spark_partition_id``, which silently required Spark to REUSE the
    range exchange between the stats branch and the data branch: a
    range exchange re-samples its boundaries per evaluation, and when
    AQE declines to reuse it — measured this round on the roc_auc DAG
    shape — the branches disagree about partition membership and ranks
    drift nondeterministically):

    1. ONE bounded construction-time action: p−1 quantile boundaries of
       a numeric order-monotone surrogate of the leading sort value,
       embedded as LITERALS — so every branch computes identical bucket
       tags by pure row-local arithmetic; there is nothing left to
       disagree about, exchange reuse or not.
    2. ``row_number() OVER (PARTITION BY bucket ORDER BY full key)`` —
       every window group is one quantile bucket (~N/P rows, never the
       table) and lead-ties always share a bucket, so the local order
       is exact.
    3. per-bucket counts (P rows) → offsets via a broadcast triangle
       join (rows in earlier buckets); optional total N is a single-row
       scalar broadcast (``total_col``).
       ``global rank = offset + local row_number``.

    The ordering MUST be total (tie-break with a unique column) or the
    assignment is not deterministic. One hash shuffle on the bucket
    tag; every other input is P-row or scalar. ``lead`` overrides the
    inferred (leading value column, ascending, nulls_first) when the
    leading sort expression is not a plain column. ``materialize=True``
    eagerly localCheckpoints the input first, so the boundary job, the
    stats branch, and the data branch read ONE evaluation instead of
    re-running an expensive upstream chain three times — use it when
    the input subtree is a long operator chain and its materialized
    size is acceptable."""
    if materialize:
        df = df.localCheckpoint(eager=True)
    spark = df.sparkSession
    p = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "200")
    )
    cols = list(order_by)
    lead_col, asc, nulls_first = lead or _lead_spec(cols[0])
    eff = _surrogate(df, lead_col, asc)
    bounds = _quantile_bounds(df, eff, p)
    tagged = df.withColumn(
        "__bkt", _bucket_col(eff, bounds, nulls_first, p)
    )
    w_loc = Window.partitionBy("__bkt").orderBy(*cols)
    stats = tagged.groupBy("__bkt").agg(F.count(F.lit(1)).alias("__cnt"))
    a, b = stats.alias("a"), stats.alias("b")
    offs = (
        a.join(
            F.broadcast(b), F.col("b.__bkt") < F.col("a.__bkt"), "left"
        )
        .groupBy(F.col("a.__bkt").alias("__bkt"))
        .agg(F.coalesce(F.sum("b.__cnt"), F.lit(0)).alias("__off"))
    )
    ranked = tagged.join(F.broadcast(offs), "__bkt").withColumn(
        out_col,
        F.col("__off") + F.row_number().over(w_loc).cast("long"),
    )
    if total_col is not None:
        tot = stats.agg(F.sum("__cnt").alias(total_col))
        ranked = ranked.crossJoin(F.broadcast(tot))
    return ranked.drop("__bkt", "__off")


def exact_ntile(
    df: DataFrame,
    n_tiles: int,
    order_by: Sequence[Column],
    out_col: str = "tile",
    num_partitions: int | None = None,
    materialize: bool = False,
) -> DataFrame:
    """EXACT ntile(n) over a total order — without the single-partition
    sort an unpartitioned ``Window.orderBy`` forces (``WindowExec: No
    Partition Defined`` moves the whole table to ONE task; at 100 TB
    that is a straight OOM).

    Thin wrapper over ``global_rank`` (the distributed-rank
    construction — fully lazy, ONE job, no driver collect) + SQL
    ntile's bucket arithmetic on the exact rank, pure integer column
    expressions: with ``q, r = N divmod n``, the first ``r`` buckets
    take ``q+1`` rows — engine-bit-equal with any conforming ntile.

    The ordering MUST be total (tie-break with a unique column) or the
    assignment is not deterministic. One hash shuffle on the quantile
    bucket tag; every other input is P-row or scalar. Used by
    ``rfm_segments`` / ``price_decile_stats`` as the 100 TB-safe twin of
    their small-SF ntile oracles."""
    if n_tiles < 1:
        raise ValueError("n_tiles must be >= 1")
    ranked = global_rank(
        df,
        order_by,
        out_col="__rank",
        num_partitions=num_partitions,
        total_col="__n",
        materialize=materialize,
    )
    tile = F.expr(
        f"CASE WHEN __n < {n_tiles} THEN __rank"  # fewer rows than tiles
        f" WHEN __rank <= (__n % {n_tiles}) * (__n DIV {n_tiles} + 1)"
        f" THEN (__rank - 1) DIV (__n DIV {n_tiles} + 1) + 1"
        f" ELSE (__n % {n_tiles})"
        f"  + (__rank - (__n % {n_tiles}) * (__n DIV {n_tiles} + 1) - 1)"
        f"    DIV (__n DIV {n_tiles}) + 1 END"
    )
    return ranked.withColumn(out_col, tile.cast("long")).drop(
        "__rank", "__n"
    )


def global_cumsum(
    df: DataFrame,
    order_by: Sequence[str],
    value_cols: Sequence[str],
    partition_by: Sequence[str] = (),
    num_partitions: int | None = None,
    out_prefix: str = "cum_",
    totals_prefix: str | None = None,
    materialize: bool = False,
) -> DataFrame:
    """EXACT inclusive running sums over a total order — without the
    single-partition sort an unpartitioned ``Window.orderBy`` forces
    (``WindowExec: No Partition Defined`` moves the whole table to ONE
    task). This is the scale-safe twin of ``SUM(v) OVER (ORDER BY k
    ROWS UNBOUNDED PRECEDING)`` for the distinct-value CDF/rank-sum
    queries (``roc_auc``, ``ks_test``, ``kruskal_wallis``,
    ``ece_calibration``): their "bounded distinct keyspace" claim is a
    fixture artifact — on continuous scores (model logits, calibrated
    probabilities) distinct values ≈ n and the old window serializes.

    Construction — like ``global_rank`` but with a DATA-DERIVED bucket
    tag instead of ``spark_partition_id`` over ``repartitionByRange``:
    the stats branch and the data branch of a cumsum DAG each
    re-evaluate their shared lineage, and a range exchange re-SAMPLES
    its boundaries per evaluation (the sampler seed hangs off the RDD
    id), so unless AQE happens to reuse the exchange the two branches
    can disagree about which rows partition *p* holds — measured here
    as a nondeterministic ±0.5 % drift in ``roc_auc``. Quantile-literal
    bucketing removes the failure mode by construction:

    1. ONE bounded construction-time action: ``percentile_approx`` of
       the leading order column at p−1 even quantiles, collected and
       embedded as LITERALS (≤ p−1 scalars — the repo's bounded-scalar
       collect class). Boundaries only steer load balance; correctness
       never depends on where they fall.
    2. every branch tags rows with ``__bkt`` = #(boundaries < key) —
       a pure deterministic expression over the row, so the branches
       CANNOT disagree, reuse or not.
    3. per-(bucket, group) totals of every value column — a P×G-row
       side table; offsets per (bucket, group) = a broadcast triangle
       join over it (totals of SAME group in EARLIER buckets);
       optional per-group grand totals (``totals_prefix``) are the
       standard bounded-broadcast scalar join.
    4. the in-bucket running sum is a ``Window.partitionBy(__bkt,
       *group)`` — every window group is one quantile bucket (~N/P
       rows), never the whole table; global cumsum = local + offset.

    Requirements: ``order_by`` must be a total order within each group
    (unique keys — true by construction after a ``groupBy`` on the same
    keys) or the tie rows' running values are nondeterministic; the
    LEADING order column must be numeric (bucket boundaries compare on
    it; ties on it stay in one bucket, so a hot leading value bounds
    that bucket's size — same caveat as any key-partitioned work).
    Adds ``{out_prefix}{v}`` per value column (and ``{totals_prefix}
    {v}`` when requested). One hash shuffle on (bucket, group) + one
    P×G-row broadcast; no range exchange anywhere. ``materialize=True``
    eagerly localCheckpoints the input so the boundary job, the stats
    branch, and the data branch read ONE evaluation — use it when the
    input subtree (typically a groupBy to the distinct-value grain) is
    expensive to re-run and its materialized size is acceptable."""
    if materialize:
        df = df.localCheckpoint(eager=True)
    spark = df.sparkSession
    p = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "200")
    )
    keys = list(partition_by)
    ords = list(order_by)
    vals = list(value_cols)
    eff = _surrogate(df, F.col(ords[0]), ascending=True)
    bounds = _quantile_bounds(df, eff, p)
    tagged = df.withColumn(
        "__bkt", _bucket_col(eff, bounds, nulls_first=True, p=p)
    )
    stats = tagged.groupBy("__bkt", *keys).agg(
        *[F.sum(v).alias(f"__t_{v}") for v in vals]
    )
    a, b = stats.alias("a"), stats.alias("b")
    same_group = F.lit(True)
    for k in keys:
        same_group = same_group & (F.col(f"a.{k}") == F.col(f"b.{k}"))
    offs = (
        a.join(
            F.broadcast(b),
            same_group & (F.col("b.__bkt") < F.col("a.__bkt")),
            "left",
        )
        .groupBy(
            F.col("a.__bkt").alias("__bkt"),
            *[F.col(f"a.{k}").alias(k) for k in keys],
        )
        .agg(
            *[
                F.coalesce(F.sum(f"b.__t_{v}"), F.lit(0)).alias(f"__off_{v}")
                for v in vals
            ]
        )
    )
    w_loc = (
        Window.partitionBy("__bkt", *keys)
        .orderBy(*ords)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = tagged.join(F.broadcast(offs), ["__bkt", *keys])
    for v in vals:
        out = out.withColumn(
            f"{out_prefix}{v}",
            F.sum(v).over(w_loc) + F.col(f"__off_{v}"),
        )
    out = out.drop("__bkt", *[f"__off_{v}" for v in vals])
    if totals_prefix is not None:
        if keys:
            tot = stats.groupBy(*keys).agg(
                *[
                    F.sum(f"__t_{v}").alias(f"{totals_prefix}{v}")
                    for v in vals
                ]
            )
            out = out.join(F.broadcast(tot), keys)
        else:
            tot = stats.agg(
                *[
                    F.sum(f"__t_{v}").alias(f"{totals_prefix}{v}")
                    for v in vals
                ]
            )
            out = out.crossJoin(F.broadcast(tot))
    return out
