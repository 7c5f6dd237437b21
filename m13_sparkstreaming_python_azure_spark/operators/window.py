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


def global_rank(
    df: DataFrame,
    order_by: Sequence[Column],
    out_col: str = "rank",
    num_partitions: int | None = None,
    total_col: str | None = None,
) -> DataFrame:
    """EXACT 1-based global rank over a total order — without the
    single-partition sort an unpartitioned ``Window.orderBy`` forces
    (``WindowExec: No Partition Defined`` moves the whole table to ONE
    task; at 100 TB that is a straight OOM).

    Distributed-rank construction (the zipWithIndex-over-range-partitions
    shape), fully lazy — ONE job, no driver collect, no checkpoint:

    1. ``repartitionByRange`` on the full ordering key +
       ``sortWithinPartitions`` → partition *p* holds a contiguous,
       locally-sorted key range, ranges ascending in *p*;
       ``monotonically_increasing_id()`` then numbers rows in sorted
       order within each partition.
    2. per-partition (count, min_id) — P rows — aggregated off the SAME
       exchange (ReuseExchange: the stats branch and the data branch
       share the one range shuffle, so they can't disagree on the
       partition assignment; the assignment is deterministic for a given
       input regardless, since the range sampler is seeded).
    3. offsets = a P×P broadcast triangle join over the stats rows
       (rows-before-this-partition); optional total N = a single-row
       scalar broadcast (``total_col``) — the standard bounded-broadcast
       idioms, replacing both the driver cumsum AND the
       per-partition-id window of the naive form.
       ``global rank = offset + (id − min_id) + 1``.

    The ordering MUST be total (tie-break with a unique column) or the
    assignment is not deterministic. One range shuffle over the
    projected ordering columns; every other input is P-row or scalar."""
    spark = df.sparkSession
    p = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "200")
    )
    cols = list(order_by)
    parted = (
        df.repartitionByRange(p, *cols)
        .sortWithinPartitions(*cols)
        .withColumn("__pid", F.spark_partition_id())
        .withColumn("__mono", F.monotonically_increasing_id())
    )
    stats = parted.groupBy("__pid").agg(
        F.count(F.lit(1)).alias("__cnt"), F.min("__mono").alias("__min_mono")
    )
    a, b = stats.alias("a"), stats.alias("b")
    offs = (
        a.join(
            F.broadcast(b), F.col("b.__pid") < F.col("a.__pid"), "left"
        )
        .groupBy(
            F.col("a.__pid").alias("__pid"),
            F.col("a.__min_mono").alias("__min_mono"),
        )
        .agg(F.coalesce(F.sum("b.__cnt"), F.lit(0)).alias("__off"))
    )
    ranked = parted.join(F.broadcast(offs), "__pid").withColumn(
        out_col,
        F.col("__off") + (F.col("__mono") - F.col("__min_mono")) + 1,
    )
    if total_col is not None:
        tot = stats.agg(F.sum("__cnt").alias(total_col))
        ranked = ranked.crossJoin(F.broadcast(tot))
    return ranked.drop("__pid", "__mono", "__min_mono", "__off")


def exact_ntile(
    df: DataFrame,
    n_tiles: int,
    order_by: Sequence[Column],
    out_col: str = "tile",
    num_partitions: int | None = None,
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
    assignment is not deterministic. One range shuffle over the
    projected ordering columns; every other input is P-row or scalar.
    Used by ``rfm_segments`` / ``price_decile_stats`` as the 100 TB-safe
    twin of their small-SF ntile oracles."""
    if n_tiles < 1:
        raise ValueError("n_tiles must be >= 1")
    ranked = global_rank(
        df,
        order_by,
        out_col="__rank",
        num_partitions=num_partitions,
        total_col="__n",
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
