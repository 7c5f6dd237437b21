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

    Distributed-rank construction (the classic zipWithIndex-over-
    range-partitions shape, e.g. Spark's own ``zipWithIndex``):

    1. ``repartitionByRange`` on the full ordering key → partition *p*
       holds a contiguous key range, ranges ascending in *p*; pin the
       assignment with an eager ``localCheckpoint`` so the two passes
       below see identical partitioning.
    2. local ``row_number`` per partition (window PARTITIONED by
       ``spark_partition_id()`` — each group ≤ N/P rows, never global).
    3. per-partition counts (P rows, not data) → driver cumsum →
       broadcast offsets joined back on the partition id;
       ``global rank = offset + local rank``.
    4. SQL ntile's bucket arithmetic on the exact rank, pure integers:
       with ``q, r = divmod(N, n)``, the first ``r`` buckets take
       ``q+1`` rows — engine-bit-equal with any conforming ntile.

    The ordering MUST be total (tie-break with a unique column) or the
    assignment is not deterministic. Two narrow passes over the data +
    one P-row collect; no stage ever holds more than one partition's
    rows. Used by ``rfm_segments`` / ``price_decile_stats`` as the
    100 TB-safe twin of their small-SF ntile oracles."""
    if n_tiles < 1:
        raise ValueError("n_tiles must be >= 1")
    spark = df.sparkSession
    p = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "200")
    )
    cols = list(order_by)
    parted = (
        df.repartitionByRange(p, *cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    counts = sorted(
        (row["__pid"], row["cnt"])
        for row in parted.groupBy("__pid")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    )
    total = sum(c for _, c in counts)
    if total == 0:
        return df.withColumn(out_col, F.lit(None).cast("long"))
    offsets, acc = [], 0
    for pid, cnt in counts:
        offsets.append((pid, acc))
        acc += cnt
    off_df = spark.createDataFrame(offsets, "__pid int, __off long")
    local_w = Window.partitionBy("__pid").orderBy(*cols)
    ranked_df = (
        parted.withColumn("__lr", F.row_number().over(local_w))
        .join(F.broadcast(off_df), "__pid")
        .withColumn("__rank", F.col("__off") + F.col("__lr"))
    )
    q, r = divmod(total, n_tiles)
    if q == 0:  # fewer rows than tiles: bucket i gets row i
        tile = F.col("__rank")
    else:
        thr = r * (q + 1)
        tile = F.expr(
            f"CASE WHEN __rank <= {thr}"
            f" THEN (__rank - 1) DIV {q + 1} + 1"
            f" ELSE {r} + (__rank - {thr} - 1) DIV {q} + 1 END"
        )
    return ranked_df.withColumn(out_col, tile.cast("long")).drop(
        "__pid", "__lr", "__off", "__rank"
    )
