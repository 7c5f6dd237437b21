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
