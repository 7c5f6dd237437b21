"""Interval algebra — merge overlapping per-key intervals (gaps-and-islands).

The reference's notebook has no interval operator (its sessions are fixed
calendar days, stream.ipynb:117-121); this is the general form a telemetry
or training-log pipeline needs: collapse [start, end) intervals that
overlap or touch into maximal merged spans, per key.

Scale design (100 TB):
- ONE shuffle, on the key — the same shuffle any per-key window needs.
  Island detection is a running max over the ordered partition (no
  self-join, no explode): a row starts a new island iff its start exceeds
  the cumulative max end of all earlier rows.
- The running max and the island-id running sum are both single-pass
  window aggregates over the key partition — whole-stage-codegen'd,
  no Python.
- Skewed keys (one user with millions of intervals) degrade to a single
  sorted partition; if that is a real shape, pre-split the key by
  coarse time range (day) and merge islands that cross the seam in a
  second, much smaller pass.

Determinism: ties on start are broken by the caller-supplied tiebreak
column, so island numbering is stable across engines and partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_intervals(
    df: DataFrame,
    key: str,
    start: str,
    end: str,
    tiebreak: str,
) -> DataFrame:
    """Collapse overlapping-or-touching ``[start, end]`` intervals per
    ``key`` into maximal islands.

    Returns one row per merged island: key, island_start, island_end,
    n_merged (how many input intervals it absorbed).
    """
    order = Window.partitionBy(key).orderBy(start, tiebreak)
    prev_max_end = F.max(end).over(
        order.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = df.withColumn(
        "_new_island",
        F.when(
            prev_max_end.isNull() | (F.col(start) > prev_max_end), 1
        ).otherwise(0),
    )
    with_island = flagged.withColumn(
        "_island",
        F.sum("_new_island").over(
            order.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return with_island.groupBy(key, "_island").agg(
        F.min(start).alias("island_start"),
        F.max(end).alias("island_end"),
        F.count(F.lit(1)).alias("n_merged"),
    ).drop("_island")
