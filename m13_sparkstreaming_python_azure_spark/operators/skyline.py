"""2-D skyline (Pareto frontier) — the points not dominated in the
(minimize x, minimize y) sense by any other point.

The classic sort-based algorithm, expressed relationally: after grouping
to distinct (x, y) points, a point is dominated iff
  (1) some point with strictly smaller x has y <= mine, or
  (2) some point with equal x has strictly smaller y.
Both conditions reduce to running minima over the x-ordered point set —
NO self-join, NO quadratic NOT EXISTS. Dominance is scanned, not paired.

Scale design: one groupBy on (x, y) collapses the input to its distinct
point set (map-side combine), then one window over x. The window's total
order over distinct points is the only serial step; if the distinct
point set itself is huge, pre-prune with a coarse grid (keep each grid
cell's min-y point) before the exact pass — grid pruning is embarrassingly
parallel and cannot drop a true skyline point.

Equal points: two identical (x, y) points do not dominate each other
(dominance requires one strict inequality), so a skyline point's full
duplicate count is reported in n_rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def skyline_2d(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """Pareto-minimal (x, y) points with their duplicate counts."""
    pts = df.groupBy(x_col, y_col).agg(F.count(F.lit(1)).alias("n_rows"))
    # running min of y over points with STRICTLY smaller x: min over the
    # x-ordered rows up to the previous DISTINCT x value. Implemented as
    # two layers: per-x min (groupBy above gives distinct points; another
    # window collapses per-x), then a lag over distinct x of the running
    # min.
    per_x = Window.partitionBy(x_col)
    w_x = Window.orderBy(x_col)
    pts = pts.withColumn("__min_y_at_x", F.min(y_col).over(per_x))
    # one row per distinct x carries the running min over preceding xs
    distinct_x = (
        pts.select(x_col, "__min_y_at_x")
        .distinct()
        .withColumn(
            "__min_y_before",
            F.min("__min_y_at_x").over(
                w_x.rowsBetween(Window.unboundedPreceding, -1)
            ),
        )
        .select(x_col, "__min_y_before")
    )
    joined = pts.join(distinct_x, on=x_col)
    dominated = (
        F.col("__min_y_before").isNotNull()
        & (F.col("__min_y_before") <= F.col(y_col))
    ) | (F.col("__min_y_at_x") < F.col(y_col))
    return (
        joined.filter(~dominated)
        .select(x_col, y_col, "n_rows")
    )
