"""2-D skyline (Pareto frontier) — the points not dominated in the
(minimize x, minimize y) sense by any other point.

The classic sort-based algorithm, expressed relationally: after grouping
to distinct (x, y) points, a point is dominated iff
  (1) some point with strictly smaller x has y <= mine, or
  (2) some point with equal x has strictly smaller y.
Both conditions reduce to running minima over the x-ordered point set —
NO self-join, NO quadratic NOT EXISTS. Dominance is scanned, not paired.

Scale design (grid-pruned, r9): the distinct-x running minimum is
decomposed through a coarse grid over the x range so that NO window ever
sees the full distinct-x set serially:

  1. groupBy (x, y) collapses the input to distinct points (map-side
     combine) and a partitioned per-x window yields min_y(x).
  2. Each distinct x is binned into one of ``n_cells`` equal-width cells
     of [min x, max x] (two scalar aggregates broadcast under every row
     — the sanctioned single-row cross join).
  3. A groupBy computes each cell's min over min_y(x) — embarrassingly
     parallel — and ONE unpartitioned running-min window runs over the
     cell summary table, whose size is bounded by ``n_cells`` regardless
     of the data (the only serial step, O(n_cells)).
  4. Grid prune: any distinct x whose min_y(x) >= the running min of all
     strictly-earlier cells is wholly dominated (an earlier cell holds a
     point with strictly smaller x — cells partition the x axis — and
     y <= every y at this x). Dropping it is lossless for the frontier
     AND for the running-min chain: a dropped value can never lower a
     later min below the earlier-cell minimum it lost to.
  5. The exact within-cell running min runs under
     Window.partitionBy(cell).orderBy(x) — partitioned, parallel — and
     min_y_before(x) = least(prev_cells_min, within_cell_prev).

At 100 TB the serial work is fixed at n_cells rows; everything else is
groupBy / partitioned windows / one broadcast-scalar join.

Equal points: two identical (x, y) points do not dominate each other
(dominance requires one strict inequality), so a skyline point's full
duplicate count is reported in n_rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def skyline_2d(
    df: DataFrame, x_col: str, y_col: str, n_cells: int = 256
) -> DataFrame:
    """Pareto-minimal (x, y) points with their duplicate counts.

    ``x_col`` must be numeric (or castable to double) for the grid
    binning; non-castable x collapses to a single cell, which degrades
    to the exact single-chain scan but stays correct.
    """
    pts = df.groupBy(x_col, y_col).agg(F.count(F.lit(1)).alias("n_rows"))
    pts = pts.withColumn(
        "__min_y_at_x", F.min(y_col).over(Window.partitionBy(x_col))
    )

    # one row per distinct x, carrying min_y(x)
    dx = pts.select(x_col, "__min_y_at_x").distinct()

    # --- grid assignment: equal-width cells over [lo, hi] ------------
    xd = F.col(x_col).cast("double")
    rng = dx.agg(
        F.min(xd).alias("__lo"), F.max(xd).alias("__hi")
    )  # single-row scalar
    width = (F.col("__hi") - F.col("__lo")) / F.lit(float(n_cells))
    dxc = (
        dx.crossJoin(F.broadcast(rng))
        .withColumn(
            "__cell",
            F.when(
                F.col("__hi").isNull()
                | F.col("__lo").isNull()
                | (F.col("__hi") <= F.col("__lo")),
                F.lit(0),
            ).otherwise(
                F.least(
                    F.lit(n_cells - 1),
                    F.floor((xd - F.col("__lo")) / width).cast("int"),
                )
            ),
        )
        .drop("__lo", "__hi")
    )

    # --- cell summary + the ONLY unpartitioned window (<= n_cells) ---
    cells = dxc.groupBy("__cell").agg(
        F.min("__min_y_at_x").alias("__cell_min")
    )
    w_cells = Window.orderBy("__cell").rowsBetween(
        Window.unboundedPreceding, -1
    )
    cells = cells.withColumn(
        "__prev_cells_min", F.min("__cell_min").over(w_cells)
    ).select("__cell", "__prev_cells_min")

    dxc = dxc.join(F.broadcast(cells), on="__cell")

    # --- lossless grid prune ------------------------------------------
    # an earlier-cell point has strictly smaller x; if its y is <= this
    # x's best y, every point at this x is dominated. Dropping the row
    # cannot change any later running min (the dropped min_y(x) is >=
    # the prev-cells min that survives in the chain).
    dxc = dxc.filter(
        F.col("__prev_cells_min").isNull()
        | (F.col("__prev_cells_min") > F.col("__min_y_at_x"))
    )

    # --- exact within-cell running min (partitioned => parallel) -----
    w_in_cell = (
        Window.partitionBy("__cell")
        .orderBy(x_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    dxc = dxc.withColumn(
        "__in_cell_prev", F.min("__min_y_at_x").over(w_in_cell)
    )
    # least() ignores nulls (null only when all inputs are null)
    distinct_x = dxc.select(
        x_col,
        F.least("__prev_cells_min", "__in_cell_prev").alias(
            "__min_y_before"
        ),
    )

    joined = pts.join(distinct_x, on=x_col)
    dominated = (
        F.col("__min_y_before").isNotNull()
        & (F.col("__min_y_before") <= F.col(y_col))
    ) | (F.col("__min_y_at_x") < F.col(y_col))
    return joined.filter(~dominated).select(x_col, y_col, "n_rows")
