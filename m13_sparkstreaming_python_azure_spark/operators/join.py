"""Join operators (SURVEY.md §2.3).

The reference contains one *implied* join — the hotels⋈weather enrichment
"joined by 4-characters geohash" (``DataDescription.md:1,10``) that produced
its input table — and one driver-side anti-pattern: collect()-then-isin
(``stream.ipynb:255,258``). Both become first-class distributed operators
here, plus the standard join flavors Spark gives for free.

Scale notes:
- Small dimension side → ``broadcast()`` (no shuffle of the fact table).
- ``semi_join`` replaces the reference's collect+isin round-trip: the
  filter set never leaves the cluster, and Spark broadcasts it when small.
- ``asof_join`` / ``range_join`` cover the time-series joins the reference
  category usually needs; both are compositions of built-ins (no UDF).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def enrich_join(
    facts: DataFrame,
    dim: DataFrame,
    on: str | Sequence[str],
    how: str = "inner",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Generic enrichment equi-join; broadcasts the dim side by default
    (dimension tables are small relative to facts at 100 TB)."""
    dim_side = F.broadcast(dim) if broadcast_dim else dim
    return facts.join(dim_side, on=on, how=how)


def geohash_join(
    hotels: DataFrame,
    weather: DataFrame,
    hotels_geohash: str = "geoHash",
    weather_geohash: str = "geoHash",
    precision: int = 4,
    broadcast_hotels: bool = False,
) -> DataFrame:
    """J1: the reference's implied geospatial equi-join — truncate both
    geohashes to ``precision`` chars and equi-join (prefix of a geohash is
    the enclosing cell, so truncation == spatial coarsening).

    At scale: geohash cells are skewed (cities!), so run with AQE skew-join
    on; broadcast the hotel dim when it fits.
    """
    hk = F.substring(F.col(hotels_geohash), 1, precision)
    wk = F.substring(F.col(weather_geohash), 1, precision)
    h = hotels.withColumn("__geo4", hk)
    w = weather.withColumn("__geo4", wk)
    if broadcast_hotels:
        h = F.broadcast(h)
    return w.join(h, on="__geo4", how="inner").drop("__geo4")


def semi_join(df: DataFrame, keys_df: DataFrame, on: str | Sequence[str]) -> DataFrame:
    """J2, idiomatic: left-semi replaces collect()+isin (stream.ipynb:255-258)."""
    return df.join(keys_df, on=on, how="left_semi")


def anti_join(df: DataFrame, keys_df: DataFrame, on: str | Sequence[str]) -> DataFrame:
    """Rows of ``df`` with no match in ``keys_df`` (NOT EXISTS)."""
    return df.join(keys_df, on=on, how="left_anti")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
) -> DataFrame:
    """As-of join (SURVEY §2.3 GAP): per left row and key, the latest right
    row with ``right_ts <= left_ts`` (backward, the default) or the
    earliest with ``right_ts >= left_ts`` (forward) — without a UDF.

    Implementation: union-tag-sort-window. Both sides are unioned on the key
    + a shared timestamp axis; ``last(right value, ignorenulls)`` (backward)
    or ``first`` over the mirrored frame (forward) carries the adjacent
    right row onto each left row. Side tags order equal-timestamp rows so
    ties match in both directions. One shuffle on the key — same cost as a
    sort-merge join, no N×M range explosion.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    on = list(on)
    # join-on-null must not match (equi-join semantics; the union-window
    # trick would otherwise pool all null-key rows into one partition and
    # cross-carry them)
    for k in on + [right_ts]:
        right = right.filter(F.col(k).isNotNull())
    lcols = [c for c in left.columns if c not in on]
    rcols = [c for c in right.columns if c not in on and c != right_ts]

    # equal-ts rule: the right row must sort on the "matching" side of the
    # left row — before it for backward (last picks it up), after it for
    # forward (first picks it up)
    l_side, r_side = (1, 0) if direction == "backward" else (0, 1)
    l_tagged = left.select(
        *on,
        F.col(left_ts).alias("__ts"),
        F.lit(l_side).alias("__side"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in rcols],
    )
    r_tagged = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(r_side).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"__r_{c}") for c in rcols],
    )
    unioned = l_tagged.unionByName(r_tagged)
    if direction == "backward":
        w = (
            Window.partitionBy(*on)
            .orderBy("__ts", "__side")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carry = lambda c: F.last(F.col(c), ignorenulls=True).over(w)  # noqa: E731
    else:
        w = (
            Window.partitionBy(*on)
            .orderBy("__ts", "__side")
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        carry = lambda c: F.first(F.col(c), ignorenulls=True).over(w)  # noqa: E731
    carried = unioned.select(
        *on,
        "__ts",
        "__side",
        *lcols,
        *[carry(f"__r_{c}").alias(f"__r_{c}") for c in rcols],
    )
    out = carried.filter(F.col("__side") == F.lit(l_side)).select(
        *on,
        F.col("__ts").alias(left_ts),
        *lcols,
        *[F.col(f"__r_{c}").alias(c) for c in rcols],
    )
    return out


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_point: str,
    right_lo: str,
    right_hi: str,
    bucket_width: float,
    on: Sequence[str] | None = None,
) -> DataFrame:
    """Interval/range join (SURVEY §2.3 GAP): left.point ∈ [right.lo, right.hi],
    optionally also matching equi-keys ``on`` (e.g. per-user time windows).

    Naive theta-join is O(N×M); instead both sides are bucketed by
    ``floor(value / bucket_width)`` (intervals explode to the buckets they
    overlap via ``sequence``) and the join runs as an equi-join on bucket
    (+ keys) + a residual predicate — the standard bucketed-range-join
    trick, all built-ins. Choose ``bucket_width`` ≈ median interval length.
    Equi-keys go INTO the hash-join condition (not a post-filter) so the
    shuffle co-locates by (key, bucket) and skewed buckets split by key.
    """
    lb = left.withColumn(
        "__bucket", F.floor(F.col(left_point) / F.lit(bucket_width))
    )
    rb = right.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(right_lo) / F.lit(bucket_width)),
                F.floor(F.col(right_hi) / F.lit(bucket_width)),
            )
        ),
    )
    join_keys = ["__bucket", *(on or [])]
    return (
        lb.join(rb, on=join_keys, how="inner")
        .filter(
            (F.col(left_point) >= F.col(right_lo))
            & (F.col(left_point) <= F.col(right_hi))
        )
        .drop("__bucket")
    )
