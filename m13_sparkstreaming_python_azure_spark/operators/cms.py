"""Count-min sketch — the mergeable approximate-frequency structure that
completes the sketch family (HLL distinct / theta set-algebra / KLL
quantiles / CMS frequencies).

Why CMS at 100 TB: the full item-frequency table shuffles the entire key
space; a CMS is a FIXED depth×width counter grid (here 4×256 longs) that
folds with map-side combine like any aggregate, merges across
partitions/days by cell-wise addition, and answers point queries with
the min over depth — overestimates bounded by εN with probability 1−δ
(ε = e/width, δ = e^−depth). Heavy-hitter exact recount
(operators/frequency.py) is the complement when exactness is required.

Cross-engine determinism: bucket hashing is the repo's md5 convention
(seeded per depth row), so the sketch CONTENTS — not just its answers —
are identical in Spark and the SQL oracle; estimates are exact integer
aggregations over that deterministic grid, hash-gateable end to end."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bucket(item, d: int, width: int):
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"cms{d}:"), item)), 1, 8
            ),
            16,
            10,
        ).cast("bigint")
        % width
    )


def cms_build(
    items: DataFrame, col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Fold an item stream into CMS cells: (d, bucket, n). One groupBy
    on a key space of at most depth×width cells — map-side combine
    absorbs the stream regardless of item cardinality."""
    item = F.col(col).cast("string")
    rows = items.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        _bucket(item, d, width).alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("c")
    )
    return rows.groupBy("c.d", "c.bucket").agg(
        F.count(F.lit(1)).alias("n")
    )


def cms_estimate(
    cms: DataFrame, probes: DataFrame, col: str, depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-query estimates for probe items: min over depth of the
    item's cell counts. The sketch is tiny — broadcast to the probes."""
    item = F.col(col).cast("string")
    keyed = probes.select(
        F.col(col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        _bucket(item, d, width).alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("c"),
    ).select(col, "c.d", "c.bucket")
    joined = keyed.join(F.broadcast(cms), on=["d", "bucket"], how="left")
    return joined.groupBy(col).agg(
        F.min(F.coalesce(F.col("n"), F.lit(0))).alias("estimate")
    )
