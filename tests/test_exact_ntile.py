"""exact_ntile (distributed rank, no single-partition WindowExec) must be
bit-identical to SQL ntile on a total order — it is the 100 TB-safe twin
behind rfm_segments / price_decile_stats (VERDICT r6 #1/#2)."""
from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from m13_sparkstreaming_python_azure_spark.operators.window import exact_ntile


def _parity(spark, n_rows: int, n_tiles: int, parts: int):
    # deterministic pseudo-random ordering key with collisions (ties are
    # broken by id — the ordering must be total)
    df = spark.range(n_rows).select(
        "id",
        F.expr("conv(substring(md5(cast(id as string)), 1, 4), 16, 10)")
        .cast("long")
        .alias("k"),
    )
    order = [F.col("k"), F.col("id")]
    want = df.withColumn(
        "tile", F.ntile(n_tiles).over(Window.orderBy(*order)).cast("long")
    )
    got = exact_ntile(df, n_tiles, order, num_partitions=parts)
    mism = (
        want.alias("w")
        .join(got.alias("g"), "id")
        .filter(F.col("w.tile") != F.col("g.tile"))
        .count()
    )
    assert mism == 0, f"{mism}/{n_rows} rows disagree with ntile({n_tiles})"


@pytest.mark.parametrize(
    "n_rows,n_tiles,parts",
    [
        (1000, 5, 7),     # uneven: 1000 % 5 == 0 but 1000 % 7 != 0
        (1003, 10, 4),    # N % n != 0 — first r buckets take q+1 rows
        (7, 10, 3),       # fewer rows than tiles: bucket i = row i
        (1, 5, 8),        # single row
        (64, 64, 5),      # N == n
    ],
)
def test_exact_ntile_matches_sql_ntile(spark, n_rows, n_tiles, parts):
    _parity(spark, n_rows, n_tiles, parts)


def test_exact_ntile_empty_input(spark):
    df = spark.range(0).select("id", F.lit(0).alias("k"))
    out = exact_ntile(df, 5, [F.col("k"), F.col("id")])
    assert out.count() == 0 and "tile" in out.columns


def test_exact_ntile_desc_ordering(spark):
    df = spark.range(100).select("id", (F.col("id") % 9).alias("k"))
    order_desc = [F.desc("k"), F.col("id")]
    want = df.withColumn(
        "tile", F.ntile(4).over(Window.orderBy(*order_desc)).cast("long")
    )
    got = exact_ntile(df, 4, order_desc, num_partitions=5)
    assert (
        want.alias("w")
        .join(got.alias("g"), "id")
        .filter(F.col("w.tile") != F.col("g.tile"))
        .count()
        == 0
    )


def test_exact_ntile_plans_no_unpartitioned_window(spark):
    import re
    import sys

    sys.path.insert(0, "tools")
    from plan_audit import unpartitioned_windows

    df = spark.range(500).select("id", (F.col("id") * 37 % 101).alias("k"))
    out = exact_ntile(df, 5, [F.col("k"), F.col("id")], num_partitions=6)
    jvm = spark._jvm
    plan = out._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert unpartitioned_windows(plan) == 0
    # v3 (r10): local rank is a Window PARTITIONED by the data-derived
    # quantile bucket — present, bounded, never unpartitioned — and no
    # range exchange exists anywhere (a range exchange re-samples its
    # boundaries per branch evaluation, the nondeterminism v3 removed)
    assert re.search(r"Window", plan)
    assert "rangepartitioning" not in plan


def test_exact_ntile_heavy_duplicate_keys(spark):
    # 90% of rows share ONE ordering value — the range partitioner must
    # still produce exact ntile assignment via the unique tiebreak
    df = spark.range(2000).select(
        "id",
        F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id")).alias("k"),
    )
    order = [F.col("k"), F.col("id")]
    want = df.withColumn(
        "tile", F.ntile(7).over(Window.orderBy(*order)).cast("long")
    )
    got = exact_ntile(df, 7, order, num_partitions=11)
    assert (
        want.alias("w")
        .join(got.alias("g"), "id")
        .filter(F.col("w.tile") != F.col("g.tile"))
        .count()
        == 0
    )
    # tile sizes are exactly q / q+1 (2000 = 7*285 + 5)
    sizes = {
        r["tile"]: r["count"]
        for r in got.groupBy("tile").count().collect()
    }
    assert sorted(sizes.values()) == [285, 285] + [286] * 5
