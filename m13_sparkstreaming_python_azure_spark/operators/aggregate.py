"""Aggregation operators (SURVEY.md §2.4 A1-A6).

The reference's signature aggregate is
``groupBy(city, wthr_date).agg(approx_count_distinct(id), avg/max/min(avg_tmpr_c))``
(``stream.ipynb:117-121``). Here it is generalized to any (keys, distinct
column, value column) and works identically on batch and streaming
DataFrames — Structured Streaming reuses the same logical plan with state
stores inserted by IncrementalExecution.

Scale notes:
- Hash aggregation is partial→final (map-side combine) automatically; the
  shuffle is on the group keys only.
- ``approx_count_distinct`` (HLL++, default rsd 0.05 — visible in the
  reference's captured plan, stream.ipynb:105) keeps state O(1) per group
  vs O(distinct) for exact count-distinct; at 100 TB always prefer it
  unless exactness is a hard requirement.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def grouped_stats(
    df: DataFrame,
    keys: Sequence[str],
    distinct_col: str,
    value_col: str,
    distinct_alias: str = "distinct_count",
    approx: bool = True,
    rsd: float = 0.05,
) -> DataFrame:
    """Per-group distinct-count + avg/max/min — the reference aggregate.

    ``approx=True`` reproduces the reference exactly (HLL++ rsd 0.05);
    ``approx=False`` is the exact-oracle flavor used for correctness checks.
    """
    distinct_expr: Column = (
        F.approx_count_distinct(distinct_col, rsd)
        if approx
        else F.countDistinct(distinct_col)
    )
    return df.groupBy(*keys).agg(
        distinct_expr.alias(distinct_alias),
        F.avg(value_col).alias(f"avg_{value_col}"),
        F.max(value_col).alias(f"max_{value_col}"),
        F.min(value_col).alias(f"min_{value_col}"),
    )


def weather_daily_aggregate(
    df: DataFrame,
    city_col: str = "city",
    date_col: str = "wthr_date",
    id_col: str = "id",
    tmpr_col: str = "avg_tmpr_c",
    approx: bool = True,
) -> DataFrame:
    """Verbatim semantics of the reference aggregate (stream.ipynb:117-121):
    distinct hotels and temperature stats per (city, day)."""
    return df.groupBy(city_col, date_col).agg(
        (
            F.approx_count_distinct(id_col)
            if approx
            else F.countDistinct(id_col)
        ).alias("distinct_hotels"),
        F.avg(tmpr_col).alias("avg_temperature"),
        F.max(tmpr_col).alias("max_temperature"),
        F.min(tmpr_col).alias("min_temperature"),
    )


def distinct_values(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """A6: ``select(cols).distinct()`` (stream.ipynb:255,514) — a group-by-
    all-columns aggregate; partial aggregation dedups map-side before the
    shuffle, so wire cost is O(distinct), not O(rows)."""
    return df.select(*cols).distinct()


def rollup_stats(
    df: DataFrame, keys: Sequence[str], value_col: str
) -> DataFrame:
    """Hierarchical subtotals (SURVEY §2.4 GAP row): built-in ``rollup`` —
    one shuffle produces all grouping levels (Expand + single hash agg)."""
    return df.rollup(*keys).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(value_col).alias(f"sum_{value_col}"),
    )


def cube_stats(df: DataFrame, keys: Sequence[str], value_col: str) -> DataFrame:
    """Cross-dimensional subtotals (SURVEY §2.4 GAP row)."""
    return df.cube(*keys).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(value_col).alias(f"sum_{value_col}"),
    )


def build_distinct_sketches(
    df: DataFrame,
    keys: Sequence[str],
    distinct_col: str,
    lgk: int = 12,
) -> DataFrame:
    """Per-key HLL sketches (Datasketches binary) for distinct counting.

    The 100 TB pattern behind the reference's ``approx_count_distinct``:
    materialize a (keys → sketch) table once per ingest slice, then answer
    any coarser distinct-count rollup by UNIONING sketches — no rescan of
    the raw data, and sketch union is exact w.r.t. the sketches (unlike
    averaging approximate counts, which is simply wrong). ``lgk=12`` ≈
    1.6% relative error at 4 KB per sketch."""
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(distinct_col, F.lit(lgk)).alias("distinct_sketch")
    )


def rollup_distinct_from_sketches(
    sketches: DataFrame,
    keys: Sequence[str],
    sketch_col: str = "distinct_sketch",
) -> DataFrame:
    """Re-aggregate a sketch table to coarser keys: union the sketches,
    then estimate. Input is the output of ``build_distinct_sketches`` (or a
    stored sketch table partitioned by ingest day)."""
    return (
        sketches.groupBy(*keys)
        .agg(F.hll_union_agg(sketch_col).alias("merged"))
        .select(
            *keys,
            F.hll_sketch_estimate("merged").alias("distinct_estimate"),
        )
    )


def profile_columns(df: DataFrame, columns: Sequence[str]) -> DataFrame:
    """Data-quality profile: one row per column with row/null/distinct
    counts — the schema-health check a pipeline runs before trusting a new
    drop of data.

    ONE aggregate pass computes every column's stats (a per-column loop
    would scan the table len(columns) times); the wide result row then
    explodes to long form, so the whole profile costs a single scan +
    single (1-row) shuffle at any table size.
    """
    aggs = [F.count(F.lit(1)).alias("__n_rows")]
    for c in columns:
        aggs.append(F.count(F.col(c)).alias(f"__nn_{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"__nd_{c}"))
    wide = df.agg(*aggs)
    entries = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                (F.col("__n_rows") - F.col(f"__nn_{c}")).alias("n_null"),
                F.col(f"__nd_{c}").alias("n_distinct"),
            )
            for c in columns
        ]
    )
    return (
        wide.select(F.col("__n_rows").alias("n_rows"), F.explode(entries).alias("e"))
        .select("e.column", "n_rows", "e.n_null", "e.n_distinct")
    )
