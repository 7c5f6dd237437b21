"""Declarative data-quality checks (Deequ-style expectation suite).

The reference pipeline trusts its inputs blindly (upload.py reads and
writes with no validation); a production 100 TB ingest cannot. This
module evaluates a suite of declarative expectations and returns one row
per check: (check, metric, passed).

Scale design:
- ALL single-table metrics (completeness, uniqueness, predicate
  compliance) evaluate in ONE aggregate pass over the table — each
  check is just another aggregate expression, so the scan cost is paid
  once regardless of suite size, with map-side partial aggregation.
  The wide one-row result is unpivoted to long form with stack()
  (driver-free, constant rows).
- Uniqueness uses count_distinct which adds an expand+shuffle per
  distinct column set; at extreme scale swap approx_count_distinct in
  (callers pass exact=False) and treat the metric as a monitor rather
  than a gate.
- Referential integrity is a broadcast-or-shuffle LEFT ANTI join
  counting orphans — the join only materializes violations, never the
  joined rows.

Metrics are ratios of identically-derived BIGINTs — bit-equal across
engines (repo float rule), so the suite is hash-gateable against a SQL
oracle.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def single_table_metrics(
    df: DataFrame,
    completeness: Sequence[str] = (),
    uniqueness: Sequence[str] = (),
    compliance: Mapping[str, Column] | None = None,
    exact: bool = True,
) -> DataFrame:
    """One aggregate pass over ``df`` → long rows (check, metric).

    - completeness:<col> — fraction of rows with col NOT NULL
    - uniqueness:<col>   — distinct(col) / count(*)
    - compliance:<name>  — fraction of rows satisfying the predicate
    """
    compliance = dict(compliance or {})
    if not completeness and not uniqueness and not compliance:
        # an empty suite would render a malformed "stack(0, )" expression
        return df.sparkSession.createDataFrame(
            [], "check string, metric double"
        )
    aggs = [F.count(F.lit(1)).alias("_n")]
    names: list[str] = []
    for c in completeness:
        names.append(f"completeness:{c}")
        aggs.append(F.count(c).alias(f"_m{len(names)}"))
    for c in uniqueness:
        names.append(f"uniqueness:{c}")
        d = (
            F.count_distinct(F.col(c))
            if exact
            else F.approx_count_distinct(c)
        )
        aggs.append(d.alias(f"_m{len(names)}"))
    for name, pred in compliance.items():
        names.append(f"compliance:{name}")
        aggs.append(
            F.sum(F.when(pred, 1).otherwise(0)).alias(f"_m{len(names)}")
        )
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{name}', _m{i + 1}" for i, name in enumerate(names)
    )
    return wide.select(
        F.expr(
            f"stack({len(names)}, {stack_args}) as (check, raw)"
        ),
        F.col("_n"),
    ).select(
        "check", (F.col("raw") / F.col("_n")).alias("metric")
    )


def referential_integrity(
    child: DataFrame, child_col: str, parent: DataFrame, parent_col: str
) -> DataFrame:
    """(check, metric) row: fraction of child rows whose key exists in
    parent (1.0 for an empty child — no rows, no violations). Orphans
    counted via LEFT ANTI join (only violations flow)."""
    total = child.count()
    orphans = (
        child.join(
            parent.select(F.col(parent_col).alias(child_col)).distinct(),
            on=child_col,
            how="left_anti",
        ).count()
        if total
        else 0
    )
    spark = child.sparkSession
    return spark.createDataFrame(
        [
            (
                f"referential:{child_col}",
                float((total - orphans) / total) if total else 1.0,
            )
        ],
        "check string, metric double",
    )


def evaluate_suite(
    metrics: DataFrame, thresholds: Mapping[str, float]
) -> DataFrame:
    """Attach pass/fail: passed = metric >= threshold[check] (checks
    without a threshold pass trivially). Threshold map is tiny —
    broadcast join via a literal map expression, no shuffle."""
    pairs = []
    for k, v in thresholds.items():
        pairs.extend([F.lit(k), F.lit(float(v))])
    tmap = F.create_map(*pairs) if pairs else F.create_map()
    return metrics.withColumn(
        "passed",
        F.coalesce(
            F.col("metric") >= tmap.getItem(F.col("check")), F.lit(True)
        ),
    )
