"""Per-group feature standardization — the grouped-map (applyInPandas)
surface and its JVM twin (SURVEY.md §2.10 GAP family).

Two implementations of the same semantics, on purpose:

- ``zscore_window`` is the SCALE PATH: pure window/aggregate expressions,
  one shuffle on the group key, whole-stage-codegen eligible, oracle-
  checkable. Use this in production.
- ``zscore_grouped_pandas`` is the ESCAPE HATCH shape: ``applyInPandas``
  (grouped map — whole group as one pandas DataFrame). Real feature
  pipelines need it when the per-group transform is a Python library call
  (sklearn scaler, signal filter); here it exists to pin the API and is
  tested equal to the JVM twin. Its scale hazard is materializing an
  ENTIRE group in one executor's memory — safe for bounded groups
  (per-type, per-day), wrong for power-law groups.

Cross-engine determinism (same contract as the rest of the repo): moments
are computed from exact decimal sums (fold-order independent), variance by
the sum-of-squares identity, and the final z floor-rounds at 1e-4.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _moments(value: Column) -> tuple[Column, Column]:
    """(sum, sum-of-squares) as exact decimals. Inputs with ≤6 decimal
    places square exactly within decimal(38,12), so the double→decimal
    cast recovers the same value in every engine."""
    return (
        F.sum(value.cast("decimal(18,6)")),
        F.sum((value * value).cast("decimal(38,12)")),
    )


def zscore_window(
    df: DataFrame, keys: Sequence[str], value_col: str
) -> DataFrame:
    """z = (v - mean) / stddev per group, sample variance via the
    sum-of-squares identity over exact decimal partial sums."""
    w = Window.partitionBy(*keys)
    s, ss = _moments(F.col(value_col))
    n = F.count(F.lit(1)).over(w)
    s = s.over(w).cast("double")
    ss = ss.over(w).cast("double")
    mean = s / n
    var = (ss - s * s / n) / (n - 1)
    z = (F.col(value_col) - mean) / F.sqrt(var)
    return df.withColumn(
        "zscore", F.floor(z * 10000 + F.lit(0.5)) / 10000
    )


def zscore_grouped_pandas(
    df: DataFrame, keys: Sequence[str], value_col: str
) -> DataFrame:
    """applyInPandas twin of ``zscore_window`` — must produce identical
    output (pinned by test). The arithmetic mirrors the JVM version
    step-for-step (exact integer-cent sums, same identity, same floor
    rounding) so the two paths agree bit-for-bit."""
    from pyspark.sql.types import DoubleType, StructField, StructType

    schema = StructType(
        list(df.schema.fields) + [StructField("zscore", DoubleType())]
    )

    def _z(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        v = pdf[value_col].to_numpy()
        n = len(v)
        # exact decimal(18,6)/(38,12) sums, emulated with integer arithmetic
        vi = np.rint(v * 10**6).astype(object)  # exact 6-dp integers
        s = float(sum(vi)) / 10**6
        ss = float(sum(x * x for x in vi)) / 10**12
        mean = s / n
        var = (ss - s * s / n) / (n - 1)
        z = (v - mean) / np.sqrt(var)
        out = pdf.copy()
        out["zscore"] = np.floor(z * 10000 + 0.5) / 10000
        return out

    return df.groupBy(*keys).applyInPandas(_z, schema=schema)
