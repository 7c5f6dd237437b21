"""String-similarity linkage beyond edit distance — Jaro-Winkler.

Complements ``operators/fuzzy.py`` (Levenshtein with symmetric-delete
blocking) and ``operators/linkage.py`` (Fellegi-Sunter weighting):
Jaro-Winkler is the name-matching measure record-linkage practice
prefers for short strings (transposition-tolerant, prefix-weighted).

Spark has no built-in (DuckDB does), so the kernel is an Arrow-batched
pandas UDF — the documented Python-fallback path for string-distance
kernels. The 100 TB shape is the same as every linkage operator here:
NEVER all-pairs; candidate pairs come from a blocking equi-join, and the
Python kernel only ever sees the blocked pair list. Scores snap to a
1e-6 floor grid (implementations differ in the last ulp; verified
grid-identical to DuckDB's jaro_winkler_similarity on every blocked
pair of the test corpus).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def _jaro_winkler_py(s1: str, s2: str) -> float:
    """Standard Jaro-Winkler: prefix weight 0.1, max prefix 4, boost
    only above 0.7 — the parameterization DuckDB/RapidFuzz use."""
    if s1 == s2:
        return 1.0
    l1, l2 = len(s1), len(s2)
    if l1 == 0 or l2 == 0:
        return 0.0
    window = max(max(l1, l2) // 2 - 1, 0)
    m1 = [False] * l1
    m2 = [False] * l2
    m = 0
    for i, c in enumerate(s1):
        lo = max(0, i - window)
        hi = min(l2, i + window + 1)
        for j in range(lo, hi):
            if not m2[j] and s2[j] == c:
                m1[i] = m2[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(l1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    jaro = (m / l1 + m / l2 + (m - t) / m) / 3.0
    if jaro > 0.7:
        p = 0
        for a, b in zip(s1[:4], s2[:4]):
            if a != b:
                break
            p += 1
        jaro = jaro + p * 0.1 * (1.0 - jaro)
    return jaro


def _jw_udf():
    # created lazily: decorating at import time parses the DDL return
    # type, which requires an active SparkSession
    @pandas_udf("double")
    def jw(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series(
            [_jaro_winkler_py(x, y) for x, y in zip(a, b)], dtype="float64"
        )

    return jw


def jaro_winkler_pairs(
    names: DataFrame,
    name_col: str,
    block_expr: Column,
    threshold: float = 0.85,
) -> DataFrame:
    """All DISTINCT name pairs sharing a blocking key with snapped
    Jaro-Winkler >= threshold. ``block_expr`` is any deterministic
    column expression over ``name_col`` (first token, soundex-ish code,
    length band…) — the equi-join on it is what bounds the pair space;
    the kernel never sees a cross product. Returns (name_a, name_b, jw)
    with name_a < name_b."""
    base = (
        names.select(F.col(name_col).alias("name"))
        .distinct()
        .withColumn("blk", block_expr)
    )
    a = base.select(F.col("name").alias("name_a"), "blk")
    b = base.select(F.col("name").alias("name_b"), "blk")
    pairs = a.join(b, on="blk").filter(F.col("name_a") < F.col("name_b"))
    jw = F.floor(
        _jw_udf()(F.col("name_a"), F.col("name_b")) * 1e6 + F.lit(0.5)
    ) / 1e6
    return (
        pairs.withColumn("jw", jw)
        .filter(F.col("jw") >= threshold)
        .select("name_a", "name_b", "jw")
    )
