"""Probabilistic record linkage — Fellegi–Sunter scoring over blocked
candidate pairs (the entity-resolution decision layer above the fuzzy
candidate generators in operators/fuzzy.py).

Model: each compared field i contributes a log-likelihood-ratio weight
    agree_i     ->  ln(m_i / u_i)
    disagree_i  ->  ln((1-m_i) / (1-u_i))
where m_i = P(agree | same entity), u_i = P(agree | different entity).
The pair score is the sum; two thresholds split match / possible /
non-match. m/u are caller-supplied (EM estimation is a separate offline
step; fixed expert priors are the common production bootstrap).

Scale design:
- Candidate generation is the caller's blocking join — NEVER all-pairs.
  Bounded blocks (nation, zip, phone prefix) keep the quadratic term
  per-block; unbounded keys should pre-split (sorted-neighborhood) the
  way operators/fuzzy.py bounds its candidate sets.
- Scoring itself is pure JVM expression work on the pair rows — one
  whole-stage-codegen'd projection, no shuffle, no Python.

Cross-engine float contract: weights are ln() of DOUBLE literal ratios —
identical IEEE inputs, correctly-rounded ln, then 1e-9 grid snap on the
summed score (sums of ≤ a handful of snapped terms stay exact)."""

from __future__ import annotations

from typing import Mapping, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fs_score(
    pairs: DataFrame,
    agreements: Mapping[str, Column],
    mu: Mapping[str, Tuple[float, float]],
    lower: float,
    upper: float,
) -> DataFrame:
    """Attach Fellegi–Sunter ``score`` and ``decision``
    (match / possible / non_match) to candidate pair rows.

    ``agreements`` maps field name -> boolean Column over the pair row;
    ``mu`` maps the same names -> (m, u)."""
    if set(agreements) != set(mu):
        raise ValueError("agreements and mu must cover the same fields")
    score = F.lit(0.0)
    for name, agree in agreements.items():
        m, u = mu[name]
        if not (0.0 < u < m < 1.0):
            raise ValueError(f"need 0 < u < m < 1 for field {name!r}")
        w_agree = F.log(F.lit(m) / F.lit(u))
        w_disagree = F.log(F.lit(1.0 - m) / F.lit(1.0 - u))
        score = score + F.when(agree, w_agree).otherwise(w_disagree)
    snapped = F.floor(score * F.lit(1e9) + F.lit(0.5)) / F.lit(1e9)
    return pairs.withColumn("score", snapped).withColumn(
        "decision",
        F.when(F.col("score") >= F.lit(upper), F.lit("match"))
        .when(F.col("score") <= F.lit(lower), F.lit("non_match"))
        .otherwise(F.lit("possible")),
    )


def sorted_neighborhood(
    df: DataFrame,
    order_by,
    window: int = 10,
    num_partitions: int | None = None,
) -> DataFrame:
    """Sorted-neighborhood candidate generation (Hernández & Stolfo,
    SIGMOD'95): totally order the records once, pair each record with
    its next ``window`` neighbors — O(window·n) candidates, linear in
    the table, the classic generator when no natural bounded blocking
    key exists.

    100 TB shape: NO unpartitioned window and NO self-join on a blocking
    key. The total order comes from ``operators/window.global_rank``
    (data-derived quantile buckets + per-bucket row_number + broadcast
    offsets — one hash shuffle, never a single-partition sort); the
    neighbor pairing is then an EQUI-JOIN on the dense integer rank
    (probe side explodes rank+1 … rank+window), which hashes perfectly
    evenly — a unique join key per row, no skew possible.

    ``order_by`` must be a total order (tie-break with a unique column).
    Returns one row per candidate pair: every non-rank column appears
    twice, suffixed ``_a`` (the earlier-sorted record) and ``_b``."""
    from m13_sparkstreaming_python_azure_spark.operators.window import (
        global_rank,
    )

    if window < 1:
        raise ValueError("window must be >= 1")
    ranked = global_rank(
        df, order_by, out_col="__rn", num_partitions=num_partitions
    )
    data_cols = [c for c in ranked.columns if c != "__rn"]
    left = ranked.select(
        F.col("__rn"),
        *[F.col(c).alias(f"{c}_a") for c in data_cols],
    ).select(
        "*",
        F.explode(
            F.sequence(F.col("__rn") + 1, F.col("__rn") + window)
        ).alias("__rn_b"),
    )
    right = ranked.select(
        F.col("__rn").alias("__rn_b"),
        *[F.col(c).alias(f"{c}_b") for c in data_cols],
    )
    return left.join(right, "__rn_b").drop("__rn", "__rn_b")
