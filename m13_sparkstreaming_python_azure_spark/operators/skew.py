"""Skew mitigation for joins and aggregations.

AQE's skew-join handling (on by default in `session.get_spark`) splits
oversized *shuffle partitions* at runtime — but it only helps sort-merge /
shuffled-hash joins, and only when the skew is visible at shuffle time.
Salting is the explicit fallback: spread one hot key across ``salt``
sub-keys and replicate the other side, turning a single straggler
partition into ``salt`` even ones. Cost: the replicated side's shuffle
volume × salt — use on the *smaller* side.

At 100 TB this is the difference between a 4-hour straggler task and an
even 32-way fan-out on keys like geohash cells of big cities (SURVEY §2.3
J1 note) or null-heavy foreign keys.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt: int = 16,
    how: str = "inner",
    keep_salt: bool = False,
) -> DataFrame:
    """Equi-join on ``on`` with the LEFT side salted (random sub-key per
    row) and the RIGHT side replicated ``salt`` times.

    Semantics are identical to ``left.join(right, on, how)`` for inner and
    left joins; each left row meets each matching right row exactly once
    (its own salt replica). ``keep_salt=True`` retains the ``__salt``
    column so callers (e.g. the plan audit's skew proof) can observe how
    evenly a hot key spread across its sub-keys.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner and left joins")
    l_salted = left.withColumn(
        "__salt", (F.rand(seed=42) * salt).cast("int")
    )
    r_replicated = right.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(salt - 1))),
    )
    out = l_salted.join(r_replicated, on=[on, "__salt"], how=how)
    return out if keep_salt else out.drop("__salt")


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    salt: int = 16,
) -> DataFrame:
    """Two-stage aggregation for skewed group keys: aggregate on
    (keys + salt) first — spreading a hot key over ``salt`` partial groups
    — then merge the partials on the true keys.

    ``aggs`` maps output column → (fn, input_col) where fn is one of
    sum/count/min/max (the mergeable aggregates; count merges via sum).
    Spark's map-side partial aggregation already does this *within* a task;
    explicit salting also spreads the REDUCE side when one key dominates
    the shuffle.
    """
    mergeable = {"sum", "count", "min", "max"}
    bad = {fn for fn, _ in aggs.values() if fn not in mergeable}
    if bad:
        raise ValueError(f"non-mergeable aggregate(s): {sorted(bad)}")
    keys = list(keys)
    salted = df.withColumn("__salt", (F.rand(seed=42) * salt).cast("int"))
    partial = salted.groupBy(*keys, "__salt").agg(
        *[
            (
                F.count(F.lit(1))
                if fn == "count"
                else getattr(F, fn)(in_col)
            ).alias(out)
            for out, (fn, in_col) in aggs.items()
        ]
    )
    merge_fns = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    return partial.groupBy(*keys).agg(
        *[merge_fns[fn](out).alias(out) for out, (fn, _) in aggs.items()]
    )
