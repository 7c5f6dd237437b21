"""MERGE / upsert semantics on plain DataFrames.

Spark SQL only ships ``MERGE INTO`` for catalogs with row-level-operation
support (Delta/Iceberg); on raw parquet the idiomatic equivalent is a
keyed full-outer join that prefers the source side. This module provides
that as a reusable operator.

Scale notes: the join shuffles both sides on the merge keys — at 100 TB
bucket the target table by the keys (sources/bucketing.py) so only the
(usually small) source side shuffles. For persisting the result, pair
with dynamic partition overwrite (``spark.sql.sources.partitionOverwriteMode
=dynamic``) so only partitions containing touched keys are rewritten,
not the whole table.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    with_action: bool = False,
) -> DataFrame:
    """MERGE: source rows update key-matched target rows (all non-key
    columns taken from source), unmatched source rows are inserted,
    untouched target rows pass through. Both sides must share a schema.

    ``with_action`` appends an ``action`` column (update/insert/keep) —
    the audit trail a CDC pipeline wants."""
    if sorted(target.columns) != sorted(source.columns):
        raise ValueError(
            f"schema mismatch: {sorted(target.columns)} vs {sorted(source.columns)}"
        )
    # explicit presence markers: NULL-key rows must not masquerade as
    # "absent" (the join is null-safe on keys)
    t = target.withColumn("__t_present", F.lit(True)).alias("t")
    s = source.withColumn("__s_present", F.lit(True)).alias("s")
    cond = None
    for k in keys:
        c = F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}"))
        cond = c if cond is None else (cond & c)
    joined = t.join(s, cond, "full_outer")
    s_present = F.col("s.__s_present").isNotNull()
    matched = s_present & F.col("t.__t_present").isNotNull()
    # row-presence test, not per-column coalesce: a source row whose
    # non-key column is legitimately NULL must still overwrite the target
    cols = [
        F.when(s_present, F.col(f"s.{c}")).otherwise(F.col(f"t.{c}")).alias(c)
        for c in target.columns
    ]
    if with_action:
        cols.append(
            F.when(matched, F.lit("update"))
            .when(F.col("t.__t_present").isNull(), F.lit("insert"))
            .otherwise(F.lit("keep"))
            .alias("action")
        )
    return joined.select(*cols)


def apply_cdc(
    target: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    op_col: str = "op",
) -> DataFrame:
    """Full CDC apply — a change feed with I/U/D ops folded into the
    target in ONE keyed full-outer join (no separate delete pass):

    - ``op = 'D'``: key-matched target rows are dropped;
    - ``op in ('I','U')``: upsert semantics (source row wins);
    - unmatched target rows pass through.

    If the feed carries several ops per key, pre-collapse it to the last
    op per key (by a sequence column) before calling — this operator
    applies ONE state transition per key, which is what a checkpointed
    micro-batch hands you anyway.

    Scale shape is identical to merge_upsert: shuffle on the merge keys,
    broadcast or bucket as the sides dictate; pair with dynamic partition
    overwrite so only touched partitions rewrite.
    """
    data_cols = [c for c in changes.columns if c != op_col]
    if sorted(target.columns) != sorted(data_cols):
        raise ValueError(
            f"schema mismatch: {sorted(target.columns)} vs {sorted(data_cols)}"
        )
    t = target.withColumn("__t_present", F.lit(True)).alias("t")
    s = changes.withColumn("__s_present", F.lit(True)).alias("s")
    cond = None
    for k in keys:
        c = F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}"))
        cond = c if cond is None else (cond & c)
    joined = t.join(s, cond, "full_outer")
    s_present = F.col("s.__s_present").isNotNull()
    is_delete = s_present & (F.col(f"s.{op_col}") == "D")
    # a delete for an absent key is a no-op row; drop it too
    out = joined.filter(~is_delete)
    cols = [
        F.when(
            F.col("s.__s_present").isNotNull(), F.col(f"s.{c}")
        ).otherwise(F.col(f"t.{c}")).alias(c)
        for c in target.columns
    ]
    return out.select(*cols)


def scd2_from_changes(
    changes: DataFrame,
    keys: Sequence[str],
    seq_col: str,
) -> DataFrame:
    """Type-2 slowly-changing-dimension history from a keyed change feed:
    each version row gains ``valid_from`` (its own sequence value),
    ``valid_to`` (the next version's sequence, null while current) and
    ``is_current`` — one window sort per key, no self-join.

    At scale this is a single shuffle on the keys; the window frame is
    growing-only (lead), so Catalyst plans one Sort + Window without
    buffering whole partitions beyond the frame.
    """
    w = Window.partitionBy(*keys).orderBy(F.col(seq_col).asc())
    return (
        changes.withColumn("valid_from", F.col(seq_col))
        .withColumn("valid_to", F.lead(seq_col).over(w))
        .withColumn("is_current", F.col("valid_to").isNull())
    )


# ---------------------------------------------------------------------------
# General conditional MERGE (the Delta/Iceberg MERGE INTO clause surface)
# ---------------------------------------------------------------------------
#
# Clause objects mirror the SQL statement one-to-one:
#
#   MERGE INTO t USING s ON <keys>
#   WHEN MATCHED [AND cond] THEN UPDATE SET col = expr, ...
#   WHEN MATCHED [AND cond] THEN DELETE
#   WHEN NOT MATCHED [AND cond] THEN INSERT (...) VALUES (...)
#   WHEN NOT MATCHED BY SOURCE [AND cond] THEN UPDATE SET ... / DELETE
#
# Conditions and SET expressions are SQL strings over the aliases ``t``
# (target) and ``s`` (source) — exactly how Delta's API exposes them.
# Clause ORDER is semantic: for each row category, the FIRST clause whose
# condition passes wins (SQL MERGE evaluation order), the rest are
# ignored; a row matching no clause passes through unchanged (matched /
# not-matched-by-source) or is dropped (not-matched insert candidates).


class MatchedUpdate:
    def __init__(self, set: dict[str, str], condition: str | None = None):
        self.set, self.condition = set, condition


class MatchedDelete:
    def __init__(self, condition: str | None = None):
        self.condition = condition


class NotMatchedInsert:
    """``values=None`` inserts the source row as-is (INSERT *)."""

    def __init__(
        self,
        values: dict[str, str] | None = None,
        condition: str | None = None,
    ):
        self.values, self.condition = values, condition


class NotMatchedBySourceUpdate:
    def __init__(self, set: dict[str, str], condition: str | None = None):
        self.set, self.condition = set, condition


class NotMatchedBySourceDelete:
    def __init__(self, condition: str | None = None):
        self.condition = condition


def merge_into(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    clauses: Sequence[object],
    check_duplicate_matches: bool = True,
) -> DataFrame:
    """Resolve a full conditional MERGE in ONE null-safe full-outer join
    (cf. Databricks MERGE INTO semantics; delta-io resolves the same
    clause matrix into a join + per-row case analysis). Returns the new
    table image; pair with ``sources.snapshots.merge_into_snapshot`` to
    commit it as a version.

    Scale: identical join shape to merge_upsert — shuffle on the keys,
    so bucket the target and broadcast/bucket the source as sizes
    dictate. The clause CASE analysis is pure projection (zero extra
    shuffles); the optional ambiguity guard is one aggregate on the
    source keys (the small side).

    ``check_duplicate_matches``: SQL MERGE forbids two source rows
    hitting the same target row (nondeterministic update); when True,
    raise if any source key repeats — disable only if a pre-collapse
    already guarantees uniqueness.
    """
    if check_duplicate_matches:
        dup = (
            source.groupBy(*[F.col(k) for k in keys])
            .count()
            .filter(F.col("count") > 1)
            .limit(1)
            .collect()
        )
        if dup:
            raise ValueError(
                f"MERGE source has duplicate key {tuple(dup[0][k] for k in keys)}: "
                "multiple source rows would update one target row"
            )
    out_cols = list(target.columns)
    t = target.withColumn("__t_present", F.lit(True)).alias("t")
    s = source.withColumn("__s_present", F.lit(True)).alias("s")
    cond = None
    for k in keys:
        c = F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}"))
        cond = c if cond is None else (cond & c)
    joined = t.join(s, cond, "full_outer")

    t_present = F.col("t.__t_present").isNotNull()
    s_present = F.col("s.__s_present").isNotNull()
    matched = t_present & s_present
    src_only = s_present & ~t_present
    tgt_only = t_present & ~s_present

    def _cond(category, clause):
        c = category
        if clause.condition is not None:
            c = c & F.expr(clause.condition)
        return c

    # first-clause-wins: for each row, the applicable clause index; -1 =
    # no clause matched (pass through / drop insert candidate)
    def _first_match(category, cats):
        picked = F.lit(False)
        out = F.lit(-1)
        for i, cl in enumerate(clauses):
            if not isinstance(cl, cats):
                continue
            hit = _cond(category, cl) & ~picked
            out = F.when(hit, F.lit(i)).otherwise(out)
            picked = picked | _cond(category, cl)
        return out

    m_idx = _first_match(matched, (MatchedUpdate, MatchedDelete))
    i_idx = _first_match(src_only, (NotMatchedInsert,))
    b_idx = _first_match(
        tgt_only, (NotMatchedBySourceUpdate, NotMatchedBySourceDelete)
    )

    # survival: matched rows die on MatchedDelete, target-only rows die
    # on NotMatchedBySourceDelete, source-only rows live only on insert
    survive = F.lit(True)
    for i, cl in enumerate(clauses):
        if isinstance(cl, (MatchedDelete,)):
            survive = survive & ~(matched & (m_idx == i))
        if isinstance(cl, (NotMatchedBySourceDelete,)):
            survive = survive & ~(tgt_only & (b_idx == i))
    survive = F.when(src_only, i_idx >= 0).otherwise(survive)

    def _col_value(name):
        v = F.col(f"t.{name}")
        for i, cl in enumerate(clauses):
            if isinstance(cl, MatchedUpdate) and name in cl.set:
                v = F.when(
                    matched & (m_idx == i), F.expr(cl.set[name])
                ).otherwise(v)
            elif isinstance(cl, NotMatchedBySourceUpdate) and name in cl.set:
                v = F.when(
                    tgt_only & (b_idx == i), F.expr(cl.set[name])
                ).otherwise(v)
            elif isinstance(cl, NotMatchedInsert):
                # Delta MERGE semantics (ADVICE r4 #2): an explicit values
                # dict inserts NULL for every target column it omits;
                # source-column passthrough applies only to INSERT *
                # (values=None).
                if cl.values is None:
                    ins = F.col(f"s.{name}")
                elif name in cl.values:
                    ins = F.expr(cl.values[name])
                else:
                    ins = F.lit(None)
                v = F.when(src_only & (i_idx == i), ins).otherwise(v)
        return v.alias(name)

    return joined.filter(survive).select(*[_col_value(c) for c in out_cols])
