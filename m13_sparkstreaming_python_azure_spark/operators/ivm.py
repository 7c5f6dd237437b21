"""Incremental view maintenance: keep a grouped aggregate current from a
CDC change feed instead of recomputing it from the full table.

The lakehouse pattern on top of the snapshot layer (sources/snapshots.py):
a keyed table advances version by version; a downstream aggregate ("view")
refreshes by applying only the delta — every update is treated as
delete(old image) + insert(new image), so rows that MOVE between groups
are handled for free. Works for the subtractable aggregates (sum, count,
and anything derived from them, e.g. avg); min/max are not subtractable
and need a recompute or a sketch.

Exactness contract: per-value sums are cast to an exact DECIMAL before
summing, so incremental refresh equals full recompute EXACTLY (double
sums would drift: the incremental path folds in a different order).

Scale shape: the refresh costs one aggregate over the CHANGE SET (tiny
relative to the table) plus one key-partitioned full-outer join against
the previous aggregate (|groups| rows) — the table itself is never read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SUM_TYPE = "decimal(27,6)"


def table_changes_images(
    old: DataFrame, new: DataFrame, keys: list[str]
) -> DataFrame:
    """Pre/post-image change feed between two table states: one row per
    changed key with ``__old`` / ``__new`` row structs (null on insert /
    delete respectively) and ``_change_type``. The both-images twin of
    sources/snapshots.snapshot_changes (which emits only one image);
    IVM needs both to subtract the old row and add the new."""
    nonkeys = [c for c in new.columns if c not in keys]
    o = old.select(*keys, F.struct(*nonkeys).alias("__old"))
    n = new.select(*keys, F.struct(*nonkeys).alias("__new"))
    j = o.join(n, on=keys, how="full_outer")
    change = (
        F.when(F.col("__old").isNull(), F.lit("insert"))
        .when(F.col("__new").isNull(), F.lit("delete"))
        .when(~F.col("__old").eqNullSafe(F.col("__new")), F.lit("update"))
    )
    return (
        j.withColumn("_change_type", change)
        .filter(F.col("_change_type").isNotNull())
    )


def grouped_view(
    df: DataFrame, group_cols: list[str], sum_cols: list[str]
) -> DataFrame:
    """The canonical maintainable aggregate: per group, ``n_rows`` plus
    ``sum_<c>`` (exact decimal) for each measure — the shape
    ``incremental_refresh`` consumes and produces. Derived measures
    (avg = sum/n) belong downstream, computed from these."""
    aggs = [F.count(F.lit(1)).alias("n_rows")] + [
        F.sum(F.col(c).cast(_SUM_TYPE)).alias(f"sum_{c}") for c in sum_cols
    ]
    return df.groupBy(*group_cols).agg(*aggs)


def incremental_refresh(
    prev_view: DataFrame,
    images: DataFrame,
    group_cols: list[str],
    sum_cols: list[str],
) -> DataFrame:
    """Advance ``prev_view`` (a ``grouped_view`` result) by a change feed
    from ``table_changes_images``: subtract old images of updates and
    deletes, add new images of updates and inserts, per group; groups
    whose row count reaches zero disappear — identical, row for row, to
    recomputing ``grouped_view`` on the new table state."""
    minus = images.filter(
        F.col("_change_type").isin("update", "delete")
    ).select(
        *[F.col("__old")[g].alias(g) for g in group_cols],
        *[F.col("__old")[c].alias(c) for c in sum_cols],
        F.lit(-1).alias("__sign"),
    )
    plus = images.filter(
        F.col("_change_type").isin("update", "insert")
    ).select(
        *[F.col("__new")[g].alias(g) for g in group_cols],
        *[F.col("__new")[c].alias(c) for c in sum_cols],
        F.lit(1).alias("__sign"),
    )
    delta = (
        minus.unionByName(plus)
        .groupBy(*group_cols)
        .agg(
            F.sum("__sign").alias("__d_n"),
            *[
                F.sum(
                    (F.col(c).cast(_SUM_TYPE) * F.col("__sign")).cast(
                        _SUM_TYPE
                    )
                ).alias(f"__d_{c}")
                for c in sum_cols
            ],
        )
    )
    merged = prev_view.join(delta, on=group_cols, how="full_outer")
    zero = F.lit(0).cast(_SUM_TYPE)
    out = merged.select(
        *group_cols,
        (
            F.coalesce("n_rows", F.lit(0)) + F.coalesce("__d_n", F.lit(0))
        ).alias("n_rows"),
        *[
            (
                F.coalesce(F.col(f"sum_{c}"), zero)
                + F.coalesce(F.col(f"__d_{c}"), zero)
            )
            .cast(_SUM_TYPE)
            .alias(f"sum_{c}")
            for c in sum_cols
        ],
    )
    return out.filter(F.col("n_rows") > 0)


def refresh_view_snapshot(
    spark,
    base_dir: str,
    view_dir: str,
    base_keys: list[str],
    group_cols: list[str],
    sum_cols: list[str],
) -> int:
    """Materialized-view maintenance over the snapshot layer: advance the
    grouped view stored at ``view_dir`` to the base table's latest
    version by diffing the two base versions and applying only the
    change images. The view is itself a versioned snapshot table (time
    travel and change feed work on it too); each view manifest records
    the ``base_version`` it reflects, so refreshes are idempotent (a
    call with nothing new is a no-op) and chainable.

    Fallback: if the recorded base version was vacuumed (its manifest is
    gone), the view re-bootstraps with a full recompute — correctness
    never depends on retention. Returns the view's committed version.
    """
    from m13_sparkstreaming_python_azure_spark.sources import snapshots as snap

    base_latest = snap.latest_version(base_dir)
    if base_latest is None:
        raise FileNotFoundError(f"no committed base version in {base_dir}")

    def _bootstrap() -> int:
        view = grouped_view(
            snap.read_snapshot(spark, base_dir, base_latest),
            group_cols,
            sum_cols,
        )
        return snap.write_snapshot(
            view, view_dir, {"base_version": base_latest, "op": "view_bootstrap"}
        )

    try:
        synced = snap.read_manifest(view_dir).get("base_version")
    except FileNotFoundError:
        synced = None
    if synced is None:
        return _bootstrap()
    if synced == base_latest:
        return snap.latest_version(view_dir)  # already current — no-op
    try:
        old = snap.read_snapshot(spark, base_dir, synced)
    except FileNotFoundError:
        return _bootstrap()  # synced-to version vacuumed away
    new = snap.read_snapshot(spark, base_dir, base_latest)
    images = table_changes_images(old, new, base_keys)
    refreshed = incremental_refresh(
        snap.read_snapshot(spark, view_dir), images, group_cols, sum_cols
    )
    return snap.write_snapshot(
        refreshed, view_dir, {"base_version": base_latest, "op": "view_refresh"}
    )


def join_view_refresh(
    prev_view: DataFrame,
    a_old: DataFrame,
    a_new: DataFrame,
    b_old: DataFrame,
    b_new: DataFrame,
    a_key: str,
    b_key: str,
    join_col: str,
    view_rows=None,
) -> DataFrame:
    """Incrementally maintain a JOIN view V = A ⋈ B (A's ``join_col``
    equi-joins B's unique ``b_key``; ``a_key`` uniquely identifies view
    rows — the fact⋈dimension shape) across a change in BOTH base
    tables: delta-detect on each side, then repair ONLY the affected
    view keys with a keyed partial recompute:

        changed_a = keys with any A-side insert/update/delete
        changed_b = B keys with any insert/update/delete
        affected  = changed_a ∪ {a-keys of old/new rows joining changed_b}
        V_new     = (V_old ⟕anti affected) ∪ (A_new⟨affected⟩ ⋈ B_new)

    Equivalent, row for row, to recomputing A_new ⋈ B_new — but the
    full tables are only touched by the (semi-join-pruned) affected
    slice; everything else is the change-feed diff. The pure signed
    delta algebra (ΔA⋈B_new ∪ A_old⋈ΔB) maintains multisets; with a
    unique view key the keyed repair is the same cost without the
    double-counting corner when one order's fact AND dimension both
    change in one batch.

    Scale shape: the diffs are key-partitioned full-outer joins of two
    versions (what table_changes_images does); `affected` is a set of
    ids semi-joined back — cost O(|changes|) plus the repair join on
    only those ids, never a view rebuild.

    ``view_rows(a, b) -> DataFrame`` projects view rows from base
    slices; the SAME callable must have produced ``prev_view`` (from
    the old states) so kept and repaired rows union by name."""
    da = table_changes_images(a_old, a_new, [a_key]).select(a_key)
    db = table_changes_images(b_old, b_new, [b_key]).select(b_key)
    via_b = (
        a_old.select(a_key, join_col)
        .unionByName(a_new.select(a_key, join_col))
        .join(
            db.withColumnRenamed(b_key, join_col), on=join_col, how="left_semi"
        )
        .select(a_key)
    )
    affected = da.unionByName(via_b).distinct()
    kept = prev_view.join(affected, on=a_key, how="left_anti")
    repaired = view_rows(
        a_new.join(affected, on=a_key, how="left_semi"), b_new
    )
    return kept.unionByName(repaired)
