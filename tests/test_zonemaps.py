"""Zone-map data skipping (sources/snapshots): footer-derived stats,
manifest-level file pruning that provably skips disjoint files, the
conservative no-stats fallback, and append-incremental stats."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from m13_sparkstreaming_python_azure_spark.sources.snapshots import (
    append_snapshot,
    attach_zone_maps,
    prune_files,
    read_manifest,
    read_snapshot,
    read_snapshot_pruned,
    write_snapshot,
)


def _table(spark, tmp_path):
    table = str(tmp_path / "t")
    rows = spark.range(0, 300).select(
        F.col("id"), (F.col("id") * 2).alias("v")
    )
    write_snapshot(rows.filter("id < 100").repartition(2), table)
    append_snapshot(
        rows.filter("id >= 100 and id < 200").repartition(2), table
    )
    append_snapshot(rows.filter("id >= 200").repartition(2), table)
    attach_zone_maps(table, ["id"])
    return table


def test_prune_skips_disjoint_files_and_loses_nothing(spark, tmp_path):
    table = _table(spark, tmp_path)
    m = read_manifest(table)
    assert m["op"] == "stats" and len(m["files"]) == 6
    kept = prune_files(m, "id", lo=120, hi=150)
    # only the middle chunk's files can overlap [120, 150]
    assert 0 < len(kept) <= 2
    got = sorted(
        r.id for r in read_snapshot_pruned(spark, table, "id", 120, 150).collect()
    )
    assert got == list(range(120, 151))
    # unbounded sides
    assert read_snapshot_pruned(spark, table, "id", lo=250).count() == 50
    assert read_snapshot_pruned(spark, table, "id", hi=9).count() == 10
    # empty intersection -> empty result, zero files would open
    assert prune_files(m, "id", lo=1000) == []
    assert read_snapshot_pruned(spark, table, "id", lo=1000).count() == 0


def test_prune_is_conservative_without_stats(spark, tmp_path):
    table = _table(spark, tmp_path)
    m = read_manifest(table)
    # a column with no zone maps keeps every file
    assert prune_files(m, "v", lo=0, hi=1) == m["files"]
    # and the filter still applies
    assert read_snapshot_pruned(spark, table, "v", 0, 10).count() == 6


def test_stats_commit_preserves_snapshot_semantics(spark, tmp_path):
    table = _table(spark, tmp_path)
    before = read_manifest(table)
    # stats version reads identically to the data it annotates
    assert read_snapshot(spark, table).count() == 300
    # a later append inherits: re-attaching only needs the new files
    extra = spark.range(300, 320).select("id", (F.col("id") * 2).alias("v"))
    append_snapshot(extra.coalesce(1), table)
    attach_zone_maps(table, ["id"])
    m2 = read_manifest(table)
    assert set(before["zone_maps"]).issubset(set(m2["zone_maps"]))
    assert len(m2["zone_maps"]) == len(m2["files"])
    assert read_snapshot_pruned(spark, table, "id", lo=300).count() == 20


def test_timestamp_zone_maps_roundtrip(spark, sf_dir, tmp_path):
    from m13_sparkstreaming_python_azure_spark.catalog import load_table

    table = str(tmp_path / "ot")
    orders = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    write_snapshot(orders.filter(d < "1996-01-01").coalesce(2), table)
    append_snapshot(orders.filter(d >= "1996-01-01").coalesce(2), table)
    attach_zone_maps(table, ["o_orderdate"])
    m = read_manifest(table)
    kept = prune_files(
        m,
        "o_orderdate",
        lo=datetime.datetime(1995, 1, 1),
        hi=datetime.datetime(1995, 12, 31),
    )
    assert len(kept) < len(m["files"])  # the >=1996 files are skipped
    want = orders.filter(
        (d >= "1995-01-01") & (d < "1996-01-01")
    ).count()
    got = read_snapshot_pruned(
        spark,
        table,
        "o_orderdate",
        lo=datetime.datetime(1995, 1, 1),
        hi=datetime.datetime(1995, 12, 31),
    ).count()
    assert got == want > 0


def test_zorder_compaction_prunes_on_both_dimensions(spark, sf_dir, tmp_path):
    """OPTIMIZE ZORDER on the snapshot layer: after the Morton-key
    rewrite, a narrow range predicate on EITHER clustered column skips
    most files via the manifest zone maps — and the content is
    unchanged."""
    from m13_sparkstreaming_python_azure_spark.catalog import load_table
    from m13_sparkstreaming_python_azure_spark.operators.zorder import (
        morton_key,
        quantize,
    )
    from m13_sparkstreaming_python_azure_spark.sources.snapshots import (
        compact_snapshot_zorder,
    )

    table = str(tmp_path / "zt")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    write_snapshot(orders.repartition(8), table)  # random layout
    b = orders.agg(
        F.min("o_totalprice"), F.max("o_totalprice"),
        F.min("o_custkey"), F.max("o_custkey"),
    ).collect()[0]
    zkey = morton_key(
        [
            quantize(F.col("o_totalprice"), float(b[0]), float(b[1]) + 1, 8),
            quantize(
                F.col("o_custkey").cast("double"), float(b[2]), float(b[3]) + 1, 8
            ),
        ],
        bits=8,
    )
    compact_snapshot_zorder(
        spark, table, zkey, n_files=8, stats_cols=["o_totalprice", "o_custkey"]
    )
    m = read_manifest(table)
    assert len(m["files"]) >= 6
    kept_price = prune_files(m, "o_totalprice", lo=10000.0, hi=30000.0)
    kept_cust = prune_files(m, "o_custkey", lo=100, hi=110)
    assert len(kept_price) < len(m["files"])
    assert len(kept_cust) < len(m["files"])
    # parity: pruned scan == plain filtered scan
    want = orders.filter(
        (F.col("o_custkey") >= 100) & (F.col("o_custkey") <= 110)
    ).count()
    got = read_snapshot_pruned(spark, table, "o_custkey", 100, 110).count()
    assert got == want > 0
    assert read_snapshot(spark, table).count() == orders.count()


def test_snapshot_schema_evolution_merge_read(spark, tmp_path):
    """Additive schema evolution: an append with a NEW column commits
    fine; merge_schema=True surfaces it (null for old files), the
    default read keeps the cheap single-footer schema."""
    from m13_sparkstreaming_python_azure_spark.sources.snapshots import (
        append_snapshot,
        read_snapshot,
        write_snapshot,
    )

    table = str(tmp_path / "se")
    v1 = spark.range(0, 10).select("id", (F.col("id") * 2).alias("v"))
    write_snapshot(v1.coalesce(1), table)
    v2 = spark.range(10, 20).select(
        "id", (F.col("id") * 2).alias("v"), F.lit("new").alias("tag")
    )
    append_snapshot(v2.coalesce(1), table)

    merged = read_snapshot(spark, table, merge_schema=True)
    assert set(merged.columns) == {"id", "v", "tag"}
    assert merged.count() == 20
    assert merged.filter(F.col("tag").isNull()).count() == 10
    assert merged.filter(F.col("tag") == "new").count() == 10


def test_attach_zone_maps_widens_columns_for_existing_files(spark, tmp_path):
    """ADVICE r4 #3: a second attach_zone_maps call with a DIFFERENT
    columns list must backfill stats for the new columns on pre-existing
    files (not leave them permanently unprunable on those columns), must
    keep the previously-computed columns, and zone_map_cols must report
    the union actually covered."""
    table = _table(spark, tmp_path)  # stats for ["id"] already attached
    attach_zone_maps(table, ["v"])
    m = read_manifest(table)
    assert m["zone_map_cols"] == ["id", "v"]
    for f in m["files"]:
        stats = m["zone_maps"][f]
        assert set(stats) == {"id", "v"}  # widened, nothing dropped
    # pruning now works on the NEW column for old files: v = 2*id, so
    # v in [240, 300] maps to the middle chunk only
    kept = prune_files(m, "v", lo=240, hi=300)
    assert 0 < len(kept) <= 2
    got = read_snapshot_pruned(spark, table, "v", 240, 300).count()
    assert got == 31  # v even in [240, 300] -> ids 120..150


def test_prune_files_accepts_date_bounds_on_date_stats(spark, tmp_path):
    """ADVICE r4 #4: datetime.date bounds (the natural type for a DATE
    column) must not TypeError against decoded datetime stats, and must
    prune consistently with the residual filter."""
    table = str(tmp_path / "dates")
    df = spark.createDataFrame(
        [(i, datetime.date(2024, 1, 1) + datetime.timedelta(days=i)) for i in range(60)],
        "id long, d date",
    )
    write_snapshot(df.filter("id < 30").coalesce(1), table)
    append_snapshot(df.filter("id >= 30").coalesce(1), table)
    attach_zone_maps(table, ["d"])
    m = read_manifest(table)
    lo, hi = datetime.date(2024, 2, 5), datetime.date(2024, 2, 10)
    kept = prune_files(m, "d", lo=lo, hi=hi)  # must not raise
    assert len(kept) == 1  # second file only
    got = sorted(
        r.d for r in read_snapshot_pruned(spark, table, "d", lo, hi).collect()
    )
    assert got == [datetime.date(2024, 2, 5) + datetime.timedelta(days=i) for i in range(6)]


def test_bloom_maps_skip_files_and_lose_nothing(spark, tmp_path):
    """Per-file bloom point-lookup skipping (attach_bloom_maps): on a
    hash-sliced layout where zone maps prune NOTHING, blooms must skip
    the absent files, keep every matching row, and coexist with zone
    maps in the manifest (stats commits must not clobber each other)."""
    from m13_sparkstreaming_python_azure_spark.sources.snapshots import (
        attach_bloom_maps,
        prune_files,
        prune_files_bloom,
        read_snapshot_point,
    )

    table = str(tmp_path / "bl")
    rows = spark.range(0, 4000).select(
        F.col("id"), (F.col("id") * 3).alias("v")
    )
    # hash-sliced: every file's id range spans [0, 4000) — min/max useless
    write_snapshot(rows.filter("id % 4 = 0").coalesce(1), table)
    for i in (1, 2, 3):
        append_snapshot(rows.filter(f"id % 4 = {i}").coalesce(1), table)
    attach_zone_maps(table, ["id"])
    attach_bloom_maps(table, ["id"], num_bits=65536)
    m = read_manifest(table)
    # both stats families live in one manifest
    assert m["zone_map_cols"] == ["id"] and m["bloom_cols"] == ["id"]
    assert len(m["files"]) == 4

    # zone maps cannot prune this layout; blooms prune to exactly 1 file
    assert len(prune_files(m, "id", lo=1234, hi=1234)) == 4
    kept = prune_files_bloom(m, "id", 1234)
    assert len(kept) == 1
    got = read_snapshot_point(spark, table, "id", 1234).collect()
    assert [(r["id"], r["v"]) for r in got] == [(1234, 3702)]
    # absent key: bloom proves absence in every file -> zero files open
    assert prune_files_bloom(m, "id", 99999) == []
    assert read_snapshot_point(spark, table, "id", 99999).count() == 0
    # conservative without a bloom for the column
    assert len(prune_files_bloom(m, "v", 30)) == 4


def test_restore_and_clone_semantics(spark, tmp_path):
    """RESTORE preserves history (new commit, old versions intact, fails
    on vacuumed targets); shallow CLONE is zero-copy, refuses non-empty
    targets, and keeps stats usable."""
    import pytest

    from m13_sparkstreaming_python_azure_spark.sources.snapshots import (
        attach_bloom_maps,
        clone_snapshot,
        history,
        latest_version,
        read_snapshot_point,
        restore_snapshot,
        vacuum_snapshots,
    )

    table = str(tmp_path / "t")
    df = spark.range(0, 100).select("id", (F.col("id") * 2).alias("v"))
    write_snapshot(df.filter("id < 50").coalesce(1), table)    # v1
    append_snapshot(df.filter("id >= 50").coalesce(1), table)  # v2
    write_snapshot(df.filter("id < 10").coalesce(1), table)    # v3 bad overwrite
    v = restore_snapshot(table, 2)                             # v4 == v2
    assert v == 4 and latest_version(table) == 4
    assert read_snapshot(spark, table).count() == 100
    # history preserved: the bad v3 remains time-travelable
    assert read_snapshot(spark, table, version=3).count() == 10
    assert history(table)[-1]["version"] == 4

    # shallow clone references the same files, zero copy; stats carry over
    attach_bloom_maps(table, ["id"], num_bits=65536)           # v5
    clone = str(tmp_path / "c")
    clone_snapshot(table, clone)
    assert read_snapshot(spark, clone).count() == 100
    assert read_snapshot_point(spark, clone, "id", 77).count() == 1
    got = read_manifest(clone)
    assert got["files"] == read_manifest(table)["files"]  # same files
    with pytest.raises(ValueError):
        clone_snapshot(table, clone)  # non-empty target refused

    # restore to a vacuumed version fails loudly
    vacuum_snapshots(table, keep_last=1)
    with pytest.raises(FileNotFoundError):
        restore_snapshot(table, 3)


def test_read_snapshot_points_batched_probe(spark, tmp_path):
    """Batched multi-key point lookup: union-of-surviving-files + one
    IN-list scan equals the plain filter; absent keys add no files."""
    from m13_sparkstreaming_python_azure_spark.sources.snapshots import (
        attach_bloom_maps,
        read_snapshot_points,
    )

    table = str(tmp_path / "pts")
    rows = spark.range(0, 2000).select("id", (F.col("id") % 7).alias("v"))
    write_snapshot(rows.filter("id % 2 = 0").coalesce(1), table)
    append_snapshot(rows.filter("id % 2 = 1").coalesce(1), table)
    attach_bloom_maps(table, ["id"], num_bits=65536)
    got = sorted(
        r["id"]
        for r in read_snapshot_points(
            spark, table, "id", [3, 4, 99999]
        ).collect()
    )
    assert got == [3, 4]
    assert read_snapshot_points(spark, table, "id", [99999, 88888]).count() == 0


def test_bloom_probe_type_insensitive(spark, tmp_path):
    """Probing an int64 column with 1234.0, numpy.int64(1234) or
    Decimal('1234') must hit the same bit positions as the stored int —
    bloom pruning is cost-only, so a differently-spelled probe must
    never prune the file that holds the match."""
    import decimal

    import numpy as np

    from m13_sparkstreaming_python_azure_spark.sources.snapshots import (
        attach_bloom_maps,
        prune_files_bloom,
        read_snapshot_point,
    )

    table = str(tmp_path / "bt")
    rows = spark.range(0, 4000).select("id", (F.col("id") * 3).alias("v"))
    write_snapshot(rows.filter("id % 4 = 0").coalesce(1), table)
    for i in (1, 2, 3):
        append_snapshot(rows.filter(f"id % 4 = {i}").coalesce(1), table)
    attach_bloom_maps(table, ["id"], num_bits=65536)
    m = read_manifest(table)

    base = prune_files_bloom(m, "id", 1234)
    assert len(base) == 1
    for probe in (1234.0, np.int64(1234), np.float64(1234.0),
                  decimal.Decimal("1234")):
        assert prune_files_bloom(m, "id", probe) == base, repr(probe)
        got = read_snapshot_point(spark, table, "id", probe).collect()
        assert [(r["id"], r["v"]) for r in got] == [(1234, 3702)]
    # non-integral float probe on an int column: no match, but must not
    # crash and keeps the no-false-negative contract trivially
    assert read_snapshot_point(spark, table, "id", 1234.5).count() == 0
