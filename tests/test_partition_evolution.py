"""Iceberg-style partition-spec evolution (sources/snapshots
.evolve_partition_spec): old files keep their spec and are never
rewritten, appends land under the new spec, mixed-spec reads union the
groups, manifest pruning skips only same-spec files, and the ambiguous
per-partition ops refuse mixed-spec tables."""

from __future__ import annotations

import os
import uuid

import pytest
from pyspark.sql import functions as F

from m13_sparkstreaming_python_azure_spark.sources.snapshots import (
    append_snapshot_partitioned,
    compact_partition,
    evolve_partition_spec,
    read_manifest,
    read_snapshot_evolved,
    read_snapshot_evolved_partitions,
    read_snapshot_partitioned,
    replace_partition,
    spec_prune_report,
    write_snapshot_partitioned,
)


@pytest.fixture()
def evolved(spark, tmp_path):
    tdir = str(tmp_path / f"t-{uuid.uuid4().hex[:8]}")
    df1 = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b", i // 10) for i in range(40)],
        "k bigint, cat string, day bigint",
    )
    write_snapshot_partitioned(df1, tdir, "cat")
    files_v1 = sorted(read_manifest(tdir)["files"])
    evolve_partition_spec(tdir, "day")
    df2 = spark.createDataFrame(
        [(100 + i, "c", 10 + i // 10) for i in range(30)],
        "k bigint, cat string, day bigint",
    )
    append_snapshot_partitioned(df2, tdir)
    return tdir, files_v1


def test_no_rewrite_and_specs_recorded(evolved):
    tdir, files_v1 = evolved
    m = read_manifest(tdir)
    assert set(files_v1) <= set(m["files"])  # old files untouched
    specs = m["partition_specs"]
    assert all(specs[f] == "cat" for f in files_v1)
    new_files = [f for f in m["files"] if f not in set(files_v1)]
    assert new_files and all(specs[f] == "day" for f in new_files)
    assert m["partition_col"] == "day"


def test_mixed_spec_read_full_schema(spark, evolved):
    tdir, _ = evolved
    got = read_snapshot_evolved(spark, tdir)
    assert sorted(got.columns) == ["cat", "day", "k"]
    assert got.count() == 70
    assert got.filter(F.col("cat") == "c").count() == 30
    # read_snapshot_partitioned dispatches to the evolved reader
    assert read_snapshot_partitioned(spark, tdir).count() == 70


def test_prune_report_and_pruned_read(spark, evolved):
    tdir, files_v1 = evolved
    rep = spec_prune_report(tdir, "day", [10, 11])
    assert set(rep["scanned_other_spec"]) == set(files_v1)
    assert rep["kept"] and rep["skipped"]  # day files split by predicate
    got = read_snapshot_evolved_partitions(spark, tdir, "day", [10, 11])
    want = (
        read_snapshot_evolved(spark, tdir)
        .filter(F.col("day").isin([10, 11]))
        .collect()
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want))
    # pruning on the OLD spec column also works: new-spec files scan
    rep2 = spec_prune_report(tdir, "cat", ["a"])
    assert rep2["kept"] and rep2["skipped"]  # cat=a kept, cat=b skipped
    got2 = read_snapshot_evolved_partitions(spark, tdir, "cat", ["a"])
    assert got2.count() == 20


def test_missing_partition_value_scans_not_skips(spark, evolved):
    """If a same-spec file has no entry in the manifest partitions map
    (invariant violated), the prune report must route it to the
    post-filtered scan list — never silently classify it prunable and
    drop its rows (ADVICE r8)."""
    import json

    tdir, _ = evolved
    m = read_manifest(tdir)
    day_files = [f for f, s in m["partition_specs"].items() if s == "day"]
    victim = sorted(day_files)[0]
    # corrupt the manifest copy on disk: drop the victim's partition value
    mdir = os.path.join(tdir, "_manifests")
    latest = max(f for f in os.listdir(mdir) if f.startswith("v"))
    mp = os.path.join(mdir, latest)
    raw = json.load(open(mp))
    removed = raw["partitions"].pop(victim)
    json.dump(raw, open(mp, "w"))
    rep = spec_prune_report(tdir, "day", [int(removed)])
    assert victim in rep["scanned_other_spec"]
    assert victim not in rep["skipped"] and victim not in rep["kept"]
    # the pruned read still returns every matching row
    got = read_snapshot_evolved_partitions(
        spark, tdir, "day", [int(removed)]
    )
    want = (
        read_snapshot_evolved(spark, tdir)
        .filter(F.col("day") == int(removed))
        .count()
    )
    assert got.count() == want


def test_time_travel_predates_evolution(spark, evolved):
    tdir, _ = evolved
    v1 = read_snapshot_partitioned(spark, tdir, version=1)
    assert v1.count() == 40 and sorted(v1.columns) == ["cat", "day", "k"]


def test_evolution_validation(spark, evolved):
    tdir, _ = evolved
    with pytest.raises(ValueError, match="already"):
        evolve_partition_spec(tdir, "day")


def test_ambiguous_partition_ops_refuse_mixed_specs(spark, evolved):
    tdir, _ = evolved
    one_day = spark.createDataFrame([(999, "z", 10)], "k bigint, cat string, day bigint")
    with pytest.raises(ValueError, match="spec-evolved"):
        replace_partition(one_day, tdir, 10)
    with pytest.raises(ValueError, match="spec-evolved"):
        compact_partition(spark, tdir, 10)


def test_empty_prune_result(spark, evolved):
    tdir, _ = evolved
    got = read_snapshot_evolved_partitions(spark, tdir, "day", [999])
    # old-spec files still scan (they can't be pruned on day) but the
    # post-filter leaves nothing
    assert got.count() == 0


def test_zone_map_stats_prune_old_spec_files(spark, evolved):
    from m13_sparkstreaming_python_azure_spark.sources.snapshots import (
        attach_zone_maps,
    )

    tdir, files_v1 = evolved
    # without stats, every old-spec file scans for a day predicate
    before = spec_prune_report(tdir, "day", [10, 11])
    assert set(before["scanned_other_spec"]) == set(files_v1)
    attach_zone_maps(tdir, ["day"])
    # day is a DATA column in the cat-spec files (0 <= day <= 3), so the
    # footer stats prove no overlap with {10, 11}: all of them skip
    after = spec_prune_report(tdir, "day", [10, 11])
    assert set(after["skipped_by_stats"]) == set(files_v1)
    assert after["scanned_other_spec"] == []
    # and the pruned read still returns exactly the right rows
    got = read_snapshot_evolved_partitions(spark, tdir, "day", [10, 11])
    want = (
        read_snapshot_evolved(spark, tdir)
        .filter(F.col("day").isin([10, 11]))
        .collect()
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want))
    # a predicate overlapping the old files' range: files whose slice
    # contains day 2 scan, the rest stats-prune — together they cover
    # every old-spec file and at least one genuinely scans
    mixed = spec_prune_report(tdir, "day", [2, 10])
    assert set(mixed["scanned_other_spec"]) | set(
        mixed["skipped_by_stats"]
    ) == set(files_v1)
    assert mixed["scanned_other_spec"]
    got2 = read_snapshot_evolved_partitions(spark, tdir, "day", [2, 10])
    want2 = (
        read_snapshot_evolved(spark, tdir)
        .filter(F.col("day").isin([2, 10]))
        .count()
    )
    assert got2.count() == want2
