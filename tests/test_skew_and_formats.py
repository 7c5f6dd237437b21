"""Tests for skew mitigation (salted join/aggregate) and the CSV/JSON/ORC
format wrappers."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from m13_sparkstreaming_python_azure_spark.catalog import load_table
from m13_sparkstreaming_python_azure_spark.operators.skew import (
    salted_aggregate,
    salted_join,
)
from m13_sparkstreaming_python_azure_spark.sources import formats


def _skewed(spark):
    """90% of rows share one key — the straggler shape."""
    rows = [(0, float(i)) for i in range(900)] + [
        (k, float(k)) for k in range(1, 101)
    ]
    return spark.createDataFrame(rows, ["k", "v"])


def test_salted_join_matches_plain_join(spark):
    left = _skewed(spark)
    dim = spark.createDataFrame(
        [(k, f"name_{k}") for k in range(0, 101)], ["k", "name"]
    )
    plain = sorted(
        tuple(r) for r in left.join(dim, "k").select("k", "v", "name").collect()
    )
    salted = sorted(
        tuple(r)
        for r in salted_join(left, dim, "k", salt=8).select("k", "v", "name").collect()
    )
    assert salted == plain
    assert len(salted) == 1000


def test_salted_join_left_keeps_unmatched(spark):
    left = spark.createDataFrame([(1, "a"), (99, "b")], ["k", "v"])
    dim = spark.createDataFrame([(1, "x")], ["k", "name"])
    out = salted_join(left, dim, "k", salt=4, how="left").collect()
    by_k = {r["k"]: r["name"] for r in out}
    assert by_k == {1: "x", 99: None}


def test_salted_aggregate_matches_plain(spark):
    df = _skewed(spark)
    plain = sorted(
        tuple(r)
        for r in df.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("total"),
            F.max("v").alias("vmax"),
        )
        .collect()
    )
    salted = sorted(
        tuple(r)
        for r in salted_aggregate(
            df,
            ["k"],
            {"n": ("count", "*"), "total": ("sum", "v"), "vmax": ("max", "v")},
            salt=8,
        )
        .select("k", "n", "total", "vmax")
        .collect()
    )
    assert salted == plain


def test_format_roundtrips(spark, sf_dir, tmp_path):
    nation = load_table(spark, sf_dir, "nation")
    want = sorted(tuple(r) for r in nation.collect())
    for name, writer, reader in [
        ("csv", formats.write_csv, formats.read_csv),
        ("jsonl", formats.write_jsonl, formats.read_jsonl),
        ("orc", formats.write_orc, formats.read_orc),
    ]:
        path = str(tmp_path / name)
        writer(nation, path)
        if name == "orc":
            back = reader(spark, path)
        else:
            back = reader(spark, path, nation.schema)
        got = sorted(tuple(r) for r in back.collect())
        assert got == want, name


def test_python_datasource_synthetic_docs(spark):
    """The custom Python DataSource plans one partition per slice, rows are
    a pure function of (seed, doc_id) independent of partition count, and
    options flow through."""
    from m13_sparkstreaming_python_azure_spark.sources.python_datasource import (
        SyntheticDocsDataSource,
    )

    spark.dataSource.register(SyntheticDocsDataSource)
    df = (
        spark.read.format("synthetic_docs")
        .option("n_docs", 200).option("seed", 7).option("partitions", 8)
        .load()
    )
    assert df.count() == 200
    assert df.rdd.getNumPartitions() == 8
    a = sorted(tuple(r) for r in df.collect())
    b = sorted(
        tuple(r)
        for r in spark.read.format("synthetic_docs")
        .option("n_docs", 200).option("seed", 7).option("partitions", 3)
        .load()
        .collect()
    )
    assert a == b
    row = dict(zip(["doc_id", "text", "n_tokens"], a[0]))
    assert row["n_tokens"] == len(row["text"].split())


def test_write_parquet_sized_codec_filecount_and_sort(spark, sf_dir, tmp_path):
    """zstd codec lands in the parquet footers, maxRecordsPerFile bounds
    file sizes, and sortWithinPartitions orders rows inside each file
    (what gives row-group stats pruning power)."""
    import pyarrow.parquet as pq

    from m13_sparkstreaming_python_azure_spark.catalog import load_table
    from m13_sparkstreaming_python_azure_spark.sources.files import (
        write_parquet_sized,
    )

    orders = load_table(spark, sf_dir, "orders").repartition(2)
    out = str(tmp_path / "sized")
    write_parquet_sized(
        orders, out, max_records_per_file=500,
        sort_within_partitions=["o_orderdate"],
    )
    files = [f for f in os.listdir(out) if f.endswith(".parquet")]
    n_rows = orders.count()
    assert len(files) >= n_rows // 500  # the cap actually split files
    meta = pq.ParquetFile(os.path.join(out, files[0]))
    assert meta.metadata.row_group(0).column(0).compression.lower() == "zstd"
    assert meta.metadata.num_rows <= 500
    back = spark.read.parquet(out)
    assert back.count() == n_rows
    # rows inside one file are sorted by the cluster key
    pdf = meta.read().to_pandas()
    assert list(pdf["o_orderdate"]) == sorted(pdf["o_orderdate"])


def test_zorder_write_prunes_files_on_both_dimensions(spark, sf_dir, tmp_path):
    """Z-order layout: every file is a compact box in (custkey, orderdate)
    space, so a box predicate on EITHER dimension overlaps few files'
    min/max footer ranges; a single-column sort layout prunes only its
    leading column. Row content must be identical across layouts."""
    import pyarrow.parquet as pq

    from m13_sparkstreaming_python_azure_spark.operators.zorder import (
        morton_key,
        quantize,
        write_zordered,
    )

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.col("o_orderdate").cast("date").alias("o_date")
    )
    max_ck = orders.agg(F.max("o_custkey")).first()[0]
    lo_d, hi_d = orders.agg(
        F.min(F.unix_date("o_date")), F.max(F.unix_date("o_date"))
    ).first()
    # 64 files → 6-bit z-prefix → an 8×8 tile grid over (custkey, date):
    # a ~10% slab on either dimension overlaps ≤2 of 8 tile rows/columns
    # (+range-bound straddle). Fewer files = coarser grid = weaker pruning.
    n_files = 64
    zkey = morton_key(
        [
            quantize(F.col("o_custkey"), 0, max_ck + 1, 8),
            quantize(F.unix_date(F.col("o_date")), lo_d, hi_d + 1, 8),
        ],
        bits=8,
    )
    zpath, spath = str(tmp_path / "zord"), str(tmp_path / "sorted")
    write_zordered(orders, zpath, zkey, n_files)
    # competing layout: range-sorted by custkey only
    orders.repartitionByRange(n_files, "o_custkey").sortWithinPartitions(
        "o_custkey"
    ).write.parquet(spath)

    def overlap_counts(path, ck_range, date_range):
        """files whose footer [min,max] intersects each predicate range"""
        ck_hits = date_hits = total = 0
        for fn in os.listdir(path):
            if not fn.endswith(".parquet"):
                continue
            total += 1
            md = pq.read_metadata(os.path.join(path, fn))
            stats = {}
            for i in range(md.num_columns):
                col = md.row_group(0).column(i)
                lo, hi = col.statistics.min, col.statistics.max
                for rg in range(1, md.num_row_groups):
                    s = md.row_group(rg).column(i).statistics
                    lo, hi = min(lo, s.min), max(hi, s.max)
                stats[col.path_in_schema] = (lo, hi)
            if not (stats["o_custkey"][1] < ck_range[0]
                    or stats["o_custkey"][0] > ck_range[1]):
                ck_hits += 1
            if not (stats["o_date"][1] < date_range[0]
                    or stats["o_date"][0] > date_range[1]):
                date_hits += 1
        return ck_hits, date_hits, total

    import datetime as dt

    ck_q = (int(max_ck * 0.4), int(max_ck * 0.5))  # ~10% of custkey space
    d0 = dt.date(1970, 1, 1)
    date_q = (
        d0 + dt.timedelta(days=int(lo_d + (hi_d - lo_d) * 0.4)),
        d0 + dt.timedelta(days=int(lo_d + (hi_d - lo_d) * 0.5)),
    )
    z_ck, z_date, z_total = overlap_counts(zpath, ck_q, date_q)
    s_ck, s_date, s_total = overlap_counts(spath, ck_q, date_q)
    assert z_total == n_files and s_total == n_files
    # sorted layout: perfect on custkey, useless on date (every file hit)
    assert s_date == n_files
    # z-order: prunes meaningfully on BOTH dimensions (≤ ~3 of 8 tile
    # columns incl. straddle), and strictly dominates overall
    assert z_ck <= (3 * n_files) // 8, (z_ck, n_files)
    assert z_date <= (3 * n_files) // 8, (z_date, n_files)
    assert z_ck + z_date < s_ck + s_date, (z_ck, z_date, s_ck, s_date)
    # identical content, different layout
    got = spark.read.parquet(zpath)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, orders.collect())
    )


def test_compact_parquet_reduces_file_count_preserving_rows(spark, sf_dir, tmp_path):
    """Streaming-sink exhaust (many tiny files) compacts to the computed
    file count with identical row content."""
    from m13_sparkstreaming_python_azure_spark.sources.files import compact_parquet

    ev = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "small")
    ev.repartition(64).write.parquet(src)  # 64 tiny files
    dst = str(tmp_path / "compacted")
    n = compact_parquet(spark, src, dst, target_file_bytes=1 << 30)
    assert n == 1  # everything fits one target-size file
    import os

    files = [f for f in os.listdir(dst) if f.endswith(".parquet")]
    assert len(files) == 1
    a = sorted(map(tuple, spark.read.parquet(dst).collect()))
    b = sorted(map(tuple, ev.collect()))
    assert a == b


def test_schema_evolution_merge_read(spark, tmp_path):
    """Schema drift across ingest batches (a column added later) must be
    readable as one dataset: mergeSchema unions the schemas, nulling the
    missing column in old files."""
    p = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "id long, v string").write.parquet(
        p + "/b0"
    )
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, v string, score double"
    ).write.parquet(p + "/b1")
    got = (
        spark.read.option("mergeSchema", "true")
        .option("recursiveFileLookup", "true")
        .parquet(p)
    )
    rows = {r["id"]: (r["v"], r["score"]) for r in got.collect()}
    assert rows == {1: ("a", None), 2: ("b", 9.5)}


def test_external_source_builders_and_jdbc_partitioning(spark):
    """Kafka/JDBC wrappers: readers build fully configured without any
    network; JDBC predicate generation is contiguous, disjoint, covering."""
    from m13_sparkstreaming_python_azure_spark.sources.external import (
        jdbc_partition_predicates,
        jdbc_reader,
        kafka_stream_reader,
    )

    kafka_stream_reader(
        spark, "broker:9092", "events", max_offsets_per_trigger=100_000,
        min_partitions=64,
    )
    jdbc_reader(
        spark, "jdbc:postgresql://db/x", "orders",
        partition_column="o_orderkey", lower_bound=0, upper_bound=10**6,
        num_partitions=32,
    )
    import pytest as _pytest

    with _pytest.raises(ValueError):
        jdbc_reader(spark, "jdbc:x", "t", partition_column="c")

    preds = jdbc_partition_predicates("k", 0, 10, 4)
    assert preds == [
        "k >= 0 AND k <= 2",
        "k >= 3 AND k <= 5",
        "k >= 6 AND k <= 8",
        "k >= 9 AND k <= 10",
    ]
    # degenerate: more partitions than values → no empty ranges
    assert jdbc_partition_predicates("k", 5, 6, 8) == [
        "k >= 5 AND k <= 5", "k >= 6 AND k <= 6",
    ]


def test_avro_roundtrip_or_documented_absence(spark, tmp_path):
    """Avro wrapper: full roundtrip when the connector jar is present;
    otherwise pin the availability probe (this container ships avro core
    jars but not spark-avro, so the probe must say False rather than the
    write failing with a cryptic error downstream)."""
    from m13_sparkstreaming_python_azure_spark.catalog import load_table
    from m13_sparkstreaming_python_azure_spark.sources.formats import (
        avro_available,
        read_avro,
        write_avro,
    )

    orders = load_table(spark, "/root/testdata/sf0.001", "orders").limit(100)
    # r10 (VERDICT r9 #7): no skip — when the spark-avro connector is
    # absent (this container), read/write_avro fall back to the
    # pure-Python OCF codec (sources/avro_py); parity tests for the
    # wire format itself live in tests/test_avro_py.py
    path = str(tmp_path / "orders_avro")
    write_avro(orders, path)
    back = read_avro(spark, path)
    assert back.count() == 100
    assert sorted(back.columns) == sorted(orders.columns)
    a = sorted(
        (r["o_orderkey"], str(r["o_orderdate"]), r["o_totalprice"])
        for r in orders.select(
            "o_orderkey", "o_orderdate", "o_totalprice"
        ).collect()
    )
    b = sorted(
        (r["o_orderkey"], str(r["o_orderdate"]), r["o_totalprice"])
        for r in back.select(
            "o_orderkey", "o_orderdate", "o_totalprice"
        ).collect()
    )
    assert a == b


def test_snapshot_table_time_travel_and_compaction(spark, tmp_path):
    """Manifest-versioned table: snapshot isolation, time travel, and
    compaction that never disturbs old versions (the Delta-less scale path
    for SURVEY §2.1 S5's durable-sink replacement)."""
    from pyspark.sql import functions as F

    from m13_sparkstreaming_python_azure_spark.catalog import load_table
    from m13_sparkstreaming_python_azure_spark.sources.snapshots import (
        append_snapshot,
        compact_snapshot,
        latest_version,
        read_manifest,
        read_snapshot,
        write_snapshot,
    )

    table = str(tmp_path / "versioned_orders")
    orders = load_table(spark, "/root/testdata/sf0.001", "orders")
    first = orders.filter(F.col("o_orderkey") % 2 == 0)
    second = orders.filter(F.col("o_orderkey") % 2 == 1)

    v1 = write_snapshot(first, table)
    # hold a reader on v1 BEFORE any further commits
    reader_v1 = read_snapshot(spark, table, v1)
    n1 = first.count()

    v2 = append_snapshot(second, table)
    assert read_snapshot(spark, table).count() == orders.count()

    v3 = compact_snapshot(spark, table, target_file_bytes=1 << 30)
    assert (v1, v2, v3) == (1, 2, 3) and latest_version(table) == 3
    # compacted latest equals full content, in fewer files
    assert read_snapshot(spark, table).count() == orders.count()
    assert len(read_manifest(table, v3)["files"]) <= len(
        read_manifest(table, v2)["files"]
    )
    # time travel: every version reproduces its exact content
    assert read_snapshot(spark, table, v1).count() == n1
    assert read_snapshot(spark, table, v2).count() == orders.count()
    # the v1 reader (resolved before v2/v3 existed) still scans clean
    assert reader_v1.count() == n1
    # value-exactness across compaction, not just counts
    a = sorted(map(tuple, read_snapshot(spark, table, v2).collect()))
    b = sorted(map(tuple, read_snapshot(spark, table, v3).collect()))
    assert a == b


def test_snapshot_merge_and_vacuum(spark, tmp_path):
    """MERGE into a versioned table produces a new time-travelable version;
    vacuum deletes only files exclusive to expired versions (retained
    versions stay fully readable)."""
    import os

    from pyspark.sql import functions as F

    from m13_sparkstreaming_python_azure_spark.catalog import load_table
    from m13_sparkstreaming_python_azure_spark.sources.snapshots import (
        latest_version,
        merge_snapshot,
        read_manifest,
        read_snapshot,
        vacuum_snapshots,
        write_snapshot,
    )

    table = str(tmp_path / "merge_table")
    orders = load_table(spark, "/root/testdata/sf0.001", "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    write_snapshot(orders, table)

    updates = orders.filter(F.col("o_orderkey") % 10 == 0).withColumn(
        "o_totalprice", F.lit(0.0)
    )
    v2 = merge_snapshot(spark, table, updates, keys=["o_orderkey"])
    assert v2 == 2
    now = read_snapshot(spark, table)
    assert now.count() == orders.count()  # upsert, no dup keys
    assert (
        now.filter((F.col("o_orderkey") % 10 == 0) & (F.col("o_totalprice") != 0.0)).count()
        == 0
    )
    # v1 unchanged (time travel across the merge)
    v1_prices = read_snapshot(spark, table, 1).agg(F.sum("o_totalprice")).collect()[0][0]
    assert v1_prices > 0

    # vacuum: v1's files (exclusive to it) go; latest stays readable
    dead = vacuum_snapshots(table, keep_last=1)
    assert dead and all(not os.path.exists(f) for f in dead)
    assert read_snapshot(spark, table).count() == orders.count()
    assert latest_version(table) == v2
    # expired manifest is gone
    import pytest

    with pytest.raises(FileNotFoundError):
        read_manifest(table, 1)

    # a SECOND vacuum after a new commit must not crash on the manifests
    # the first vacuum deleted (ADVICE r1), and stays a no-op for live files
    v3 = merge_snapshot(spark, table, updates, keys=["o_orderkey"])
    dead2 = vacuum_snapshots(table, keep_last=1)
    assert read_snapshot(spark, table).count() == orders.count()
    assert latest_version(table) == v3
    assert all(not os.path.exists(f) for f in dead2)


def test_commit_propagates_batch_id_through_compact_and_merge(spark, tmp_path):
    """Exactly-once guard survives maintenance commits: compaction and
    MERGE inherit the previous manifest's batch_id, so a crash-replayed
    micro-batch after a compact/merge is still a no-op (ADVICE r1)."""
    from pyspark.sql import functions as F

    from m13_sparkstreaming_python_azure_spark.catalog import load_table
    from m13_sparkstreaming_python_azure_spark.sources.snapshots import (
        compact_snapshot,
        latest_version,
        merge_snapshot,
        read_manifest,
        snapshot_batch_sink,
    )

    table = str(tmp_path / "bid_table")
    nation = load_table(spark, "/root/testdata/sf0.001", "nation")
    sink = snapshot_batch_sink(table)
    sink(nation, 7)
    assert read_manifest(table)["batch_id"] == 7

    compact_snapshot(spark, table)
    assert read_manifest(table)["batch_id"] == 7  # inherited, not lost

    updates = nation.withColumn("n_name", F.upper("n_name"))
    merge_snapshot(spark, table, updates, keys=["n_nationkey"])
    assert read_manifest(table)["batch_id"] == 7

    # replayed micro-batch after the maintenance commits: still a no-op
    before = latest_version(table)
    sink(nation, 7)
    assert latest_version(table) == before
    # a genuinely new batch advances the mark
    sink(nation.limit(3), 8)
    assert read_manifest(table)["batch_id"] == 8


def test_keyed_sink_incremental_and_crash_safe(spark, tmp_path, monkeypatch):
    """The bucketed keyed sink rewrites ONLY touched key-hash buckets per
    batch (untouched buckets keep their exact file paths), and a crash
    between data-file write and manifest commit leaves the previous
    version fully readable; the replayed batch then converges."""
    import m13_sparkstreaming_python_azure_spark.sources.snapshots as snap

    table = str(tmp_path / "keyed_table")
    rows1 = [(i, f"u{i}", float(i)) for i in range(200)]
    df1 = spark.createDataFrame(rows1, "k int, name string, v double")
    sink = snap.keyed_batch_sink(table, keys=["k"], mode="merge", n_buckets=8)
    sink(df1, 0)
    assert sorted(map(tuple, snap.read_snapshot(spark, table).collect())) == sorted(rows1)

    # batch 2 touches 3 keys → at most 3 buckets rewritten
    df2 = spark.createDataFrame(
        [(5, "u5", -5.0), (6, "u6", -6.0), (300, "u300", 300.0)],
        "k int, name string, v double",
    )
    parts_before = snap.read_manifest(table)["parts"]
    sink(df2, 1)
    parts_after = snap.read_manifest(table)["parts"]
    changed = [b for b in parts_before if parts_before[b]["files"] != parts_after.get(b, {}).get("files")]
    assert 1 <= len(changed) <= 3  # only touched buckets rewrote
    untouched = [b for b in parts_before if b not in changed]
    assert untouched, "expected some untouched buckets"
    for b in untouched:
        assert parts_before[b]["files"] == parts_after[b]["files"]
    want = {r[0]: (r[1], r[2]) for r in rows1}
    want.update({5: ("u5", -5.0), 6: ("u6", -6.0), 300: ("u300", 300.0)})
    got = {r["k"]: (r["name"], r["v"]) for r in snap.read_snapshot(spark, table).collect()}
    assert got == want

    # crash mid-batch: data files written, commit never happens
    v_before = snap.latest_version(table)
    real_commit = snap._commit

    def boom(*a, **kw):
        raise RuntimeError("simulated crash before manifest commit")

    monkeypatch.setattr(snap, "_commit", boom)
    df3 = spark.createDataFrame([(5, "u5", 555.0)], "k int, name string, v double")
    import pytest

    with pytest.raises(RuntimeError):
        sink(df3, 2)
    monkeypatch.setattr(snap, "_commit", real_commit)
    # previous version intact and readable — no torn table
    assert snap.latest_version(table) == v_before
    assert {r["k"]: r["v"] for r in snap.read_snapshot(spark, table).collect()}[5] == -5.0
    # replay of the failed batch converges; replaying it again is a no-op
    sink(df3, 2)
    assert {r["k"]: r["v"] for r in snap.read_snapshot(spark, table).collect()}[5] == 555.0
    v_now = snap.latest_version(table)
    sink(df3, 2)
    assert snap.latest_version(table) == v_now


def test_keyed_sink_latest_mode_order_independent(spark, tmp_path):
    """mode='latest': batches applied out of arrival order converge to the
    same per-key argmax fixed point (max is commutative + idempotent)."""
    import m13_sparkstreaming_python_azure_spark.sources.snapshots as snap

    schema = "k int, ts long, v string"
    late = spark.createDataFrame([(1, 10, "old"), (2, 30, "keep2")], schema)
    early = spark.createDataFrame([(1, 20, "new"), (3, 5, "keep3")], schema)

    out = {}
    for name, batches in {"fwd": [late, early], "rev": [early, late]}.items():
        table = str(tmp_path / f"latest_{name}")
        sink = snap.keyed_batch_sink(
            table, keys=["k"], mode="latest", order_cols=["ts"], n_buckets=4
        )
        for i, b in enumerate(batches):
            sink(b, i)
        out[name] = sorted(map(tuple, snap.read_snapshot(spark, table).collect()))
    assert out["fwd"] == out["rev"] == [(1, 20, "new"), (2, 30, "keep2"), (3, 5, "keep3")]


def test_file_index_prunes_point_lookup(spark, tmp_path):
    """File-level min/max index over a key-clustered layout: a point lookup
    opens a small fraction of the files and returns exactly the full-scan
    result; an out-of-domain lookup opens none."""
    from m13_sparkstreaming_python_azure_spark.catalog import load_table
    from m13_sparkstreaming_python_azure_spark.sources.fileindex import (
        build_file_index,
        indexed_lookup,
        prune_files,
    )

    orders = load_table(spark, "/root/testdata/sf0.01", "orders")
    path = str(tmp_path / "clustered")
    # range-partition + sort by the key: each file owns a compact key range
    orders.repartitionByRange(16, "o_custkey").sortWithinPartitions(
        "o_custkey"
    ).write.parquet(path)

    index = build_file_index(spark, path, "o_custkey").cache()
    n_files = index.count()
    assert n_files >= 8

    probe = orders.select("o_custkey").first()[0]
    candidates = prune_files(index, probe, probe)
    # clustered layout → a point key lives in ~1 file (straddle ≤ 2)
    assert 1 <= len(candidates) <= 2

    got = sorted(
        tuple(r)
        for r in indexed_lookup(spark, index, "o_custkey", probe).collect()
    )
    want = sorted(
        tuple(r)
        for r in spark.read.parquet(path)
        .filter(F.col("o_custkey") == probe)
        .collect()
    )
    assert got == want and len(got) > 0

    # out of domain: no files read, empty but correctly-typed result
    missing = indexed_lookup(spark, index, "o_custkey", -1)
    assert missing.count() == 0
    assert missing.columns == spark.read.parquet(path).columns

    # explicit schema types the empty result with ZERO file access
    typed = indexed_lookup(
        spark, index, "o_custkey", -1, schema=spark.read.parquet(path).schema
    )
    assert typed.count() == 0 and typed.columns == missing.columns

    # an EMPTY index is a clear error without schema, fine with one
    import pytest

    empty_index = index.filter(F.lit(False))
    with pytest.raises(ValueError, match="schema"):
        indexed_lookup(spark, empty_index, "o_custkey", 1)
    ok = indexed_lookup(
        spark, empty_index, "o_custkey", 1, schema="o_custkey long"
    )
    assert ok.count() == 0


def test_snapshot_history_timetravel_and_changes(spark, tmp_path):
    """DESCRIBE HISTORY / TIMESTAMP AS OF / change-feed analogues: history
    lists retained commits with timestamps; as-of-timestamp reads resolve
    to the newest version at or before ts; snapshot_changes reports the
    exact key-level insert/update/delete diff between two versions."""
    import time as _time

    import m13_sparkstreaming_python_azure_spark.sources.snapshots as snap

    table = str(tmp_path / "hist_table")
    v1_rows = [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)]
    df1 = spark.createDataFrame(v1_rows, "k int, name string, v double")
    snap.write_snapshot(df1, table)
    t_after_v1 = _time.time()
    _time.sleep(0.05)

    # v2: update k=2, insert k=4; k=3 carried over, then v3 deletes k=3
    df2 = spark.createDataFrame(
        [(2, "b", 20.0), (4, "d", 4.0)], "k int, name string, v double"
    )
    snap.merge_snapshot(spark, table, df2, keys=["k"])
    df3 = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 20.0), (4, "d", 4.0)],
        "k int, name string, v double",
    )
    snap.write_snapshot(df3, table)  # v3 = full replace without k=3

    h = snap.history(table)
    assert [e["version"] for e in h] == [1, 2, 3]
    assert all(e["committed_at"] is not None for e in h)
    assert h[0]["rows"] == 3 and h[1]["rows"] == 4

    # timestamp between v1 and v2 resolves to v1
    as_of = snap.read_snapshot_as_of(spark, table, t_after_v1)
    assert sorted(map(tuple, as_of.collect())) == sorted(v1_rows)
    import pytest

    with pytest.raises(FileNotFoundError):
        snap.read_snapshot_as_of(spark, table, t_after_v1 - 1e6)

    # change feed v1 → v3: k=2 update (postimage), k=4 insert, k=3 delete
    ch = {
        r["k"]: (r["_change_type"], r["name"], r["v"])
        for r in snap.snapshot_changes(spark, table, ["k"], 1, 3).collect()
    }
    assert ch == {
        2: ("update", "b", 20.0),
        4: ("insert", "d", 4.0),
        3: ("delete", "c", 3.0),
    }
    # unchanged keys (k=1) are absent; a version diffed with itself is empty
    assert snap.snapshot_changes(spark, table, ["k"], 3, 3).count() == 0


def test_concurrent_commits_never_clobber(spark, tmp_path):
    """Writer-writer race on the same table: O_CREAT|O_EXCL version claims
    mean every commit lands as its OWN version — no lost commits, _latest
    at the max (ADVICE r1)."""
    from concurrent.futures import ThreadPoolExecutor

    import m13_sparkstreaming_python_azure_spark.sources.snapshots as snap

    table = str(tmp_path / "race_table")
    nation = spark.createDataFrame([(1, "x")], "k int, s string")
    snap.write_snapshot(nation, table)  # v1 creates the table

    def commit_one(i: int) -> int:
        # commit metadata-only versions concurrently (empty file deltas):
        # the contended resource is the version number itself
        return snap._commit(table, [], 0, {"writer": i})

    with ThreadPoolExecutor(max_workers=8) as ex:
        versions = sorted(ex.map(commit_one, range(8)))
    assert versions == list(range(2, 10))  # all distinct, no clobber
    assert snap.latest_version(table) == 9
    # every writer's manifest survived intact
    writers = {
        snap.read_manifest(table, v).get("writer") for v in range(2, 10)
    }
    assert writers == set(range(8))


def test_keyed_table_compaction_preserves_buckets(spark, tmp_path):
    """compact_keyed_snapshot rewrites a keyed table into fewer files while
    PRESERVING the per-bucket manifest mapping (bucket-pure files), so
    later batches keep merging incrementally; plain compact_snapshot on a
    keyed table is rejected by the sink with a clear error."""
    import pytest

    import m13_sparkstreaming_python_azure_spark.sources.snapshots as snap

    table = str(tmp_path / "keyed_compact")
    sink = snap.keyed_batch_sink(table, keys=["k"], mode="merge", n_buckets=4)
    sink(spark.createDataFrame([(i, float(i)) for i in range(100)], "k int, v double"), 0)
    sink(spark.createDataFrame([(i, float(-i)) for i in range(50)], "k int, v double"), 1)

    before = snap.read_manifest(table)
    want = {r["k"]: r["v"] for r in snap.read_snapshot(spark, table).collect()}
    v = snap.compact_keyed_snapshot(spark, table)
    after = snap.read_manifest(table, v)
    # content identical, parts preserved, fewer-or-equal files
    got = {r["k"]: r["v"] for r in snap.read_snapshot(spark, table).collect()}
    assert got == want
    assert set(after.get("parts", {})) == set(before["parts"])
    assert len(after["files"]) <= len(before["files"])
    assert after["rows"] == before["rows"]

    # the sink keeps merging incrementally after the compaction
    sink(spark.createDataFrame([(1, 111.0), (999, 9.0)], "k int, v double"), 2)
    got2 = {r["k"]: r["v"] for r in snap.read_snapshot(spark, table).collect()}
    want.update({1: 111.0, 999: 9.0})
    assert got2 == want

    # a non-keyed commit on a keyed table is caught at the next batch
    table2 = str(tmp_path / "keyed_misuse")
    sink2 = snap.keyed_batch_sink(table2, keys=["k"], mode="merge", n_buckets=4)
    sink2(spark.createDataFrame([(1, 1.0)], "k int, v double"), 0)
    snap.compact_snapshot(spark, table2)  # wrong tool for keyed tables
    with pytest.raises(ValueError, match="keyed"):
        sink2(spark.createDataFrame([(2, 2.0)], "k int, v double"), 1)


def test_keyed_sink_random_batches_match_reference_fold(spark, tmp_path):
    """Property test (hypothesis): for ANY sequence of keyed batches, the
    latest-mode sink's table equals a driver-side reference argmax fold,
    and the merge-mode table equals last-writer-wins by batch order —
    regardless of key distribution, duplicates, or bucket collisions."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    import m13_sparkstreaming_python_azure_spark.sources.snapshots as snap

    row = st.tuples(
        st.integers(min_value=0, max_value=12),   # key (few keys → collisions)
        st.integers(min_value=0, max_value=1000), # order value
        st.integers(min_value=0, max_value=99),   # payload
    )
    batches_strategy = st.lists(
        st.lists(row, min_size=1, max_size=12), min_size=1, max_size=3
    )
    case_n = [0]

    @settings(
        max_examples=5,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(batches=batches_strategy)
    def run(batches):
        case_n[0] += 1
        table = str(tmp_path / f"prop_{case_n[0]}")
        sink = snap.keyed_batch_sink(
            table, keys=["k"], mode="latest", order_cols=["ord", "p"],
            n_buckets=3,
        )
        ref: dict = {}
        for bid, rows in enumerate(batches):
            df = spark.createDataFrame(rows, "k int, ord int, p int")
            sink(df, bid)
            for k, o, p in rows:
                if k not in ref or (o, p) > ref[k]:
                    ref[k] = (o, p)
        got = {
            r["k"]: (r["ord"], r["p"])
            for r in snap.read_snapshot(spark, table).collect()
        }
        assert got == ref

    run()
