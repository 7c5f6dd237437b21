"""Manifest-versioned parquet tables: snapshot isolation + time travel
without a table-format dependency (Delta/Iceberg aren't in this container;
SURVEY §2.1 S5 flags the memory sink's replacement path for scale).

Layout:
    table_dir/
      data/part-*.parquet      immutable data files (never rewritten in place)
      _manifests/v00001.json   ordered file list + row count per version
      _manifests/_latest       the committed version number (atomic pointer)

Semantics (the useful subset of a table format, in ~100 lines):
- **Snapshot isolation**: a reader resolves `_latest` → manifest → fixed
  file list once; concurrent appends/compactions create NEW files and a NEW
  manifest, never touching files a live reader holds.
- **Time travel**: every version's manifest is retained; `read_snapshot(
  version=N)` reproduces the table as of commit N exactly.
- **Safe compaction**: `compact_snapshot` rewrites current content into
  fewer files and commits them as a new version — old versions (and old
  readers) still see the original files.
- **Atomic commit**: the manifest is created exclusively and `_latest` is
  a one-line pointer published atomically — both routed through the
  filesystem seam (sources/fs.py): POSIX rename/O_EXCL locally,
  conditional-put + overwrite-put on an object store. The protocol is
  identical on both; only the nine primitive ops differ, so pointing
  `table_dir` at `abfss://…` needs an adapter, not a rewrite.

At 100 TB the manifest lists O(file count) entries — keep files ~256 MB+
via `target_file_bytes` and the list stays in the low millions, read once
per query plan (exactly the Delta/Iceberg trade).
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from m13_sparkstreaming_python_azure_spark.sources.fs import fs_for


class CommitConflict(RuntimeError):
    """The table advanced past the version this commit's content was
    derived from (optimistic-concurrency check). The version-number CAS
    alone only serializes WHO commits — without the lineage check, a
    read-modify-write loser would publish content derived from a stale
    base and silently drop the winner's rows. Callers rebase (appends:
    re-union the file list; compactions/merges: recompute from the new
    content) and retry."""


_UNCHECKED = object()  # content-independent commits skip the lineage check


def _manifest_dir(table_dir: str) -> str:
    return os.path.join(table_dir, "_manifests")


def _manifest_path(table_dir: str, version: int) -> str:
    return os.path.join(_manifest_dir(table_dir), f"v{version:05d}.json")


def _atomic_write(path: str, content: str) -> None:
    """Atomic pointer publish, routed through the owning filesystem
    (POSIX tmp+rename locally; one conditional/overwrite put on an
    object store — sources/fs.py)."""
    fs_for(path).write_atomic(path, content)


def _exclusive_write(path: str, content: str) -> None:
    """Create ``path`` exclusively — FileExistsError if another writer
    already claimed this version number (writer-writer conflict
    detection; the loser retries at the next version). O_CREAT|O_EXCL
    locally; conditional-put/If-None-Match on an object store."""
    fs_for(path).write_exclusive(path, content)


def latest_version(table_dir: str) -> int | None:
    fs = fs_for(table_dir)
    p = os.path.join(_manifest_dir(table_dir), "_latest")
    if not fs.exists(p):
        return None
    return int(fs.read_text(p).strip())


def _commit(
    table_dir: str,
    files: list[str],
    n_rows: int,
    extra: dict | None = None,
    base_version: int | None | object = _UNCHECKED,
) -> int:
    """Commit a new version. Concurrency + exactly-once invariants:

    - The version manifest is created O_CREAT|O_EXCL: two concurrent
      committers can't both claim version N+1 — the loser retries at the
      next number, so no commit is ever silently clobbered.
    - ``base_version`` (when given) is the version this commit's CONTENT
      was derived from: if the table has advanced past it, the commit
      raises CommitConflict instead of publishing a stale file list that
      would drop the interleaved writer's rows (lost-update guard —
      overwrite-semantics commits pass _UNCHECKED and stay
      last-writer-wins by design).
    - ``batch_id`` (the streaming exactly-once high-water mark) is
      inherited from the previous latest manifest unless ``extra``
      advances it — so a compaction or MERGE between micro-batches can't
      reset the guard and let a crash-replayed batch double-commit.
    - ``_latest`` advances monotonically (never moved backwards by a
      slower concurrent committer).
    """
    import time

    while True:
        prev_v = latest_version(table_dir)
        if base_version is not _UNCHECKED and prev_v != base_version:
            raise CommitConflict(
                f"{table_dir}: content derived from version {base_version} "
                f"but the table is now at {prev_v}"
            )
        version = (prev_v or 0) + 1
        manifest = {
            "version": version,
            "files": sorted(files),
            "rows": n_rows,
            "committed_at": time.time(),
        }
        if prev_v is not None:
            try:
                prev_m = read_manifest(table_dir, prev_v)
            except FileNotFoundError:
                prev_m = {}
            if prev_m.get("batch_id") is not None:
                manifest["batch_id"] = prev_m["batch_id"]
            # deletion vectors are part of the table's CONTENT: a commit
            # that doesn't rewrite data (append, zone-map attach, …) must
            # carry them forward or the deleted rows silently resurrect.
            # Rewriting ops (overwrite/compact/merge/purge) clear them by
            # passing an explicit dv_files in ``extra`` (even []).
            if "dv_files" not in (extra or {}) and prev_m.get("dv_files"):
                manifest["dv_files"] = prev_m["dv_files"]
            # CHECK constraints are table metadata: every commit carries
            # them unless explicitly replaced (add_check_constraint)
            if "constraints" not in (extra or {}) and prev_m.get(
                "constraints"
            ):
                manifest["constraints"] = prev_m["constraints"]
            # partition layout metadata persists the same way; layout-
            # rewriting ops must clear/replace it explicitly
            if "partition_col" not in (extra or {}) and prev_m.get(
                "partition_col"
            ):
                manifest["partition_col"] = prev_m["partition_col"]
                if "partitions" not in (extra or {}):
                    manifest["partitions"] = prev_m.get("partitions", {})
            # per-file partition SPECS (Iceberg-style evolution metadata):
            # carried forward unless the commit rewrites the layout
            if "partition_specs" not in (extra or {}) and prev_m.get(
                "partition_specs"
            ):
                manifest["partition_specs"] = prev_m["partition_specs"]
            # table schema (DDL string): inherited by commits that don't
            # change it; writes/appends record their DataFrame's schema so
            # schema_history() shows when each column appeared
            if "schema" not in (extra or {}) and prev_m.get("schema"):
                manifest["schema"] = prev_m["schema"]
            # generated-column definitions are table metadata like
            # constraints: carried unless explicitly replaced
            if "generated" not in (extra or {}) and prev_m.get("generated"):
                manifest["generated"] = prev_m["generated"]
        if extra:
            manifest.update(extra)
        try:
            _exclusive_write(
                _manifest_path(table_dir, version), json.dumps(manifest)
            )
            break
        except FileExistsError:
            continue  # another writer took this version — retry on top of it
    current = latest_version(table_dir)
    if current is None or version > current:
        _atomic_write(
            os.path.join(_manifest_dir(table_dir), "_latest"), str(version)
        )
    return version


def _write_data_files(
    df: DataFrame, table_dir: str, subdir: str = "data"
) -> list[str]:
    """Write df as new immutable files under ``subdir``/ (staging dir +
    move — Spark owns the file layout inside the staging write)."""
    fs = fs_for(table_dir)
    staging = os.path.join(table_dir, f"_staging-{uuid.uuid4().hex[:12]}")
    df.write.mode("overwrite").parquet(staging)
    data_dir = os.path.join(table_dir, subdir)
    fs.makedirs(data_dir)
    moved = []
    for name in fs.listdir(staging):
        if name.endswith(".parquet"):
            dst = os.path.join(data_dir, f"{uuid.uuid4().hex[:8]}-{name}")
            fs.rename(os.path.join(staging, name), dst)
            moved.append(dst)
    # best-effort cleanup of the _SUCCESS marker etc.
    fs.rmtree(staging)
    return moved


def _count_files_rows(spark, files: list[str]) -> int:
    """Row count of freshly-written data files. Plain local paths count
    from parquet FOOTERS driver-side (`_parquet_rows`) — under
    foreachBatch commits the old `spark.read.parquet(*files).count()`
    cost one full Spark job per commit, a measurable slice of the
    micro-batch floor (VERDICT r10 #6). Scheme'd paths (blob seam) keep
    the Spark count."""
    if not files:
        return 0
    if all("://" not in f for f in files):
        return sum(_parquet_rows(f) for f in files)
    return spark.read.parquet(*files).count()


def write_snapshot(
    df: DataFrame, table_dir: str, extra: dict | None = None
) -> int:
    """Create version 1 (or fully replace content as a new version)."""
    fs_for(table_dir).makedirs(_manifest_dir(table_dir))
    files = _write_data_files(df, table_dir)
    spark = df.sparkSession
    n = _count_files_rows(spark, files)
    return _commit(
        table_dir,
        files,
        n,
        {
            "op": "overwrite",
            "dv_files": [],
            # a plain overwrite writes UNPARTITIONED files — clear any
            # previous partition layout rather than inheriting a lie
            "partition_col": None,
            "partitions": {},
            "schema": df.schema.simpleString(),
            **(extra or {}),
        },
    )


def append_snapshot(
    df: DataFrame, table_dir: str, extra: dict | None = None
) -> int:
    """Append rows as a new version: previous files + new files.

    Concurrent-append safe: the data files land once; the manifest union
    is rebased and retried if another writer commits in between (appends
    commute, so the rebase is just re-reading the latest file list —
    no data rewrite)."""
    _m0 = read_manifest(table_dir)
    if _m0.get("partition_col"):
        raise ValueError(
            "append_snapshot writes flat files without the hive layout — "
            "append to a partitioned snapshot via append_snapshot_partitioned"
        )
    df = _materialize_generated(df, _m0)
    _validate_constraints(df, _m0, table_dir)
    files = _write_data_files(df, table_dir)
    spark = df.sparkSession
    n_new = _count_files_rows(spark, files)
    while True:
        prev = read_manifest(table_dir)
        try:
            return _commit(
                table_dir,
                prev["files"] + files,
                prev["rows"] + n_new,
                {
                    "op": "append",
                    "schema": _merged_schema_ddl(prev.get("schema"), df),
                    **(extra or {}),
                },
                base_version=prev["version"],
            )
        except CommitConflict:
            continue  # rebase on the advanced manifest and retry


def read_manifest(table_dir: str, version: int | None = None) -> dict:
    v = version if version is not None else latest_version(table_dir)
    if v is None:
        raise FileNotFoundError(f"no committed version in {table_dir}")
    fs = fs_for(table_dir)
    try:
        return json.loads(fs.read_text(_manifest_path(table_dir, v)))
    except OSError as e:
        raise FileNotFoundError(str(e)) from None


def read_snapshot(
    spark: SparkSession,
    table_dir: str,
    version: int | None = None,
    merge_schema: bool = False,
) -> DataFrame:
    """The table exactly as of ``version`` (default: latest committed).

    ``merge_schema=True`` unions the schemas across the version's files
    (additive schema evolution: an append may carry NEW columns; older
    files surface them as null) — the Delta ``mergeSchema`` read
    contract. Default off: schema comes from a single footer, the cheap
    common case."""
    m = read_manifest(table_dir, version)
    if not m["files"]:
        raise FileNotFoundError(f"version {m['version']} has no files")
    reader = spark.read
    if merge_schema:
        reader = reader.option("mergeSchema", "true")
    if m.get("partition_col"):
        reader = reader.option(
            "basePath", os.path.join(table_dir, "data")
        )
    out = _apply_deletion_vectors(spark, reader.parquet(*m["files"]), m)
    return _apply_generated(out, m)


def compact_snapshot(
    spark: SparkSession, table_dir: str, target_file_bytes: int = 256 << 20
) -> int:
    """Rewrite the CURRENT version into ~target-sized files and commit as a
    new version. Old versions keep their original files — live readers and
    time travel are unaffected (files are only ever added, never mutated;
    a vacuum step for expired versions is deliberately separate)."""
    m = read_manifest(table_dir)
    if m.get("partition_col"):
        raise ValueError(
            "compact_snapshot rewrites files without the hive layout — "
            "compact a partitioned snapshot per partition via "
            "replace_partition"
        )
    fs = fs_for(table_dir)
    size = sum(fs.getsize(f) for f in m["files"])
    n_files = max(1, -(-size // target_file_bytes))
    # read DV-applied: compaction materializes soft deletes, so the new
    # version carries no deletion vectors (dv_files cleared below)
    df = _apply_deletion_vectors(
        spark, spark.read.parquet(*m["files"]), m
    ).repartition(n_files)
    files = _write_data_files(df, table_dir)
    # heavy rewrite: a concurrent commit means OUR rewritten content is
    # stale — raise (CommitConflict) and let the caller re-run compaction
    return _commit(
        table_dir, files, m["rows"], {"op": "compact", "dv_files": []},
        base_version=m["version"],
    )


def snapshot_batch_sink(table_dir: str):
    """The idempotent foreachBatch function behind
    ``write_stream_snapshots`` (public so recovery behavior is directly
    testable): commits a micro-batch as a new table version unless its
    batch_id is already committed — a replayed batch (crash recovery)
    commits nothing."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        last = None
        try:
            last = read_manifest(table_dir).get("batch_id")
        except FileNotFoundError:
            pass
        if last is not None and batch_id <= last:
            return  # replayed batch — already committed
        extra = {"batch_id": batch_id}
        if latest_version(table_dir) is None:
            write_snapshot(batch_df, table_dir, extra)
        else:
            append_snapshot(batch_df, table_dir, extra)

    return _sink


def write_stream_snapshots(stream: DataFrame, table_dir: str, checkpoint: str):
    """foreachBatch sink committing each micro-batch as a table version —
    the durable, versioned, exactly-once landing path for streams.

    Exactly-once: Spark replays a micro-batch (same batch_id) after crash
    recovery; the manifest records the last committed batch_id, and a
    replayed id commits nothing — the checkpoint (Spark's offsets) and the
    manifest (our commits) re-converge. Returns the DataStreamWriter (call
    ``.start()``/``.trigger(...)`` on it)."""
    return stream.writeStream.foreachBatch(snapshot_batch_sink(table_dir)).option(
        "checkpointLocation", checkpoint
    )


def merge_snapshot(
    spark: SparkSession,
    table_dir: str,
    source: DataFrame,
    keys: list[str],
) -> int:
    """MERGE (upsert) into a versioned table: key-matched rows take the
    source's values, unmatched source rows insert, untouched rows carry
    over — committed as a NEW version (copy-on-write at table granularity;
    per-file copy-on-write is the refinement when update rate << table
    size). Old versions remain time-travelable."""
    from m13_sparkstreaming_python_azure_spark.operators.merge import (
        merge_upsert,
    )

    m = read_manifest(table_dir)
    if m.get("partition_col"):
        raise ValueError(
            "merge_snapshot rewrites files without the hive layout — "
            "merge into a partitioned snapshot per partition"
        )
    target = _apply_deletion_vectors(spark, spark.read.parquet(*m["files"]), m)
    merged = merge_upsert(target, source, keys)
    _validate_constraints(merged, m, table_dir)
    files = _write_data_files(merged, table_dir)
    n = _count_files_rows(spark, files)
    # like compaction: stale-base MERGEs must not publish — raise and
    # let the caller recompute against the advanced table
    return _commit(
        table_dir, files, n, {"op": "merge", "dv_files": []},
        base_version=m["version"],
    )


def merge_into_snapshot(
    spark: SparkSession,
    table_dir: str,
    source: DataFrame,
    keys: list[str],
    clauses: list,
) -> int:
    """Full conditional ``MERGE INTO`` on a versioned table — the
    Delta/Iceberg clause surface (WHEN MATCHED [AND cond] UPDATE/DELETE,
    WHEN NOT MATCHED [AND cond] INSERT, WHEN NOT MATCHED BY SOURCE
    UPDATE/DELETE) resolved by ``operators.merge.merge_into`` in one
    null-safe full-outer join, committed copy-on-write as a new version
    with the stale-base lost-update guard (CommitConflict on interleaved
    writers). Old versions stay time-travelable; the change feed
    (``snapshot_changes``) sees the merge like any other commit."""
    from m13_sparkstreaming_python_azure_spark.operators.merge import (
        merge_into,
    )

    m = read_manifest(table_dir)
    if m.get("partition_col"):
        raise ValueError(
            "merge_into_snapshot rewrites files without the hive layout — "
            "merge into a partitioned snapshot per partition"
        )
    target = _apply_deletion_vectors(spark, spark.read.parquet(*m["files"]), m)
    merged = merge_into(target, source, keys, clauses)
    _validate_constraints(merged, m, table_dir)
    files = _write_data_files(merged, table_dir)
    n = _count_files_rows(spark, files)
    return _commit(
        table_dir, files, n, {"op": "merge_into", "dv_files": []},
        base_version=m["version"],
    )


def vacuum_snapshots(table_dir: str, keep_last: int = 1) -> list[str]:
    """Delete data files referenced ONLY by expired versions (older than
    the ``keep_last`` most recent), and their manifests. The separate,
    explicitly-invoked destructive step — commits/compactions never delete
    anything, so a reader holding any retained version is never broken.
    Returns the deleted file paths."""
    latest = latest_version(table_dir)
    if latest is None:
        return []
    fs = fs_for(table_dir)
    keep = set(range(max(1, latest - keep_last + 1), latest + 1))
    live_files: set[str] = set()
    for v in keep:
        mk = read_manifest(table_dir, v)
        live_files.update(mk["files"])
        live_files.update(mk.get("dv_files", []))
    deleted = []
    for v in range(1, latest + 1):
        if v in keep:
            continue
        try:
            m = read_manifest(table_dir, v)
        except FileNotFoundError:
            continue  # already vacuumed by an earlier run
        for f in m["files"] + m.get("dv_files", []):
            if f not in live_files and fs.exists(f):
                fs.remove(f)
                deleted.append(f)
        fs.remove(_manifest_path(table_dir, v))
    return deleted


def restore_snapshot(table_dir: str, version: int) -> int:
    """``RESTORE TABLE ... TO VERSION AS OF`` (Delta parity): commit a NEW
    version whose content is the old version's file list — a content
    rollback that PRESERVES history (the bad commits stay inspectable and
    time-travelable; nothing is deleted). Fails loudly if the target
    version's files were already vacuumed. Zero data movement: the commit
    re-references existing files."""
    m = read_manifest(table_dir, version)
    fs = fs_for(table_dir)
    missing = [f for f in m["files"] if not fs.exists(f)]
    if missing:
        raise FileNotFoundError(
            f"cannot restore {table_dir} to v{version}: {len(missing)} data "
            f"file(s) vacuumed, e.g. {missing[0]}"
        )
    cur = read_manifest(table_dir)
    extra = {"op": "restore", "restored_from": version}
    # keyed tables must keep their parts mapping usable after restore
    for k in ("keys", "n_buckets", "mode", "parts", "delta"):
        if k in m:
            extra[k] = m[k]
    # restore the TARGET version's deletion vectors (explicitly, even if
    # empty — otherwise _commit would inherit the CURRENT version's DVs
    # and the restored content would be wrong)
    extra["dv_files"] = m.get("dv_files", [])
    return _commit(
        table_dir, m["files"], m["rows"], extra, base_version=cur["version"]
    )


def replace_where(
    df: DataFrame,
    table_dir: str,
    predicate: str,
) -> int:
    """Delta-parity ``overwrite`` + ``replaceWhere``: atomically delete
    every current row matching ``predicate`` (a SQL boolean expression
    over the table's columns) and insert ``df`` — the selective-backfill
    primitive ("recompute this partition/slice") that a full overwrite
    is too blunt for.

    Contract (mirrors Delta's):
    - every inserted row must satisfy ``predicate`` — violations raise
      before anything commits (otherwise the op silently widens beyond
      the slice it claims to replace);
    - files with NO matching rows are carried into the new version
      untouched (no rewrite, no data movement — one file-grain
      count-aggregate classifies them, and the predicate pushes down to
      that scan);
    - files where EVERY row matches are simply dropped from the
      manifest (old versions still reference them — time travel holds);
    - only genuinely mixed files are rewritten (filtered to
      ``(predicate) IS NOT TRUE`` — rows where the predicate evaluates
      to NULL are NON-matching and must survive the rewrite, exactly as
      Delta's replaceWhere keeps them; a bare ``NOT (predicate)`` would
      null-eliminate them and silently delete data);
    - the commit carries a ``base_version`` guard: a concurrent commit
      between classify and publish raises ``CommitConflict`` instead of
      silently dropping the interleaved writer's rows.

    At 100 TB with data laid out by the replace key (partitioned /
    Z-ORDERed ingest), the mixed set is empty and this is a pure
    manifest operation on the old slice plus the new files' write."""
    spark = df.sparkSession
    _m0 = read_manifest(table_dir)
    if _m0.get("partition_col"):
        raise ValueError(
            "replace_where on a partitioned snapshot: use "
            "replace_partition (partition-grain replace preserves the "
            "hive layout)"
        )
    if _m0.get("dv_files"):
        # per-file hit classification below counts soft-deleted rows and
        # would misclassify files / overstate rows — materialize first
        raise ValueError(
            "replace_where on a table with deletion vectors: run "
            "purge_deletes(...) first"
        )
    _validate_constraints(df, _m0, table_dir)
    # IS NOT TRUE, not NOT(..): a row whose predicate evaluates to NULL
    # does not satisfy it, so it must count as a violation here too
    n_bad = df.filter(f"({predicate}) IS NOT TRUE").count()
    if n_bad:
        raise ValueError(
            f"replace_where: {n_bad} inserted row(s) violate the "
            f"predicate {predicate!r}"
        )
    m = read_manifest(table_dir)
    # one file-grain pass: rows + matching rows per current file
    cur = spark.read.parquet(*m["files"]).select(
        F.regexp_replace(F.input_file_name(), "^file:(//)?", "").alias(
            "__f"
        ),
        # coalesce to false so NULL-evaluating rows classify (and count)
        # as non-matching — consistent with the IS NOT TRUE rewrite below
        F.coalesce(F.expr(predicate), F.lit(False))
        .cast("long")
        .alias("__hit"),
    )
    per_file = {
        r["__f"]: (r["n"], r["hits"])
        for r in cur.groupBy("__f")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("__hit").alias("hits"))
        .collect()
    }
    kept, mixed, n_dropped = [], [], 0
    for f in m["files"]:
        n, hits = per_file.get(f, (0, 0))
        if not hits:
            kept.append(f)
        elif hits == n:
            n_dropped += n
        else:
            mixed.append(f)
            n_dropped += hits
    files = list(kept)
    n_rows = m["rows"] - n_dropped
    if mixed:
        survivors = spark.read.parquet(*mixed).filter(
            f"({predicate}) IS NOT TRUE"
        )
        files += _write_data_files(survivors, table_dir)
    new_files = _write_data_files(df, table_dir)
    n_new = spark.read.parquet(*new_files).count() if new_files else 0
    return _commit(
        table_dir,
        files + new_files,
        n_rows + n_new,
        {"op": "replace_where", "predicate": predicate},
        base_version=m["version"],
    )


def clone_snapshot(
    src_dir: str, dst_dir: str, version: int | None = None
) -> int:
    """SHALLOW CLONE (Delta parity): a new table whose first manifest
    references the source version's files — zero copy, O(manifest) time
    regardless of table size. The standard dev/test-against-prod and
    what-if-compaction primitive. Caveat (same as Delta shallow clones):
    the clone depends on the source's data files, so a ``vacuum`` on the
    source can break it — deep-copy (read+write) before vacuuming if the
    clone must outlive source retention."""
    m = read_manifest(src_dir, version)
    if latest_version(dst_dir) is not None:
        raise ValueError(f"clone target {dst_dir} already has commits")
    fs = fs_for(dst_dir)
    fs.makedirs(_manifest_dir(dst_dir))
    extra = {
        "op": "clone",
        "cloned_from": src_dir,
        "cloned_version": m["version"],
    }
    for k in ("keys", "n_buckets", "mode", "parts", "delta", "zone_maps",
              "zone_map_cols", "bloom_maps", "bloom_cols", "bloom_bits",
              "bloom_hashes"):
        if k in m:
            extra[k] = m[k]
    return _commit(dst_dir, m["files"], m["rows"], extra)


def history(table_dir: str) -> list[dict]:
    """Commit history over retained versions, oldest first — the
    ``DESCRIBE HISTORY`` analogue. Vacuumed versions are simply absent.
    Each entry: version, rows, n_files, committed_at (epoch seconds),
    batch_id (if a streaming commit), mode/keys (if a keyed table)."""
    latest = latest_version(table_dir)
    if latest is None:
        return []
    out = []
    for v in range(1, latest + 1):
        try:
            m = read_manifest(table_dir, v)
        except FileNotFoundError:
            continue
        out.append(
            {
                "version": m["version"],
                "rows": m.get("rows"),
                "n_files": len(m.get("files", [])),
                "committed_at": m.get("committed_at"),
                "batch_id": m.get("batch_id"),
                "mode": m.get("mode"),
            }
        )
    return out


def read_snapshot_as_of(
    spark: SparkSession, table_dir: str, ts: float
) -> DataFrame:
    """Time travel by TIMESTAMP (``TIMESTAMP AS OF`` analogue): the table
    at the newest retained version committed at or before ``ts`` (epoch
    seconds). Raises if no retained version is that old."""
    candidates = [
        h["version"]
        for h in history(table_dir)
        if h["committed_at"] is not None and h["committed_at"] <= ts
    ]
    if not candidates:
        raise FileNotFoundError(
            f"no retained version committed at or before {ts} in {table_dir}"
        )
    return read_snapshot(spark, table_dir, max(candidates))


def snapshot_changes(
    spark: SparkSession,
    table_dir: str,
    keys: list[str],
    from_version: int,
    to_version: int | None = None,
) -> DataFrame:
    """Key-level change feed between two retained versions (the CDF
    analogue, computed rather than logged): one row per key whose content
    changed, with ``_change_type`` ∈ insert / update / delete. Inserts and
    updates carry the NEW row (postimage), deletes the old one.

    Scale shape: one full-outer join on the keys between the two version
    reads — both sides shuffle once on the key columns; non-key columns
    travel as a single struct and compare null-safely in codegen. Delta's
    logged CDF is cheaper per query (it writes change files at commit
    time); this form needs no cooperation from writers and works on any
    two retained versions."""
    old = read_snapshot(spark, table_dir, from_version)
    new = read_snapshot(spark, table_dir, to_version)
    nonkeys = [c for c in new.columns if c not in keys]
    o = old.select(*keys, F.struct(*nonkeys).alias("__old"))
    n = new.select(*keys, F.struct(*nonkeys).alias("__new"))
    j = o.join(n, on=keys, how="full_outer")
    change = (
        F.when(F.col("__old").isNull(), F.lit("insert"))
        .when(F.col("__new").isNull(), F.lit("delete"))
        .when(~F.col("__old").eqNullSafe(F.col("__new")), F.lit("update"))
    )
    payload = F.coalesce(F.col("__new"), F.col("__old"))
    return (
        j.withColumn("_change_type", change)
        .filter(F.col("_change_type").isNotNull())
        .select(
            *keys,
            *[payload[c].alias(c) for c in nonkeys],
            "_change_type",
        )
    )


# ---------------------------------------------------------------------------
# Keyed (bucketed) tables: partition-incremental MERGE / latest-state sinks
# ---------------------------------------------------------------------------
#
# A keyed table hash-partitions rows into ``n_buckets`` buckets on the merge
# keys (pmod(xxhash64(keys), n)); the manifest tracks the file list PER
# BUCKET. A micro-batch then rewrites only the buckets its keys land in —
# O(batch ÷ table) of the data instead of O(table) — and commits through the
# same atomic manifest pointer swap as every other write, so a crash between
# data-file write and commit leaves the previous version intact and readable
# (orphaned staging files are reclaimed by vacuum).
#
# This is the manifest-layer stand-in for Delta/Iceberg MERGE with
# bucket-clustered targets: on a real deployment swap `keyed_batch_sink` for
# `MERGE INTO` on a Delta table clustered by the same keys — the protocol
# (idempotent batch_id guard, copy-on-write of touched files only, atomic
# commit) maps 1:1. See README "Snapshots vs Delta/Iceberg".


def _parquet_rows(path: str) -> int:
    """Row count from the parquet footer (no data read)."""
    import pyarrow.parquet as pq

    return pq.read_metadata(path).num_rows


def _write_bucketed_files(df: DataFrame, table_dir: str) -> dict[str, list[str]]:
    """Write ``df`` (must carry an int ``__bucket`` column) as immutable
    bucket-pure files under data/; returns {bucket: [files]}. Bucket purity
    is what lets a later batch rewrite one bucket without touching others.
    The ``__bucket`` value is derivable from the keys, so it is not stored
    in the data files (partitionBy path-encodes it; readers recompute)."""
    fs = fs_for(table_dir)
    staging = os.path.join(table_dir, f"_staging-{uuid.uuid4().hex[:12]}")
    df.write.mode("overwrite").partitionBy("__bucket").parquet(staging)
    data_dir = os.path.join(table_dir, "data")
    fs.makedirs(data_dir)
    parts: dict[str, list[str]] = {}
    for entry in fs.listdir(staging):
        if not entry.startswith("__bucket="):
            continue
        bucket = entry.split("=", 1)[1]
        moved = []
        pdir = os.path.join(staging, entry)
        for name in fs.listdir(pdir):
            if name.endswith(".parquet"):
                dst = os.path.join(
                    data_dir, f"{uuid.uuid4().hex[:8]}-b{bucket}-{name}"
                )
                fs.rename(os.path.join(pdir, name), dst)
                moved.append(dst)
        parts[bucket] = moved
    fs.rmtree(staging)
    return parts


def keyed_batch_sink(
    table_dir: str,
    keys: list[str],
    mode: str = "merge",
    order_cols: list[str] | None = None,
    n_buckets: int = 16,
):
    """foreachBatch function MERGE-ing each micro-batch into a bucketed
    keyed table, rewriting only touched buckets (partition-incremental
    copy-on-write) and committing atomically via the manifest pointer.

    ``mode='merge'``: key-matched rows take the batch's values, new keys
    insert (CDC apply — ``operators.merge.merge_upsert`` semantics).
    ``mode='latest'``: per key, keep the row with the greatest
    ``order_cols`` tuple across all batches — order-independent (max is
    commutative + idempotent), so replays and shuffled arrival converge
    to the batch argmax.

    Crash safety: data files land first, the manifest commit is the
    atomic last step — a crash in between leaves the previous version
    live (orphan files only). Replays are no-ops via the batch_id
    high-water mark, which `_commit` now propagates through intervening
    compactions/merges.
    """
    if mode not in ("merge", "latest"):
        raise ValueError(f"mode must be 'merge' or 'latest', got {mode!r}")
    if mode == "latest" and not order_cols:
        raise ValueError("mode='latest' requires order_cols")

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    def _argmax(df: DataFrame) -> DataFrame:
        w = Window.partitionBy(*keys).orderBy(
            *[F.col(c).desc() for c in order_cols]
        )
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )

    def _sink(batch_df: DataFrame, batch_id: int, _retries: int = 5) -> None:
        spark = batch_df.sparkSession
        try:
            base_manifest = read_manifest(table_dir)
            last = base_manifest.get("batch_id")
            base_v = base_manifest["version"]
            # live bucket count: rebucketing compaction may have resized
            # the hash index since this sink closure was built
            nb = int(base_manifest.get("n_buckets", n_buckets))
        except FileNotFoundError:
            last = None
            base_v = None
            nb = n_buckets
        if last is not None and batch_id <= last:
            return  # replayed batch — already committed

        # reduce the batch first (tiny): latest-mode folds to per-key argmax
        reduced = _argmax(batch_df) if mode == "latest" else batch_df
        reduced = reduced.withColumn(
            "__bucket", F.pmod(F.xxhash64(*keys), F.lit(nb)).cast("int")
        ).persist()
        touched = sorted(
            r["__bucket"] for r in reduced.select("__bucket").distinct().collect()
        )
        if not touched:
            reduced.unpersist()
            return  # empty batch — nothing to commit

        try:
            m = base_manifest if base_v is not None else read_manifest(table_dir)
            prev_parts = m.get("parts", {})
            if m.get("delta"):
                # merge rewrites touched buckets; non-bucket-pure delta
                # files would make the rewrite silently drop/miss rows
                raise ValueError(
                    f"{table_dir} has uncompacted append deltas — a merge "
                    "sink cannot share a table with an append sink; run "
                    "compact_keyed_snapshot first"
                )
            if m.get("files") and not prev_parts:
                raise ValueError(
                    f"{table_dir} has data committed outside the keyed "
                    "layout (no per-bucket manifest) — was plain "
                    "compact_snapshot run on a keyed table? Use "
                    "compact_keyed_snapshot; it preserves bucket-pure "
                    "files and the parts mapping."
                )
        except FileNotFoundError:
            prev_parts = {}
        old_files = [
            f
            for b in touched
            for f in prev_parts.get(str(b), {}).get("files", [])
        ]
        batch_rows = reduced.drop("__bucket")
        if old_files:
            old = spark.read.parquet(*old_files)
            if mode == "merge":
                from m13_sparkstreaming_python_azure_spark.operators.merge import (
                    merge_upsert,
                )

                merged = merge_upsert(
                    old, batch_rows.select(*old.columns), keys
                )
            else:
                merged = _argmax(old.unionByName(batch_rows.select(*old.columns)))
        else:
            merged = batch_rows
        # cluster by bucket BEFORE partitionBy: without this every shuffle
        # partition writes a sliver into every bucket dir — O(partitions ×
        # buckets) tiny files per batch; with it, one file per touched
        # bucket
        merged = merged.withColumn(
            "__bucket", F.pmod(F.xxhash64(*keys), F.lit(nb)).cast("int")
        ).repartition(len(touched), "__bucket")

        fs_for(table_dir).makedirs(_manifest_dir(table_dir))
        written = _write_bucketed_files(merged, table_dir)
        reduced.unpersist()

        # per-bucket row counts from the parquet footers (driver-side
        # metadata read — no extra Spark job over the data)
        counts: dict[str, int] = {}
        for bs, fs in written.items():
            counts[bs] = sum(_parquet_rows(f) for f in fs)

        parts = dict(prev_parts)
        for b in touched:
            bs = str(b)
            parts[bs] = {
                "files": written.get(bs, []),
                "rows": int(counts.get(bs, 0)),
            }
        files = [f for p in parts.values() for f in p["files"]]
        rows = sum(p["rows"] for p in parts.values())
        try:
            _commit(
                table_dir,
                files,
                rows,
                {
                    "op": "keyed",
                    "batch_id": batch_id,
                    "keys": keys,
                    "n_buckets": nb,
                    "mode": mode,
                    "parts": parts,
                },
                base_version=base_v,
            )
        except CommitConflict:
            # a concurrent commit (compaction/GDPR delete) advanced the
            # table while this batch merged against the old buckets —
            # the merge result is stale. Rebase: redo the whole batch
            # against the new manifest (bounded; conflicts are rare).
            if _retries <= 0:
                raise
            _sink(batch_df, batch_id, _retries - 1)

    return _sink


def keyed_append_sink(
    table_dir: str,
    keys: list[str],
    n_buckets: int = 16,
):
    """foreachBatch sink APPENDING each micro-batch into a keyed table
    with an LSM-style two-level layout (VERDICT r11 #1) — the
    postings-index write path (an LSH band index, a fingerprint set, an
    inverted index):

    - each batch writes a handful of DELTA files (one small repartition,
      no per-bucket clustering) and extends the manifest's ``delta``
      list — O(batch) work AND O(1) files per batch regardless of table
      size or bucket count;
    - ``compact_keyed_snapshot`` periodically folds delta + base into
      bucket-pure BASE files under ``parts`` (optionally REBUCKETING to
      more buckets as the table grows — the hash-index-resize
      maintenance invariant) and clears the delta;
    - ``read_keyed_buckets`` reads the touched base buckets plus the
      whole (bounded-by-compaction-cadence) delta, so probe scan volume
      is O(touched × bytes-per-bucket + delta) — measured flat under 10×
      history by tools/plan_audit.py's history-growth probe.

    Nothing existing is ever read on the write path. Replays are no-ops
    via the batch_id guard.

    Two-phase API (VERDICT r11 #4 — overlap index file writes with the
    corpus commit): ``sink.prepare(batch_df, batch_id, ...)`` runs the
    data-file WRITE (the Spark job) and returns a driver-only commit
    thunk, or None for an empty/replayed batch. Until the thunk runs, no
    manifest references the new files — a crash leaves unreferenced
    orphans, exactly like a crash mid-write today. Calling the sink
    directly is prepare-then-commit."""

    def _prepare(
        batch_df: DataFrame,
        batch_id: int,
        *,
        touched_buckets: list[int] | None = None,
    ):
        """``touched_buckets``: the batch's (live-bucket-count) bucket
        ids when the CALLER already computed them (the minhash sink
        derives both its index sinks' touched sets in one combined job —
        VERDICT r10 #6). With the delta layout it serves only as the
        empty-batch short-circuit; bucket clustering happens at
        compaction."""
        try:
            base_manifest = read_manifest(table_dir)
            last = base_manifest.get("batch_id")
            # validate the layout BEFORE writing anything — a commit-time
            # check would already have sprayed this batch's delta files
            # into the foreign table's data directory
            if (
                base_manifest.get("files")
                and not base_manifest.get("parts")
                and not base_manifest.get("delta")
            ):
                raise ValueError(
                    f"{table_dir} has data committed outside the keyed "
                    "layout"
                )
        except FileNotFoundError:
            last = None
        if last is not None and batch_id <= last:
            return None  # replayed batch — already committed
        if touched_buckets is not None and not touched_buckets:
            return None  # caller already knows the batch is empty

        # a few delta files per batch: cap the write width so a wide
        # session doesn't spray tiny files (probes read the WHOLE delta,
        # so clustering buys nothing before compaction)
        spark = batch_df.sparkSession
        width = min(8, int(spark.sparkContext.defaultParallelism))
        fs = fs_for(table_dir)
        fs.makedirs(_manifest_dir(table_dir))
        new_files = _write_data_files(
            batch_df.repartition(width), table_dir
        )
        rows = sum(_parquet_rows(f) for f in new_files)
        if rows == 0:
            # Spark writes one EMPTY part file for an empty DataFrame
            # (schema preservation), so `new_files` alone can't detect
            # emptiness — count footers. Reclaim the junk files and skip
            # the commit so batch_id stays unadvanced (an all-duplicate
            # steady-state stream must not grow the delta list with
            # empty files every probe would have to open).
            for f in new_files:
                fs.remove(f)
            return None
        entry = {"files": new_files, "rows": rows}

        def _commit_entry(_retries: int = 5) -> None:
            # manifest-only: re-reads the base on every (re)try, so a
            # CommitConflict retry reuses the already-written files
            try:
                base_manifest = read_manifest(table_dir)
                last = base_manifest.get("batch_id")
                base_v = base_manifest["version"]
                prev_parts = base_manifest.get("parts", {})
                prev_delta = base_manifest.get("delta", [])
                # live bucket count: rebucketing compaction may have
                # resized the hash index since this closure was built
                nb = int(base_manifest.get("n_buckets", n_buckets))
                if (
                    base_manifest.get("files")
                    and not prev_parts
                    and not prev_delta
                ):
                    raise ValueError(
                        f"{table_dir} has data committed outside the "
                        "keyed layout"
                    )
            except FileNotFoundError:
                last, base_v, prev_parts, prev_delta = None, None, {}, []
                nb = n_buckets
            if last is not None and batch_id <= last:
                return  # committed by a concurrent replay meanwhile
            delta = prev_delta + [entry]
            base_files = [f for p in prev_parts.values() for f in p["files"]]
            files = base_files + [f for d in delta for f in d["files"]]
            rows = sum(int(p["rows"]) for p in prev_parts.values()) + sum(
                int(d["rows"]) for d in delta
            )
            try:
                _commit(
                    table_dir,
                    files,
                    rows,
                    {
                        "op": "keyed",
                        "batch_id": batch_id,
                        "keys": keys,
                        "n_buckets": nb,
                        "mode": "append",
                        "parts": prev_parts,
                        "delta": delta,
                    },
                    base_version=base_v,
                )
            except CommitConflict:
                if _retries <= 0:
                    raise
                _commit_entry(_retries - 1)

        return _commit_entry

    def _sink(
        batch_df: DataFrame,
        batch_id: int,
        *,
        touched_buckets: list[int] | None = None,
    ) -> None:
        commit = _prepare(
            batch_df, batch_id, touched_buckets=touched_buckets
        )
        if commit is not None:
            commit()

    _sink.prepare = _prepare
    return _sink


def read_keyed_buckets(
    spark: SparkSession, table_dir: str, buckets: list[int]
) -> DataFrame | None:
    """Read ONLY the given buckets of a keyed table (None if the table
    has no committed version or those buckets are empty) — the pruned
    probe path: a batch that touches k of n buckets reads k/n of the
    compacted BASE plus the whole append DELTA (bounded by the
    compaction cadence), so probe scan volume stays O(touched ×
    bytes-per-bucket + delta) no matter how large the table grows."""
    try:
        m = read_manifest(table_dir)
    except FileNotFoundError:
        return None
    parts = m.get("parts", {})
    files = [
        f
        for b in buckets
        for f in parts.get(str(b), {}).get("files", [])
    ]
    files += [f for d in m.get("delta", []) for f in d["files"]]
    if not files:
        return None
    return spark.read.parquet(*files)


def live_n_buckets(table_dir: str, default: int) -> int:
    """The CURRENT bucket count of a keyed table — the committed
    manifest's, falling back to ``default`` for a table with no commits
    yet. Every writer and prober must derive bucket ids from THIS (one
    driver-side manifest read), never from a constant: rebucketing
    compaction (VERDICT r11 #1) grows ``n_buckets`` as the table grows,
    and a stale constant would cluster/probe against the wrong
    layout."""
    try:
        return int(read_manifest(table_dir).get("n_buckets", default))
    except FileNotFoundError:
        return default


def compact_keyed_snapshot(
    spark: SparkSession,
    table_dir: str,
    target_file_bytes: int = 256 << 20,
    n_buckets: int | None = None,
) -> int:
    """Compaction for KEYED tables: rewrites the current version into
    bucket-pure files (one job: recompute ``__bucket`` from the keys,
    cluster, write) and commits a manifest that PRESERVES the per-bucket
    parts mapping — plain ``compact_snapshot`` would drop it and break
    later incremental merges (the sink guards against that). Old versions
    keep their files; vacuum reclaims them.

    ``n_buckets`` REBUCKETS the table (hash-index resize — VERDICT r11
    #1): a probe reads ~touched/n_buckets of the table, so O(batch)
    probe cost against ever-growing history holds only while per-bucket
    size stays bounded — the maintenance invariant is to rebucket (e.g.
    ×10 the buckets at ×10 the rows) on the compaction cadence. Safe at
    any point between batches: sinks and probes read the live bucket
    count from the manifest (``live_n_buckets``), never a constant."""
    m = read_manifest(table_dir)
    if not (m.get("parts") or m.get("delta")) or "keys" not in m:
        raise ValueError(
            f"{table_dir} is not a keyed table (no parts mapping or "
            "append delta); use compact_snapshot"
        )
    keys = m["keys"]
    n_buckets = int(n_buckets or m["n_buckets"])
    df = spark.read.parquet(*m["files"]).withColumn(
        "__bucket", F.pmod(F.xxhash64(*keys), F.lit(n_buckets)).cast("int")
    )
    # one output file per bucket unless a bucket exceeds the size target
    df = df.repartition(n_buckets, "__bucket")
    written = _write_bucketed_files(df, table_dir)
    new_parts = {
        bs: {"files": fs, "rows": sum(_parquet_rows(f) for f in fs)}
        for bs, fs in written.items()
    }
    files = [f for p in new_parts.values() for f in p["files"]]
    rows = sum(p["rows"] for p in new_parts.values())
    return _commit(
        table_dir,
        files,
        rows,
        {
            "op": "compact",
            "keys": keys,
            "n_buckets": n_buckets,
            "mode": m.get("mode"),
            "parts": new_parts,
            # delta folded into the base — explicitly cleared
            "delta": [],
        },
        base_version=m["version"],
    )


def delete_keys(
    spark: SparkSession, table_dir: str, keys_df: DataFrame
) -> int:
    """GDPR-style key deletion from a KEYED table: remove every row whose
    key tuple appears in ``keys_df``, rewriting ONLY the buckets those
    keys hash into (partition-incremental copy-on-write, same bucket
    discipline as keyed_batch_sink). Commits a new version with
    op='delete' — prior versions remain time-travelable until
    ``vacuum_snapshots`` reclaims them, which is the actual forget step
    for compliance (delete + vacuum = physically gone).

    Scale: the delete set is usually minuscule next to the table —
    it is hashed to buckets, the untouched buckets' files carry over
    by reference (no IO), and each touched bucket is rewritten via a
    broadcast LEFT ANTI join against the delete set.
    """
    m = read_manifest(table_dir)
    parts = m.get("parts")
    if not parts:
        raise ValueError(
            f"{table_dir} is not a keyed table (no parts mapping)"
        )
    if m.get("delta"):
        # delta files are not bucket-pure; a bucket-scoped rewrite would
        # silently miss keys still sitting in the append delta
        raise ValueError(
            f"{table_dir} has uncompacted append deltas — run "
            "compact_keyed_snapshot before delete_keys"
        )
    keys, n_buckets = m["keys"], m["n_buckets"]
    dels = (
        keys_df.select(*keys)
        .distinct()
        .withColumn(
            "__bucket", F.pmod(F.xxhash64(*keys), F.lit(n_buckets)).cast("int")
        )
        .persist()
    )
    touched = sorted(
        r["__bucket"] for r in dels.select("__bucket").distinct().collect()
    )
    if not touched:
        dels.unpersist()
        return latest_version(table_dir)
    old_files = [
        f
        for b in touched
        for f in parts.get(str(b), {}).get("files", [])
    ]
    new_parts = dict(parts)
    if old_files:
        survivors = (
            spark.read.parquet(*old_files)
            .join(F.broadcast(dels.drop("__bucket")), on=keys, how="left_anti")
            .withColumn(
                "__bucket",
                F.pmod(F.xxhash64(*keys), F.lit(n_buckets)).cast("int"),
            )
            .repartition(len(touched), "__bucket")
        )
        written = _write_bucketed_files(survivors, table_dir)
    else:
        written = {}
    for b in touched:
        bs = str(b)
        fs = written.get(bs, [])
        new_parts[bs] = {
            "files": fs,
            "rows": sum(_parquet_rows(f) for f in fs),
        }
    dels.unpersist()
    files = [f for p in new_parts.values() for f in p["files"]]
    rows = sum(p["rows"] for p in new_parts.values())
    return _commit(
        table_dir,
        files,
        rows,
        {
            "op": "delete",
            "keys": keys,
            "n_buckets": n_buckets,
            "mode": m.get("mode"),
            "parts": new_parts,
        },
        base_version=m["version"],
    )


# ---------------------------------------------------------------------------
# Zone maps — file-level data skipping (the Delta/Iceberg min-max stats
# analogue). A 100 TB table's real partition pruning happens here: the
# manifest carries per-file [min, max] for chosen columns, and a range
# query resolves its file list from the MANIFEST — files whose interval
# can't overlap the predicate are never opened, so selective scans cost
# O(matching files), not O(table). Stats ride the same versioned-manifest
# commit as everything else (snapshot-isolated, time-travelable).
# ---------------------------------------------------------------------------


def _file_zone_maps(files: list[str], columns: list[str]) -> dict:
    """Per-file min/max for ``columns`` from the parquet FOOTERS (row-group
    statistics — no data pages read). Values serialize as strings: ISO
    for timestamps, repr for numerics — comparisons at prune time parse
    back through the same codec so ordering is preserved."""
    import pyarrow.parquet as pq

    out: dict[str, dict] = {}
    for path in files:
        md = pq.ParquetFile(path).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        stats: dict[str, list] = {}
        for col in columns:
            if col not in idx:
                continue
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                s = md.row_group(rg).column(idx[col]).statistics
                if s is None or not s.has_min_max:
                    mins = []  # unknown stats -> no zone map for this file
                    break
                mins.append(s.min)
                maxs.append(s.max)
            if mins:
                stats[col] = [
                    _zm_encode(min(mins)), _zm_encode(max(maxs))
                ]
        out[path] = stats
    return out


def _zm_encode(v):
    import datetime

    if isinstance(v, datetime.datetime):
        # parquet footers hand back tz-aware UTC datetimes (Spark writes
        # isAdjustedToUTC); normalize to UTC-naive so prune-time bounds
        # (session timezone is pinned UTC) compare cleanly
        if v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return {"t": "ts", "v": v.isoformat()}
    if isinstance(v, datetime.date):
        return {"t": "ts", "v": v.isoformat()}
    if isinstance(v, bytes):
        return {"t": "s", "v": v.decode("utf-8", "replace")}
    if isinstance(v, str):
        return {"t": "s", "v": v}
    return {"t": "n", "v": v}


def _zm_decode(e):
    import datetime

    if e["t"] == "ts":
        return datetime.datetime.fromisoformat(e["v"])
    return e["v"]


def attach_zone_maps(table_dir: str, columns: list[str]) -> int:
    """Compute zone maps for the CURRENT version's files and commit them
    as a new version (op: stats — same data files, enriched manifest).
    Incremental by construction: recomputing after an append only needs
    the new files' footers (previous stats are inherited)."""
    while True:
        m = read_manifest(table_dir)
        prev = m.get("zone_maps", {})
        # A file is due when it has no inherited stats OR its inherited
        # stats miss one of the requested columns (ADVICE r4 #3: a call
        # with a different columns list must not leave old files
        # permanently stat-less for the new columns while zone_map_cols
        # claims coverage). Files whose footer genuinely lacks stats for
        # a column get re-probed — footer reads are cheap and bounded.
        todo = [
            f
            for f in m["files"]
            if f not in prev or not set(columns) <= set(prev[f])
        ]
        zone_maps = {**{f: s for f, s in prev.items() if f in set(m["files"])}}
        for f, s in _file_zone_maps(todo, columns).items():
            # merge per-column so a new columns list widens a file's
            # stats instead of dropping its previously-computed columns
            zone_maps[f] = {**zone_maps.get(f, {}), **s}
        extra = {
            "op": "stats",
            "zone_maps": zone_maps,
            "zone_map_cols": sorted(
                set(columns) | set(m.get("zone_map_cols", []))
            ),
        }
        # a stats commit must not clobber the OTHER stats family
        for k in ("bloom_maps", "bloom_cols", "bloom_bits", "bloom_hashes"):
            if k in m:
                extra[k] = m[k]
        try:
            return _commit(
                table_dir,
                m["files"],
                m["rows"],
                extra,
                base_version=m["version"],
            )
        except CommitConflict:
            continue  # footer reads are cheap — recompute on the new base


_BLOOM_BITS = 4096
_BLOOM_HASHES = 5


def _bloom_canonical(value) -> str:
    """One canonical string per NUMERIC value regardless of Python
    spelling: probing an int64 column with ``1.0``, ``numpy.int64(1)``
    or ``Decimal("1")`` must hit the same bit positions as the stored
    ``1`` — otherwise pruning drops files that DO contain the match and
    point reads silently lose rows (bloom pruning must stay cost-only).
    Integral floats/Decimals/numpy scalars collapse to ``str(int(v))``;
    non-integral ones collapse to the float repr; ``bool`` (a Python
    ``int`` subclass, but a distinct parquet type) stays ``True/False``;
    everything else is ``str(value)``."""
    import decimal

    if isinstance(value, bool):
        return str(value)
    if isinstance(value, int):
        return str(value)
    if isinstance(value, float):
        return str(int(value)) if value.is_integer() else repr(value)
    if isinstance(value, decimal.Decimal):
        if value == value.to_integral_value():
            return str(int(value))
        return repr(float(value))
    try:
        import numpy as _np

        if isinstance(value, _np.integer):
            return str(int(value))
        if isinstance(value, _np.floating):
            fv = float(value)
            return str(int(fv)) if fv.is_integer() else repr(fv)
    except ImportError:  # pragma: no cover
        pass
    return str(value)


def _bloom_positions(value, num_bits: int, num_hashes: int) -> list[int]:
    """k md5-derived bit positions for a value's canonical string form.

    Canonicalization is ``_bloom_canonical`` (numeric spellings collapse,
    strings identity) — build and probe sides both go through it, so
    equality of VALUE, not of Python type, determines the positions."""
    import hashlib

    s = _bloom_canonical(value)
    return [
        int(hashlib.md5(f"{i}:{s}".encode()).hexdigest()[:15], 16) % num_bits
        for i in range(num_hashes)
    ]


def attach_bloom_maps(
    table_dir: str,
    columns: list[str],
    num_bits: int = _BLOOM_BITS,
    num_hashes: int = _BLOOM_HASHES,
) -> int:
    """Per-file BLOOM filters for point-lookup file skipping — the data-
    skipping complement to zone maps: min/max is useless for equality
    probes on high-cardinality unsorted keys (every file's range spans
    the domain), while a per-file bloom answers "key definitely not in
    this file" with ~1-in-1e3 false-positive rate at the defaults
    (m=4096, k=5, ≤ a few hundred distinct keys per file). Same parity
    as Delta/Iceberg bloom indexes.

    Incremental like ``attach_zone_maps``: only files lacking a bloom for
    one of the requested columns are scanned (one pyarrow column read
    per file, driver-side — at production scale this would be a Spark
    job writing sidecar files; the manifest stores hex bitmaps, ~1 KiB
    per file per column)."""
    import pyarrow.parquet as _pq

    while True:
        m = read_manifest(table_dir)
        prev = m.get("bloom_maps", {})
        todo = [
            f
            for f in m["files"]
            if f not in prev or not set(columns) <= set(prev[f])
        ]
        blooms = {f: dict(s) for f, s in prev.items() if f in set(m["files"])}
        for f in todo:
            per_col = blooms.get(f, {})
            for col in columns:
                try:
                    vals = _pq.read_table(f, columns=[col]).column(0).to_pylist()
                except Exception:
                    continue  # column absent in this file — no bloom, kept
                bits = 0
                for v in vals:
                    if v is None:
                        continue
                    for p in _bloom_positions(v, num_bits, num_hashes):
                        bits |= 1 << p
                per_col[col] = format(bits, "x")
            blooms[f] = per_col
        extra = {
            "op": "stats",
            "bloom_maps": blooms,
            "bloom_cols": sorted(set(columns) | set(m.get("bloom_cols", []))),
            "bloom_bits": num_bits,
            "bloom_hashes": num_hashes,
        }
        # a stats commit must not clobber the OTHER stats family
        for k in ("zone_maps", "zone_map_cols"):
            if k in m:
                extra[k] = m[k]
        try:
            return _commit(
                table_dir,
                m["files"],
                m["rows"],
                extra,
                base_version=m["version"],
            )
        except CommitConflict:
            continue


def prune_files_bloom(manifest: dict, col: str, value) -> list[str]:
    """Files that might contain rows with ``col == value``. Conservative:
    a file without a bloom for ``col`` is always kept; a file is dropped
    only when at least one of the value's bit positions is unset — the
    bloom's no-false-negative guarantee makes that a proof of absence."""
    bm = manifest.get("bloom_maps", {})
    num_bits = manifest.get("bloom_bits", _BLOOM_BITS)
    num_hashes = manifest.get("bloom_hashes", _BLOOM_HASHES)
    pos = _bloom_positions(value, num_bits, num_hashes)
    keep = []
    for f in manifest["files"]:
        hexmap = bm.get(f, {}).get(col)
        if not hexmap:
            keep.append(f)
            continue
        bits = int(hexmap, 16)
        if all((bits >> p) & 1 for p in pos):
            keep.append(f)
    return keep


def read_snapshot_point(
    spark: SparkSession,
    table_dir: str,
    col: str,
    value,
    version: int | None = None,
) -> DataFrame:
    """Point lookup with bloom file skipping. The equality FILTER still
    applies to surviving files (false positives are pruned by the
    predicate — pruning is cost, correctness is the filter, exactly the
    ``read_snapshot_pruned`` contract), so the result equals
    ``read_snapshot(...).filter(col == value)``."""
    m = read_manifest(table_dir, version)
    files = prune_files_bloom(m, col, value)
    if not files:
        return read_snapshot(spark, table_dir, version).filter(F.lit(False))
    df = spark.read.parquet(*files).filter(F.col(col) == F.lit(value))
    return _apply_deletion_vectors(spark, df, m)


def read_snapshot_points(
    spark: SparkSession,
    table_dir: str,
    col: str,
    values: list,
    version: int | None = None,
) -> DataFrame:
    """Batched point lookups: one scan over the UNION of each value's
    bloom-surviving files + one IN-list filter — the production shape
    for multi-key probes (per-key scans would re-open shared files and
    bloat the plan with unions). Result equals
    ``read_snapshot(...).filter(col.isin(values))``."""
    m = read_manifest(table_dir, version)
    files = sorted(
        {f for v in values for f in prune_files_bloom(m, col, v)}
    )
    if not files:
        return read_snapshot(spark, table_dir, version).filter(F.lit(False))
    df = spark.read.parquet(*files).filter(F.col(col).isin(values))
    return _apply_deletion_vectors(spark, df, m)


def prune_files(manifest: dict, col: str, lo=None, hi=None) -> list[str]:
    """Files that can contain rows with ``lo <= col <= hi`` (either bound
    optional). Conservative: a file without stats for ``col`` is always
    kept; a file is dropped only when its [min, max] interval provably
    misses the predicate range."""
    import datetime

    def _bound(v):
        # Date-typed stats decode to datetime (midnight); a caller's
        # datetime.date bound would hit TypeError on date-vs-datetime
        # comparison (ADVICE r4 #4). Coerce date bounds to midnight —
        # value-identical to how Spark casts the same literal in the
        # residual filter, so pruning stays consistent with the predicate.
        if isinstance(v, datetime.date) and not isinstance(v, datetime.datetime):
            return datetime.datetime(v.year, v.month, v.day)
        return v

    lo, hi = _bound(lo), _bound(hi)
    zm = manifest.get("zone_maps", {})
    keep = []
    for f in manifest["files"]:
        stats = zm.get(f, {}).get(col)
        if not stats:
            keep.append(f)
            continue
        fmin, fmax = _zm_decode(stats[0]), _zm_decode(stats[1])
        if lo is not None and fmax < lo:
            continue
        if hi is not None and fmin > hi:
            continue
        keep.append(f)
    return keep


def read_snapshot_pruned(
    spark: SparkSession,
    table_dir: str,
    col: str,
    lo=None,
    hi=None,
    version: int | None = None,
) -> DataFrame:
    """Range scan with manifest-level file skipping. The range FILTER is
    still applied to the surviving files (pruning is a cost optimization;
    correctness comes from the predicate — exactly Delta's contract), so
    the result equals ``read_snapshot(...).filter(lo <= col <= hi)``."""
    m = read_manifest(table_dir, version)
    files = prune_files(m, col, lo, hi)
    if not files:
        return read_snapshot(spark, table_dir, version).filter(F.lit(False))
    df = spark.read.parquet(*files)
    if lo is not None:
        df = df.filter(F.col(col) >= F.lit(lo))
    if hi is not None:
        df = df.filter(F.col(col) <= F.lit(hi))
    return _apply_deletion_vectors(spark, df, m)


def compact_snapshot_zorder(
    spark: SparkSession,
    table_dir: str,
    zkey,
    n_files: int,
    stats_cols: list[str],
) -> int:
    """OPTIMIZE ZORDER for the manifest layer: rewrite the current
    version's content range-partitioned + sorted by a Morton key
    (``zkey``, from operators/zorder.morton_key) so every data file is a
    small hyper-rectangle in the clustered dimensions, then commit fresh
    zone maps. After this, ``read_snapshot_pruned`` skips files for a
    range predicate on ANY clustered column — the payoff a single-column
    sort layout can only give its leading column. Old versions (and live
    readers) still see the original files: this is a compaction commit
    like any other, snapshot-isolated and time-travelable."""
    m = read_manifest(table_dir)
    if m.get("partition_col"):
        raise ValueError(
            "compact_snapshot_zorder rewrites files without the hive "
            "layout — Z-ORDER a partitioned snapshot per partition"
        )
    cur = _apply_deletion_vectors(spark, spark.read.parquet(*m["files"]), m)
    zdf = (
        cur.withColumn("__z", zkey)
        .repartitionByRange(n_files, F.asc("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
    )
    files = _write_data_files(zdf, table_dir)
    version = _commit(
        table_dir, files, m["rows"], {"op": "optimize-zorder", "dv_files": []},
        base_version=m["version"],
    )
    attach_zone_maps(table_dir, stats_cols)
    return version


# ---------------------------------------------------------------------------
# Deletion vectors: positional soft deletes (Delta DV / Iceberg position-
# delete parity)
# ---------------------------------------------------------------------------
#
# A DELETE that rewrites every touched file is O(touched data); at 100 TB a
# point-ish delete (GDPR erasure, a bad upstream batch) touching 1 row per
# file would rewrite the whole table. Deletion vectors instead record the
# DELETED ROW POSITIONS per data file in small sidecar parquet files
# (``deletes/``, columns ``__dv_file string, __dv_pos long``) and commit a
# new version whose manifest carries the cumulative sidecar list — the data
# files stay byte-identical, so positions are stable and time travel holds.
#
# Read path: every snapshot reader tags rows with the parquet scan's
# ``_metadata.file_path`` + ``_metadata.row_index`` (generated by the scan,
# not stored) and LEFT ANTI joins the sidecars — broadcast when the DV row
# count (from footers, no data read) is small, the overwhelmingly common
# case between compactions. Rewriting commits (overwrite / compact / merge /
# Z-ORDER / purge_deletes) materialize the deletes and clear ``dv_files``;
# non-rewriting commits inherit them (``_commit``), so an append can never
# resurrect deleted rows.


_DV_BROADCAST_MAX_ROWS = 4_000_000


def _strip_file_scheme(col):
    return F.regexp_replace(col, "^file:(//)?", "")


def _apply_deletion_vectors(
    spark: SparkSession, df: DataFrame, manifest: dict
) -> DataFrame:
    """Filter out soft-deleted rows. ``df`` must be a parquet scan over (a
    subset of) the manifest's files — ``_metadata`` is only resolvable on
    the file-source relation. No-op when the version has no DVs."""
    dv_paths = manifest.get("dv_files") or []
    if not dv_paths:
        return df
    dv = spark.read.parquet(*dv_paths).select("__dv_file", "__dv_pos")
    n_dv = sum(_parquet_rows(p) for p in dv_paths)
    if n_dv <= _DV_BROADCAST_MAX_ROWS:
        dv = F.broadcast(dv)
    tagged = df.withColumn(
        "__dv_f", _strip_file_scheme(F.col("_metadata.file_path"))
    ).withColumn("__dv_p", F.col("_metadata.row_index"))
    kept = tagged.join(
        dv,
        (tagged["__dv_f"] == dv["__dv_file"])
        & (tagged["__dv_p"] == dv["__dv_pos"]),
        "left_anti",
    )
    return kept.drop("__dv_f", "__dv_p")


def delete_where(spark: SparkSession, table_dir: str, predicate: str) -> int:
    """``DELETE FROM t WHERE predicate`` via deletion vectors: commit a new
    version that hides the matching rows WITHOUT rewriting any data file.

    - NULL-predicate rows are NOT deleted (``coalesce(pred, false)`` — SQL
      DELETE semantics, same rule as ``replace_where``'s classifier);
    - already-deleted rows are excluded before matching, so overlapping
      predicates never double-count and the manifest ``rows`` stays the
      exact live-row count;
    - a concurrent commit between read and publish raises CommitConflict
      (the positions were derived from a stale file list);
    - matching zero rows commits nothing and returns the current version.

    Plan shape at scale: one predicate-pushed scan emitting only (file,
    pos) for hits — no shuffle, no data rewrite. Sidecars accumulate one
    per DELETE; ``purge_deletes`` (or any compaction) folds them in.
    Zone maps / bloom maps keep their file-level stats over the superset —
    pruning stays conservative, hence cost-only."""
    m = read_manifest(table_dir)
    # tag positions FIRST (``_metadata`` resolves only on the scan), then
    # exclude already-deleted positions, then match the predicate
    tagged = spark.read.parquet(*m["files"]).select(
        "*",
        _strip_file_scheme(F.col("_metadata.file_path")).alias("__f"),
        F.col("_metadata.row_index").alias("__p"),
    )
    old_dv_paths = m.get("dv_files") or []
    if old_dv_paths:
        old = spark.read.parquet(*old_dv_paths)
        if sum(_parquet_rows(p) for p in old_dv_paths) <= _DV_BROADCAST_MAX_ROWS:
            old = F.broadcast(old)
        tagged = tagged.join(
            old,
            (tagged["__f"] == old["__dv_file"])
            & (tagged["__p"] == old["__dv_pos"]),
            "left_anti",
        )
    hits = tagged.filter(
        F.coalesce(F.expr(predicate), F.lit(False))
    ).select(
        F.col("__f").alias("__dv_file"), F.col("__p").alias("__dv_pos")
    )
    dv_files = _write_data_files(hits.coalesce(1), table_dir, subdir="deletes")
    n_deleted = sum(_parquet_rows(p) for p in dv_files)
    if n_deleted == 0:
        fs = fs_for(table_dir)
        for p in dv_files:
            fs.remove(p)
        return m["version"]
    return _commit(
        table_dir,
        m["files"],
        m["rows"] - n_deleted,
        {
            "op": "delete",
            "n_deleted": n_deleted,
            "dv_files": m.get("dv_files", []) + dv_files,
        },
        base_version=m["version"],
    )


def purge_deletes(spark: SparkSession, table_dir: str) -> int:
    """``REORG TABLE ... APPLY (PURGE)`` parity: rewrite ONLY the data
    files that have deletion vectors (untouched files carry over by
    reference — zero data movement for them), commit with ``dv_files``
    cleared. After this the table reads without any anti-join and
    ``replace_where`` is usable again. No-op (current version returned)
    when there are no DVs."""
    m = read_manifest(table_dir)
    dv_paths = m.get("dv_files") or []
    if not dv_paths:
        return m["version"]
    if m.get("partition_col"):
        raise ValueError(
            "purge_deletes rewrites files without the hive layout — on a "
            "partitioned snapshot, re-materialize via replace_partition "
            "of the affected partitions (reads apply DVs either way)"
        )
    dv = spark.read.parquet(*dv_paths)
    affected = {
        r["__dv_file"] for r in dv.select("__dv_file").distinct().collect()
    }
    live_affected = [f for f in m["files"] if f in affected]
    carried = [f for f in m["files"] if f not in affected]
    new_files: list[str] = []
    if live_affected:
        survivors = _apply_deletion_vectors(
            spark, spark.read.parquet(*live_affected), m
        )
        new_files = _write_data_files(survivors, table_dir)
    return _commit(
        table_dir,
        carried + new_files,
        m["rows"],
        {"op": "purge_deletes", "dv_files": []},
        base_version=m["version"],
    )


def dv_stats(table_dir: str, version: int | None = None) -> dict:
    """Deletion-vector bookkeeping for the version: sidecar count, deleted
    row count (from footers — no data read), and affected-file count."""
    m = read_manifest(table_dir, version)
    dv_paths = m.get("dv_files") or []
    return {
        "n_dv_files": len(dv_paths),
        "n_deleted": sum(_parquet_rows(p) for p in dv_paths),
        "live_rows": m["rows"],
    }


# ---------------------------------------------------------------------------
# CHECK constraints (Delta `ALTER TABLE ADD CONSTRAINT` parity)
# ---------------------------------------------------------------------------


class ConstraintViolation(ValueError):
    """A write contained rows violating a table CHECK constraint. Carries
    the per-constraint violation counts in ``.counts``."""

    def __init__(self, table_dir: str, counts: dict[str, int]):
        self.counts = counts
        detail = ", ".join(f"{k}: {v}" for k, v in sorted(counts.items()))
        super().__init__(
            f"{table_dir}: CHECK constraint violation(s) — {detail}"
        )


def add_check_constraint(
    spark: SparkSession, table_dir: str, name: str, expr: str
) -> int:
    """Register a CHECK constraint (a SQL boolean expression over the
    table's columns). The EXISTING content must already satisfy it —
    validated in one scan before the commit (Delta's ADD CONSTRAINT
    contract); every subsequent append / merge / replace_where validates
    against it. Constraints live in the manifest and inherit across
    commits like ``dv_files`` (``_commit``), so a compaction can't drop
    them."""
    m = read_manifest(table_dir)
    constraints = dict(m.get("constraints") or {})
    constraints[name] = expr
    existing = _apply_deletion_vectors(
        spark, spark.read.parquet(*m["files"]), m
    )
    counts = constraint_report(existing, {name: expr})
    bad = {k: v for k, v in counts.items() if v}
    if bad:
        raise ConstraintViolation(table_dir, bad)
    return _commit(
        table_dir,
        m["files"],
        m["rows"],
        {"op": "add_constraint", "constraints": constraints},
        base_version=m["version"],
    )


def constraint_report(df: DataFrame, constraints: dict[str, str]) -> dict:
    """Violation count per constraint, ONE aggregation pass over ``df``
    (each constraint folds to ``sum((expr) IS NOT TRUE)`` — NULL-evaluating
    rows violate, matching SQL CHECK semantics where a constraint must be
    TRUE, and one job covers any number of constraints)."""
    if not constraints:
        return {}
    aggs = [
        F.sum(
            F.when(F.expr(expr).eqNullSafe(F.lit(True)), 0).otherwise(1)
        ).alias(name)
        for name, expr in constraints.items()
    ]
    row = df.agg(*aggs).collect()[0]
    return {name: int(row[name] or 0) for name in constraints}


def _validate_constraints(df: DataFrame, manifest: dict, table_dir: str):
    checks = dict(manifest.get("constraints") or {})
    # generated columns validate as null-safe-equality CHECKs wherever the
    # writer supplies the column (a writer may not contradict the
    # definition — Delta's generated-column contract); absent columns are
    # materialized by the append path before this runs
    for name, expr in (manifest.get("generated") or {}).items():
        checks[f"generated:{name}"] = f"{name} <=> ({expr})"
    checks = {
        k: v
        for k, v in checks.items()
        if not k.startswith("generated:")
        or k[len("generated:"):] in df.columns
    }
    counts = constraint_report(df, checks)
    bad = {k: v for k, v in counts.items() if v}
    if bad:
        raise ConstraintViolation(table_dir, bad)


def _materialize_generated(df: DataFrame, manifest: dict) -> DataFrame:
    """Compute any declared generated column the writer did not supply
    (Delta materializes generated columns at write time)."""
    for name, expr in (manifest.get("generated") or {}).items():
        if name not in df.columns:
            df = df.withColumn(name, F.expr(expr))
    return df


def _apply_generated(df: DataFrame, manifest: dict) -> DataFrame:
    """Read-side completion: files written BEFORE a column's declaration
    lack it (surface as NULL under mergeSchema) — compute those from the
    definition so readers always see the column populated."""
    for name, expr in (manifest.get("generated") or {}).items():
        if name in df.columns:
            df = df.withColumn(
                name, F.coalesce(F.col(name), F.expr(expr))
            )
        else:
            df = df.withColumn(name, F.expr(expr))
    return df


def add_generated_column(
    spark: SparkSession, table_dir: str, name: str, expr: str
) -> int:
    """Declare a GENERATED column ``name AS (expr)`` (Delta generated
    columns — the derived-date-partition pattern, e.g. ``event_date AS
    date_format(ts, 'yyyy-MM-dd')``). Semantics:

    - future appends that OMIT the column get it materialized at write;
    - appends/merges that SUPPLY it are validated (null-safe equality)
      and raise ConstraintViolation on contradiction;
    - files committed before the declaration are completed at READ time
      (``read_snapshot`` computes the column where it is missing/NULL);
    - if the current content already carries the column, it must agree
      with the definition — validated in one scan before the commit.

    Definitions live in the manifest and inherit across commits like
    CHECK constraints."""
    m = read_manifest(table_dir)
    gen = dict(m.get("generated") or {})
    gen[name] = expr
    existing = _apply_deletion_vectors(
        spark, spark.read.parquet(*m["files"]), m
    )
    if name in existing.columns:
        counts = constraint_report(
            existing, {f"generated:{name}": f"{name} <=> ({expr})"}
        )
        bad = {k: v for k, v in counts.items() if v}
        if bad:
            raise ConstraintViolation(table_dir, bad)
    return _commit(
        table_dir,
        m["files"],
        m["rows"],
        {"op": "add_generated_column", "generated": gen},
        base_version=m["version"],
    )


# ---------------------------------------------------------------------------
# Hive-partitioned snapshots: manifest-level partition pruning
# ---------------------------------------------------------------------------
#
# Partition pruning is THE primitive that keeps a 100 TB scan from reading
# 100 TB: files land under ``data/<col>=<value>/`` and the manifest records
# each file's partition value, so a partition-filtered read resolves to a
# file-list subset BEFORE Spark plans anything (the same listing-free
# partition pruning Delta/Iceberg do from their metadata). Reads pass
# ``basePath`` so Spark reconstructs the partition column from the path.


def _write_partitioned_files(
    df: DataFrame, table_dir: str, part_col: str
) -> dict[str, str]:
    """Write df hive-partitioned under data/<part_col>=<value>/; returns
    {file_path: partition_value_string}."""
    fs = fs_for(table_dir)
    staging = os.path.join(table_dir, f"_staging-{uuid.uuid4().hex[:12]}")
    df.write.mode("overwrite").partitionBy(part_col).parquet(staging)
    out: dict[str, str] = {}
    for sub in fs.listdir(staging):
        if not sub.startswith(f"{part_col}="):
            continue
        value = sub.split("=", 1)[1]
        dst_dir = os.path.join(table_dir, "data", sub)
        fs.makedirs(dst_dir)
        for name in fs.listdir(os.path.join(staging, sub)):
            if name.endswith(".parquet"):
                dst = os.path.join(
                    dst_dir, f"{uuid.uuid4().hex[:8]}-{name}"
                )
                fs.rename(os.path.join(staging, sub, name), dst)
                out[dst] = value
    fs.rmtree(staging)
    return out


def write_snapshot_partitioned(
    df: DataFrame, table_dir: str, part_col: str
) -> int:
    """Create (or fully replace) a hive-partitioned snapshot. The
    manifest records ``partition_col`` and per-file partition values, so
    ``read_snapshot_partitions`` prunes at the manifest — no directory
    listing, no footer reads for skipped partitions."""
    fs_for(table_dir).makedirs(_manifest_dir(table_dir))
    parts = _write_partitioned_files(df, table_dir, part_col)
    spark = df.sparkSession
    files = sorted(parts)
    n = _count_files_rows(spark, files)
    return _commit(
        table_dir,
        files,
        n,
        {
            "op": "overwrite",
            "dv_files": [],
            "partition_col": part_col,
            "partitions": parts,
        },
    )


def append_snapshot_partitioned(
    df: DataFrame, table_dir: str, extra: dict | None = None
) -> int:
    """Append to a partitioned snapshot, preserving the hive layout and
    extending the manifest's per-file partition map (CHECK constraints
    validate first, like every append)."""
    m = read_manifest(table_dir)
    part_col = m.get("partition_col")
    if not part_col:
        raise ValueError(f"{table_dir} is not a partitioned snapshot")
    _validate_constraints(df, m, table_dir)
    parts = _write_partitioned_files(df, table_dir, part_col)
    spark = df.sparkSession
    n_new = spark.read.parquet(*sorted(parts)).count() if parts else 0
    while True:
        prev = read_manifest(table_dir)
        commit_extra = {
            "op": "append",
            "partitions": {**prev.get("partitions", {}), **parts},
            **(extra or {}),
        }
        if prev.get("partition_specs") is not None:
            # evolved table: new files belong to the CURRENT spec
            commit_extra["partition_specs"] = {
                **prev["partition_specs"],
                **{f: part_col for f in parts},
            }
        try:
            return _commit(
                table_dir,
                prev["files"] + sorted(parts),
                prev["rows"] + n_new,
                commit_extra,
                base_version=prev["version"],
            )
        except CommitConflict:
            continue


def prune_files_partitions(manifest: dict, values: list) -> list[str]:
    """Manifest-level partition pruning: the file subset whose partition
    value is in ``values`` (stringified — hive dir names are strings)."""
    wanted = {str(v) for v in values}
    pm = manifest.get("partitions", {})
    return [f for f in manifest["files"] if pm.get(f) in wanted]


def read_snapshot_partitions(
    spark: SparkSession,
    table_dir: str,
    values: list,
    version: int | None = None,
) -> DataFrame:
    """Partition-pruned read: only the manifest files for ``values`` are
    planned (``basePath`` reconstructs the partition column). Equals
    ``read_snapshot(...).filter(col.isin(values))`` — pruning is free,
    correctness doesn't depend on it. Deletion vectors apply as on any
    read."""
    m = read_manifest(table_dir, version)
    part_col = m.get("partition_col")
    if not part_col:
        raise ValueError(f"{table_dir} is not a partitioned snapshot")
    files = prune_files_partitions(m, values)
    base = os.path.join(table_dir, "data")
    if not files:
        return (
            spark.read.option("basePath", base)
            .parquet(*m["files"])
            .filter(F.lit(False))
        )
    df = spark.read.option("basePath", base).parquet(*files)
    return _apply_deletion_vectors(spark, df, m)


def read_snapshot_partitioned(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame:
    """Full read of a partitioned snapshot (partition column included)."""
    m = read_manifest(table_dir, version)
    if not m.get("partition_col"):
        raise ValueError(f"{table_dir} is not a partitioned snapshot")
    if m.get("partition_specs"):
        return read_snapshot_evolved(spark, table_dir, version)
    df = spark.read.option(
        "basePath", os.path.join(table_dir, "data")
    ).parquet(*m["files"])
    return _apply_deletion_vectors(spark, df, m)


# ---------------------------------------------------------------------------
# Partition-spec evolution (Iceberg v2 semantics, identity transforms)
# ---------------------------------------------------------------------------


def evolve_partition_spec(table_dir: str, new_part_col: str) -> int:
    """Iceberg-style partition evolution: change the partition column for
    FUTURE writes without rewriting a single existing file. The manifest
    gains ``partition_specs`` — {file: the spec column it was written
    under} — so every file keeps its own layout (Iceberg's per-manifest
    spec-id, flattened to per-file here). Appends after evolution write
    hive dirs under the NEW column; reads union the spec groups (each
    group reconstructs its own partition column from its paths — the
    other spec's column is an ordinary data column in those files);
    pruning on column X skips, at the manifest, exactly the files whose
    spec IS X — files under another spec cannot be manifest-pruned for X
    and are post-filtered, precisely Iceberg's behavior (old files rely
    on metrics/zone maps until rewritten)."""
    while True:
        m = read_manifest(table_dir)
        old = m.get("partition_col")
        if not old:
            raise ValueError(f"{table_dir} is not a partitioned snapshot")
        if new_part_col == old:
            raise ValueError(
                f"partition spec is already ({new_part_col})"
            )
        specs = m.get("partition_specs") or {f: old for f in m["files"]}
        try:
            return _commit(
                table_dir,
                m["files"],
                m["rows"],
                {
                    "op": "evolve-spec",
                    "partition_col": new_part_col,
                    "partitions": m.get("partitions", {}),
                    "partition_specs": specs,
                },
                base_version=m["version"],
            )
        except CommitConflict:
            continue


def _spec_groups(m: dict) -> dict[str, list[str]]:
    specs = m.get("partition_specs") or {
        f: m["partition_col"] for f in m["files"]
    }
    groups: dict[str, list[str]] = {}
    for f in m["files"]:
        groups.setdefault(specs.get(f, m["partition_col"]), []).append(f)
    return groups


def _read_spec_groups(
    spark: SparkSession, m: dict, table_dir: str, groups: dict
) -> DataFrame:
    """Union the per-spec file groups into one full-schema DataFrame.
    Each group is read with ``basePath`` so Spark reconstructs THAT
    group's partition column from its hive paths; the union aligns by
    name with the first group's types (a hive-reconstructed column can
    infer a different-but-castable type than its data-column twin)."""
    base = os.path.join(table_dir, "data")
    dfs = [
        spark.read.option("basePath", base).parquet(*sorted(files))
        for files in groups.values()
    ]
    cols = sorted(dfs[0].columns)
    types = dict(dfs[0].dtypes)
    for d in dfs[1:]:
        if sorted(d.columns) != cols:
            raise ValueError(
                "spec groups disagree on the logical schema: "
                f"{cols} vs {sorted(d.columns)}"
            )
    out = dfs[0].select(*cols)
    for d in dfs[1:]:
        out = out.unionByName(
            d.select(*[F.col(c).cast(types[c]).alias(c) for c in cols])
        )
    return _apply_deletion_vectors(spark, out, m)


def read_snapshot_evolved(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame:
    """Full read across every partition spec the table has lived under."""
    m = read_manifest(table_dir, version)
    if not m.get("partition_col"):
        raise ValueError(f"{table_dir} is not a partitioned snapshot")
    return _read_spec_groups(spark, m, table_dir, _spec_groups(m))


def spec_prune_report(
    table_dir: str, col: str, values: list, version: int | None = None
) -> dict:
    """Manifest-level pruning decision for a predicate ``col IN values``
    over an evolved table: files whose spec is ``col`` prune by their
    recorded partition value; files under any other spec prune by their
    ZONE-MAP stats when ``attach_zone_maps(table_dir, [col])`` has run
    (the predicate column is an ordinary DATA column in other-spec
    files, so footer min/max exist — exactly Iceberg's metrics pruning
    for pre-evolution files) and must scan otherwise. Returned lists let
    callers (and the gate) assert pruning actually skipped files."""
    m = read_manifest(table_dir, version)
    wanted = {str(v) for v in values}
    pm = m.get("partitions", {})
    zm = m.get("zone_maps", {})
    groups = _spec_groups(m)
    kept, skipped, scanned, skipped_stats = [], [], [], []
    for spec, files in groups.items():
        for f in files:
            if spec == col:
                pv = pm.get(f)
                if pv is None:
                    # partitions-map invariant violated (no recorded
                    # value for a same-spec file): NEVER classify as
                    # prunable — route to the post-filtered scan list
                    # so no row can be silently dropped (ADVICE r8).
                    scanned.append(f)
                elif pv in wanted:
                    kept.append(f)
                else:
                    skipped.append(f)
                continue
            stats = zm.get(f, {}).get(col)
            if stats:
                fmin, fmax = _zm_decode(stats[0]), _zm_decode(stats[1])
                if not any(fmin <= v <= fmax for v in values):
                    skipped_stats.append(f)
                    continue
            scanned.append(f)
    return {
        "kept": sorted(kept),
        "skipped": sorted(skipped),
        "skipped_by_stats": sorted(skipped_stats),
        "scanned_other_spec": sorted(scanned),
    }


def read_snapshot_evolved_partitions(
    spark: SparkSession,
    table_dir: str,
    col: str,
    values: list,
    version: int | None = None,
) -> DataFrame:
    """Partition-pruned read over an evolved table: equals
    ``read_snapshot_evolved(...).filter(col.isin(values))`` — manifest
    pruning removes only same-spec files, so correctness never depends
    on which spec a row was written under."""
    m = read_manifest(table_dir, version)
    rep = spec_prune_report(table_dir, col, values, version)
    files = set(rep["kept"]) | set(rep["scanned_other_spec"])
    groups = {
        spec: [f for f in fs if f in files]
        for spec, fs in _spec_groups(m).items()
    }
    groups = {s: fs for s, fs in groups.items() if fs}
    if not groups:
        return read_snapshot_evolved(spark, table_dir, version).filter(
            F.lit(False)
        )
    df = _read_spec_groups(spark, m, table_dir, groups)
    return df.filter(F.col(col).isin(values))


def replace_partition(df: DataFrame, table_dir: str, value) -> int:
    """Atomically replace ONE partition's content (the ``INSERT
    OVERWRITE PARTITION`` / replaceWhere-on-partition idiom — recompute
    day X without touching the rest): files of ``value`` drop from the
    manifest (still referenced by old versions — time travel holds), the
    new rows land under the partition dir, everything else carries over
    by reference. Inserted rows must all belong to ``value`` — validated
    before commit. CHECK constraints validate like every write."""
    m = read_manifest(table_dir)
    part_col = m.get("partition_col")
    if not part_col:
        raise ValueError(f"{table_dir} is not a partitioned snapshot")
    if m.get("dv_files"):
        raise ValueError(
            "replace_partition on a table with deletion vectors: run "
            "purge_deletes(...) first"
        )
    if len(set((m.get("partition_specs") or {}).values())) > 1:
        raise ValueError(
            "replace_partition on a spec-evolved table with files under "
            "multiple specs: rewrite to one spec first (partition "
            "identity is ambiguous across specs)"
        )
    _validate_constraints(df, m, table_dir)
    spark = df.sparkSession
    n_bad = df.filter(
        f"(CAST({part_col} AS STRING) = '{value}') IS NOT TRUE"
    ).count()
    if n_bad:
        raise ValueError(
            f"replace_partition: {n_bad} row(s) outside partition "
            f"{part_col}={value}"
        )
    old_pm = m.get("partitions", {})
    dropped = [f for f in m["files"] if old_pm.get(f) == str(value)]
    n_dropped = (
        spark.read.parquet(*dropped).count() if dropped else 0
    )
    kept = [f for f in m["files"] if old_pm.get(f) != str(value)]
    parts = _write_partitioned_files(df, table_dir, part_col)
    n_new = spark.read.parquet(*sorted(parts)).count() if parts else 0
    return _commit(
        table_dir,
        kept + sorted(parts),
        m["rows"] - n_dropped + n_new,
        {
            "op": "replace_partition",
            "partitions": {
                **{f: v for f, v in old_pm.items() if f in set(kept)},
                **parts,
            },
        },
        base_version=m["version"],
    )


def compact_partition(
    spark: SparkSession,
    table_dir: str,
    value,
    target_file_bytes: int = 256 << 20,
) -> int:
    """Compact ONE partition of a hive-partitioned snapshot (the
    per-partition OPTIMIZE the table-level ``compact_snapshot`` guard
    points at): the partition's files rewrite into ~target-sized files
    under the same ``<col>=<value>/`` dir, deletion vectors touching
    those files materialize away, everything else carries over by
    reference. Old versions keep the original files — time travel
    holds."""
    m = read_manifest(table_dir)
    part_col = m.get("partition_col")
    if not part_col:
        raise ValueError(f"{table_dir} is not a partitioned snapshot")
    if len(set((m.get("partition_specs") or {}).values())) > 1:
        raise ValueError(
            "compact_partition on a spec-evolved table with files under "
            "multiple specs: partition identity is ambiguous across "
            "specs — compact per spec group after a rewrite"
        )
    pm = m.get("partitions", {})
    target = [f for f in m["files"] if pm.get(f) == str(value)]
    if not target:
        return m["version"]
    kept = [f for f in m["files"] if pm.get(f) != str(value)]
    fs = fs_for(table_dir)
    size = sum(fs.getsize(f) for f in target)
    n_files = max(1, -(-size // target_file_bytes))
    base = os.path.join(table_dir, "data")
    df = _apply_deletion_vectors(
        spark,
        spark.read.option("basePath", base).parquet(*target),
        m,
    ).repartition(n_files)
    parts = _write_partitioned_files(df, table_dir, part_col)
    n_new = spark.read.parquet(*sorted(parts)).count() if parts else 0
    if m.get("dv_files"):
        # DVs on the compacted partition are materialized into the
        # rewrite; DVs on kept files must survive, and the live-row
        # count re-derives from the kept side's DV view + the new files
        kept_live = (
            _apply_deletion_vectors(
                spark,
                spark.read.option("basePath", base).parquet(*kept),
                m,
            ).count()
            if kept
            else 0
        )
        # DVs referencing the compacted partition are materialized; DVs
        # on kept files must survive
        dv = spark.read.parquet(*m["dv_files"])
        remaining = dv.filter(F.col("__dv_file").isin(kept))
        dv_files = []
        if remaining.limit(1).count():
            dv_files = _write_data_files(
                remaining.coalesce(1), table_dir, subdir="deletes"
            )
        n_rows = kept_live + n_new
    else:
        dv_files = []
        n_rows = m["rows"]
    return _commit(
        table_dir,
        kept + sorted(parts),
        n_rows,
        {
            "op": "compact_partition",
            "dv_files": dv_files,
            "partitions": {
                **{f: v for f, v in pm.items() if f in set(kept)},
                **parts,
            },
        },
        base_version=m["version"],
    )


def delete_matching(
    spark: SparkSession,
    table_dir: str,
    keys: DataFrame,
    key_cols: list[str],
) -> int:
    """``DELETE FROM t WHERE (k1, …) IN (SELECT … FROM keys)`` via
    deletion vectors — the GDPR-erasure shape: the kill list arrives as a
    DATAFRAME (a right-to-be-forgotten feed, a revoked-consent table) and
    deletes resolve through one SEMI JOIN, never an IN-list predicate
    string. Same invariants as ``delete_where``: positions of live rows
    only (no double-counting), sidecar parquet, no data rewrite,
    CommitConflict on a stale base, no-op on zero matches. At scale the
    semi join broadcasts the (small) kill list under the predicate-pushed
    scan."""
    m = read_manifest(table_dir)
    tagged = spark.read.parquet(*m["files"]).select(
        "*",
        _strip_file_scheme(F.col("_metadata.file_path")).alias("__f"),
        F.col("_metadata.row_index").alias("__p"),
    )
    old_dv_paths = m.get("dv_files") or []
    if old_dv_paths:
        old = spark.read.parquet(*old_dv_paths)
        if sum(_parquet_rows(p) for p in old_dv_paths) <= _DV_BROADCAST_MAX_ROWS:
            old = F.broadcast(old)
        tagged = tagged.join(
            old,
            (tagged["__f"] == old["__dv_file"])
            & (tagged["__p"] == old["__dv_pos"]),
            "left_anti",
        )
    hits = tagged.join(
        keys.select(*key_cols).distinct(), key_cols, "left_semi"
    ).select(
        F.col("__f").alias("__dv_file"), F.col("__p").alias("__dv_pos")
    )
    dv_files = _write_data_files(hits.coalesce(1), table_dir, subdir="deletes")
    n_deleted = sum(_parquet_rows(p) for p in dv_files)
    if n_deleted == 0:
        fs = fs_for(table_dir)
        for p in dv_files:
            fs.remove(p)
        return m["version"]
    return _commit(
        table_dir,
        m["files"],
        m["rows"] - n_deleted,
        {
            "op": "delete",
            "n_deleted": n_deleted,
            "dv_files": m.get("dv_files", []) + dv_files,
        },
        base_version=m["version"],
    )


# ---------------------------------------------------------------------------
# Schema evolution + incremental (logged-style) change data feed
# ---------------------------------------------------------------------------


def _split_top_level(s: str) -> list[str]:
    """Split a simpleString field list on ',' at bracket depth 0 only, so
    types like ``decimal(18,6)`` / ``map<string,int>`` / nested structs
    survive intact."""
    if not s:
        return []
    parts, depth, start = [], 0, 0
    for i, ch in enumerate(s):
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(s[start:i])
            start = i + 1
    parts.append(s[start:])
    return parts


def _merged_schema_ddl(prev_ddl: str | None, df: DataFrame) -> str:
    """Union of the previous schema and the appended DataFrame's schema
    (append-with-new-columns = Delta ``mergeSchema`` evolution; the old
    files simply lack the new column and read as NULL). Column ORDER is
    previous-first so the history reads as 'column X appeared at v'."""
    new = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    if not prev_ddl:
        return df.schema.simpleString()
    # simpleString format: struct<a:bigint,b:string,...>. Field TYPES may
    # themselves contain commas — decimal(18,6), map<string,int>, nested
    # struct<...> — so split on ',' only at bracket/paren depth 0.
    inner = prev_ddl[len("struct<"):-1]
    prev_fields = []
    for part in _split_top_level(inner):
        name, typ = part.split(":", 1)
        prev_fields.append((name, typ))
    prev_names = {n for n, _ in prev_fields}
    merged = prev_fields + [
        (n, t) for n, t in new.items() if n not in prev_names
    ]
    return "struct<" + ",".join(f"{n}:{t}" for n, t in merged) + ">"


def schema_history(table_dir: str) -> list[dict]:
    """(version, op, schema) for every retained version — when did each
    column appear. Manifest-only (no data read)."""
    out = []
    for h in history(table_dir):
        m = read_manifest(table_dir, h["version"])
        out.append(
            {
                "version": m["version"],
                "op": m.get("op"),
                "schema": m.get("schema"),
            }
        )
    return out


def snapshot_changes_incremental(
    spark: SparkSession,
    table_dir: str,
    from_version: int,
    to_version: int | None = None,
) -> DataFrame:
    """Row-level change feed from MANIFEST DELTAS — the logged-CDF shape
    (Delta CHANGE DATA FEED): reads ONLY the data that changed, never the
    two full versions ``snapshot_changes`` joins.

    Per commit v in (from, to]:
    - files added at v (op append/ingest) → their rows as ``insert``;
    - DV sidecars added at v → the deleted rows' preimages as ``delete``
      (read from ONLY the files the sidecar references — the sidecar is
      collected driver-side, file-count-bounded, to prune the scan);
    - rewrite commits (overwrite / compact / merge / purge / zorder)
      change files without changing logical content attribution → raise,
      directing callers to the join-based ``snapshot_changes`` for those
      ranges (Delta's CDF has the same split: it logs change files only
      for DML, and reconstructs rewrites differently).

    Returns the data columns + ``_change_type`` + ``_commit_version``.
    Scale: cost is O(appended bytes + deleted rows' files), independent
    of table size — the property that makes CDC consumers cheap."""
    to_version = (
        to_version if to_version is not None else latest_version(table_dir)
    )
    if to_version is None or from_version > to_version:
        raise ValueError("empty or invalid version range")
    parts: list[DataFrame] = []
    for v in range(from_version + 1, to_version + 1):
        m = read_manifest(table_dir, v)
        # from_version=0 = "since before the table existed": the base is
        # the empty manifest, so v1's files all read as inserts
        prev = (
            read_manifest(table_dir, v - 1)
            if v > 1
            else {"files": [], "dv_files": []}
        )
        prev_files = set(prev["files"])
        prev_dvs = set(prev.get("dv_files") or [])
        added_files = [f for f in m["files"] if f not in prev_files]
        removed_files = [f for f in prev["files"] if f not in set(m["files"])]
        added_dvs = [
            d for d in (m.get("dv_files") or []) if d not in prev_dvs
        ]
        removed_dvs = prev_dvs - set(m.get("dv_files") or [])
        # removed files = rewrite; removed DVs = rows resurrected (RESTORE)
        # — neither is attributable from deltas alone
        if removed_files or removed_dvs:
            raise ValueError(
                f"version {v} ({m.get('op')}) rewrites files or restores "
                f"deleted rows — change attribution needs the join-based "
                f"snapshot_changes for this range"
            )
        if added_files:
            ins = spark.read.parquet(*added_files)
            parts.append(
                ins.withColumn("_change_type", F.lit("insert")).withColumn(
                    "_commit_version", F.lit(v).cast("long")
                )
            )
        if added_dvs:
            dv = spark.read.parquet(*added_dvs).select(
                "__dv_file", "__dv_pos"
            )
            touched = sorted(
                r["__dv_file"]
                for r in dv.select("__dv_file").distinct().collect()
            )
            src = spark.read.parquet(*touched).select(
                "*",
                _strip_file_scheme(F.col("_metadata.file_path")).alias(
                    "__f"
                ),
                F.col("_metadata.row_index").alias("__p"),
            )
            dels = (
                src.join(
                    dv,
                    (src["__f"] == dv["__dv_file"])
                    & (src["__p"] == dv["__dv_pos"]),
                )
                .drop("__f", "__p", "__dv_file", "__dv_pos")
                .withColumn("_change_type", F.lit("delete"))
                .withColumn("_commit_version", F.lit(v).cast("long"))
            )
            parts.append(dels)
    if not parts:
        return (
            read_snapshot(spark, table_dir, to_version)
            .withColumn("_change_type", F.lit("insert"))
            .withColumn("_commit_version", F.lit(0).cast("long"))
            .limit(0)
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p, allowMissingColumns=True)
    return out


def consume_table_feed(
    spark: SparkSession,
    src_table: str,
    sink_table: str,
    transform=None,
) -> int | None:
    """One poll of a snapshot table AS A STREAMING SOURCE — the Delta
    "stream from a table via Change Data Feed" shape: read the
    incremental change feed since the last consumed source version,
    apply ``transform`` (default: pass the change rows through), append
    the result to ``sink_table`` with the consumed high-water version as
    the batch_id.

    Exactly-once without a side cursor file: the cursor IS the sink
    manifest's ``batch_id`` (the Kafka-offsets-live-in-the-checkpoint
    pattern) — a crash between sink commit and anything else replays the
    poll, the batch_id guard sees ``to_version <= batch_id``, and the
    replay commits nothing. Returns the newly consumed source version,
    or None when there was nothing new.

    Scale: each poll costs O(changed data) via
    ``snapshot_changes_incremental`` — a consumer of a 100 TB table pays
    for its deltas only."""
    latest_src = latest_version(src_table)
    if latest_src is None:
        return None
    cursor = 0
    try:
        cursor = read_manifest(sink_table).get("batch_id") or 0
    except FileNotFoundError:
        pass
    if latest_src <= cursor:
        return None  # nothing new (or a replayed poll) — no-op
    feed = snapshot_changes_incremental(spark, src_table, cursor, latest_src)
    out = transform(feed) if transform is not None else feed
    extra = {"batch_id": latest_src}
    if latest_version(sink_table) is None:
        write_snapshot(out, sink_table, extra)
    else:
        append_snapshot(out, sink_table, extra)
    return latest_src
