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
- **Atomic commit**: the manifest is written to a temp name and renamed;
  `_latest` is a one-line pointer file renamed over atomically (POSIX /
  HDFS rename semantics; on S3-like stores use a conditional-put catalog —
  same protocol, different pointer swap).

At 100 TB the manifest lists O(file count) entries — keep files ~256 MB+
via `target_file_bytes` and the list stays in the low millions, read once
per query plan (exactly the Delta/Iceberg trade).
"""

from __future__ import annotations

import json
import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession


def _manifest_dir(table_dir: str) -> str:
    return os.path.join(table_dir, "_manifests")


def _manifest_path(table_dir: str, version: int) -> str:
    return os.path.join(_manifest_dir(table_dir), f"v{version:05d}.json")


def _atomic_write(path: str, content: str) -> None:
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path))
    with os.fdopen(fd, "w") as f:
        f.write(content)
    os.rename(tmp, path)


def latest_version(table_dir: str) -> int | None:
    p = os.path.join(_manifest_dir(table_dir), "_latest")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return int(f.read().strip())


def _commit(
    table_dir: str,
    files: list[str],
    n_rows: int,
    extra: dict | None = None,
) -> int:
    version = (latest_version(table_dir) or 0) + 1
    manifest = {"version": version, "files": sorted(files), "rows": n_rows}
    if extra:
        manifest.update(extra)
    _atomic_write(_manifest_path(table_dir, version), json.dumps(manifest))
    _atomic_write(
        os.path.join(_manifest_dir(table_dir), "_latest"), str(version)
    )
    return version


def _write_data_files(df: DataFrame, table_dir: str) -> list[str]:
    """Write df as new immutable files under data/ (staging dir + move —
    Spark owns the file layout inside the staging write)."""
    staging = os.path.join(table_dir, f"_staging-{uuid.uuid4().hex[:12]}")
    df.write.mode("overwrite").parquet(staging)
    data_dir = os.path.join(table_dir, "data")
    os.makedirs(data_dir, exist_ok=True)
    moved = []
    for name in os.listdir(staging):
        if name.endswith(".parquet"):
            dst = os.path.join(data_dir, f"{uuid.uuid4().hex[:8]}-{name}")
            os.rename(os.path.join(staging, name), dst)
            moved.append(dst)
    # best-effort cleanup of the _SUCCESS marker etc.
    for name in os.listdir(staging):
        os.remove(os.path.join(staging, name))
    os.rmdir(staging)
    return moved


def write_snapshot(
    df: DataFrame, table_dir: str, extra: dict | None = None
) -> int:
    """Create version 1 (or fully replace content as a new version)."""
    os.makedirs(_manifest_dir(table_dir), exist_ok=True)
    files = _write_data_files(df, table_dir)
    spark = df.sparkSession
    n = spark.read.parquet(*files).count() if files else 0
    return _commit(table_dir, files, n, extra)


def append_snapshot(
    df: DataFrame, table_dir: str, extra: dict | None = None
) -> int:
    """Append rows as a new version: previous files + new files."""
    prev = read_manifest(table_dir)
    files = _write_data_files(df, table_dir)
    spark = df.sparkSession
    n_new = spark.read.parquet(*files).count() if files else 0
    return _commit(table_dir, prev["files"] + files, prev["rows"] + n_new, extra)


def read_manifest(table_dir: str, version: int | None = None) -> dict:
    v = version if version is not None else latest_version(table_dir)
    if v is None:
        raise FileNotFoundError(f"no committed version in {table_dir}")
    with open(_manifest_path(table_dir, v)) as f:
        return json.load(f)


def read_snapshot(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame:
    """The table exactly as of ``version`` (default: latest committed)."""
    m = read_manifest(table_dir, version)
    if not m["files"]:
        raise FileNotFoundError(f"version {m['version']} has no files")
    return spark.read.parquet(*m["files"])


def compact_snapshot(
    spark: SparkSession, table_dir: str, target_file_bytes: int = 256 << 20
) -> int:
    """Rewrite the CURRENT version into ~target-sized files and commit as a
    new version. Old versions keep their original files — live readers and
    time travel are unaffected (files are only ever added, never mutated;
    a vacuum step for expired versions is deliberately separate)."""
    m = read_manifest(table_dir)
    size = sum(os.path.getsize(f) for f in m["files"])
    n_files = max(1, -(-size // target_file_bytes))
    df = spark.read.parquet(*m["files"]).repartition(n_files)
    files = _write_data_files(df, table_dir)
    return _commit(table_dir, files, m["rows"])


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

    target = read_snapshot(spark, table_dir)
    merged = merge_upsert(target, source, keys)
    files = _write_data_files(merged, table_dir)
    n = spark.read.parquet(*files).count() if files else 0
    return _commit(table_dir, files, n)


def vacuum_snapshots(table_dir: str, keep_last: int = 1) -> list[str]:
    """Delete data files referenced ONLY by expired versions (older than
    the ``keep_last`` most recent), and their manifests. The separate,
    explicitly-invoked destructive step — commits/compactions never delete
    anything, so a reader holding any retained version is never broken.
    Returns the deleted file paths."""
    latest = latest_version(table_dir)
    if latest is None:
        return []
    keep = set(range(max(1, latest - keep_last + 1), latest + 1))
    live_files: set[str] = set()
    for v in keep:
        live_files.update(read_manifest(table_dir, v)["files"])
    deleted = []
    for v in range(1, latest + 1):
        if v in keep:
            continue
        m = read_manifest(table_dir, v)
        for f in m["files"]:
            if f not in live_files and os.path.exists(f):
                os.remove(f)
                deleted.append(f)
        os.remove(_manifest_path(table_dir, v))
    return deleted
