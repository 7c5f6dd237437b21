"""Custom Python data source (Spark 4 DataSource API) — the extensibility
path for sources Spark has no built-in reader for (internal services,
bespoke binary formats, synthetic generators).

``SyntheticDocsDataSource`` generates a seeded document corpus directly in
executors: the driver plans one ``InputPartition`` per slice and each
executor materializes only its slice — generation parallelizes like a
scan (no driver materialization, no single-node bottleneck), which is the
pattern any custom source should follow at scale.

Usage:
    spark.dataSource.register(SyntheticDocsDataSource)
    df = (spark.read.format("synthetic_docs")
          .option("n_docs", 1000).option("seed", 7)
          .option("partitions", 8).load())
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

_WORDS = (
    "the quick brown fox jumps over lazy dog data spark stream engine "
    "query parquet shuffle join window state corpus token chunk model"
).split()

SCHEMA_DDL = "doc_id bigint, text string, n_tokens int"


class _SliceParts(InputPartition):
    def __init__(self, start: int, end: int, seed: int) -> None:
        self.start, self.end, self.seed = start, end, seed


class _SyntheticDocsReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict) -> None:
        self.n_docs = int(options.get("n_docs", 100))
        self.seed = int(options.get("seed", 42))
        self.n_parts = max(1, int(options.get("partitions", 4)))

    def partitions(self) -> list[InputPartition]:
        step = -(-self.n_docs // self.n_parts)
        return [
            _SliceParts(lo, min(lo + step, self.n_docs), self.seed)
            for lo in range(0, self.n_docs, step)
        ]

    def read(self, partition: _SliceParts):
        import random

        for doc_id in range(partition.start, partition.end):
            # per-doc RNG keyed by (seed, doc_id): rows are reproducible
            # regardless of partitioning
            rng = random.Random((partition.seed << 32) | doc_id)
            n = rng.randint(5, 60)
            words = [_WORDS[rng.randrange(len(_WORDS))] for _ in range(n)]
            yield (doc_id, " ".join(words), n)


class SyntheticDocsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return SCHEMA_DDL

    def reader(self, schema: StructType) -> DataSourceReader:
        return _SyntheticDocsReader(schema, self.options)


# ---------------------------------------------------------------------------
# Streaming flavor: Spark 4 SimpleDataSourceStreamReader — the extensibility
# path for streaming ingest Spark has no built-in source for (REST polling,
# message buses without connectors, synthetic load). Offsets are explicit
# and checkpointable: each micro-batch reads [start, end) and Spark replays
# the range on recovery, so the source is exactly-once end-to-end when the
# generator is offset-deterministic (this one is: rows are a pure function
# of position).
# ---------------------------------------------------------------------------

STREAM_SCHEMA_DDL = "event_id bigint, user_id bigint, value double"


class _SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict) -> None:
        self.rows_per_batch = int(options.get("rows_per_batch", 100))
        self.max_rows = int(options.get("max_rows", 1000))
        self.seed = int(options.get("seed", 42))

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def _rows(self, start: int, end: int):
        import random

        out = []
        for i in range(start, end):
            rng = random.Random((self.seed << 32) | i)
            out.append((i, rng.randrange(100), round(rng.random() * 100, 4)))
        return out

    def read(self, start: dict):
        pos = start["pos"]
        if pos >= self.max_rows:
            # caught up: empty batch, offset unchanged → availableNow stops
            return iter([]), {"pos": pos}
        end = min(pos + self.rows_per_batch, self.max_rows)
        return iter(self._rows(pos, end)), {"pos": end}

    def readBetweenOffsets(self, start: dict, end: dict):
        # recovery replay: deterministic regeneration of the exact range
        return iter(self._rows(start["pos"], end["pos"]))

    def commit(self, end: dict) -> None:
        pass


class SyntheticEventsStreamDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_events_stream"

    def schema(self) -> str:
        return STREAM_SCHEMA_DDL

    def simpleStreamReader(
        self, schema: StructType
    ) -> SimpleDataSourceStreamReader:
        return _SyntheticEventsStreamReader(self.options)


# ---------------------------------------------------------------------------
# Snapshot-table streaming source: stream a manifest-versioned table
# (sources/snapshots.py) incrementally — each micro-batch is the data files
# ADDED by newly committed versions. The Delta streaming-source analogue
# for the manifest layer, built on the full DataSourceStreamReader API so
# file reads happen in EXECUTORS (one InputPartition per new file), not on
# the driver: at 100 TB a micro-batch fans out like any parquet scan.
#
# Semantics (mirrors Delta's source):
# - version offsets are checkpointable dicts {"version": N}; recovery
#   replays exactly the files of versions (start, end];
# - 'overwrite' (initial) and 'append' commits stream their new files;
# - 'compact' commits are data-neutral and are skipped (no duplicates);
# - 'merge'/'keyed' commits REWRITE data in place — not representable as
#   an append stream, so the source fails fast unless
#   .option("ignore_changes", "true") is set (Delta: ignoreChanges).
#   For keyed tables, the change-feed path (snapshot_changes) is the
#   correct streaming surface.
#
# Usage:
#     spark.dataSource.register(SnapshotStreamDataSource)
#     (spark.readStream.format("snapshot_stream")
#          .option("table_dir", path).load()
#          .writeStream...)
# ---------------------------------------------------------------------------


class _SnapshotFilePart(InputPartition):
    def __init__(self, path: str, columns: list[str]) -> None:
        self.path, self.columns = path, columns


_ARROW_TO_DDL = {
    "int64": "bigint",
    "int32": "int",
    "int16": "smallint",
    "int8": "tinyint",
    "double": "double",
    "float": "float",
    "string": "string",
    "large_string": "string",
    "bool": "boolean",
    "date32[day]": "date",
    "binary": "binary",
}


def _snapshot_schema_ddl(table_dir: str) -> str:
    """Infer a DDL schema from the latest manifest's first data file."""
    import pyarrow.parquet as pq

    from m13_sparkstreaming_python_azure_spark.sources.snapshots import (
        read_manifest,
    )

    files = read_manifest(table_dir)["files"]
    if not files:
        raise ValueError(f"snapshot table {table_dir} has no data files yet")
    schema = pq.read_schema(files[0])
    cols = []
    for field in schema:
        t = str(field.type)
        if t.startswith("timestamp"):
            ddl = "timestamp"
        elif t.startswith("decimal"):
            ddl = t  # decimal(p,s) DDL matches arrow's repr
        else:
            ddl = _ARROW_TO_DDL.get(t)
        if ddl is None:
            raise ValueError(
                f"cannot map arrow type {t} of column {field.name}; pass "
                ".schema(...) explicitly"
            )
        cols.append(f"{field.name} {ddl}")
    return ", ".join(cols)


class _SnapshotStreamReader(DataSourceStreamReader):
    def __init__(self, schema: StructType, options: dict) -> None:
        self.table_dir = options.get("table_dir") or options.get("path")
        if not self.table_dir:
            raise ValueError("snapshot_stream requires .option('table_dir', ...)")
        self.ignore_changes = (
            str(options.get("ignore_changes", "false")).lower() == "true"
        )
        self.columns = [f.name for f in schema.fields]

    def initialOffset(self) -> dict:
        return {"version": 0}

    def latestOffset(self) -> dict:
        from m13_sparkstreaming_python_azure_spark.sources.snapshots import (
            latest_version,
        )

        return {"version": latest_version(self.table_dir) or 0}

    def _new_files(self, start_v: int, end_v: int) -> list[str]:
        from m13_sparkstreaming_python_azure_spark.sources.snapshots import (
            read_manifest,
        )

        out: list[str] = []
        prev_files: set[str] | None = None
        for v in range(start_v + 1, end_v + 1):
            m = read_manifest(self.table_dir, v)
            op = m.get("op", "append")
            if op == "compact":
                prev_files = set(m["files"])
                continue
            if op in ("merge", "keyed") and v > 1:
                if not self.ignore_changes:
                    raise ValueError(
                        f"version {v} is a '{op}' commit (in-place rewrite); "
                        "an append stream cannot represent it. Set "
                        ".option('ignore_changes','true') to skip such "
                        "commits, or stream snapshot_changes instead."
                    )
                prev_files = set(m["files"])
                continue
            if prev_files is None:
                prev_files = (
                    set(read_manifest(self.table_dir, v - 1)["files"])
                    if v > 1
                    else set()
                )
            cur = m["files"]
            out.extend(f for f in cur if f not in prev_files)
            prev_files = set(cur)
        return out

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        files = self._new_files(start["version"], end["version"])
        return [_SnapshotFilePart(f, self.columns) for f in files] or [
            _SnapshotFilePart("", self.columns)
        ]

    def read(self, partition: _SnapshotFilePart):
        if not partition.path:
            return
        import pyarrow.parquet as pq

        table = pq.read_table(partition.path, columns=partition.columns)
        for batch in table.to_batches():
            cols = [batch.column(i).to_pylist() for i in range(batch.num_columns)]
            yield from zip(*cols)

    def commit(self, end: dict) -> None:
        pass


class SnapshotStreamDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "snapshot_stream"

    def schema(self) -> str:
        table_dir = self.options.get("table_dir") or self.options.get("path")
        if not table_dir:
            raise ValueError("snapshot_stream requires .option('table_dir', ...)")
        return _snapshot_schema_ddl(table_dir)

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        return _SnapshotStreamReader(schema, self.options)
