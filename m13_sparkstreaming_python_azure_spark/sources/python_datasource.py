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
