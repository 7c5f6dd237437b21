"""Incremental replay harness — file-arrival stream simulator.

Re-engineering of the reference's uploader (``upload.py:80-106``): walk a
date-partitioned dataset, re-emit one day-partition at a time into a target
directory (with an optional delay), stamping each batch with a
``processed_date``. In the reference this targeted ADLS Gen2; here the
target is any Spark-writable path — tests use local tmp dirs.

This is a *test/ingest harness*, not an engine operator (SURVEY.md §2.1
S8): the per-day loop is inherently driver-side sequencing. Each day's
read→stamp→write runs distributed.
"""

from __future__ import annotations

import datetime as dt
import os
import re
import time
from collections.abc import Iterator, Sequence

from pyspark.sql import DataFrame, SparkSession

from m13_sparkstreaming_python_azure_spark.sources.files import (
    stamp_processed_date,
    write_parquet,
)

_PART_RE = re.compile(r"(\w+)=([^/]+)")


def discover_day_partitions(root: str) -> list[tuple[dt.date, str]]:
    """Find ``year=/month=/day=`` leaf dirs under ``root``, sorted by date
    (the os.walk + sort of upload.py:86-98)."""
    out: list[tuple[dt.date, str]] = []
    for dirpath, dirnames, filenames in os.walk(root):
        parts = dict(_PART_RE.findall(dirpath.replace(os.sep, "/")))
        if {"year", "month", "day"} <= parts.keys() and filenames:
            out.append(
                (
                    dt.date(
                        int(parts["year"]), int(parts["month"]), int(parts["day"])
                    ),
                    dirpath,
                )
            )
    out.sort(key=lambda x: x[0])
    return out


def replay_partitions(
    spark: SparkSession,
    source_root: str,
    target_root: str,
    delay_seconds: float = 0.0,
    limit: int | None = None,
) -> Iterator[tuple[dt.date, str]]:
    """Upload one day-partition per cycle (upload.py:100-106 pattern).

    Yields after each day so callers (tests) can interleave stream triggers
    with arrivals. ``delay_seconds=1`` reproduces the reference's
    ``CYCLES_DELAY_TIME`` cadence (upload.py:8).
    """
    days = discover_day_partitions(source_root)
    if limit is not None:
        days = days[:limit]
    for day, src in days:
        df = spark.read.parquet(src)
        stamped = stamp_processed_date(
            df, when=dt.datetime(day.year, day.month, day.day)
        )
        dst = os.path.join(
            target_root, f"year={day.year}", f"month={day.month:02d}", f"day={day.day:02d}"
        )
        write_parquet(stamped, dst)
        yield day, dst
        if delay_seconds:
            time.sleep(delay_seconds)


def publish_chunk(df: DataFrame, land: str) -> str:
    """Atomically publish one replay chunk into a live streaming landing dir.

    ``df.write.mode("append").parquet(land)`` into a directory a running
    file-source stream is polling is RACY: the micro-batch engine lists on
    its own thread and can observe a half-committed multi-file write,
    splitting one chunk across two micro-batches out of event-time order —
    which breaks operators whose contract is "batch boundaries respect
    event-time order" (order-dependent EWMA, sessionization, watermark
    late-drop). Fix: stage the chunk as a SINGLE parquet file in a sibling
    temp dir, then ``os.rename`` that one file into the landing dir. A
    single-file rename is atomic on a local FS, so any directory listing
    sees the whole chunk or none of it. Chunks here are toy-scale replay
    slices, so the 1-file repartition is free; at production scale the
    equivalent is a commit-protocol/manifest source (sources/snapshots.py).
    """
    import shutil
    import uuid

    os.makedirs(land, exist_ok=True)
    parent = os.path.dirname(land.rstrip(os.sep)) or "."
    stage = os.path.join(parent, f"_stage-{uuid.uuid4().hex[:12]}")
    try:
        # repartition(1), NOT coalesce(1): coalesce folds the plan into
        # one task that keeps the child's preferred locations — for a
        # createDataFrame LocalTableScan (every sentinel batch) that is
        # PROCESS_LOCAL on the driver, and under the default 3 s
        # spark.locality.wait the task sits out the full timeout before
        # any executor may take it (+3 s per sentinel publish, measured
        # r10). The 1-row shuffle repartition introduces costs ~ nothing
        # at replay-chunk scale and has no locality preference.
        df.repartition(1).write.mode("overwrite").parquet(stage)
        parts = sorted(
            f for f in os.listdir(stage)
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        )
        assert len(parts) == 1, f"expected one staged part file, got {parts}"
        final = os.path.join(land, f"chunk-{uuid.uuid4().hex[:12]}.parquet")
        os.rename(os.path.join(stage, parts[0]), final)
    finally:
        shutil.rmtree(stage, ignore_errors=True)
    return final


def replay_dataframe_by_key(
    df: DataFrame,
    key_values: Sequence,
    key_col: str,
    target_root: str,
) -> Iterator[str]:
    """Replay an in-memory DataFrame as arriving files, one slice per key
    value (e.g. one file per event date) — used to stream the ``events``
    fixture through the pipeline."""
    from pyspark.sql import functions as F

    for i, kv in enumerate(key_values):
        dst = os.path.join(target_root, f"batch={i:05d}")
        df.filter(F.col(key_col) == kv).write.mode("overwrite").parquet(dst)
        yield dst
