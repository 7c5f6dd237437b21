"""Multi-table atomic commit groups — cross-table transactions over the
snapshot layer.

Single-table formats (Delta's log, this repo's manifests) give snapshot
isolation PER TABLE: a reader joining orders@latest with lineitem@latest
can still observe a TORN pair when a pipeline publishes the two tables
one after the other. A commit GROUP fixes that the same way the table
layer fixed files: one more level of versioned manifest. A group
directory carries group manifests, each pinning {member table → table
version}; the group ``_latest`` pointer swaps atomically, so a reader
resolving the group sees all-old or all-new pins — never a mix.

Protocol (the table layer's CAS discipline, one level up):

1. PREPARE: writers publish each member table's new version with the
   ordinary snapshot ops (write/append/merge — data files and table
   manifests land first). These versions are INVISIBLE to group readers:
   group readers never consult member tables' own ``_latest``.
2. COMMIT: ``group_commit`` claims group version G+1 by exclusive create
   (O_CREAT|O_EXCL locally, If-None-Match:* on a blob store) with the
   pinned map, then swaps the group ``_latest``. A writer crash between
   prepare and commit leaves the prepared table versions unreferenced —
   harmless garbage for vacuum, exactly like data files that lose a
   manifest race.

Reads: ``read_group`` resolves pins (latest or time-traveled);
``read_group_table`` opens one member AS OF its pinned version through
the ordinary versioned reader, so deletion vectors / generated columns /
partition specs all apply as usual.

Iceberg's catalog-level multi-table transactions (REST catalog
``commitTransaction``) are the production analogue; Delta has no
equivalent — cross-table consistency is this layer's reason to exist.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession

from m13_sparkstreaming_python_azure_spark.sources.fs import fs_for
from m13_sparkstreaming_python_azure_spark.sources.snapshots import (
    latest_version,
    read_snapshot,
)


def _group_manifest_path(group_dir: str, version: int) -> str:
    return os.path.join(group_dir, f"g{version:05d}.json")


def _latest_path(group_dir: str) -> str:
    return os.path.join(group_dir, "_latest")


def latest_group_version(group_dir: str) -> int | None:
    fs = fs_for(group_dir)
    p = _latest_path(group_dir)
    if not fs.exists(p):
        return None
    return int(fs.read_text(p).strip())


def _max_manifest_version(group_dir: str) -> int | None:
    """Highest g<N>.json that EXISTS, from a directory listing — may be
    ahead of ``_latest`` when a committer crashed after the exclusive
    create but before the pointer swap (an orphaned-but-durable commit
    record)."""
    fs = fs_for(group_dir)
    best = None
    for name in fs.listdir(group_dir):
        if name.startswith("g") and name.endswith(".json"):
            try:
                v = int(name[1:-5])
            except ValueError:
                continue
            if best is None or v > best:
                best = v
    return best


def group_commit(
    group_dir: str,
    pins: dict[str, int] | None = None,
    tables: list[str] | None = None,
    op: str = "txn",
) -> int:
    """Publish one consistent cut across member tables.

    ``pins`` maps table_dir → the PREPARED table version this group
    commit makes visible. Convenience: pass ``tables`` instead to pin
    each at its CURRENT latest version (the common publish-what-I-just-
    wrote case — callers that need stricter control pass explicit pins).
    Tables absent from this commit inherit their previous pins, so a
    transaction touching 2 of 5 tables re-pins only those 2."""
    if (pins is None) == (tables is None):
        raise ValueError("pass exactly one of pins / tables")
    if pins is None:
        pins = {}
        for t in tables:
            v = latest_version(t)
            if v is None:
                raise ValueError(f"{t} has no committed version to pin")
            pins[t] = v
    fs = fs_for(group_dir)
    fs.makedirs(group_dir)
    while True:
        # derive the predecessor from the DIRECTORY LISTING, not from
        # ``_latest``: a committer that crashed between the exclusive
        # create of g<N>.json and the pointer swap leaves _latest at
        # N-1 forever — recomputing from _latest alone would retry the
        # taken number in a livelock. The orphan's manifest is durable
        # (its exclusive create succeeded = its commit claim), so the
        # successor ADOPTS it: inherit its pins and commit as N+1; the
        # monotonic pointer swap below then publishes both at once —
        # the standard CAS "helping" pattern.
        prev_v = _max_manifest_version(group_dir)
        prev_pins = {}
        if prev_v is not None:
            prev_pins = read_group(group_dir, prev_v)["pins"]
        version = (prev_v or 0) + 1
        manifest = {
            "version": version,
            "op": op,
            "pins": {**prev_pins, **pins},
            "committed_at": time.time(),
        }
        try:
            fs.write_exclusive(
                _group_manifest_path(group_dir, version),
                json.dumps(manifest),
            )
        except FileExistsError:
            continue  # another group committer claimed this number
        # monotonic pointer swap (same rule as the table layer)
        cur = latest_group_version(group_dir)
        if cur is None or cur < version:
            fs.write_atomic(_latest_path(group_dir), str(version))
        return version


def read_group(group_dir: str, version: int | None = None) -> dict:
    v = version if version is not None else latest_group_version(group_dir)
    if v is None:
        raise FileNotFoundError(f"no group commits in {group_dir}")
    return json.loads(
        fs_for(group_dir).read_text(_group_manifest_path(group_dir, v))
    )


def group_history(group_dir: str) -> list[dict]:
    out = []
    v = latest_group_version(group_dir) or 0
    for i in range(1, v + 1):
        m = read_group(group_dir, i)
        out.append(
            {"version": m["version"], "op": m.get("op"), "pins": m["pins"]}
        )
    return out


def read_group_table(
    spark: SparkSession,
    group_dir: str,
    table_dir: str,
    version: int | None = None,
) -> DataFrame:
    """Read one member table AS OF the group's pinned version — the only
    sanctioned way to read a grouped table (reading its own ``_latest``
    would reintroduce the torn-pair window the group exists to close)."""
    pins = read_group(group_dir, version)["pins"]
    if table_dir not in pins:
        raise KeyError(f"{table_dir} is not pinned by group {group_dir}")
    return read_snapshot(spark, table_dir, version=pins[table_dir])
