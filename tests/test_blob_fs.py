"""The snapshot commit protocol against a REAL HTTP blob endpoint
(VERDICT r6 #4): every seam operation crosses a socket to an in-process
server speaking Azure-Blob REST semantics — conditional create via
``If-None-Match: *`` (412 → FileExistsError), whole-blob atomic PUT,
server-side copy instead of rename, flat-namespace prefix listing.
Mirrors tests/test_fs_seam.py's memory-FS suite, plus the blob-specific
divergences (copy+delete rename, implicit directories, 412 CAS races
over real HTTP)."""

from __future__ import annotations

import threading

import pytest

from m13_sparkstreaming_python_azure_spark.sources import snapshots as snap
from m13_sparkstreaming_python_azure_spark.sources.blobstore import (
    BlobStoreServer,
    HttpBlobSnapshotFS,
)
from m13_sparkstreaming_python_azure_spark.sources.fs import (
    fs_for,
    register_fs,
)


@pytest.fixture()
def blobfs():
    server = BlobStoreServer()
    fs = HttpBlobSnapshotFS(server.endpoint)
    register_fs("azb", fs)
    yield fs
    server.close()


def test_blob_rest_semantics(blobfs):
    """The raw verb surface: conditional put, overwrite, 404s, listing."""
    blobfs.write_exclusive("azb://c/k1", "v1")
    with pytest.raises(FileExistsError):
        blobfs.write_exclusive("azb://c/k1", "v2")  # 412 BlobAlreadyExists
    assert blobfs.read_text("azb://c/k1") == "v1"
    blobfs.write_atomic("azb://c/k1", "v3")  # unconditional = overwrite
    assert blobfs.read_text("azb://c/k1") == "v3"
    assert blobfs.getsize("azb://c/k1") == 2
    with pytest.raises(FileNotFoundError):
        blobfs.read_text("azb://c/missing")
    with pytest.raises(FileNotFoundError):
        blobfs.remove("azb://c/missing")
    # implicit directories: exists == non-empty prefix
    blobfs.write_atomic("azb://c/dir/a/x.json", "{}")
    assert blobfs.exists("azb://c/dir") and blobfs.exists("azb://c/dir/a")
    assert blobfs.listdir("azb://c/dir") == ["a"]
    assert blobfs.listdir("azb://c") == ["dir", "k1"]


def test_blob_rename_is_copy_then_delete(blobfs):
    blobfs.write_atomic("azb://c/src", "payload")
    blobfs.rename("azb://c/src", "azb://c/dst")
    assert blobfs.read_text("azb://c/dst") == "payload"
    assert not blobfs.exists("azb://c/src")
    with pytest.raises(FileNotFoundError):
        blobfs.rename("azb://c/nope", "azb://c/other")


def test_commit_protocol_on_blob_store(blobfs):
    table = "azb://warehouse/tbl"
    assert fs_for(table) is blobfs
    assert snap.latest_version(table) is None
    v1 = snap._commit(
        table, ["azb://warehouse/tbl/data/a.parquet"], 10, {"op": "overwrite"}
    )
    v2 = snap._commit(
        table,
        [
            "azb://warehouse/tbl/data/a.parquet",
            "azb://warehouse/tbl/data/b.parquet",
        ],
        25,
        {"op": "append", "batch_id": 7},
    )
    assert (v1, v2) == (1, 2)
    assert snap.latest_version(table) == 2
    m = snap.read_manifest(table)
    assert m["rows"] == 25 and m["batch_id"] == 7
    v3 = snap._commit(table, m["files"], 25, {"op": "compact"})
    assert snap.read_manifest(table, v3)["batch_id"] == 7
    assert snap.read_manifest(table, 1)["rows"] == 10
    assert [h["version"] for h in snap.history(table)] == [1, 2, 3]


def test_writer_writer_conflict_over_real_http(blobfs):
    """Two committers race the SAME version number over real sockets;
    the conditional put must serialize them onto distinct versions."""
    table = "azb://warehouse/race"
    snap._commit(table, ["azb://f0"], 1, {"op": "overwrite"})
    barrier = threading.Barrier(2)
    results = []

    def committer(tag):
        barrier.wait()
        results.append(snap._commit(table, [f"azb://{tag}"], 1, {"op": tag}))

    ts = [threading.Thread(target=committer, args=(t,)) for t in ("a", "b")]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert sorted(results) == [2, 3]
    ops = {snap.read_manifest(table, v)["op"] for v in (2, 3)}
    assert ops == {"a", "b"}


def test_conditional_put_race_many_writers(blobfs):
    """N threads all conditional-put the SAME key: exactly one 201, the
    rest 412 — the property the whole commit protocol rests on."""
    wins, losses = [], []
    barrier = threading.Barrier(8)

    def claim(i):
        barrier.wait()
        try:
            blobfs.write_exclusive("azb://c/claim", f"writer-{i}")
            wins.append(i)
        except FileExistsError:
            losses.append(i)

    ts = [threading.Thread(target=claim, args=(i,)) for i in range(8)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert len(wins) == 1 and len(losses) == 7
    assert blobfs.read_text("azb://c/claim") == f"writer-{wins[0]}"


def test_vacuum_on_blob_store(blobfs):
    table = "azb://warehouse/vac"
    old_file = "azb://warehouse/vac/data/old.parquet"
    new_file = "azb://warehouse/vac/data/new.parquet"
    blobfs.write_atomic(old_file, "x" * 8)
    blobfs.write_atomic(new_file, "y" * 8)
    snap._commit(table, [old_file], 1, {"op": "overwrite"})
    snap._commit(table, [new_file], 1, {"op": "overwrite"})
    deleted = snap.vacuum_snapshots(table, keep_last=1)
    assert deleted == [old_file]
    assert not blobfs.exists(old_file)
    assert blobfs.exists(new_file)
    assert snap.vacuum_snapshots(table, keep_last=1) == []


def test_blob_rmtree_and_reuse(blobfs):
    for i in range(5):
        blobfs.write_atomic(f"azb://c/tree/sub/{i}.json", "{}")
    blobfs.write_atomic("azb://c/keep.txt", "k")
    blobfs.rmtree("azb://c/tree")
    assert not blobfs.exists("azb://c/tree")
    assert blobfs.listdir("azb://c") == ["keep.txt"]
    # a fresh table can be created where one was removed
    blobfs.write_exclusive("azb://c/tree/sub/0.json", "new")
    assert blobfs.read_text("azb://c/tree/sub/0.json") == "new"
