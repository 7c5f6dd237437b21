"""Event-driven file discovery (sources/fileevents): exactly-once
consumption across restarts, concurrent publisher serialization, and
the no-listing cost invariant."""

from __future__ import annotations

import os
import tempfile
import threading

from m13_sparkstreaming_python_azure_spark.sources.fileevents import (
    EventDrivenLister,
    FileEventLog,
    notify_write,
)


def _setup():
    root = tempfile.mkdtemp(prefix="fev-")
    log = FileEventLog(os.path.join(root, "log"))
    lister = EventDrivenLister(log, os.path.join(root, "cursor.json"))
    return root, log, lister


def test_poll_exactly_once_across_restarts():
    root, log, lister = _setup()
    log.publish(["/a/1.parquet", "/a/2.parquet"])
    log.publish(["/a/3.parquet"])
    assert lister.poll() == ["/a/1.parquet", "/a/2.parquet", "/a/3.parquet"]
    assert lister.poll() == []
    # a fresh lister instance with the same cursor path resumes, not replays
    lister2 = EventDrivenLister(log, lister.cursor_path)
    log.publish(["/a/4.parquet"])
    assert lister2.poll() == ["/a/4.parquet"]
    assert lister2.last_event_count == 1  # O(new events), not O(history)


def test_concurrent_publishers_serialize():
    root, log, _ = _setup()
    barrier = threading.Barrier(4)

    def pub(i):
        barrier.wait()
        log.publish([f"/w{i}.parquet"])

    ts = [threading.Thread(target=pub, args=(i,)) for i in range(4)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    payloads, cur = log.read_from(0)
    assert cur == 4  # four distinct consecutive sequence numbers
    assert sorted(f for p in payloads for f in p) == [
        f"/w{i}.parquet" for i in range(4)
    ]


def test_unannounced_files_are_invisible(spark):
    root, log, lister = _setup()
    data = os.path.join(root, "data")
    df = spark.createDataFrame([(1, "x")], "id long, s string")
    announced = notify_write(df, data, log)
    # a second writer drops a file with no event
    df.write.mode("append").parquet(data)
    got = lister.poll()
    assert sorted(got) == sorted(announced)
    assert lister.poll() == []


def test_notify_write_lands_then_announces(spark):
    root, log, lister = _setup()
    data = os.path.join(root, "data")
    df = spark.createDataFrame([(i, float(i)) for i in range(100)], "id long, v double")
    paths = notify_write(df, data, log)
    assert paths and all(os.path.exists(p) for p in paths)
    polled = lister.poll()
    assert sorted(polled) == sorted(paths)
    assert spark.read.parquet(*polled).count() == 100
