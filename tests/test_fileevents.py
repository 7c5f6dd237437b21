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


def test_peek_ack_two_phase_redelivery():
    """ADVICE r3 #2: crash between delivery and ingest-commit must NOT
    lose the announced files. peek() is repeatable; only ack() advances
    the durable cursor, so a restart before ack re-delivers."""
    root, log, lister = _setup()
    log.publish(["/a/1.parquet"])
    assert lister.peek() == ["/a/1.parquet"]
    assert lister.peek() == ["/a/1.parquet"]  # repeatable pre-ack
    # simulated crash before ack: a fresh lister on the same cursor path
    crashed = EventDrivenLister(log, lister.cursor_path)
    assert crashed.peek() == ["/a/1.parquet"]  # redelivered, not lost
    crashed.ack()
    assert crashed.peek() == []
    assert lister.poll() == []  # cursor is shared + durable
    # ack with nothing pending is a no-op
    crashed.ack()
    assert crashed.peek() == []


def test_crash_between_commit_and_ack_does_not_duplicate(spark, tmp_path):
    """ADVICE r4 #1: a crash AFTER the snapshot commit but BEFORE
    lister.ack() redelivers the same files on restart; the ingest's
    batch_id guard must skip the duplicate commit (but still ack) —
    exactly-once end-to-end, not just at-least-once."""
    from m13_sparkstreaming_python_azure_spark.sources.fileindex import (
        incremental_snapshot_ingest,
    )
    from m13_sparkstreaming_python_azure_spark.sources.snapshots import (
        latest_version,
        read_snapshot,
    )

    root, log, lister = _setup()
    data = os.path.join(root, "data")
    table = str(tmp_path / "tbl")
    df = spark.createDataFrame([(i, float(i)) for i in range(50)], "id long, v double")
    notify_write(df, data, log)

    # batch 0 commits, then "crash": ack never runs
    class CrashAfterCommit:
        """Lister proxy whose ack raises — simulates dying in the gap."""

        def peek(self):
            return lister.peek()

        def ack(self):
            raise RuntimeError("crash before ack")

    try:
        incremental_snapshot_ingest(spark, CrashAfterCommit(), table, batch_id=0)
    except RuntimeError:
        pass
    assert latest_version(table) == 1
    assert read_snapshot(spark, table).count() == 50

    # restart: same files redelivered with the SAME batch_id → no second
    # commit, no duplicate rows, and the cursor advances (ack happens)
    restarted = EventDrivenLister(log, lister.cursor_path)
    assert restarted.peek()  # redelivery confirmed
    assert incremental_snapshot_ingest(spark, restarted, table, batch_id=0) is None
    assert latest_version(table) == 1
    assert read_snapshot(spark, table).count() == 50
    assert restarted.peek() == []  # guard still acked the redelivery

    # a genuinely NEW batch after recovery commits normally
    df2 = spark.createDataFrame([(i, 0.0) for i in range(100, 110)], "id long, v double")
    notify_write(df2, data, log)
    assert incremental_snapshot_ingest(spark, restarted, table, batch_id=1) == 2
    assert read_snapshot(spark, table).count() == 60


def test_read_from_stops_at_partial_record():
    """ADVICE r3 #3: a claimed-but-incomplete record (possible on a
    backend whose conditional put is not content-atomic) must stall the
    reader AT that seq — no crash, no skipping ahead of an in-flight
    earlier publish — and consumption resumes once the payload lands."""
    root, log, lister = _setup()
    log.publish(["/a/1.parquet"])
    # seq 1 claimed but payload torn; seq 2 complete and already visible
    with open(os.path.join(log.log_dir, "ev-00000001.json"), "w") as f:
        f.write('{"files": [')
    log.publish(["/a/3.parquet"])  # takes seq 2
    assert lister.peek() == ["/a/1.parquet"]  # stops before seq 1
    lister.ack()
    # the slow publisher finishes seq 1 → order restored, nothing skipped
    os.unlink(os.path.join(log.log_dir, "ev-00000001.json"))
    with open(os.path.join(log.log_dir, "ev-00000001.json"), "w") as f:
        f.write('{"files": ["/a/2.parquet"]}')
    assert lister.poll() == ["/a/2.parquet", "/a/3.parquet"]


def test_write_exclusive_is_content_atomic(tmp_path):
    """The local seam's exclusive create links full content into place:
    the path is never visible empty, and a lost race still raises."""
    import pytest

    from m13_sparkstreaming_python_azure_spark.sources.fs import (
        LocalSnapshotFS,
    )

    fs = LocalSnapshotFS()
    p = str(tmp_path / "claim.json")
    fs.write_exclusive(p, '{"v": 1}')
    assert fs.read_text(p) == '{"v": 1}'
    with pytest.raises(FileExistsError):
        fs.write_exclusive(p, '{"v": 2}')
    assert fs.read_text(p) == '{"v": 1}'  # loser did not clobber
