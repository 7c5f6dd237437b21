"""Event-time-timeout session flush (streaming/stateful
.sessions_with_event_timeout): a key with NO rows in a later batch still
emits its session when the watermark passes its horizon."""

from __future__ import annotations

import datetime as dt
import os
import tempfile
import uuid

from m13_sparkstreaming_python_azure_spark.sources.replay import publish_chunk
from m13_sparkstreaming_python_azure_spark.sources.filestream import (
    parquet_file_stream,
)
from m13_sparkstreaming_python_azure_spark.streaming.stateful import (
    sessions_with_event_timeout,
)


def _rows(spark, specs):
    data = [
        (eid, dt.datetime(2024, 1, d, h, m, 0), uid)
        for eid, d, h, m, uid in specs
    ]
    return spark.createDataFrame(data, "event_id long, ts timestamp, user_id long")


def test_timeout_flushes_silent_key(spark):
    root = tempfile.mkdtemp(prefix="sess-timeout-")
    land, ck = (os.path.join(root, d) for d in ("land", "ck"))
    # batch 1: user 1 has a tight session on day 1; user 2 too
    b1 = _rows(
        spark,
        [(1, 1, 9, 0, 1), (2, 1, 9, 5, 1), (3, 1, 9, 0, 2)],
    )
    # batch 2: ONLY user 2, far in the future -> watermark jumps past
    # user 1's session horizon; user 1 gets a timeout callback with no
    # input rows and its session must emit
    b2 = _rows(spark, [(4, 20, 9, 0, 2)])

    publish_chunk(b1, land)
    stream = parquet_file_stream(spark, land, b1.schema)
    name = f"sess_to_{uuid.uuid4().hex[:8]}"
    q = (
        sessions_with_event_timeout(stream, gap_minutes=10)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ck)
        .start()
    )
    q.processAllAvailable()
    publish_chunk(b2, land)
    q.processAllAvailable()
    # one more empty-ish trigger so timers registered in batch 2 can fire
    publish_chunk(_rows(spark, [(5, 20, 10, 0, 2)]), land)
    q.processAllAvailable()
    q.stop()

    got = {
        (r["user_id"], r["n_events"])
        for r in spark.table(name).collect()
    }
    # user 1's 2-event session flushed by TIMEOUT (no user-1 rows after
    # batch 1); user 2's day-1 single-event session flushed the same way
    assert (1, 2) in got
    assert (2, 1) in got


def test_late_event_behind_watermark_does_not_kill_query(spark):
    """A late event whose session horizon is already behind the watermark
    must not arm an event-time timer in the past — Spark rejects past
    timers with IllegalArgumentException and kills the query (ADVICE r2).
    In practice Spark's late-event filter drops such rows before the
    state function (so the key never materializes), but the filter uses
    the PREVIOUS batch's watermark while timer validation uses the
    current one — rows landing in that window need the clamp. Either
    way the query must survive and on-time keys must still flush."""
    root = tempfile.mkdtemp(prefix="sess-late-")
    land, ck = (os.path.join(root, d) for d in ("land", "ck"))
    b1 = _rows(spark, [(1, 1, 9, 0, 1), (2, 1, 9, 5, 1)])
    # far-future row pushes the watermark way past day 1
    b2 = _rows(spark, [(3, 25, 9, 0, 2)])
    # LATE row: day-2 session end + delay is far behind the watermark now
    b3 = _rows(spark, [(4, 2, 9, 0, 3)])
    # two more future rows: the clamped timer sits at watermark+1, and
    # batch N's timeouts use the watermark derived from batch N-1's max
    # event time — so one batch advances the watermark past the timer and
    # the NEXT one fires it
    b4 = _rows(spark, [(5, 26, 9, 0, 2)])
    b5 = _rows(spark, [(6, 27, 9, 0, 2)])

    publish_chunk(b1, land)
    stream = parquet_file_stream(spark, land, b1.schema)
    name = f"sess_late_{uuid.uuid4().hex[:8]}"
    q = (
        sessions_with_event_timeout(stream, gap_minutes=10)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ck)
        .start()
    )
    q.processAllAvailable()
    for b in (b2, b3, b4, b5):
        publish_chunk(b, land)
        q.processAllAvailable()
    assert q.exception() is None  # a past-watermark timer would kill it
    q.stop()
    got = {(r["user_id"], r["n_events"]) for r in spark.table(name).collect()}
    assert (1, 2) in got  # user 1 flushed by timeout
    # the behind-watermark event was dropped by the late-event filter —
    # watermark semantics: no session for user 3, and no crash either
    assert not any(u == 3 for u, _ in got)
