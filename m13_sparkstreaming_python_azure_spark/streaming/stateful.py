"""Stateful / advanced streaming operators (SURVEY.md §2.9 GAP rows).

The reference exercises exactly one stateful shape — an unbounded
complete-mode aggregation (stream.ipynb:117-121). This module adds the
rest of the Structured Streaming surface a production pipeline needs:
streaming dedup, stream-static joins, session windows, an
``applyInPandasWithState`` custom stateful operator, and the RocksDB state
store configuration that keeps state off the JVM heap at scale.

Scale notes:
- ``streaming_dedup`` without a watermark keeps every key seen forever —
  only viable for bounded key spaces. The watermarked variant
  (``dropDuplicatesWithinWatermark``) bounds state to the delay window and
  is the 100 TB-safe default for event streams.
- Stream-static joins re-read the static side per micro-batch; broadcast
  it (dimension tables) so the stream side never shuffles.
- Session windows grow state per active session; the watermark closes
  sessions and evicts them.
- RocksDB state store: HDFS-backed in-memory state (the default) caps at
  executor heap; RocksDB spills to local disk with incremental checkpoints
  — required once keyed state exceeds a few GB per executor.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def streaming_dedup(
    stream: DataFrame,
    keys: Sequence[str],
    ts_col: str | None = None,
    watermark_delay: str | None = None,
) -> DataFrame:
    """Streaming deduplication (§2.9 GAP: ``dropDuplicates``).

    With ``watermark_delay``, uses ``dropDuplicatesWithinWatermark`` so the
    seen-keys state is evicted once the watermark passes — bounded state,
    the only scale-safe mode for unbounded key spaces."""
    if watermark_delay is not None:
        if ts_col is None:
            raise ValueError("watermarked dedup needs ts_col")
        return stream.withWatermark(ts_col, watermark_delay).dropDuplicatesWithinWatermark(
            list(keys)
        )
    return stream.dropDuplicates(list(keys))


def stream_static_join(
    stream: DataFrame,
    dim: DataFrame,
    on: str | Sequence[str],
    how: str = "inner",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Stream-static enrichment join (§2.9 GAP): the batch ``dim`` side is
    re-evaluated per micro-batch (picks up dimension updates); broadcast it
    so the stream side joins map-side with no shuffle."""
    d = F.broadcast(dim) if broadcast_dim else dim
    return stream.join(d, on=on, how=how)


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    max_lag: str = "1 hour",
    watermark_delay: str = "1 day",
    how: str = "inner",
    rewatermark: bool = True,
) -> DataFrame:
    """Stream-stream join (§2.9 GAP): left rows matched to right rows with
    the same ``key`` whose ``right_ts`` falls in
    ``[left_ts - max_lag, left_ts]``.

    ``rewatermark=False`` for inputs that already carry a watermark (e.g.
    a ``dropDuplicatesWithinWatermark`` stage upstream): Spark ≥3.5
    forbids redefining a stream's watermark once multiple stateful
    operators are allowed, and the upstream mark already bounds this
    join's state.

    Both sides MUST be watermarked and the join MUST carry a time-range
    condition — that pair is what lets Spark evict buffered rows once
    ``watermark - max_lag`` passes them; an unconstrained stream-stream
    equi-join buffers both streams forever. State per side is bounded by
    ``rate × (watermark_delay + max_lag)`` regardless of total volume.

    Output columns are qualified ``l.*`` / ``r.*`` — select through the
    aliases. Inner joins emit eagerly; outer flavors hold unmatched rows
    until the watermark closes their interval."""
    if rewatermark:
        left = left.withWatermark(left_ts, watermark_delay)
        right = right.withWatermark(right_ts, watermark_delay)
    l = left.alias("l")
    r = right.alias("r")
    lts, rts = F.col(f"l.{left_ts}"), F.col(f"r.{right_ts}")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (rts >= lts - F.expr(f"INTERVAL {max_lag}"))
        & (rts <= lts)
    )
    return l.join(r, cond, how)


def session_window_aggregate(
    stream: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "30 minutes",
    value_col: str = "value",
    watermark_delay: str | None = "1 day",
) -> DataFrame:
    """Session windows (§2.5/§2.9 GAP): per key, windows that extend while
    events keep arriving within ``gap`` and close after a quiet period.
    Works identically on batch DataFrames (parity-testable). Streaming use
    needs the watermark to finalize + evict sessions."""
    src = (
        stream.withWatermark(ts_col, watermark_delay)
        if watermark_delay is not None and stream.isStreaming
        else stream
    )
    return src.groupBy(
        F.session_window(ts_col, gap).alias("session"), key_col
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum(value_col), 2).alias("sum_value"),
    )


RUNNING_TOTALS_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events_total", LongType()),
        StructField("batch_rows", LongType()),
    ]
)

_STATE_SCHEMA = StructType([StructField("count", LongType())])


def _running_totals_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-key running event count carried across micro-batches in
    GroupState — the minimal custom stateful operator shape."""
    batch_rows = 0
    for pdf in pdfs:
        batch_rows += len(pdf)
    (prev,) = state.get if state.exists else (0,)
    total = prev + batch_rows
    state.update((total,))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events_total": [total],
            "batch_rows": [batch_rows],
        }
    )


def running_totals_with_state(
    stream: DataFrame, key_col: str = "user_id"
) -> DataFrame:
    """Custom stateful operator (§2.9 GAP: ``applyInPandasWithState``):
    per-key running totals that survive across micro-batches. Arrow-batched
    per group; state is a single counter row per key, stored in the state
    store (RocksDB-compatible)."""
    return stream.groupBy(key_col).applyInPandasWithState(
        _running_totals_fn,
        outputStructType=RUNNING_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_EWMA_OUT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("event_type", StringType()),
        StructField("ewma", DoubleType()),
    ]
)
_EWMA_STATE_SCHEMA = StructType(
    [StructField("buf", ArrayType(DoubleType()))]
)


def _ewma_fn_factory(max_lag: int):
    import math

    def _fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts", "event_id"])
        buf = list(state.get[0]) if state.exists else []
        ids, ewmas = [], []
        for eid, v in zip(rows["event_id"], rows["value"]):
            buf.append(float(v))
            if len(buf) > max_lag + 1:
                buf.pop(0)
            m = len(buf)
            # identical fold to the batch operator / DuckDB oracle:
            # left-fold oldest->newest, weights exact powers of two
            acc = 0.0
            for i, x in enumerate(buf, start=1):
                acc = acc + x / (1 << (m - i))
            den = 2.0 - 1.0 / (1 << (m - 1))
            ids.append(int(eid))
            ewmas.append(math.floor(acc / den * 1e6 + 0.5) / 1e6)
        state.update((buf,))
        yield pd.DataFrame(
            {
                "event_id": ids,
                "event_type": [key[0]] * len(ids),
                "ewma": ewmas,
            }
        )

    return _fn


def ewma_with_state(
    stream: DataFrame, key_col: str = "event_type", max_lag: int = 20
) -> DataFrame:
    """Streaming EWMA control chart — the ORDER-DEPENDENT custom stateful
    operator (vs the commutative folds of the other streaming gates):
    per-key state carries the ring buffer of the last ``max_lag``+1
    values across micro-batches, and each arriving event emits its
    smoothed level.

    Exactly replicates operators/timeseries.ewma_control_chart when
    events arrive in (ts, event_id) order across batches (rows are
    sorted within each batch; the caller guarantees batch boundaries
    respect event-time order, e.g. by chunked day replay) — per-row math
    is the same left fold over exact power-of-two weights, so Python
    doubles match the JVM and the DuckDB oracle bit-for-bit.

    State is O(max_lag) doubles per key — bounded regardless of stream
    length; at scale this runs on RocksDB state like any keyed state."""
    return stream.select(key_col, "event_id", "ts", "value").groupBy(
        key_col
    ).applyInPandasWithState(
        _ewma_fn_factory(max_lag),
        outputStructType=_EWMA_OUT_SCHEMA,
        stateStructType=_EWMA_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_totals_transform_with_state(
    stream: DataFrame, key_col: str = "user_id"
) -> DataFrame:
    """Same running-totals contract as ``running_totals_with_state`` on the
    Spark 4 ``transformWithStateInPandas`` API — the successor to
    ``applyInPandasWithState``: named state variables (value/list/map) on a
    handle instead of one state tuple, plus timers and TTL. New pipelines
    should prefer this; the older operator stays for parity.

    Runtime dependency: the transformWithState protocol speaks protobuf
    between the JVM and the Python state server — environments without
    ``google.protobuf`` fail at stream start (tests skip there and the
    applyInPandasWithState twin is the covered path)."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._count = handle.getValueState("count", _STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):  # noqa: ANN001
            batch_rows = sum(len(pdf) for pdf in rows)
            prev = self._count.get()[0] if self._count.exists() else 0
            total = prev + batch_rows
            self._count.update((total,))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events_total": [total],
                    "batch_rows": [batch_rows],
                }
            )

        def close(self) -> None:
            pass

    return stream.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=RunningTotals(),
        outputStructType=RUNNING_TOTALS_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def rocksdb_state_conf() -> dict[str, str]:
    """Session conf enabling the RocksDB state store provider (§2.9 T4
    scale redesign; the reference ran the default HDFS-backed heap store).
    Pass to ``get_spark(extra_conf=...)`` or set via ``spark.conf.set``
    before starting the query."""
    return {
        "spark.sql.streaming.stateStore.providerClass": (
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
        ),
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled": (
            "true"
        ),
    }


def read_state(spark, checkpoint_dir: str, batch_id: int | None = None):
    """Offline inspection of a streaming query's keyed state via Spark 4's
    state data source — the ops/debugging surface for stateful pipelines
    (inspect hot keys, audit watermark drops, seed migrations) without
    touching the running query. Returns (key, value, partition_id) rows
    for the aggregation operator's state at ``batch_id`` (default:
    latest committed batch)."""
    reader = spark.read.format("statestore")
    if batch_id is not None:
        reader = reader.option("batchId", batch_id)
    return reader.load(checkpoint_dir)


def read_state_metadata(spark, checkpoint_dir: str):
    """Operator-level state metadata (operator/store names, partition
    counts, batch id range) via the `state-metadata` data source."""
    return spark.read.format("state-metadata").load(checkpoint_dir)


_SESS_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", LongType()),  # epoch MICROseconds
        StructField("session_end", LongType()),
        StructField("n_events", LongType()),
    ]
)
_SESS_STATE_SCHEMA = StructType(
    [
        StructField("start", LongType()),
        StructField("end", LongType()),
        StructField("n", LongType()),
    ]
)


def _sessions_fn_factory(gap_micros: int):
    def fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        rows = pd.concat(list(pdfs))
        rows = rows.sort_values(["ts", "event_id"])
        # epoch MICROseconds — sub-second precision matters: two events
        # exactly gap-apart at microsecond resolution are separate
        # sessions, and second-truncation would merge them
        micros = rows["ts"].astype("int64") // 1_000
        cur = list(state.get) if state.exists else None
        closed: list[tuple[int, int, int, int]] = []
        uid = key[0]
        for ts in micros:
            end = ts + gap_micros
            if cur is None:
                cur = [ts, end, 1]
            elif ts <= cur[1]:  # overlap-or-touch -> same session
                cur[1] = max(cur[1], end)
                cur[2] += 1
            else:
                closed.append((uid, cur[0], cur[1], cur[2]))
                cur = [ts, end, 1]
        state.update(tuple(cur))
        yield pd.DataFrame(
            closed,
            columns=["user_id", "session_start", "session_end", "n_events"],
        )

    return fn


def sessions_with_state(
    stream: DataFrame, gap_minutes: int = 10
) -> DataFrame:
    """Streaming interval-merge sessionization — the stateful twin of
    operators/intervals.merge_intervals: each event spans [ts, ts+gap];
    per-user GroupState carries the OPEN session (start, end, count)
    across micro-batches, and a session emits exactly once, when an
    arriving event starts a new one (its start exceeds the open
    session's end).

    Equivalence contract: when events arrive in (ts, event_id) order
    across batches (rows sorted within each batch; chunked event-time
    replay guarantees the boundary), emitted sessions are exactly the
    batch gaps-and-islands islands. Sessions still open at stream end
    live in state only — flush them by replaying one far-future sentinel
    event per key (the sentinel's own session is never emitted).

    State is 3 longs per key — bounded; timestamps travel as epoch
    microseconds so the state tuple stays primitive (RocksDB-friendly)
    without losing sub-second session boundaries."""
    return stream.select("user_id", "event_id", "ts").groupBy(
        "user_id"
    ).applyInPandasWithState(
        _sessions_fn_factory(gap_minutes * 60 * 1_000_000),
        outputStructType=_SESS_OUT_SCHEMA,
        stateStructType=_SESS_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _sessions_timeout_fn_factory(gap_micros: int, delay_ms: int):
    def fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        uid = key[0]
        if state.hasTimedOut:
            # watermark passed the open session's horizon: flush + evict
            start, end, n = state.get
            state.remove()
            yield pd.DataFrame(
                [(uid, start, end, n)],
                columns=[
                    "user_id", "session_start", "session_end", "n_events"
                ],
            )
            return
        rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        micros = rows["ts"].astype("int64") // 1_000
        cur = list(state.get) if state.exists else None
        closed: list[tuple[int, int, int, int]] = []
        for ts in micros:
            end = ts + gap_micros
            if cur is None:
                cur = [ts, end, 1]
            elif ts <= cur[1]:
                cur[1] = max(cur[1], end)
                cur[2] += 1
            else:
                closed.append((uid, cur[0], cur[1], cur[2]))
                cur = [ts, end, 1]
        state.update(tuple(cur))
        # fire when the event-time watermark passes session end + delay;
        # a key with NO rows in a later batch still gets this callback —
        # the production flush (vs the gate query's sentinel replay).
        # Clamp above the CURRENT watermark: Spark rejects past timers
        # (IllegalArgumentException kills the query). Fully-late rows are
        # dropped by the engine's late-event filter before reaching this
        # function, but that filter uses the PREVIOUS batch's watermark
        # while timer validation uses the current one — a row landing in
        # that window would otherwise arm a past timer. The clamped timer
        # fires once the watermark advances again.
        wm_ms = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(cur[1] // 1000 + delay_ms, wm_ms + 1))
        yield pd.DataFrame(
            closed,
            columns=["user_id", "session_start", "session_end", "n_events"],
        )

    return fn


def sessions_with_event_timeout(
    stream: DataFrame,
    gap_minutes: int = 10,
    watermark_delay: str = "1 minute",
    timeout_extra_ms: int = 0,
) -> DataFrame:
    """Streaming sessionization with EVENT-TIME TIMEOUT flush — the
    production twin of ``sessions_with_state``: instead of replaying a
    sentinel row to close trailing sessions, each key arms an event-time
    timer at its open session's end; when the watermark passes it, the
    state function is invoked WITHOUT input rows, emits the session, and
    evicts the state (bounded state even for keys that go silent — the
    semantics Auto-Loader-era jobs need on unbounded key spaces).

    The caller's stream must carry an event-time watermark on ``ts``
    (applyInPandasWithState requires one for EventTimeTimeout); sessions
    whose horizon the final watermark never passes remain in state —
    exactly-once hand-off to the next run via the checkpoint."""
    return (
        stream.withWatermark("ts", watermark_delay)
        .select("user_id", "event_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessions_timeout_fn_factory(
                gap_minutes * 60 * 1_000_000, timeout_extra_ms
            ),
            outputStructType=_SESS_OUT_SCHEMA,
            stateStructType=_SESS_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


_HOLT_OUT_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("n_days", LongType()),
        StructField("level", DoubleType()),
        StructField("trend", DoubleType()),
    ]
)
_HOLT_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("lvl", DoubleType()),
        StructField("trend", DoubleType()),
        StructField("last_day", LongType()),
    ]
)


def _holt_fn_factory(alpha: float, beta: float):
    def _fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        rows = pd.concat(list(pdfs), ignore_index=True)
        days = rows.groupby("day").size().sort_index()
        if state.exists:
            n, lvl, trend, last_day = state.get
        else:
            n, lvl, trend, last_day = 0, 0.0, 0.0, -(1 << 62)
        for day, y in days.items():
            if int(day) <= last_day:
                raise ValueError(
                    "holt_with_state: day arrived out of order or split "
                    "across batches — the replay contract requires "
                    "day-aligned, event-time-ordered chunks"
                )
            y = float(y)
            if n == 0:
                lvl = y
            else:
                if n == 1:
                    trend = y - lvl
                prev = lvl
                lvl = alpha * y + (1.0 - alpha) * (lvl + trend)
                trend = beta * (lvl - prev) + (1.0 - beta) * trend
            n += 1
            last_day = int(day)
        state.update((n, float(lvl), float(trend), last_day))
        yield pd.DataFrame(
            {
                "event_type": [key[0]],
                "n_days": [n],
                "level": [float(lvl)],
                "trend": [float(trend)],
            }
        )

    return _fn


def holt_with_state(
    stream: DataFrame,
    key_col: str = "event_type",
    alpha: float = 0.2,
    beta: float = 0.1,
) -> DataFrame:
    """Streaming Holt double exponential smoothing — the ORDER-DEPENDENT
    recursion of operators/timeseries.holt_forecast maintained
    incrementally in per-key GroupState: the state is just
    (n, level, trend, last_day) — O(1) per key regardless of stream
    length — and each micro-batch folds its COMPLETE days (the chunked
    replay contract cuts batches on day boundaries; a split or
    out-of-order day raises rather than silently corrupting the
    recursion). Per-day math is the identical IEEE sequence the batch
    operator and the DuckDB recursive-CTE oracle run, so the final
    (level, trend) — and forecasts projected from them — are bit-equal:
    stream↔batch↔oracle three-way parity for a trend-tracking model,
    the stateful upgrade of the flat-mean ``ewma_with_state``."""
    return stream.select(key_col, "day").groupBy(key_col).applyInPandasWithState(
        _holt_fn_factory(alpha, beta),
        outputStructType=_HOLT_OUT_SCHEMA,
        stateStructType=_HOLT_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
