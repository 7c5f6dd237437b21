"""Streaming observability — the ops surface a production pipeline
watches: per-trigger progress (rows/sec, batch duration), stateful-
operator gauges (state rows, memory, rows dropped by watermark), and a
small history fold for trend checks.

The reference monitors nothing (stream.ipynb fires and forgets its
query); at scale the FIRST operational question is "is the watermark
dropping data and is state growing without bound" — both are answered
from StreamingQuery progress JSON, no extra instrumentation."""

from __future__ import annotations

from typing import Any


def progress_summary(progress: dict | None) -> dict[str, Any]:
    """Flatten one StreamingQuery progress dict (``query.lastProgress``)
    into the gauges worth alerting on. Tolerates missing sections
    (sources differ in what they report)."""
    if progress is None:
        return {}
    state = (progress.get("stateOperators") or [{}])[0]
    sources = progress.get("sources") or [{}]
    return {
        "batch_id": progress.get("batchId"),
        "input_rows": progress.get("numInputRows"),
        "rows_per_sec": progress.get("processedRowsPerSecond"),
        "batch_ms": (progress.get("durationMs") or {}).get("triggerExecution"),
        "state_rows": state.get("numRowsTotal"),
        "state_mem_bytes": state.get("memoryUsedBytes"),
        "rows_dropped_by_watermark": state.get(
            "numRowsDroppedByWatermark"
        ),
        "n_sources": len(sources),
        "watermark": (progress.get("eventTime") or {}).get("watermark"),
    }


def history_summary(query) -> dict[str, Any]:
    """Fold a query's ``recentProgress`` into run-level totals — the
    numbers a health check compares against thresholds: total input,
    max state footprint, and TOTAL rows the watermark dropped (any
    nonzero value means late data is being lost; widen the delay or
    accept the loss explicitly)."""
    totals = {
        "n_triggers": 0,
        "total_input_rows": 0,
        "max_state_rows": 0,
        "total_rows_dropped_by_watermark": 0,
    }
    for p in query.recentProgress:
        s = progress_summary(p)
        totals["n_triggers"] += 1
        totals["total_input_rows"] += s.get("input_rows") or 0
        totals["max_state_rows"] = max(
            totals["max_state_rows"], s.get("state_rows") or 0
        )
        totals["total_rows_dropped_by_watermark"] += (
            s.get("rows_dropped_by_watermark") or 0
        )
    return totals
