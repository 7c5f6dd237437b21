"""Driver-session parity sweep (VERDICT r4 #2).

Round 4 proved a query can pass the builder's tuned session factory yet
crash the driver's gate: the driver builds a BARE session (no
``inferTimestampNTZ=false``, no ``nanosAsLong``), under which parquet
isAdjustedToUTC=false timestamps surface as TIMESTAMP_NTZ — a type
``unix_micros``/watermarks reject (kaplan_meier, CORRECTNESS_r04).

This test runs registry queries under exactly that session shape, in a
SUBPROCESS (the in-process session fixture would be reused by
getOrCreate, silently re-tuning the confs we're trying to strip).

Default run: the timestamp-heavy representatives (one per fixture table
with a temporal column + a streaming gate). Full 216-query sweep:
``SPARK_GRAFT_DRIVER_SWEEP=1 python -m pytest tests/test_driver_session.py``
(~12 min — the verify recipe's per-round step).
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Every fixture temporal column gets a representative: orders.o_orderdate
# (kaplan_meier — the r4 failure), lineitem dates (pricing_summary),
# events.ts batch epoch math (user_sessions), events.ts watermark
# streaming (streaming_daily_stats), SCD2 timestamp compare
# (scd2_pit_join), plus the flagship.
_REPRESENTATIVES = [
    "kaplan_meier",
    "pricing_summary",
    "user_sessions",
    "streaming_daily_stats",
    "scd2_pit_join",
    "cuped_lift",
]


def test_registry_survives_bare_driver_session(sf_dir):
    names = [] if os.environ.get("SPARK_GRAFT_DRIVER_SWEEP") else _REPRESENTATIVES
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "check_correctness.py"),
            "--driver-session",
            sf_dir,
            *names,
        ],
        capture_output=True,
        text=True,
        timeout=3600,
        cwd=REPO,
    )
    tail = "\n".join(proc.stdout.splitlines()[-30:])
    assert proc.returncode == 0, (
        f"bare-session sweep failed:\n{tail}\n{proc.stderr[-2000:]}"
    )
    assert "queries pass" in proc.stdout
