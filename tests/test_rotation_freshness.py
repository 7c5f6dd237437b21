"""Registry-rotation freshness gate (VERDICT r10 #1).

Round 10 changed 16 gates but the driver-checked prefix-50 was not
rotated, so CORRECTNESS_r10 never re-verified them. This test makes that
impossible to repeat: ANY package source change (or prefix edit) fails
the suite until ``tools/rotate_registry.py`` has re-validated that every
changed gate either leads the prefix or sits on the explicit pending
queue, and has re-stamped ``queries/rotation_stamp.json``.

The tool computes per-gate fingerprints from a static function-level
closure (gate source + everything it transitively references + its
oracle SQL) and refuses to stamp while a changed gate is outside the
prefix — so "stamp fresh" here really means "prefix coverage verified".
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
STAMP = os.path.join(
    REPO, "m13_sparkstreaming_python_azure_spark", "queries",
    "rotation_stamp.json",
)


def test_rotation_stamp_exists_and_fresh():
    assert os.path.exists(STAMP), (
        "rotation stamp missing — run python tools/rotate_registry.py"
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "rotate_registry.py"),
         "--check"],
        capture_output=True, text=True, cwd=REPO, timeout=600,
    )
    assert proc.returncode == 0, (
        "package code changed since the last registry rotation — review "
        "the driver prefix-50, then re-stamp:\n" + proc.stdout + proc.stderr
    )


def test_no_gate_pending_forever():
    """The --defer escape hatch is visible, not a parking lot: pending
    gates must drain at the NEXT rotation, so the queue never carries a
    gate that the current prefix could hold (prefix has 50 slots; a
    pending entry while the head holds a pure anchor is a misuse)."""
    with open(STAMP) as fh:
        stamp = json.load(fh)
    assert isinstance(stamp.get("pending"), list)
    assert len(stamp["pending"]) == 0, (
        f"gates deferred past their rotation: {stamp['pending']} — lead "
        "them in queries/registry.py _head and re-stamp"
    )


def test_defer_lands_on_pending_and_would_trip_the_gate(tmp_path):
    """NEGATIVE test (VERDICT r11 #8): --defer must put the gate on the
    VISIBLE pending queue of the stamp it writes — the exact state
    ``test_no_gate_pending_forever`` rejects — proving the escape hatch
    cannot silently park a gate past round end. Runs the real tool
    against a sandboxed stamp copy (env override), never the committed
    stamp."""
    import shutil

    sandbox = tmp_path / "rotation_stamp.json"
    shutil.copy(STAMP, sandbox)
    with open(STAMP) as fh:
        head = set(json.load(fh)["head"])
    from m13_sparkstreaming_python_azure_spark.queries import registry

    gate = next(g for g in registry.QUERIES if g not in head)
    env = dict(os.environ, SPARK_GRAFT_ROTATION_STAMP=str(sandbox))
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "rotate_registry.py"),
         "--defer", gate],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=600,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    with open(sandbox) as fh:
        stamp = json.load(fh)
    assert stamp["pending"] == [gate]
    # the committed stamp is untouched and still clean
    with open(STAMP) as fh:
        assert json.load(fh)["pending"] == []
