"""Exit-code probes for the zero-skip contract (VERDICT r10 #8 /
ADVICE r11 / review r12).

Two skip classes must both fail the run loudly:
- RUN-TIME skips (pytest.skip / skipif inside a collected test) —
  converted by the ``pytest_runtest_makereport`` hookwrapper;
- COLLECTION-time skips (module-level ``pytest.importorskip`` — e.g.
  tests/test_mini_protobuf.py's proto import) — these never reach the
  runtest protocol, so they are converted at report CREATION via the
  ``pytest_make_collect_report`` hookwrapper (review r12: before that,
  a vanished import silently dropped a whole file and the suite stayed
  green).

Both probes run pytest in a subprocess against a sandbox file placed
under tests/ (so the real conftest applies) and assert the exit code
both ways of SPARK_GRAFT_ALLOW_SKIPS. The sandbox names start with
``test_zz_sandbox`` and are created/removed inside the test — the outer
session collected before they exist, so they never leak into the suite.
"""

from __future__ import annotations

import os
import subprocess
import sys
import uuid

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

RUNTIME_SKIP = """
import pytest

def test_skips():
    pytest.skip("runtime skip probe")
"""

COLLECT_SKIP = """
import pytest

pytest.importorskip("definitely_not_a_module_{tag}")

def test_never_runs():
    assert True
"""

PASSING = """
def test_fine():
    assert 1 + 1 == 2
"""


def _run(files: dict[str, str], allow: bool) -> int:
    paths = []
    env = dict(os.environ)
    env.pop("SPARK_GRAFT_ALLOW_SKIPS", None)
    if allow:
        env["SPARK_GRAFT_ALLOW_SKIPS"] = "1"
    try:
        for name, body in files.items():
            p = os.path.join(HERE, name)
            with open(p, "w") as fh:
                fh.write(body)
            paths.append(p)
        proc = subprocess.run(
            [sys.executable, "-m", "pytest", "-q", *paths],
            cwd=REPO,
            env=env,
            capture_output=True,
            text=True,
            timeout=120,
        )
        return proc.returncode
    finally:
        for p in paths:
            if os.path.exists(p):
                os.remove(p)


def test_runtime_skip_fails_the_run():
    tag = uuid.uuid4().hex[:8]
    files = {f"test_zz_sandbox_rt_{tag}.py": RUNTIME_SKIP}
    assert _run(files, allow=False) != 0
    assert _run(files, allow=True) == 0


def test_collection_skip_fails_the_run():
    tag = uuid.uuid4().hex[:8]
    files = {
        f"test_zz_sandbox_cs_{tag}.py": COLLECT_SKIP.format(tag=tag),
        f"test_zz_sandbox_ok_{tag}.py": PASSING,
    }
    assert _run(files, allow=False) != 0
    assert _run(files, allow=True) == 0
