from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from m13_sparkstreaming_python_azure_spark.session import get_spark

SF0001 = "/root/testdata/sf0.001"
SF001 = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("m13-tests", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return SF0001


@pytest.hookimpl(hookwrapper=True)
def pytest_runtest_makereport(item, call):
    """Zero-skip invariant (VERDICT r10 #8): the suite reached 0 skips in
    round 10 (the last skip died with the pure-Python Avro codec); make
    any regression loud by converting a skip into a FAILURE at the test
    that skipped. Public API only (ADVICE r11 — the previous version
    flipped the run's exit code through terminalreporter._session and
    _pytest.config internals, which a pytest upgrade could silently
    defuse): a failed TestReport drives the exit status through pytest's
    own machinery. Deselection (-k/-m) and explicit single-file runs
    still work — this only fires on tests that ran and reported
    'skipped'. Override for a genuinely degraded environment with
    SPARK_GRAFT_ALLOW_SKIPS=1."""
    outcome = yield
    rep = outcome.get_result()
    if rep.skipped and not os.environ.get("SPARK_GRAFT_ALLOW_SKIPS"):
        rep.outcome = "failed"
        rep.longrepr = (
            f"{rep.nodeid}: SKIPPED, but this suite is zero-skip by "
            f"contract (VERDICT r10 #8); original reason: {rep.longrepr}"
            " — set SPARK_GRAFT_ALLOW_SKIPS=1 only for a genuinely "
            "degraded environment"
        )


@pytest.hookimpl(hookwrapper=True)
def pytest_make_collect_report(collector):
    """COLLECTION-level skips never reach the runtest protocol, so the
    makereport hook above cannot see them (review r12: a module-level
    ``pytest.importorskip`` skipping a whole file — e.g.
    test_mini_protobuf's proto import — would silently drop its tests
    and the suite would exit green). Mutate the report at CREATION time
    — before the session's own pytest_collectreport impl counts it — so
    a skipped collect becomes a collection FAILURE and the run exits
    non-zero with the file listed as an error (exit-code probed both
    ways in tests/test_zero_skip_gate.py)."""
    outcome = yield
    rep = outcome.get_result()
    if (
        rep is not None
        and rep.skipped
        and not os.environ.get("SPARK_GRAFT_ALLOW_SKIPS")
    ):
        rep.outcome = "failed"
        rep.longrepr = (
            f"{rep.nodeid}: collection SKIPPED, but this suite is "
            f"zero-skip by contract (VERDICT r10 #8); original reason: "
            f"{rep.longrepr} — set SPARK_GRAFT_ALLOW_SKIPS=1 only "
            "for a genuinely degraded environment"
        )
