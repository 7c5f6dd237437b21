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


def pytest_terminal_summary(terminalreporter, exitstatus, config):
    """Zero-skip invariant (VERDICT r10 #8): the suite reached 0 skips in
    round 10 (the last skip died with the pure-Python Avro codec); make
    any regression loud by failing the whole run if ANYTHING skipped.
    Deselection (-k/-m) and explicit single-file runs still work — this
    only fires on tests that ran and reported 'skipped'. Override for a
    genuinely degraded environment with SPARK_GRAFT_ALLOW_SKIPS=1."""
    skipped = terminalreporter.stats.get("skipped", [])
    if skipped and not os.environ.get("SPARK_GRAFT_ALLOW_SKIPS"):
        terminalreporter.write_line(
            f"\nERROR: {len(skipped)} skipped test(s) — this suite is "
            "zero-skip by contract (VERDICT r10 #8):", red=True,
        )
        for rep in skipped:
            terminalreporter.write_line(f"  {rep.nodeid}", red=True)
        import _pytest.config as _cfg

        # flip the session exit code to failure
        terminalreporter._session.exitstatus = _cfg.ExitCode.TESTS_FAILED
