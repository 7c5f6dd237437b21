"""Property tests (hypothesis): interval merge and 2-D skyline match
brute-force references on arbitrary inputs."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from m13_sparkstreaming_python_azure_spark.operators.intervals import (
    merge_intervals,
)
from m13_sparkstreaming_python_azure_spark.operators.skyline import skyline_2d


def _brute_merge(intervals):
    """Reference merge: sort by start, sweep, overlap-or-touch."""
    out = []
    for s, e in sorted(intervals):
        if out and s <= out[-1][1]:
            out[-1][1] = max(out[-1][1], e)
            out[-1][2] += 1
        else:
            out.append([s, e, 1])
    return {(s, e, n) for s, e, n in out}


iv = st.tuples(
    st.integers(min_value=0, max_value=40),
    st.integers(min_value=0, max_value=25),
).map(lambda t: (t[0], t[0] + t[1]))


def test_interval_merge_matches_sweep(spark):
    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(ivs=st.lists(iv, min_size=1, max_size=12))
    def run(ivs):
        rows = [("k", i, s, e) for i, (s, e) in enumerate(ivs)]
        df = spark.createDataFrame(rows, ["k", "tb", "s", "e"])
        got = {
            (r["island_start"], r["island_end"], r["n_merged"])
            for r in merge_intervals(df, "k", "s", "e", "tb").collect()
        }
        assert got == _brute_merge(ivs)

    run()


pt = st.tuples(
    st.integers(min_value=0, max_value=8),
    st.integers(min_value=0, max_value=8),
)


def test_skyline_matches_bruteforce_property(spark):
    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(pts=st.lists(pt, min_size=1, max_size=15))
    def run(pts):
        df = spark.createDataFrame(
            [(float(x), y) for x, y in pts], ["x", "y"]
        )
        got = {
            (r["x"], r["y"]): r["n_rows"]
            for r in skyline_2d(df, "x", "y").collect()
        }
        expect = {}
        for p in pts:
            dominated = any(
                q[0] <= p[0]
                and q[1] <= p[1]
                and (q[0] < p[0] or q[1] < p[1])
                for q in pts
            )
            if not dominated:
                key = (float(p[0]), p[1])
                expect[key] = expect.get(key, 0) + 1
        assert got == expect

    run()
