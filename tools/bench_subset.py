"""Targeted re-measurement helper for optimization rounds: bench.py's
exact methodology (count() action, median of $SPARK_GRAFT_BENCH_REPS
reps, clearCache between queries, rep-major order) over a SUBSET of
queries named on the command line — so an optimization's before/after
costs minutes, not a full 314-query suite run.

Usage: python tools/bench_subset.py [sf_dir] name [name ...]
Prints one JSON line {"queries": {...}, "queries_iqr": {...}}.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from m13_sparkstreaming_python_azure_spark.session import get_spark


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sf_dir, args = args[0], args[1:]
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    spark = get_spark("m13-bench-subset")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    missing = [n for n in args if n not in qs]
    if missing:
        raise SystemExit(f"unknown queries: {missing}")
    # same warm-up as bench.py
    next(iter(qs.values()))(spark, "/root/testdata/sf0.001").count()
    samples: dict[str, list[float]] = {n: [] for n in args}
    for _ in range(reps):
        for name in args:
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).count()
            samples[name].append(time.perf_counter() - t0)
            spark.catalog.clearCache()
    timings = {n: round(statistics.median(s), 3) for n, s in samples.items()}
    iqr = {}
    for n, s in samples.items():
        if len(s) >= 2:
            q = statistics.quantiles(s, n=4, method="inclusive")
            iqr[n] = round(q[2] - q[0], 3)
        else:
            iqr[n] = 0.0
    print(json.dumps({"queries": timings, "queries_iqr": iqr, "sf_dir": sf_dir}))
    spark.stop()


if __name__ == "__main__":
    main()
