"""Capture .explain("formatted") for named queries into plans/<tag>/.

Usage: python tools/capture_plans.py <tag> <suffix> name [name ...]
Writes plans/<tag>/<name>_<suffix>.txt (e.g. tag=r12, suffix=before).
Streaming-sink queries whose declared function RUNS the pipeline and
returns a result-read are captured as the final result plan (the plan
the bench's count() executes) — per-batch sink plans are driver-side
foreachBatch bodies and are documented in OPTIMIZATION notes instead.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from m13_sparkstreaming_python_azure_spark.session import get_spark


def main() -> None:
    tag, suffix, *names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        tag,
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("m13-capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        print(f"wrote {name}_{suffix}.txt ({len(plan)} chars)")
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
