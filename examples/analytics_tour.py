"""End-to-end telemetry analytics tour on the events/orders fixtures —
the round-2 operator families composed as one pipeline:

  1. data-quality gate before anything else      (operators/quality.py)
  2. interval-merge sessionization               (operators/intervals.py)
  3. Markov transition matrix of event flows     (queries/analytics_ext.py)
  4. changepoint + EWMA anomaly monitoring       (operators/timeseries.py)
  5. rolling correlation of activity vs value    (operators/timeseries.py)
  6. heavy-hitter detection on the token stream  (operators/frequency.py)
  7. A/B readout with the two-sample z           (queries/analytics_ext.py)
  8. GDPR forget-flow: delete keys + vacuum      (sources/snapshots.py)

Each stage is the gated operator itself — this file only narrates the
composition; correctness lives in the oracle gate and tests/.

Run: python examples/analytics_tour.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from m13_sparkstreaming_python_azure_spark.catalog import load_table
from m13_sparkstreaming_python_azure_spark.queries.analytics_ext import (
    q_ab_test_zscore,
    q_changepoint_detect,
    q_data_quality_suite,
    q_heavy_hitter_bigrams,
    q_interval_merge_sessions,
    q_markov_transitions,
    q_rolling_corr,
)
from m13_sparkstreaming_python_azure_spark.session import get_spark
from m13_sparkstreaming_python_azure_spark.sources.snapshots import (
    delete_keys,
    keyed_batch_sink,
    read_snapshot,
    vacuum_snapshots,
)


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark("analytics-tour")

    # 1. quality gate — refuse to ship analytics over broken inputs
    quality = q_data_quality_suite(spark, sf_dir)
    failed = quality.filter(~F.col("passed")).count()
    print(f"quality checks failing: {failed}")
    if failed:
        print(" -> would halt the pipeline here")

    # 2-3. behavior: sessions + flow transitions
    sessions = q_interval_merge_sessions(spark, sf_dir)
    print(f"sessions: {sessions.count()}")
    q_markov_transitions(spark, sf_dir).orderBy(
        F.col("prob").desc()
    ).show(5, truncate=False)

    # 4-5. monitoring: where did the series shift, what co-moves
    q_changepoint_detect(spark, sf_dir).show(truncate=False)
    corr = q_rolling_corr(spark, sf_dir)
    print(f"rolling-corr rows: {corr.count()}")

    # 6. content: dominant bigrams of the document stream
    q_heavy_hitter_bigrams(spark, sf_dir).orderBy(F.col("n").desc()).show(5)

    # 7. experimentation readout
    q_ab_test_zscore(spark, sf_dir).show(truncate=False)

    # 8. forget-flow: latest-state keyed table -> delete -> vacuum
    ev = load_table(spark, sf_dir, "events")
    tdir = os.path.join(tempfile.mkdtemp(prefix="tour-"), "users")
    keyed_batch_sink(tdir, ["user_id"], mode="latest", order_cols=["ts", "event_id"])(
        ev, 0
    )
    forget = ev.select("user_id").distinct().limit(3)
    delete_keys(spark, tdir, forget)
    vacuum_snapshots(tdir, keep_last=1)
    print(f"post-forget rows: {read_snapshot(spark, tdir).count()}")


if __name__ == "__main__":
    main(*sys.argv[1:])
