"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Query implementations live in ``m13_sparkstreaming_python_azure_spark.queries``
(core relational surface + LLM-data-pipeline operators); this module is the
thin driver-facing shim.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from m13_sparkstreaming_python_azure_spark.queries import ORACLES, QUERIES
from m13_sparkstreaming_python_azure_spark.queries.core import events_daily
from m13_sparkstreaming_python_azure_spark.operators.window import (
    top1_per_group,
    topk,
)

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's notebook pipeline (agg → best-day-per-key →
    top-10, stream.ipynb:117-187) on sf0.001 events, approx distinct (HLL++)
    for reference parity."""
    agg = events_daily(spark, SF0001, approx=True)
    best = top1_per_group(
        agg, ["event_type"], [F.desc("distinct_users"), F.desc("event_date")]
    )
    return topk(best, [F.desc("distinct_users"), F.asc("event_type")], 10)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    d = dict(ORACLES)
    # The real-codec multimodal oracles are generated LAZILY here (a live
    # scalar reference recomputation over ~300 images, a few seconds) so
    # importing the queries package stays fast for bench/tests.
    from m13_sparkstreaming_python_azure_spark.queries.analytics_ext import (
        bpe_oracle_values,
    )
    from m13_sparkstreaming_python_azure_spark.queries.llm import (
        multimodal_oracle_values,
    )

    d.update(multimodal_oracle_values())
    # bpe_merges (VERDICT r10 #5): merge sequence recomputed through an
    # independent DuckDB-SQL + pure-Python path at the driver's gate sf
    d.update(bpe_oracle_values())
    return d
