"""Round-8 gated queries: Iceberg-style partition-spec evolution over the
snapshot layer, plus the round's new text/streaming additions.

Same contract as every other queries module: each entry has a Spark
implementation in R8_QUERIES and (where SQL-expressible) a DuckDB oracle
in R8_ORACLES whose stringified, column-sorted, order-insensitive hash
must match (tools/check_correctness.py replica of the driver gate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from m13_sparkstreaming_python_azure_spark.catalog import load_table

_US_PER_DAY = 86_400_000_000


def q_partition_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg-style partition evolution (sources/snapshots
    .evolve_partition_spec): events land partitioned by event_type, the
    spec evolves to the epoch-day column, later events append under the
    NEW layout — zero files rewritten — and a day-range read unions the
    two spec groups: the day-spec files prune at the MANIFEST, the
    event_type-spec files post-filter (exactly Iceberg's old-spec
    behavior). In-gate asserts: the appended day files outside the
    predicate are manifest-skipped, no pre-evolution file is, and the
    evolved read equals the full-read-then-filter twin. The census the
    oracle replays is the filtered day window grouped by event_type."""
    import os
    import tempfile
    import uuid

    from m13_sparkstreaming_python_azure_spark.sources.snapshots import (
        append_snapshot_partitioned,
        evolve_partition_spec,
        read_snapshot_evolved,
        read_snapshot_evolved_partitions,
        spec_prune_report,
        write_snapshot_partitioned,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        "user_id",
        F.col("value").cast("decimal(18,6)").alias("v"),
        F.floor(F.unix_micros(F.col("ts")) / F.lit(_US_PER_DAY))
        .cast("long")
        .alias("day"),
    )
    split_day = 19738  # 2024-01-16
    lo, hi = 19735, 19740  # 3 days either side of the evolution point
    tdir = os.path.join(
        tempfile.gettempdir(), f"specevo-{uuid.uuid4().hex[:10]}"
    )
    write_snapshot_partitioned(
        ev.filter(F.col("day") < split_day), tdir, "event_type"
    )
    evolve_partition_spec(tdir, "day")
    append_snapshot_partitioned(ev.filter(F.col("day") >= split_day), tdir)
    days = list(range(lo, hi + 1))
    rep = spec_prune_report(tdir, "day", days)
    # the appended (day-spec) files outside [lo, hi] were skipped at the
    # manifest; every pre-evolution (event_type-spec) file must scan
    assert rep["skipped"], "expected manifest-pruned day-spec files"
    assert rep["kept"], "expected surviving day-spec files"
    assert rep["scanned_other_spec"], "expected old-spec files to scan"
    pruned = read_snapshot_evolved_partitions(spark, tdir, "day", days)
    full = read_snapshot_evolved(spark, tdir).filter(F.col("day").isin(days))
    n_pruned, n_full = pruned.count(), full.count()
    assert n_pruned == n_full, (
        f"pruned read lost rows: {n_pruned} != {n_full}"
    )
    return pruned.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("day").alias("n_days"),
        F.round(F.sum("v"), 2).cast("double").alias("sum_value"),
    )


R8_QUERIES = {
    "partition_evolution": q_partition_evolution,
}

R8_ORACLES = {
    "partition_evolution": """
        WITH ev AS (
            SELECT event_type,
                   CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT)
                       AS day,
                   CAST(value AS DECIMAL(18,6)) AS v
            FROM events
        )
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n,
               CAST(count(DISTINCT day) AS BIGINT) AS n_days,
               CAST(round(sum(v), 2) AS DOUBLE) AS sum_value
        FROM ev
        WHERE day BETWEEN 19735 AND 19740
        GROUP BY event_type
    """,
}
