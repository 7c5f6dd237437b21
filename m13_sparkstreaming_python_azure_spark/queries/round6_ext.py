"""Round-6 components: deletion vectors, CHECK constraints, streaming CDC
upsert, NB domain classifier, HITS, pseudo-relevance feedback, QL
retrieval, fuzzy decontamination, n-gram novelty, OOV rate, CCF lag,
information gain, quantile regression, majority-vote label model.

Each query has a DuckDB oracle twin in R6_ORACLES (same column names —
the driver's gate hashes values under sorted column order)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from m13_sparkstreaming_python_azure_spark.catalog import load_table


def q_deletion_vector_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional soft deletes (sources/snapshots.delete_where — Delta
    deletion-vector / Iceberg position-delete parity): orders land as four
    files, a first DELETE hides the even-cent 'F' rows WITHOUT rewriting
    any data file (sidecar positions only; NULL-region rows survive — SQL
    DELETE semantics), ``purge_deletes`` then rewrites ONLY the affected
    files (REORG PURGE), and a second DELETE lands on the purged layout.
    The oracle states the surviving rows directly. At 100 TB the delete is
    one predicate-pushed scan emitting (file, pos) pairs — no shuffle, no
    rewrite; reads anti-join a broadcast sidecar."""
    import os
    import tempfile

    from m13_sparkstreaming_python_azure_spark.sources.snapshots import (
        delete_where,
        purge_deletes,
        read_snapshot,
        write_snapshot,
    )

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.when(F.col("o_orderkey") % 11 == 0, F.lit(None))
        .otherwise(F.col("o_orderstatus"))
        .alias("region"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    root = tempfile.mkdtemp(prefix="dvdel-")
    table = os.path.join(root, "t")
    write_snapshot(orders.coalesce(4), table)
    # NULL-region rows do NOT match (coalesce-to-false), exactly SQL DELETE
    delete_where(spark, table, "region = 'F' AND cents % 2 = 0")
    purge_deletes(spark, table)
    delete_where(spark, table, "cents % 7 = 0")
    return (
        read_snapshot(spark, table)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("cents").alias("total_cents"),
        )
    )


_DELETION_VECTOR_SQL = """
    WITH base AS (
        SELECT o_orderkey, o_orderstatus,
               CASE WHEN o_orderkey % 11 = 0 THEN NULL
                    ELSE o_orderstatus END AS region,
               CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        FROM orders
    ), after1 AS (
        SELECT * FROM base
        WHERE (region = 'F' AND cents % 2 = 0) IS NOT TRUE
    ), after2 AS (
        SELECT * FROM after1 WHERE (cents % 7 = 0) IS NOT TRUE
    )
    SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(cents) AS BIGINT) AS total_cents
    FROM after2 GROUP BY o_orderstatus
"""


def q_check_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality gate (sources/snapshots
    add_check_constraint / constraint_report — Delta CHECK-constraint
    parity): four constraints over orders fold into ONE aggregation pass
    (each is ``sum((expr) IS NOT TRUE)``; NULL-evaluating rows violate,
    SQL CHECK semantics), then unpivot to a per-constraint report. On the
    write path the same report gates appends/merges atomically
    (ConstraintViolation before anything commits — tests). One scan for
    any number of constraints — the shape that matters at 100 TB."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.when(F.col("o_orderkey") % 13 == 0, F.lit(None))
        .otherwise(F.col("o_orderpriority"))
        .alias("priority"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    constraints = {
        "status_known": "o_orderstatus IN ('O', 'F', 'P')",
        "cents_nonneg": "cents >= 0",
        "big_order": "cents >= 1000000",
        "priority_notnull": "priority IS NOT NULL",
    }
    agg = orders.agg(
        F.count(F.lit(1)).alias("__n"),
        *[
            F.sum(
                F.when(F.expr(expr).eqNullSafe(F.lit(True)), 0).otherwise(1)
            ).alias(name)
            for name, expr in constraints.items()
        ],
    )
    kv = []
    for name in constraints:
        kv += [F.lit(name), F.col(name)]
    return agg.select(
        F.explode(F.create_map(*kv)).alias("constraint_name", "n_violations"),
        F.col("__n").alias("n_rows"),
    )


_CHECK_CONSTRAINTS_SQL = """
    WITH base AS (
        SELECT o_orderstatus,
               CASE WHEN o_orderkey % 13 = 0 THEN NULL
                    ELSE o_orderpriority END AS priority,
               CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        FROM orders
    ), n AS (SELECT CAST(count(*) AS BIGINT) AS n_rows FROM base)
    SELECT c.constraint_name,
           CAST(c.n_violations AS BIGINT) AS n_violations, n.n_rows
    FROM (
        SELECT 'status_known' AS constraint_name,
               sum(CASE WHEN (o_orderstatus IN ('O','F','P')) IS TRUE
                        THEN 0 ELSE 1 END) AS n_violations FROM base
        UNION ALL
        SELECT 'cents_nonneg',
               sum(CASE WHEN (cents >= 0) IS TRUE THEN 0 ELSE 1 END)
        FROM base
        UNION ALL
        SELECT 'big_order',
               sum(CASE WHEN (cents >= 1000000) IS TRUE THEN 0 ELSE 1 END)
        FROM base
        UNION ALL
        SELECT 'priority_notnull',
               sum(CASE WHEN (priority IS NOT NULL) IS TRUE THEN 0 ELSE 1 END)
        FROM base
    ) c CROSS JOIN n
"""


def q_streaming_cdc_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CDC apply under the gate: an ordered I/U/D change feed
    (bootstrap inserts → %5 reprices → %7 deletes → %35 re-inserts)
    replays as four atomically-published chunks; foreachBatch folds each
    micro-batch into a versioned snapshot table via ``merge_into`` (ONE
    null-safe full-outer join per batch: MatchedDelete for D, MatchedUpdate
    for U, NotMatchedInsert for I — the Delta CDC-apply clause matrix) with
    the exactly-once base-version guard. The final table must equal the
    oracle's direct statement of the end state, independent of micro-batch
    machinery. At scale the merge shuffles on the key both sides; bucket
    the target (keyed_batch_sink) to make it partition-incremental."""
    import os
    import tempfile
    import uuid

    from m13_sparkstreaming_python_azure_spark.operators.merge import (
        MatchedDelete,
        MatchedUpdate,
        NotMatchedInsert,
    )
    from m13_sparkstreaming_python_azure_spark.sources.filestream import (
        parquet_file_stream,
    )
    from m13_sparkstreaming_python_azure_spark.sources.replay import (
        publish_chunk,
    )
    from m13_sparkstreaming_python_azure_spark.sources.snapshots import (
        latest_version,
        merge_into_snapshot,
        read_snapshot,
        write_snapshot,
    )

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    k = F.col("o_orderkey")
    chunks = [
        orders.withColumn("op", F.lit("I")),
        orders.filter(k % 5 == 0).select(
            "o_orderkey",
            F.lit("U").alias("o_orderstatus"),
            F.floor((F.col("cents") * 9) / 10).cast("long").alias("cents"),
            F.lit("U").alias("op"),
        ),
        orders.filter(k % 7 == 0).withColumn("op", F.lit("D")),
        orders.filter(k % 35 == 0).select(
            "o_orderkey",
            F.lit("R").alias("o_orderstatus"),
            F.lit(123456).cast("long").alias("cents"),
            F.lit("I").alias("op"),
        ),
    ]
    root = tempfile.mkdtemp(prefix="cdc-upsert-")
    land, ck, table = (
        os.path.join(root, d) for d in ("land", "ck", "table")
    )
    clauses = [
        MatchedDelete("s.op = 'D'"),
        MatchedUpdate(
            {"o_orderstatus": "s.o_orderstatus", "cents": "s.cents"},
            condition="s.op <> 'D'",
        ),
        NotMatchedInsert(
            values={
                "o_orderkey": "s.o_orderkey",
                "o_orderstatus": "s.o_orderstatus",
                "cents": "s.cents",
            },
            condition="s.op <> 'D'",
        ),
    ]

    def _apply(batch_df, batch_id):
        if latest_version(table) is None:
            write_snapshot(
                batch_df.filter("op <> 'D'").drop("op"), table
            )
        else:
            merge_into_snapshot(
                spark, table, batch_df, ["o_orderkey"], clauses
            )

    publish_chunk(chunks[0], land)
    schema = "o_orderkey long, o_orderstatus string, cents long, op string"
    stream = parquet_file_stream(spark, land, schema)
    q = (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", ck)
        .queryName(f"cdc_upsert_{uuid.uuid4().hex[:8]}")
        .start()
    )
    q.processAllAvailable()
    for ch in chunks[1:]:
        publish_chunk(ch, land)
        q.processAllAvailable()
    q.stop()
    return read_snapshot(spark, table).select(
        "o_orderkey", "o_orderstatus", "cents"
    )


_STREAMING_CDC_UPSERT_SQL = """
    WITH base AS (
        SELECT o_orderkey, o_orderstatus,
               CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        FROM orders
    )
    SELECT o_orderkey, 'R' AS o_orderstatus, CAST(123456 AS BIGINT) AS cents
    FROM base WHERE o_orderkey % 35 = 0
    UNION ALL
    SELECT o_orderkey, 'U' AS o_orderstatus,
           (cents * 9) // 10 AS cents
    FROM base WHERE o_orderkey % 5 = 0 AND o_orderkey % 7 <> 0
    UNION ALL
    SELECT o_orderkey, o_orderstatus, cents
    FROM base WHERE o_orderkey % 5 <> 0 AND o_orderkey % 7 <> 0
"""


R6_QUERIES = {
    "deletion_vector_delete": q_deletion_vector_delete,
    "check_constraints": q_check_constraints,
    "streaming_cdc_upsert": q_streaming_cdc_upsert,
}

R6_ORACLES = {
    "deletion_vector_delete": _DELETION_VECTOR_SQL,
    "check_constraints": _CHECK_CONSTRAINTS_SQL,
    "streaming_cdc_upsert": _STREAMING_CDC_UPSERT_SQL,
}
