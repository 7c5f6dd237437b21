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


def q_streaming_holt_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming Holt trend model under the gate (streaming/stateful
    .holt_with_state): daily event counts replay as 3 day-aligned chunks,
    per-key GroupState carries just (n, level, trend, last_day) — O(1)
    state — and the recursion folds each batch's complete days in event-
    time order. The final state projects the SAME 7-step forecast table
    as the batch ``holt_forecast`` gate, hash-checked against the SAME
    recursive-CTE oracle: stream↔batch↔oracle three-way bit parity for
    an order-dependent trend model."""
    import os
    import tempfile
    import uuid

    from m13_sparkstreaming_python_azure_spark.sources.filestream import (
        parquet_file_stream,
    )
    from m13_sparkstreaming_python_azure_spark.sources.replay import (
        publish_chunk,
    )
    from m13_sparkstreaming_python_azure_spark.streaming.stateful import (
        holt_with_state,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type"
    )
    root = tempfile.mkdtemp(prefix="holt-stream-")
    land, ck = (os.path.join(root, d) for d in ("land", "ck"))
    chunks = [
        ev.filter(F.col("ts") < "2024-01-11"),
        ev.filter(
            (F.col("ts") >= "2024-01-11") & (F.col("ts") < "2024-01-21")
        ),
        ev.filter(F.col("ts") >= "2024-01-21"),
    ]
    publish_chunk(chunks[0], land)
    stream = parquet_file_stream(spark, land, ev.schema).select(
        "event_type",
        F.floor(F.unix_micros(F.col("ts")) / F.lit(_US_PER_DAY))
        .cast("long")
        .alias("day"),
    )
    name = f"holt_stream_{uuid.uuid4().hex[:8]}"
    q = (
        holt_with_state(stream, alpha=0.2, beta=0.1)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ck)
        .start()
    )
    q.processAllAvailable()
    for ch in chunks[1:]:
        publish_chunk(ch, land)
        q.processAllAvailable()
    q.stop()
    final = (
        spark.table(name)
        .groupBy("event_type")
        .agg(
            F.max("n_days").alias("n_days"),
            F.max_by("level", "n_days").alias("lvl"),
            F.max_by("trend", "n_days").alias("b"),
        )
        .filter(F.col("n_days") >= 2)
    )
    hs = spark.range(1, 8).select(F.col("id").alias("h"))
    snap = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    return final.crossJoin(F.broadcast(hs)).select(
        "event_type",
        "h",
        snap(F.col("lvl") + F.col("h") * F.col("b")).alias("forecast"),
        snap(F.col("lvl")).alias("level"),
        snap(F.col("b")).alias("trend"),
    )


_BOILERPLATE = (
    "shared canonical boilerplate footer sentence repeated across many "
    "training documents verbatim"
)


def q_exact_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr span REMOVAL (operators/spans.exact_substring_dedup —
    Lee et al. 2022): every 8-token span also present in an earlier
    document is cut from the later one; the first occurrence survives.
    The fixture corpus is random word salad, so a 12-token boilerplate
    footer is PLANTED on every doc_id ≡ 0 (mod 7) — the lowest such doc
    owns the span, every later one loses exactly those tokens (plus any
    accidental cross-doc 8-gram repeats, which the oracle computes
    identically). Output hashes the rebuilt text via md5 so the gate
    pins the full redaction, not just the counts."""
    from m13_sparkstreaming_python_azure_spark.operators.spans import (
        exact_substring_dedup,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(F.col("text"), F.lit(" " + _BOILERPLATE)),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    out = exact_substring_dedup(docs, "doc_id", n=8)
    return out.select(
        "doc_id",
        "n_tokens",
        "n_removed",
        F.md5("redacted").alias("redacted_md5"),
    )


def q_bucketed_colocated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed-table co-located join under the gate (sources/bucketing):
    orders and lineitem persist bucketed by the SAME key into the SAME
    bucket count, so the recurring fact-fact join runs with ZERO
    exchanges — each task reads matching bucket files from both sides.
    The in-gate plan assert requires NO Exchange under the join (the
    whole point: at 100 TB this converts the star-join pipeline's
    dominant shuffle into a one-time write cost). The revenue census is
    hash-checked against the plain SQL join — bucketing must never
    change results, only the plan."""
    import uuid

    from m13_sparkstreaming_python_azure_spark.sources.bucketing import (
        co_located_join,
        write_bucketed,
    )

    tag = uuid.uuid4().hex[:8]
    t_orders, t_li = f"bkt_orders_{tag}", f"bkt_lineitem_{tag}"
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"),
        F.col("l_extendedprice").cast("decimal(18,6)").alias("price"),
        F.col("l_discount").cast("decimal(18,6)").alias("disc"),
    )
    write_bucketed(orders, t_orders, ["o_orderkey"], 8, ["o_orderkey"])
    write_bucketed(li, t_li, ["o_orderkey"], 8, ["o_orderkey"])
    bcast = "spark.sql.autoBroadcastJoinThreshold"
    abcast = "spark.sql.adaptive.autoBroadcastJoinThreshold"
    saved = {k: spark.conf.get(k, None) for k in (bcast, abcast)}
    try:
        # the gate proves the BUCKETED merge path: disable broadcast so
        # the small fixture can't sidestep it (a BroadcastExchange would
        # also be exchange-free per side, but proves nothing about
        # co-location at fact-fact scale)
        spark.conf.set(bcast, "-1")
        spark.conf.set(abcast, "-1")
        joined = co_located_join(spark, t_orders, t_li, "o_orderkey")
        agg = joined.groupBy("o_orderstatus", "o_orderpriority").agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(
                    (F.col("price") * (1 - F.col("disc"))).cast(
                        "decimal(19,6)"
                    )
                ),
                2,
            )
            .cast("double")
            .alias("revenue"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, (
            "bucketed join planned a shuffle — co-location broken:\n" + plan
        )
        # materialize before the confs/tables are restored/dropped
        rows = agg.collect()
        return spark.createDataFrame(rows, agg.schema)
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
        # the catalog entries are session-scoped scratch; data lives in
        # the warehouse dir and drops with the table
        spark.sql(f"DROP TABLE IF EXISTS {t_orders}")
        spark.sql(f"DROP TABLE IF EXISTS {t_li}")


def q_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-style prefix-dimension retrieval eval (Kusupati et al.
    2022): rank the corpus against query vec 0 by EXACT integer dot
    product — components quantized to a 1e-6 grid, so the score is a
    BIGINT and the (score desc, vec_id) order is total and engine-exact,
    no float-boundary ambiguity — once with all dimensions and once with
    the first-16 prefix, and report top-10 overlap (the recall a
    truncated 'nested' embedding retains). Both top-k cuts are ORDER BY
    + LIMIT (TakeOrderedAndProject's bounded heap); the corpus pass is
    one scan, the query vector a single-row broadcast."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").alias("v")
    )
    q = emb.filter(F.col("vec_id") == 0).select(F.col("v").alias("qv"))
    quant = lambda c: F.transform(  # noqa: E731
        c, lambda x: F.floor(x * 1e6 + F.lit(0.5)).cast("long")
    )
    scored = emb.filter(F.col("vec_id") != 0).crossJoin(F.broadcast(q))

    def _dot(vc, qc):
        return F.aggregate(
            F.zip_with(quant(vc), quant(qc), lambda a, b: a * b),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    scored = scored.select(
        "vec_id",
        _dot(F.col("v"), F.col("qv")).alias("dot_full"),
        _dot(F.slice("v", 1, 16), F.slice("qv", 1, 16)).alias("dot_16"),
    )
    top_full = scored.orderBy(
        F.col("dot_full").desc(), F.col("vec_id")
    ).limit(10)
    top_16 = scored.orderBy(F.col("dot_16").desc(), F.col("vec_id")).limit(10)
    overlap = top_full.select("vec_id").join(
        top_16.select("vec_id"), "vec_id", "left_semi"
    )
    return overlap.agg(
        F.count(F.lit(1)).alias("n_overlap"),
        (F.count(F.lit(1)) / F.lit(10.0)).alias("recall_at_10"),
    )


def q_salted_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit salted join under the gate (operators/skew.salted_join —
    until now only proven inside the plan audit's skew fixture): lineitem
    salted across 16 sub-keys joins the 16×-replicated supplier side, and
    the per-nation revenue census must hash-match the PLAIN SQL join —
    salting must never change results, only spread a hot key's straggler
    partition. The replicated side is the small one (the documented cost
    rule); revenue folds in exact decimals."""
    from m13_sparkstreaming_python_azure_spark.operators.skew import (
        salted_join,
    )

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("suppkey"),
        (
            F.col("l_extendedprice").cast("decimal(19,6)")
            * (1 - F.col("l_discount").cast("decimal(19,6)"))
        )
        .cast("decimal(19,6)")
        .alias("rev"),
    )
    sup = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("suppkey"),
        F.col("s_nationkey").alias("nation"),
    )
    joined = salted_join(li, sup, on="suppkey", salt=16)
    return joined.groupBy("nation").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(F.sum("rev"), 2).cast("double").alias("revenue"),
    )


def q_snapshot_commit_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table atomic commit groups (sources/txgroup) — the
    cross-table transaction single-table formats lack: orders and
    lineitem derivatives publish TOGETHER under group versions, and a
    group reader sees all-old or all-new pins, never a torn pair.
    Script: G1 pins the even-orderkey half of both tables; both tables
    then PREPARE their full content (append the odd half) — the in-gate
    assert shows the group still serves the G1 pins (prepared versions
    invisible = no torn read) — and G2 pins the full pair. Output is the
    per-group-version join census (rows of both sides + joined revenue),
    which the oracle rebuilds from the same residue split."""
    import os
    import tempfile
    import uuid

    from m13_sparkstreaming_python_azure_spark.sources.snapshots import (
        append_snapshot,
        write_snapshot,
    )
    from m13_sparkstreaming_python_azure_spark.sources.txgroup import (
        group_commit,
        read_group,
        read_group_table,
    )

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        (
            F.col("l_extendedprice").cast("decimal(19,6)")
            * (1 - F.col("l_discount").cast("decimal(19,6)"))
        )
        .cast("decimal(19,6)")
        .alias("rev"),
    )
    root = tempfile.mkdtemp(prefix=f"txg-{uuid.uuid4().hex[:8]}-")
    t_o, t_l = os.path.join(root, "orders"), os.path.join(root, "lineitem")
    gdir = os.path.join(root, "_group")
    even = F.col("o_orderkey") % 2 == 0
    write_snapshot(orders.filter(even), t_o)
    write_snapshot(li.filter(F.col("l_orderkey") % 2 == 0), t_l)
    g1 = group_commit(gdir, tables=[t_o, t_l], op="initial")
    # PREPARE the full pair (table versions advance) — group unaffected
    append_snapshot(orders.filter(~even), t_o)
    pins_before = read_group(gdir)["pins"]
    assert read_group(gdir)["version"] == g1, "group moved without commit"
    assert pins_before == {t_o: 1, t_l: 1}, (
        f"prepared-but-uncommitted version leaked into the group: "
        f"{pins_before}"
    )
    append_snapshot(li.filter(F.col("l_orderkey") % 2 == 1), t_l)
    g2 = group_commit(gdir, tables=[t_o, t_l], op="publish-odd-half")
    out = []
    for g in (g1, g2):
        o = read_group_table(spark, gdir, t_o, version=g)
        l_ = read_group_table(spark, gdir, t_l, version=g)
        census = (
            o.join(l_, o.o_orderkey == l_.l_orderkey)
            .agg(
                F.round(F.sum("rev"), 2).cast("double").alias("revenue"),
                F.count(F.lit(1)).alias("n_join"),
            )
            .crossJoin(o.agg(F.count(F.lit(1)).alias("n_orders")))
            .crossJoin(l_.agg(F.count(F.lit(1)).alias("n_lineitem")))
            .select(
                F.lit(g).cast("long").alias("g"),
                "n_orders",
                "n_lineitem",
                "n_join",
                "revenue",
            )
        )
        out.append(census)
    return out[0].unionByName(out[1])


# the streaming Holt gate reuses the batch gate's recursive-CTE oracle
# verbatim — stream↔batch↔oracle three-way parity
from m13_sparkstreaming_python_azure_spark.queries.analytics_ext import (  # noqa: E402
    _HOLT_SQL,
)

R8_QUERIES = {
    "partition_evolution": q_partition_evolution,
    "streaming_holt_level": q_streaming_holt_level,
    "exact_substring_dedup": q_exact_substring_dedup,
    "bucketed_colocated_join": q_bucketed_colocated_join,
    "matryoshka_recall": q_matryoshka_recall,
    "salted_join_revenue": q_salted_join_revenue,
    "snapshot_commit_group": q_snapshot_commit_group,
}

R8_ORACLES = {
    "streaming_holt_level": _HOLT_SQL,
    "snapshot_commit_group": """
        WITH gs AS (SELECT 1 AS g UNION ALL SELECT 2),
        o AS (
            SELECT g.g, o_orderkey FROM orders o JOIN gs g
              ON g.g = 2 OR o.o_orderkey % 2 = 0
        ), l AS (
            SELECT g.g, l_orderkey,
                   CAST(CAST(l_extendedprice AS DECIMAL(19,6))
                        * (1 - CAST(l_discount AS DECIMAL(19,6)))
                        AS DECIMAL(19,6)) AS rev
            FROM lineitem l JOIN gs g
              ON g.g = 2 OR l.l_orderkey % 2 = 0
        ), j AS (
            SELECT o.g,
                   CAST(round(sum(l.rev), 2) AS DOUBLE) AS revenue,
                   CAST(count(*) AS BIGINT) AS n_join
            FROM o JOIN l ON o.g = l.g AND o.o_orderkey = l.l_orderkey
            GROUP BY o.g
        )
        SELECT j.g,
               (SELECT CAST(count(*) AS BIGINT) FROM o WHERE o.g = j.g)
                   AS n_orders,
               (SELECT CAST(count(*) AS BIGINT) FROM l WHERE l.g = j.g)
                   AS n_lineitem,
               j.n_join, j.revenue
        FROM j
    """,
    "salted_join_revenue": """
        SELECT s.s_nationkey AS nation,
               CAST(count(*) AS BIGINT) AS n_items,
               CAST(round(sum(CAST(
                   CAST(l.l_extendedprice AS DECIMAL(19,6))
                   * (1 - CAST(l.l_discount AS DECIMAL(19,6)))
                   AS DECIMAL(19,6))), 2) AS DOUBLE) AS revenue
        FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
        GROUP BY 1
    """,
    "bucketed_colocated_join": """
        SELECT o.o_orderstatus, o.o_orderpriority,
               CAST(count(*) AS BIGINT) AS n,
               CAST(round(sum(CAST(
                   CAST(l.l_extendedprice AS DECIMAL(19,6))
                   * (1 - CAST(l.l_discount AS DECIMAL(19,6)))
                   AS DECIMAL(19,6))), 2) AS DOUBLE) AS revenue
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        GROUP BY 1, 2
    """,
    "matryoshka_recall": """
        WITH q AS (
            SELECT embedding AS qv FROM embeddings WHERE vec_id = 0
        ), scored AS (
            SELECT e.vec_id,
                   (SELECT CAST(sum(
                        CAST(floor(e.embedding[i.i] * 1e6
                                   + CAST(0.5 AS DOUBLE)) AS BIGINT)
                        * CAST(floor(q.qv[i.i] * 1e6
                                     + CAST(0.5 AS DOUBLE)) AS BIGINT)
                    ) AS BIGINT)
                    FROM unnest(generate_series(1, 64)) AS i(i)) AS dot_full,
                   (SELECT CAST(sum(
                        CAST(floor(e.embedding[i.i] * 1e6
                                   + CAST(0.5 AS DOUBLE)) AS BIGINT)
                        * CAST(floor(q.qv[i.i] * 1e6
                                     + CAST(0.5 AS DOUBLE)) AS BIGINT)
                    ) AS BIGINT)
                    FROM unnest(generate_series(1, 16)) AS i(i)) AS dot_16
            FROM embeddings e CROSS JOIN q
            WHERE e.vec_id <> 0
        ), top_full AS (
            SELECT vec_id FROM scored
            ORDER BY dot_full DESC, vec_id LIMIT 10
        ), top_16 AS (
            SELECT vec_id FROM scored
            ORDER BY dot_16 DESC, vec_id LIMIT 10
        )
        SELECT CAST(count(*) AS BIGINT) AS n_overlap,
               count(*) / CAST(10.0 AS DOUBLE) AS recall_at_10
        FROM top_full SEMI JOIN top_16 USING (vec_id)
    """,
    "exact_substring_dedup": f"""
        WITH planted AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 7 = 0
                        THEN text || ' {_BOILERPLATE}'
                        ELSE text END AS text
            FROM documents
        ), toklists AS (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(text), '\\s+'),
                               x -> x <> '') AS tl
            FROM planted
        ), toks AS (
            SELECT doc_id, tl[g.i] AS tok, CAST(g.i AS BIGINT) AS pos
            FROM toklists,
                 unnest(generate_series(1, len(tl))) AS g(i)
        ), grams AS (
            SELECT doc_id, CAST(g.s1 AS BIGINT) AS s1,
                   array_to_string(tl[g.s1:g.s1 + 7], ' ') AS gram
            FROM toklists,
                 unnest(generate_series(1, len(tl) - 7)) AS g(s1)
        ), owners AS (
            SELECT gram, min(doc_id) AS owner FROM grams GROUP BY gram
        ), covered AS (
            SELECT DISTINCT g.doc_id, g.s1 + i.i AS pos
            FROM grams g
            JOIN owners o USING (gram),
                 unnest(generate_series(0, 7)) AS i(i)
            WHERE g.doc_id > o.owner
        ), kept AS (
            SELECT t.doc_id, t.tok, t.pos
            FROM toks t
            ANTI JOIN covered c ON t.doc_id = c.doc_id AND t.pos = c.pos
        ), rebuilt AS (
            SELECT doc_id,
                   CAST(count(*) AS BIGINT) AS n_kept,
                   string_agg(tok, ' ' ORDER BY pos) AS redacted
            FROM kept GROUP BY doc_id
        )
        SELECT tl.doc_id,
               CAST(len(tl.tl) AS BIGINT) AS n_tokens,
               CAST(len(tl.tl) - coalesce(r.n_kept, 0) AS BIGINT)
                   AS n_removed,
               md5(coalesce(r.redacted, '')) AS redacted_md5
        FROM toklists tl LEFT JOIN rebuilt r USING (doc_id)
    """,
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
