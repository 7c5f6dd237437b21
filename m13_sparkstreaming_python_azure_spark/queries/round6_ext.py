"""Round-6 components: deletion vectors, CHECK constraints, streaming CDC
upsert, NB domain classifier, HITS, pseudo-relevance feedback, QL
retrieval, fuzzy decontamination, n-gram novelty, OOV rate, CCF lag,
information gain, quantile regression, majority-vote label model.

Each query has a DuckDB oracle twin in R6_ORACLES (same column names —
the driver's gate hashes values under sorted column order)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
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


def q_nb_domain_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial naive-Bayes domain classifier
    (operators/classify.nb_classify — the counts-only member of the
    CCNet/fastText curation-filter family): train on 2/3 of documents
    (doc_id % 3 ≠ 0) predicting ``source``, score the held-out third,
    emit the argmax class per doc. Per-token smoothed log-likelihoods are
    grid-snapped to BIGINT before summing, so scores are exact integer
    sums the oracle reproduces bit-for-bit. Token-keyed shuffles only;
    the (vocab × classes) term table broadcasts at scale."""
    from m13_sparkstreaming_python_azure_spark.operators.classify import (
        nb_classify,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "source"
    )
    train = docs.filter(F.col("doc_id") % 3 != 0)
    held = docs.filter(F.col("doc_id") % 3 == 0)
    return nb_classify(train, held, "source")


_NB_DOMAIN_SQL = """
    WITH train AS (
        SELECT doc_id, source,
               list_filter(string_split_regex(lower(text), '\\s+'),
                           x -> x <> '') AS ts
        FROM documents WHERE doc_id % 3 <> 0
    ), tok AS (
        SELECT source, unnest(ts) AS token FROM train
    ), cct AS (
        SELECT source, token, count(*) AS c FROM tok GROUP BY 1, 2
    ), totc AS (
        SELECT source, count(*) AS tot FROM tok GROUP BY 1
    ), vocab AS (
        SELECT DISTINCT token FROM tok
    ), vs AS (
        SELECT count(*) AS v FROM vocab
    ), prior AS (
        SELECT source, count(*) AS n_docs FROM train GROUP BY 1
    ), ntot AS (
        SELECT count(*) AS n FROM train
    ), term AS (
        SELECT t.source, vb.token,
               CAST(floor(ln((coalesce(c.c, 0) + 1) / (t.tot + vs.v))
                          * 1000000 + 0.5) AS BIGINT) AS g_term
        FROM vocab vb
        CROSS JOIN totc t
        CROSS JOIN vs
        LEFT JOIN cct c ON c.source = t.source AND c.token = vb.token
    ), prior_g AS (
        SELECT source,
               CAST(floor(ln(n_docs / n.n) * 1000000 + 0.5) AS BIGINT)
                   AS g_prior
        FROM prior CROSS JOIN ntot n
    ), held AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\\s+'),
                           x -> x <> '') AS ts
        FROM documents WHERE doc_id % 3 = 0
    ), stok AS (
        SELECT doc_id, unnest(ts) AS token FROM held
    ), tok_scores AS (
        SELECT s.doc_id, t.source, sum(t.g_term) AS g_tokens
        FROM stok s JOIN term t ON t.token = s.token
        GROUP BY 1, 2
    ), all_pairs AS (
        SELECT h.doc_id, p.source FROM held h CROSS JOIN prior p
    ), scored AS (
        SELECT a.doc_id, a.source,
               coalesce(ts.g_tokens, 0) + pg.g_prior AS score
        FROM all_pairs a
        LEFT JOIN tok_scores ts
            ON ts.doc_id = a.doc_id AND ts.source = a.source
        JOIN prior_g pg ON pg.source = a.source
    ), ranked AS (
        SELECT doc_id, source, score,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY score DESC, source ASC) AS rn
        FROM scored
    )
    SELECT doc_id, source AS pred_source, CAST(score AS BIGINT) AS score
    FROM ranked WHERE rn = 1
"""




def q_hits_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs & authorities (operators/graph.hits, Kleinberg '99) on
    the customer→supplier purchase graph (distinct (o_custkey, l_suppkey)
    edges through orders⋈lineitem). 6 fixed rounds; scores live on a 1e6
    BIGINT grid with exact integer L1 normalization ((x·G) DIV Σx), so
    hubs/authorities are bit-equal to the oracle's unrolled-CTE replay.
    Each round is two node-keyed join+aggregate supersteps, lineage
    truncated per round — the same O(rounds) shape as pagerank."""
    from m13_sparkstreaming_python_azure_spark.operators.graph import hits

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    edges = orders.join(
        li, orders["o_orderkey"] == li["l_orderkey"]
    ).select(
        F.concat(F.lit("c"), F.col("o_custkey")).alias("src"),
        F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst"),
    )
    return hits(edges, iterations=6)


def _hits_oracle_sql(iterations: int = 6) -> str:
    ctes = [
        """e AS MATERIALIZED (
            SELECT DISTINCT 'c' || o_custkey AS s, 's' || l_suppkey AS d
            FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        )""",
        """h0 AS MATERIALIZED (
            SELECT s AS node, CAST(1000000 AS BIGINT) AS h
            FROM (SELECT DISTINCT s FROM e)
        )""",
    ]
    for i in range(1, iterations + 1):
        ctes.append(
            f"""ar{i} AS MATERIALIZED (
            SELECT d AS node, sum(h) AS raw
            FROM e JOIN h{i - 1} ON e.s = h{i - 1}.node GROUP BY d
        )"""
        )
        ctes.append(
            f"""a{i} AS MATERIALIZED (
            SELECT node,
                   CAST((raw * 1000000) // (SELECT sum(raw) FROM ar{i})
                        AS BIGINT) AS a
            FROM ar{i}
        )"""
        )
        ctes.append(
            f"""hr{i} AS MATERIALIZED (
            SELECT s AS node, sum(a) AS raw
            FROM e JOIN a{i} ON e.d = a{i}.node GROUP BY s
        )"""
        )
        ctes.append(
            f"""h{i} AS MATERIALIZED (
            SELECT node,
                   CAST((raw * 1000000) // (SELECT sum(raw) FROM hr{i})
                        AS BIGINT) AS h
            FROM hr{i}
        )"""
        )
    n = iterations
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
        SELECT coalesce(h{n}.node, a{n}.node) AS node,
               CAST(coalesce(h, 0) AS BIGINT) AS hub,
               CAST(coalesce(a, 0) AS BIGINT) AS authority
        FROM h{n} FULL OUTER JOIN a{n} ON h{n}.node = a{n}.node
    """
    )


def q_info_gain_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Information-gain feature ranking (operators/stats.info_gain — the
    decision-stump/feature-selection primitive): IG(status; X) for four
    candidate features over orders, on an exact integer grid (each
    count-weighted ln term snaps to BIGINT before the sum — fold-order
    immune). ``ship_const`` is a constant column and must score exactly
    0 (negative control); ``priority`` and the price bin carry signal.
    One map-side-combinable groupBy per feature."""
    from m13_sparkstreaming_python_azure_spark.operators.stats import (
        info_gain,
    )

    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderpriority").alias("priority"),
        F.lit(0).alias("ship_const"),
        F.floor(
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)) / 10000000
        )
        .cast("long")
        .alias("cents_bin"),
        (F.col("o_custkey") % 7).alias("cust_bucket"),
    )
    return info_gain(
        orders, ["priority", "ship_const", "cents_bin", "cust_bucket"],
        "status",
    )


_INFO_GAIN_SQL = """
    WITH base AS (
        SELECT o_orderstatus AS status,
               o_orderpriority AS priority,
               0 AS ship_const,
               CAST(floor(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                          / 10000000) AS BIGINT) AS cents_bin,
               o_custkey % 7 AS cust_bucket
        FROM orders
    ), n AS (SELECT count(*) AS n_total FROM base),
    g0 AS (
        SELECT sum(n_y * CAST(floor(ln(n_y / n.n_total) * 1000000 + 0.5)
                              AS BIGINT)) AS g
        FROM (SELECT status, count(*) AS n_y FROM base GROUP BY status)
        CROSS JOIN n
    ),
    feat AS (
        SELECT 'priority' AS feature, CAST(priority AS VARCHAR) AS x, status
        FROM base
        UNION ALL
        SELECT 'ship_const', CAST(ship_const AS VARCHAR), status FROM base
        UNION ALL
        SELECT 'cents_bin', CAST(cents_bin AS VARCHAR), status FROM base
        UNION ALL
        SELECT 'cust_bucket', CAST(cust_bucket AS VARCHAR), status FROM base
    ),
    cells AS (
        SELECT feature, x, status, count(*) AS n_xy
        FROM feat GROUP BY 1, 2, 3
    ),
    nx AS (
        SELECT feature, x, sum(n_xy) AS n_x FROM cells GROUP BY 1, 2
    )
    SELECT c.feature,
           CAST(sum(n_xy * CAST(floor(ln(n_xy / n_x) * 1000000 + 0.5)
                                AS BIGINT)) - (SELECT g FROM g0)
                AS BIGINT) AS ig_scaled
    FROM cells c JOIN nx ON nx.feature = c.feature AND nx.x = c.x
    GROUP BY c.feature
"""


def q_majority_vote_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weak-supervision label model (operators/classify
    .weighted_majority_vote — one Dawid-Skene step): five synthetic
    annotators vote per document (md5-derived: 70% the true source, 30% a
    deterministic confusion), round 1 takes the plain majority, round 2
    re-votes weighting each annotator by integer agreement with round 1.
    All-integer arithmetic; the oracle replays both rounds. Per-worker
    weights broadcast; shuffles key on doc or worker only."""
    from m13_sparkstreaming_python_azure_spark.operators.classify import (
        weighted_majority_vote,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    votes = docs.select(
        "doc_id",
        "source",
        F.explode(
            F.array(*[F.lit(f"w{i}") for i in range(1, 6)])
        ).alias("worker"),
    ).select(
        "doc_id",
        "worker",
        F.when(
            F.conv(
                F.substring(
                    F.md5(F.concat_ws(":", F.col("worker"), F.col("doc_id"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % 10
            < 7,
            F.col("source"),
        )
        .otherwise(
            F.concat(
                F.lit("src"),
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat_ws(
                                ";", F.col("worker"), F.col("doc_id")
                            )
                        ),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("long")
                % 20,
            )
        )
        .alias("label"),
    )
    return weighted_majority_vote(
        votes, item_col="doc_id", worker_col="worker", label_col="label"
    )


_MAJORITY_VOTE_SQL = """
    WITH workers AS (
        SELECT unnest(['w1', 'w2', 'w3', 'w4', 'w5']) AS worker
    ), votes AS (
        SELECT d.doc_id, w.worker,
               CASE WHEN ('0x' || substring(md5(w.worker || ':' || d.doc_id),
                                            1, 8))::BIGINT % 10 < 7
                    THEN d.source
                    ELSE 'src' ||
                         (('0x' || substring(md5(w.worker || ';' || d.doc_id),
                                             1, 8))::BIGINT % 20)
               END AS vote
        FROM documents d CROSS JOIN workers w
    ), r1 AS (
        SELECT doc_id, vote AS consensus1
        FROM (
            SELECT doc_id, vote, count(*) AS n,
                   row_number() OVER (PARTITION BY doc_id
                                      ORDER BY count(*) DESC, vote ASC) AS rn
            FROM votes GROUP BY doc_id, vote
        ) WHERE rn = 1
    ), acc AS (
        SELECT v.worker,
               sum(CASE WHEN v.vote = r.consensus1 THEN 1 ELSE 0 END)
                   AS weight
        FROM votes v JOIN r1 r ON r.doc_id = v.doc_id
        GROUP BY v.worker
    ), r2 AS (
        SELECT doc_id, vote, w,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY w DESC, vote ASC) AS rn
        FROM (
            SELECT v.doc_id, v.vote, sum(a.weight) AS w
            FROM votes v JOIN acc a ON a.worker = v.worker
            GROUP BY v.doc_id, v.vote
        )
    )
    SELECT doc_id, vote AS consensus, CAST(w AS BIGINT) AS weight
    FROM r2 WHERE rn = 1
"""



def q_bm25_prf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 + pseudo-relevance feedback (operators/retrieval
    .bm25_prf_search, RM3-style): seed query ('hash', 'join') → top-10
    feedback docs → 5 heaviest non-query expansion terms (exact counts) →
    re-score with the expanded set → top-20. Grid-snapped contributions
    make every stage integer-exact; the oracle replays both passes. One
    tokenize pass serves both rounds; term stats broadcast."""
    from m13_sparkstreaming_python_azure_spark.operators.retrieval import (
        bm25_prf_search,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return bm25_prf_search(docs, ["hash", "join"])


_BM25_PRF_SQL = """
    WITH tokd AS MATERIALIZED (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\\s+'),
                           x -> x <> '') AS ts
        FROM documents
    ), tok AS MATERIALIZED (
        SELECT doc_id, len(ts) AS dl, unnest(ts) AS term FROM tokd
    ), stats AS MATERIALIZED (
        SELECT CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(len(ts)) AS BIGINT) AS sum_dl
        FROM tokd
    ), seed AS (
        SELECT unnest(['hash', 'join']) AS term
    ), tf1 AS MATERIALIZED (
        SELECT t.doc_id, t.dl, t.term, CAST(count(*) AS BIGINT) AS tf
        FROM tok t JOIN seed q ON q.term = t.term
        GROUP BY 1, 2, 3
    ), df1 AS (
        SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf1 GROUP BY 1
    ), s1 AS MATERIALIZED (
        SELECT tf1.doc_id,
               sum(CAST(floor(
                   ln(CAST(1.0 AS DOUBLE)
                      + (n_docs - df + CAST(0.5 AS DOUBLE))
                        / (df + CAST(0.5 AS DOUBLE)))
                   * (tf * CAST(2.2 AS DOUBLE))
                   / (tf + CAST(1.2 AS DOUBLE)
                      * (CAST(1.0 AS DOUBLE) - CAST(0.75 AS DOUBLE)
                         + (CAST(0.75 AS DOUBLE) * dl) / (sum_dl / n_docs)))
                   * 1000000 + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS score
        FROM tf1 JOIN df1 USING (term) CROSS JOIN stats
        GROUP BY tf1.doc_id
    ), fb AS MATERIALIZED (
        SELECT doc_id FROM (
            SELECT doc_id,
                   row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rn
            FROM s1
        ) WHERE rn <= 10
    ), expansion AS MATERIALIZED (
        SELECT term FROM (
            SELECT t.term, count(*) AS cnt,
                   row_number() OVER (ORDER BY count(*) DESC, t.term ASC)
                       AS rn
            FROM tok t JOIN fb USING (doc_id)
            WHERE t.term NOT IN ('hash', 'join')
            GROUP BY t.term
        ) WHERE rn <= 5
    ), terms2 AS MATERIALIZED (
        SELECT term FROM seed UNION ALL SELECT term FROM expansion
    ), tf2 AS MATERIALIZED (
        SELECT t.doc_id, t.dl, t.term, CAST(count(*) AS BIGINT) AS tf
        FROM tok t JOIN terms2 q ON q.term = t.term
        GROUP BY 1, 2, 3
    ), df2 AS (
        SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf2 GROUP BY 1
    ), s2 AS MATERIALIZED (
        SELECT tf2.doc_id,
               sum(CAST(floor(
                   ln(CAST(1.0 AS DOUBLE)
                      + (n_docs - df + CAST(0.5 AS DOUBLE))
                        / (df + CAST(0.5 AS DOUBLE)))
                   * (tf * CAST(2.2 AS DOUBLE))
                   / (tf + CAST(1.2 AS DOUBLE)
                      * (CAST(1.0 AS DOUBLE) - CAST(0.75 AS DOUBLE)
                         + (CAST(0.75 AS DOUBLE) * dl) / (sum_dl / n_docs)))
                   * 1000000 + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS score
        FROM tf2 JOIN df2 USING (term) CROSS JOIN stats
        GROUP BY tf2.doc_id
    )
    SELECT doc_id, CAST(score AS BIGINT) AS score, CAST(rn AS INT) AS rank
    FROM (
        SELECT doc_id, score,
               row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rn
        FROM s2
    ) WHERE rn <= 20
"""


def q_ql_dirichlet_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-likelihood retrieval with Dirichlet smoothing
    (operators/retrieval.ql_dirichlet_scores, Zhai & Lafferty '01) for
    ('hash', 'join', 'stream'), μ=2000: candidates matching ≥1 term score
    over ALL query terms (tf=0 terms contribute background mass
    μ·ctf/|C|), per-term lns grid-snapped → exact integer scores; top-20
    with id tiebreak. Corpus stats are one token-keyed aggregate; no
    cartesian."""
    from m13_sparkstreaming_python_azure_spark.operators.retrieval import (
        ql_dirichlet_scores,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return ql_dirichlet_scores(docs, ["hash", "join", "stream"])


_QL_DIRICHLET_SQL = """
    WITH tokd AS MATERIALIZED (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\\s+'),
                           x -> x <> '') AS ts
        FROM documents
    ), tok AS MATERIALIZED (
        SELECT doc_id, len(ts) AS dl, unnest(ts) AS term FROM tokd
    ), clen AS (
        SELECT CAST(count(*) AS BIGINT) AS c_len FROM tok
    ), q AS (
        SELECT unnest(['hash', 'join', 'stream']) AS term
    ), ctf AS MATERIALIZED (
        SELECT t.term, CAST(count(*) AS BIGINT) AS ctf
        FROM tok t JOIN q ON q.term = t.term GROUP BY 1
    ), tf AS MATERIALIZED (
        SELECT t.doc_id, t.dl, t.term, CAST(count(*) AS BIGINT) AS tf
        FROM tok t JOIN q ON q.term = t.term GROUP BY 1, 2, 3
    ), cand AS (
        SELECT DISTINCT doc_id, dl FROM tf
    ), pairs AS (
        SELECT c.doc_id, c.dl, q.term FROM cand c CROSS JOIN q
    ), scored AS (
        SELECT p.doc_id,
               sum(CAST(floor(
                   ln((coalesce(tf.tf, 0) + 2000 * (ctf.ctf / c.c_len))
                      / (p.dl + 2000))
                   * 1000000 + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS score
        FROM pairs p
        LEFT JOIN tf ON tf.doc_id = p.doc_id AND tf.term = p.term
        JOIN ctf ON ctf.term = p.term
        CROSS JOIN clen c
        GROUP BY p.doc_id
    )
    SELECT doc_id, CAST(score AS BIGINT) AS score, CAST(rn AS INT) AS rank
    FROM (
        SELECT doc_id, score,
               row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rn
        FROM scored
    ) WHERE rn <= 20
"""



def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document 8-gram novelty (operators/text.ngram_novelty): of a
    doc's distinct positional 8-grams, how many occur in no other doc —
    the memorization/duplication-risk signal (Lee et al. '22). One
    gram-keyed shuffle + one doc rollup; nothing quadratic."""
    from m13_sparkstreaming_python_azure_spark.operators.text import (
        ngram_novelty,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return ngram_novelty(docs, n=8)


_NGRAM_NOVELTY_SQL = """
    WITH toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\\s+'),
                           x -> x <> '') AS t
        FROM documents
    ), grams AS (
        SELECT DISTINCT doc_id, gram FROM (
            SELECT doc_id,
                   unnest(list_transform(
                       range(1, greatest(len(t) - 7, 1) + 1),
                       i -> array_to_string(t[i:i+7], ' ')
                   )) AS gram
            FROM toks
        ) WHERE gram <> ''
    ), dfg AS (
        SELECT gram, count(*) AS df FROM grams GROUP BY gram
    )
    SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
           CAST(sum(CASE WHEN d.df = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_novel
    FROM grams g JOIN dfg d USING (gram)
    GROUP BY g.doc_id
"""


def q_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary rate per doc (operators/text.oov_rate) against
    the corpus's own top-1000 token vocabulary — tokenizer-coverage
    tracking per document. Vocab is one broadcast aggregate; OOV counting
    is a token-keyed left join."""
    from m13_sparkstreaming_python_azure_spark.operators.text import oov_rate

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return oov_rate(docs, vocab_size=1000)


_OOV_RATE_SQL = """
    WITH tok AS (
        SELECT doc_id,
               unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                  x -> x <> '')) AS token
        FROM documents
    ), vocab AS (
        SELECT token FROM (
            SELECT token, count(*) AS cnt,
                   row_number() OVER (ORDER BY count(*) DESC, token ASC)
                       AS rn
            FROM tok GROUP BY token
        ) WHERE rn <= 1000
    )
    SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_oov
    FROM tok t LEFT JOIN vocab v ON v.token = t.token
    GROUP BY t.doc_id
"""


def q_fuzzy_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy benchmark decontamination (operators/dedup
    .fuzzy_contamination_pairs): benchmark = every %97 doc; the corpus is
    the remaining docs PLUS planted leaks — each benchmark doc re-entering
    truncated to its first 4/5 tokens under id+200000 (paraphrase-ish
    leakage that exact n-gram matching underweights). MinHash-LSH
    (md5-derived, 16×4) candidates verify by exact shingle Jaccard ≥ 0.5;
    the planted leaks must surface. Banded equi-join only — never
    corpus × benchmark."""
    from m13_sparkstreaming_python_azure_spark.operators.dedup import (
        fuzzy_contamination_pairs,
    )
    from m13_sparkstreaming_python_azure_spark.operators.text import tokens

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    t = tokens("text")
    planted = bench.filter(F.size(t) >= 5).select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.concat_ws(
            " ", F.slice(t, 1, ((F.size(t) * 4) / 5).cast("int"))
        ).alias("text"),
    )
    corpus = docs.filter(F.col("doc_id") % 97 != 0).unionByName(planted)
    return fuzzy_contamination_pairs(corpus, bench)


_FUZZY_DECONTAM_SQL = """
    WITH toksrc AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\\s+'),
                           x -> x <> '') AS t
        FROM documents
    ), bench AS (
        SELECT doc_id, t FROM toksrc WHERE doc_id % 97 = 0
    ), corpus AS (
        SELECT doc_id, t FROM toksrc WHERE doc_id % 97 <> 0
        UNION ALL
        SELECT doc_id + 200000, t[1:(len(t) * 4) // 5]
        FROM bench WHERE len(t) >= 5
    ), cg AS (
        SELECT DISTINCT doc_id, gram FROM (
            SELECT doc_id,
                   unnest(list_transform(
                       range(1, greatest(len(t) - 2, 1) + 1),
                       i -> array_to_string(t[i:i+2], ' ')
                   )) AS gram
            FROM corpus WHERE len(t) > 0
        )
    ), bg AS (
        SELECT DISTINCT doc_id, gram FROM (
            SELECT doc_id,
                   unnest(list_transform(
                       range(1, greatest(len(t) - 2, 1) + 1),
                       i -> array_to_string(t[i:i+2], ' ')
                   )) AS gram
            FROM bench WHERE len(t) > 0
        )
    ), hi AS (SELECT unnest(range(0, 16)) AS i),
    cmh AS MATERIALIZED (
        SELECT g.doc_id, hi.i,
               min(('0x' || substring(
                   md5(CAST(hi.i AS VARCHAR) || ':' || g.gram), 1, 15
               ))::BIGINT) AS h
        FROM cg g CROSS JOIN hi GROUP BY g.doc_id, hi.i
    ), bmh AS MATERIALIZED (
        SELECT g.doc_id, hi.i,
               min(('0x' || substring(
                   md5(CAST(hi.i AS VARCHAR) || ':' || g.gram), 1, 15
               ))::BIGINT) AS h
        FROM bg g CROSS JOIN hi GROUP BY g.doc_id, hi.i
    ), cbnd AS MATERIALIZED (
        SELECT doc_id, substring(md5(
                   CAST(i // 4 AS VARCHAR) || ',' ||
                   string_agg(CAST(h AS VARCHAR), ',' ORDER BY i)
               ), 1, 16) AS bkt
        FROM cmh GROUP BY doc_id, i // 4
    ), bbnd AS MATERIALIZED (
        SELECT doc_id, substring(md5(
                   CAST(i // 4 AS VARCHAR) || ',' ||
                   string_agg(CAST(h AS VARCHAR), ',' ORDER BY i)
               ), 1, 16) AS bkt
        FROM bmh GROUP BY doc_id, i // 4
    ), cand AS (
        SELECT DISTINCT c.doc_id AS cid, b.doc_id AS bid
        FROM cbnd c JOIN bbnd b USING (bkt)
    ), sizes_c AS (
        SELECT doc_id, count(*) AS n FROM cg GROUP BY doc_id
    ), sizes_b AS (
        SELECT doc_id, count(*) AS n FROM bg GROUP BY doc_id
    ), inter AS (
        SELECT c.cid, c.bid, count(*) AS ni
        FROM cand c
        JOIN cg ON cg.doc_id = c.cid
        JOIN bg ON bg.doc_id = c.bid AND bg.gram = cg.gram
        GROUP BY c.cid, c.bid
    )
    SELECT i.cid AS corpus_id, i.bid AS bench_id,
           CAST(i.ni AS DOUBLE) / (sc.n + sb.n - i.ni) AS jaccard
    FROM inter i
    JOIN sizes_c sc ON sc.doc_id = i.cid
    JOIN sizes_b sb ON sb.doc_id = i.bid
    WHERE CAST(i.ni AS DOUBLE) / (sc.n + sb.n - i.ni)
          >= CAST(0.5 AS DOUBLE)
"""


def q_ccf_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-correlation function (operators/timeseries.ccf_lags) between
    the daily click and purchase count series at lags −7..7 — lead/lag
    detection between two event streams. The ACF exact-integer centering
    trick in two-series form: numerators and denominators are exact
    BIGINTs, the final ratio is division + sqrt (both IEEE-exact), so the
    doubles hash-match with no grid. One row per day before the lag
    join."""
    from m13_sparkstreaming_python_azure_spark.operators.timeseries import (
        ccf_lags,
    )

    ev = load_table(spark, sf_dir, "events")
    day = (
        F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000)
        .cast("long")
        .alias("day")
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(day)
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("y"))
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(day)
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("y"))
    )
    return ccf_lags(clicks, purchases, max_lag=7)


_CCF_LAG_SQL = """
    WITH a AS (
        SELECT CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS day,
               CAST(count(*) AS BIGINT) AS ya
        FROM events WHERE event_type = 'click' GROUP BY 1
    ), b AS (
        SELECT CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS day,
               CAST(count(*) AS BIGINT) AS yb
        FROM events WHERE event_type = 'purchase' GROUP BY 1
    ), j AS (
        SELECT a.day, ya, yb FROM a JOIN b USING (day)
    ), z AS (
        SELECT CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS idx,
               CAST(count(*) OVER () * ya - sum(ya) OVER () AS BIGINT) AS za,
               CAST(count(*) OVER () * yb - sum(yb) OVER () AS BIGINT) AS zb
        FROM j
    ), den AS (
        SELECT CAST(sum(za * za) AS BIGINT) AS da,
               CAST(sum(zb * zb) AS BIGINT) AS db
        FROM z
    ), lags AS (
        SELECT CAST(unnest(generate_series(-7, 7)) AS BIGINT) AS lag
    ), num AS (
        SELECT l.lag, CAST(sum(x.za * y.zb) AS BIGINT) AS num
        FROM z x
        CROSS JOIN lags l
        JOIN z y ON x.idx - l.lag = y.idx
        GROUP BY l.lag
    )
    SELECT lag,
           num / sqrt(CAST(da AS DOUBLE) * CAST(db AS DOUBLE)) AS ccf
    FROM num CROSS JOIN den
"""



_QR_ITERS = 3
_QR_TAU = 0.9
_QR_DELTA = 100.0


def q_quantile_regression_p90(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile (pinball, τ=0.9) regression of price on quantity via
    IRLS — completes the fit family (OLS / Huber / LAD=τ0.5 in
    science_ext): asymmetric weights w = (r≥0 ? τ : 1−τ)/max(|r|, δ)
    re-solve the SAME weighted sufficient-statistics system as LAD
    (queries/science_ext.q_lad_regression), 3 unrolled iterations from
    the OLS start. Every weighted product snaps to a 1e-6 BIGINT grid
    pre-sum (fold-order immune); the oracle unrolls identical chained
    CTEs. Output adds the mean pinball loss (1e-2-grid pre-sum) — the
    objective the τ-quantile fit minimizes."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("long").alias("x"),
        F.floor(F.col("l_extendedprice")).cast("long").alias("y"),
    )
    stats = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    slope0 = (
        F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    ).cast("double") / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    fit = stats.select(
        slope0.alias("b"),
        ((F.col("sy") - slope0 * F.col("sx")) / F.col("n")).alias("a"),
    )

    def _q6(c):
        return F.floor(c * 1e6 + F.lit(0.5)).cast("long")

    def _snap6(c):
        return F.floor(c * 1e6 + F.lit(0.5)) / 1e6

    tau, delta = F.lit(_QR_TAU), F.lit(_QR_DELTA)
    for _ in range(_QR_ITERS):
        scored = li.crossJoin(F.broadcast(fit))
        r = F.col("y") - (F.col("a") + F.col("b") * F.col("x"))
        w = F.when(r >= 0, tau).otherwise(F.lit(1.0) - tau) / F.greatest(
            F.abs(r), delta
        )
        agg = scored.agg(
            F.sum(_q6(w)).alias("qw"),
            F.sum(_q6(w * F.col("x"))).alias("qwx"),
            F.sum(_q6(w * F.col("y"))).alias("qwy"),
            F.sum(_q6(w * F.col("x") * F.col("y"))).alias("qwxy"),
            F.sum(_q6(w * F.col("x") * F.col("x"))).alias("qwxx"),
        )
        sw = F.col("qw") / 1e6
        swx = F.col("qwx") / 1e6
        swy = F.col("qwy") / 1e6
        swxy = F.col("qwxy") / 1e6
        swxx = F.col("qwxx") / 1e6
        b = (sw * swxy - swx * swy) / (sw * swxx - swx * swx)
        fit = agg.select(
            b.alias("b"), ((swy - b * swx) / sw).alias("a")
        )
    final = li.crossJoin(F.broadcast(fit))
    r = F.col("y") - (F.col("a") + F.col("b") * F.col("x"))
    pinball = F.when(r >= 0, tau * r).otherwise((tau - F.lit(1.0)) * r)
    q2 = F.floor(pinball * 1e2 + F.lit(0.5)).cast("long")
    return final.agg(
        F.count(F.lit(1)).alias("n"),
        _snap6(F.first("b")).alias("slope"),
        _snap6(F.first("a")).alias("intercept"),
        _snap6(F.sum(q2) / 1e2 / F.count(F.lit(1))).alias(
            "mean_pinball"
        ),
    )


def _qr_sql() -> str:
    d = "CAST(100.0 AS DOUBLE)"
    sql = """
    WITH li AS (
        SELECT CAST(l_quantity AS BIGINT) AS x,
               CAST(floor(l_extendedprice) AS BIGINT) AS y
        FROM lineitem
    ), stats AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS sx,
               CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(x * y) AS BIGINT) AS sxy,
               CAST(sum(x * x) AS BIGINT) AS sxx
        FROM li
    ), fit_0 AS (
        SELECT CAST(n * sxy - sx * sy AS DOUBLE)
                   / (n * sxx - sx * sx) AS b,
               (sy - CAST(n * sxy - sx * sy AS DOUBLE)
                   / (n * sxx - sx * sx) * sx) / n AS a
        FROM stats
    )"""
    wexpr = (
        "(CASE WHEN (y - (f.a + f.b * x)) >= 0 THEN CAST(0.9 AS DOUBLE)"
        " ELSE CAST(1.0 AS DOUBLE) - CAST(0.9 AS DOUBLE) END)"
        " / greatest(abs(y - (f.a + f.b * x)), {d})".format(d=d)
    )

    def q6(expr: str) -> str:
        return (
            "CAST(sum(CAST(floor(({e}) * 1e6 + CAST(0.5 AS DOUBLE))"
            " AS BIGINT)) AS BIGINT)".format(e=expr)
        )

    for k in range(1, _QR_ITERS + 1):
        sql += f""", sc_{k} AS (
        SELECT {q6(wexpr)} AS qw,
               {q6(wexpr + " * x")} AS qwx,
               {q6(wexpr + " * y")} AS qwy,
               {q6(wexpr + " * x * y")} AS qwxy,
               {q6(wexpr + " * x * x")} AS qwxx
        FROM li CROSS JOIN fit_{k - 1} f
    ), fit_{k} AS (
        SELECT ((s.qw / 1e6) * (s.qwxy / 1e6)
                - (s.qwx / 1e6) * (s.qwy / 1e6))
               / ((s.qw / 1e6) * (s.qwxx / 1e6)
                  - (s.qwx / 1e6) * (s.qwx / 1e6)) AS b,
               ((s.qwy / 1e6)
                - ((s.qw / 1e6) * (s.qwxy / 1e6)
                   - (s.qwx / 1e6) * (s.qwy / 1e6))
                  / ((s.qw / 1e6) * (s.qwxx / 1e6)
                     - (s.qwx / 1e6) * (s.qwx / 1e6))
                  * (s.qwx / 1e6)) / (s.qw / 1e6) AS a
        FROM sc_{k} s CROSS JOIN fit_{k - 1} f
    )"""
    sql += f"""
    SELECT CAST(count(*) AS BIGINT) AS n,
           floor(f.b * 1e6 + 0.5) / 1e6 AS slope,
           floor(f.a * 1e6 + 0.5) / 1e6 AS intercept,
           floor((CAST(sum(CAST(floor(
                       (CASE WHEN (y - (f.a + f.b * x)) >= 0
                             THEN CAST(0.9 AS DOUBLE) * (y - (f.a + f.b * x))
                             ELSE (CAST(0.9 AS DOUBLE) - CAST(1.0 AS DOUBLE))
                                  * (y - (f.a + f.b * x)) END) * 1e2
                       + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS DOUBLE)
                  / 1e2 / count(*)) * 1e6 + 0.5) / 1e6 AS mean_pinball
    FROM li CROSS JOIN fit_{_QR_ITERS} f
    GROUP BY f.a, f.b
"""
    return sql



def q_partitioned_snapshot_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-partitioned snapshot with manifest-level partition pruning
    (sources/snapshots.write_snapshot_partitioned /
    read_snapshot_partitions / replace_partition — the Delta/Iceberg
    metadata-pruning primitive): orders land partitioned by status, the
    'O' partition is atomically recomputed at 90% price
    (INSERT OVERWRITE PARTITION parity; out-of-partition rows rejected),
    then a PRUNED read of {'O','F'} plans only those partitions' files —
    at 100 TB this is the difference between scanning 2 partitions and
    scanning the table. The oracle states the final slice directly."""
    import os
    import tempfile

    from m13_sparkstreaming_python_azure_spark.sources.snapshots import (
        read_snapshot_partitions,
        replace_partition,
        write_snapshot_partitioned,
    )

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    root = tempfile.mkdtemp(prefix="partsnap-")
    table = os.path.join(root, "t")
    write_snapshot_partitioned(orders, table, "o_orderstatus")
    repriced = orders.filter(F.col("o_orderstatus") == "O").select(
        "o_orderkey",
        "o_orderstatus",
        F.floor((F.col("cents") * 9) / 10).cast("long").alias("cents"),
    )
    replace_partition(repriced, table, "O")
    return (
        read_snapshot_partitions(spark, table, ["O", "F"])
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("cents").alias("total_cents"),
        )
    )


_PARTITIONED_SNAPSHOT_SQL = """
    WITH base AS (
        SELECT o_orderkey, o_orderstatus,
               CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        FROM orders
    ), final AS (
        SELECT o_orderstatus, cents FROM base
        WHERE o_orderstatus = 'F'
        UNION ALL
        SELECT o_orderstatus, (cents * 9) // 10 FROM base
        WHERE o_orderstatus = 'O'
    )
    SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(cents) AS BIGINT) AS total_cents
    FROM final GROUP BY o_orderstatus
"""



def q_streaming_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming expectations with quarantine (streaming/pipeline
    .expectations_batch_router — Delta Live Tables expect_or_drop
    parity): events with planted violations (negative value every %13
    id, unknown type every %17, NULL value every %19) replay as two
    chunks; each micro-batch routes passing rows to the main snapshot
    table and failing rows — tagged with the sorted names of every
    constraint they failed — to a quarantine table. Good data keeps
    flowing; the quarantine preserves evidence. Output: per-segment
    row counts and cent sums across both tables; the oracle states the
    routing directly."""
    import os
    import tempfile
    import uuid

    from m13_sparkstreaming_python_azure_spark.sources.filestream import (
        parquet_file_stream,
    )
    from m13_sparkstreaming_python_azure_spark.sources.replay import (
        publish_chunk,
    )
    from m13_sparkstreaming_python_azure_spark.sources.snapshots import (
        read_snapshot,
    )
    from m13_sparkstreaming_python_azure_spark.streaming.pipeline import (
        expectations_batch_router,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.when(F.col("event_id") % 17 == 0, F.lit("bogus"))
        .otherwise(F.col("event_type"))
        .alias("event_type"),
        F.when(
            F.col("event_id") % 19 == 0, F.lit(None).cast("double")
        )
        .when(
            F.col("event_id") % 13 == 0, -F.abs(F.col("value")) - F.lit(1.0)
        )
        .otherwise(F.col("value"))
        .alias("value"),
    )
    constraints = {
        "value_nonneg": "value >= 0",
        "type_known": (
            "event_type IN ('click', 'view', 'purchase', 'signup', 'error')"
        ),
    }
    root = tempfile.mkdtemp(prefix="expect-")
    land, ck, main, quar = (
        os.path.join(root, d) for d in ("land", "ck", "main", "quar")
    )
    router = expectations_batch_router(constraints, main, quar)
    chunks = [
        ev.filter(F.col("event_id") % 2 == 0),
        ev.filter(F.col("event_id") % 2 == 1),
    ]
    publish_chunk(chunks[0], land)
    stream = parquet_file_stream(
        spark, land, "event_id long, event_type string, value double"
    )
    q = (
        stream.writeStream.foreachBatch(router)
        .option("checkpointLocation", ck)
        .queryName(f"expect_{uuid.uuid4().hex[:8]}")
        .start()
    )
    q.processAllAvailable()
    publish_chunk(chunks[1], land)
    q.processAllAvailable()
    q.stop()
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    good = (
        read_snapshot(spark, main)
        .groupBy(
            F.concat(F.lit("main:"), F.col("event_type")).alias("segment")
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(cents).alias("cents_sum"),
        )
    )
    bad = (
        read_snapshot(spark, quar)
        .groupBy(F.concat(F.lit("q:"), F.col("failed")).alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(cents).alias("cents_sum"),
        )
    )
    return good.unionByName(bad)


_STREAMING_EXPECTATIONS_SQL = """
    WITH ev AS (
        SELECT event_id,
               CASE WHEN event_id % 17 = 0 THEN 'bogus'
                    ELSE event_type END AS event_type,
               CASE WHEN event_id % 19 = 0 THEN NULL
                    WHEN event_id % 13 = 0
                        THEN -abs(value) - CAST(1.0 AS DOUBLE)
                    ELSE value END AS value
        FROM events
    ), tagged AS (
        SELECT *,
               coalesce(array_to_string(list_filter([
                   CASE WHEN (event_type IN ('click', 'view', 'purchase',
                                             'signup', 'error')) IS TRUE
                        THEN NULL ELSE 'type_known' END,
                   CASE WHEN (value >= 0) IS TRUE
                        THEN NULL ELSE 'value_nonneg' END
               ], x -> x IS NOT NULL), ','), '') AS failed
        FROM ev
    )
    SELECT 'main:' || event_type AS segment,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(floor(value * 100 + CAST(0.5 AS DOUBLE))
                         AS BIGINT)) AS BIGINT) AS cents_sum
    FROM tagged WHERE failed = '' GROUP BY event_type
    UNION ALL
    SELECT 'q:' || failed,
           CAST(count(*) AS BIGINT),
           CAST(sum(CAST(floor(value * 100 + CAST(0.5 AS DOUBLE))
                         AS BIGINT)) AS BIGINT)
    FROM tagged WHERE failed <> '' GROUP BY failed
"""



def q_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss random projection (operators/pca
    .random_projection): 64-dim embeddings down to 16 dims with
    md5-derived ±1 signs — the data-independent reduction whose output
    for a vector never drifts as the corpus grows (PCA axes do). Each
    output coordinate is an exact grid sum the oracle reproduces
    bit-for-bit. One explode + one (id, dim) aggregate."""
    from m13_sparkstreaming_python_azure_spark.operators.pca import (
        random_projection,
    )

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    return random_projection(emb, out_dims=16)


_RANDOM_PROJECTION_SQL = """
    WITH e AS (
        SELECT vec_id, unnest(embedding::DOUBLE[]) AS v,
               generate_subscripts(embedding, 1) AS j
        FROM embeddings
    ), dims AS (
        SELECT unnest(range(0, 16)) AS i
    ), g AS (
        SELECT vec_id, dims.i AS dim,
               CAST(floor(
                   (CASE WHEN ('0x' || substring(
                               md5(dims.i || ',' || e.j), 1, 8))::BIGINT
                              % 2 = 0
                         THEN e.v ELSE -e.v END) * 1000000
                   + CAST(0.5 AS DOUBLE)) AS BIGINT) AS t
        FROM e CROSS JOIN dims
    )
    SELECT vec_id, CAST(dim AS INT) AS dim,
           CAST(sum(t) AS BIGINT) AS proj_g
    FROM g GROUP BY vec_id, dim
"""



def q_binary_ann_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-quantized ANN with exact rerank (operators/similarity
    .binary_rerank_search): sign-bit vectors (two BIGINT words, 32×
    smaller) prefilter 50 Hamming candidates per probe, exact grid-sum
    cosine reranks the top 10 — the binary-prefilter shape every vector
    store ships (BitQ). Popcounts are exact integers; cosine is a pure
    IEEE ratio of grid sums, so the oracle reproduces ranks
    bit-for-bit. Probes: vec_id < 10."""
    from m13_sparkstreaming_python_azure_spark.operators.similarity import (
        binary_rerank_search,
    )

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    return binary_rerank_search(emb, list(range(10)))


_BINARY_ANN_SQL = """
    WITH el AS MATERIALIZED (
        SELECT vec_id, unnest(embedding::DOUBLE[]) AS v,
               generate_subscripts(embedding, 1) - 1 AS j
        FROM embeddings
    ), words AS MATERIALIZED (
        SELECT vec_id,
               sum(CASE WHEN j < 32 AND v >= 0
                        THEN (CAST(1 AS BIGINT) << (j % 32)) ELSE 0 END)
                   AS w0,
               sum(CASE WHEN j >= 32 AND v >= 0
                        THEN (CAST(1 AS BIGINT) << (j % 32)) ELSE 0 END)
                   AS w1
        FROM el GROUP BY vec_id
    ), probes AS (
        SELECT vec_id AS query_id, w0 AS q0, w1 AS q1
        FROM words WHERE vec_id < 10
    ), ham AS MATERIALIZED (
        SELECT p.query_id, w.vec_id,
               bit_count(xor(w.w0, p.q0)) + bit_count(xor(w.w1, p.q1))
                   AS hamming
        FROM words w CROSS JOIN probes p
        WHERE w.vec_id <> p.query_id
    ), cand AS MATERIALIZED (
        SELECT query_id, vec_id, hamming FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY hamming ASC, vec_id ASC
            ) AS rn FROM ham
        ) WHERE rn <= 50
    ), norms AS MATERIALIZED (
        SELECT vec_id,
               CAST(sum(CAST(floor(v * v * 1000000
                                   + CAST(0.5 AS DOUBLE)) AS BIGINT))
                    AS BIGINT) AS norm_g
        FROM el GROUP BY vec_id
    ), dots AS (
        SELECT c.query_id, c.vec_id, c.hamming,
               CAST(sum(CAST(floor(e.v * q.v * 1000000
                                   + CAST(0.5 AS DOUBLE)) AS BIGINT))
                    AS BIGINT) AS dot_g
        FROM cand c
        JOIN el e ON e.vec_id = c.vec_id
        JOIN el q ON q.vec_id = c.query_id AND q.j = e.j
        GROUP BY c.query_id, c.vec_id, c.hamming
    ), scored AS (
        SELECT d.query_id, d.vec_id, d.hamming,
               d.dot_g / sqrt(CAST(n.norm_g AS DOUBLE)
                              * CAST(qn.norm_g AS DOUBLE)) AS cosine
        FROM dots d
        JOIN norms n ON n.vec_id = d.vec_id
        JOIN norms qn ON qn.vec_id = d.query_id
    )
    SELECT query_id, vec_id, CAST(hamming AS BIGINT) AS hamming, cosine,
           CAST(rn AS INT) AS rank
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC
        ) AS rn FROM scored
    ) WHERE rn <= 10
"""



def q_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per language — BPE-ish tokens emitted per
    whitespace word (the per-language tokenizer-cost metric multilingual
    pipelines budget by; high fertility = the tokenizer fragments that
    language). Exact BIGINT counts (operators/text tokens +
    bpe_ish_token_count), fertility an IEEE ratio — no snapping. One
    scan, one tiny aggregate."""
    from m13_sparkstreaming_python_azure_spark.operators.text import (
        bpe_ish_token_count,
        token_count,
    )

    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            "lang",
            token_count("text").cast("long").alias("ws"),
            bpe_ish_token_count("text").cast("long").alias("bpe"),
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("ws").alias("ws_tokens"),
            F.sum("bpe").alias("bpe_tokens"),
            (F.sum("bpe") / F.sum("ws")).alias("fertility"),
        )
    )


_TOKENIZER_FERTILITY_SQL = """
    WITH d AS (
        SELECT lang,
               CAST(len(list_filter(string_split_regex(lower(text), '\\s+'),
                                    x -> x <> '')) AS BIGINT) AS ws,
               CAST(len(regexp_extract_all(text, '\\w+|[^\\w\\s]'))
                    AS BIGINT) AS bpe
        FROM documents
    )
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(ws) AS BIGINT) AS ws_tokens,
           CAST(sum(bpe) AS BIGINT) AS bpe_tokens,
           CAST(sum(bpe) AS BIGINT) / CAST(sum(ws) AS BIGINT) AS fertility
    FROM d GROUP BY lang
"""



def q_domain_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DoReMi-lite domain mixture reweighting (operators/lm
    .domain_mixture_weights): per-source cross-entropy under one
    corpus-wide add-1 unigram reference, sampling weight ∝ exp(excess
    loss over the easiest source) — the one-step counts-only version of
    the DoReMi mixture optimizer. Per-token lns on a 1e-9 grid pre-sum;
    one exp snap; weights an IEEE ratio of exact sums."""
    from m13_sparkstreaming_python_azure_spark.operators.lm import (
        domain_mixture_weights,
    )

    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    return domain_mixture_weights(docs)


_DOMAIN_MIXTURE_SQL = """
    WITH tok AS (
        SELECT source AS label,
               unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                  x -> x <> '')) AS token
        FROM documents
    ), model AS (
        SELECT token, count(*) AS c FROM tok GROUP BY token
    ), nv AS (
        SELECT (SELECT count(*) FROM tok)
               + (SELECT count(*) FROM model) AS denom
    ), g AS (
        SELECT token,
               CAST(floor(ln((c + 1) / CAST(denom AS DOUBLE)) * 1000000000
                          + CAST(0.5 AS DOUBLE)) AS BIGINT) AS g
        FROM model CROSS JOIN nv
    ), scored AS (
        SELECT t.label, CAST(count(*) AS BIGINT) AS n_tokens,
               -CAST(sum(g.g) AS BIGINT) / CAST(count(*) AS BIGINT) AS ce_g
        FROM tok t JOIN g ON g.token = t.token
        GROUP BY t.label
    ), base AS (
        SELECT min(ce_g) AS b FROM scored
    ), e AS (
        SELECT label, n_tokens, ce_g,
               CAST(floor(exp((ce_g - b) / CAST(1000000000 AS DOUBLE)) * 1e6
                          + CAST(0.5 AS DOUBLE)) AS BIGINT) AS eg
        FROM scored CROSS JOIN base
    ), tot AS (
        SELECT CAST(sum(eg) AS BIGINT) AS t FROM e
    )
    SELECT label AS source, n_tokens,
           CAST(floor(ce_g) AS BIGINT) AS ce_g,
           eg / t.t AS weight
    FROM e CROSS JOIN tot t
"""



def q_personalized_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank (operators/graph.personalized_pagerank):
    random walk with restart over the supplier co-purchase graph
    (suppliers sharing an order), teleporting only to the %10==1 suppliers
    — 'importance relative to this seed set', the related-entity /
    recommendation-expansion primitive. decimal(27,12) contribution sums
    + per-round 1e-9 snap make 4 rounds bit-equal to the unrolled
    MATERIALIZED-CTE oracle."""
    from m13_sparkstreaming_python_azure_spark.operators.graph import (
        personalized_pagerank,
    )

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_suppkey") != F.col("b.l_suppkey")),
        )
        .select(
            F.col("a.l_suppkey").alias("src"),
            F.col("b.l_suppkey").alias("dst"),
        )
        .distinct()
    )
    # seed by key residue, not nation: every fixture SF has %10 == 1
    # suppliers, while small SFs can lack any given nation entirely
    seeds = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_suppkey") % 10 == 1)
        .select(F.col("s_suppkey").alias("node"))
    )
    out = personalized_pagerank(edges, seeds, iterations=4)
    return out.select(F.col("node").alias("suppkey"), "rank")


def _ppr_sql(iterations: int = 4) -> str:
    tele = (
        "(CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE))"
        " / CAST((SELECT count(*) FROM seeds) AS DOUBLE)"
    )
    ctes = [
        """edges AS MATERIALIZED (
            SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
            FROM lineitem a
            JOIN lineitem b ON a.l_orderkey = b.l_orderkey
                           AND a.l_suppkey <> b.l_suppkey
        )""",
        """deg AS MATERIALIZED (
            SELECT src, count(*) AS d FROM edges GROUP BY src
        )""",
        """seeds AS MATERIALIZED (
            SELECT s_suppkey AS node FROM supplier WHERE s_suppkey % 10 = 1
        )""",
        """r0 AS MATERIALIZED (
            SELECT node,
                   CAST(1.0 AS DOUBLE)
                   / CAST((SELECT count(*) FROM seeds) AS DOUBLE) AS rank
            FROM seeds
        )""",
    ]
    for i in range(1, iterations + 1):
        ctes.append(
            f"""c{i} AS MATERIALIZED (
            SELECT e.dst AS node,
                   CAST(sum(CAST(r.rank / deg.d AS DECIMAL(27,12)))
                        AS DOUBLE) AS m
            FROM edges e
            JOIN r{i - 1} r ON e.src = r.node
            JOIN deg ON deg.src = e.src
            GROUP BY e.dst
        )"""
        )
        ctes.append(
            f"""r{i} AS MATERIALIZED (
            SELECT coalesce(c.node, s.node) AS node,
                   floor(((CASE WHEN s.node IS NOT NULL THEN {tele}
                                ELSE CAST(0.0 AS DOUBLE) END)
                          + CAST(0.85 AS DOUBLE)
                            * coalesce(c.m, CAST(0.0 AS DOUBLE))) * 1e9
                         + 0.5) / 1e9 AS rank
            FROM c{i} c FULL OUTER JOIN seeds s ON c.node = s.node
        )"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\n    SELECT node AS suppkey, rank FROM r{iterations}"
    )



def q_streaming_gdpr_erasure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming right-to-be-forgotten (sources/snapshots.delete_matching
    + deletion vectors): a replayed erasure-request feed (two chunks of
    customer keys) is applied per micro-batch as a SEMI-JOIN positional
    delete against the orders snapshot — no data-file rewrite, each batch
    one sidecar commit, repeat requests in later batches are no-ops
    (positions already deleted are excluded). The oracle states the
    surviving rows directly. At 100 TB each erasure batch costs one
    broadcast semi join + a sidecar write — the only affordable shape for
    continuous compliance deletes."""
    import os
    import tempfile
    import uuid

    from m13_sparkstreaming_python_azure_spark.sources.filestream import (
        parquet_file_stream,
    )
    from m13_sparkstreaming_python_azure_spark.sources.replay import (
        publish_chunk,
    )
    from m13_sparkstreaming_python_azure_spark.sources.snapshots import (
        delete_matching,
        read_snapshot,
        write_snapshot,
    )

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    root = tempfile.mkdtemp(prefix="gdpr-")
    land, ck, table = (os.path.join(root, d) for d in ("land", "ck", "t"))
    write_snapshot(orders.coalesce(4), table)
    k = F.col("o_custkey")
    requests = [
        orders.filter(k % 7 == 0).select("o_custkey").distinct(),
        # chunk 2 repeats some chunk-1 keys (%77) — must be a no-op
        orders.filter((k % 11 == 0)).select("o_custkey").distinct(),
    ]

    def _erase(batch_df, batch_id):
        delete_matching(spark, table, batch_df, ["o_custkey"])

    publish_chunk(requests[0], land)
    stream = parquet_file_stream(spark, land, "o_custkey long")
    q = (
        stream.writeStream.foreachBatch(_erase)
        .option("checkpointLocation", ck)
        .queryName(f"gdpr_{uuid.uuid4().hex[:8]}")
        .start()
    )
    q.processAllAvailable()
    publish_chunk(requests[1], land)
    q.processAllAvailable()
    q.stop()
    return (
        read_snapshot(spark, table)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("cents").alias("total_cents"),
        )
    )


_STREAMING_GDPR_SQL = """
    WITH base AS (
        SELECT o_custkey, o_orderstatus,
               CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        FROM orders
    )
    SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(cents) AS BIGINT) AS total_cents
    FROM base
    WHERE o_custkey % 7 <> 0 AND o_custkey % 11 <> 0
    GROUP BY o_orderstatus
"""



def q_unseen_mass_good_turing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Good-Turing unseen-probability mass per source: P(next token is
    novel) ≈ N₁/N (singleton count over token count — the Good-Turing
    missing-mass estimate), plus vocabulary size and type-token ratio —
    the corpus-openness diagnostics an LM data pipeline tracks per
    domain. Pure counts; ratios are IEEE divisions of exact BIGINTs —
    no snapping. Two token-keyed aggregates."""
    from m13_sparkstreaming_python_azure_spark.operators.text import tokens

    tok = (
        load_table(spark, sf_dir, "documents")
        .select("source", F.explode(tokens("text")).alias("token"))
    )
    counts = tok.groupBy("source", "token").agg(
        F.count(F.lit(1)).alias("c")
    )
    return counts.groupBy("source").agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("vocab"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).alias("n1"),
        (
            F.sum(F.when(F.col("c") == 1, 1).otherwise(0)) / F.sum("c")
        ).alias("unseen_mass"),
        (F.count(F.lit(1)) / F.sum("c")).alias("type_token_ratio"),
    )


_GOOD_TURING_SQL = """
    WITH tok AS (
        SELECT source,
               unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                  x -> x <> '')) AS token
        FROM documents
    ), counts AS (
        SELECT source, token, CAST(count(*) AS BIGINT) AS c
        FROM tok GROUP BY 1, 2
    )
    SELECT source,
           CAST(sum(c) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS vocab,
           CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
           CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
               / CAST(sum(c) AS BIGINT) AS unseen_mass,
           CAST(count(*) AS BIGINT) / CAST(sum(c) AS BIGINT)
               AS type_token_ratio
    FROM counts GROUP BY source
"""


def q_embedding_isotropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space health per label: mean vector norm² (anisotropy —
    how far the cloud's centroid sits from the origin; isotropic
    embeddings have ≈0) and mean self-norm², via exact grid sums: each
    element and each square snaps to a 1e-9 BIGINT grid BEFORE the sums,
    so the per-label moments are fold-order exact and the final ratios
    pure IEEE. One posexplode + two keyed aggregates — the drift-style
    shuffle shape."""
    emb = load_table(spark, sf_dir, "embeddings")
    el = emb.select(
        "label",
        "vec_id",
        F.posexplode("embedding").alias("j", "v"),
    ).select(
        "label",
        "vec_id",
        "j",
        F.col("v").cast("double").alias("v"),
    )
    g = 1_000_000_000
    per_dim = el.groupBy("label", "j").agg(
        F.sum(
            F.floor(F.col("v") * g + F.lit(0.5)).cast("long")
        ).alias("s_g"),
        F.count(F.lit(1)).alias("n"),
    )
    # |mean|² per label: Σ_j (Σ_i v_ij / n)²  — exact sums, IEEE squares
    mean_norm = per_dim.groupBy("label").agg(
        F.sum(
            (F.col("s_g") / F.lit(float(g)) / F.col("n"))
            * (F.col("s_g") / F.lit(float(g)) / F.col("n"))
        ).alias("mean_norm_sq"),
        F.first("n").alias("n_vecs"),
    )
    self_norm = (
        el.select(
            "label",
            "vec_id",
            F.floor(F.col("v") * F.col("v") * g + F.lit(0.5))
            .cast("long")
            .alias("sq_g"),
        )
        .groupBy("label")
        .agg((F.sum("sq_g") / F.lit(float(g))).alias("sum_norm_sq"))
    )
    return mean_norm.join(self_norm, "label").select(
        "label",
        "n_vecs",
        F.floor(F.col("mean_norm_sq") * 1e6 + F.lit(0.5)).alias(
            "mean_norm_sq_g"
        ),
        F.floor(
            F.col("sum_norm_sq") / F.col("n_vecs") * 1e6 + F.lit(0.5)
        ).alias("avg_self_norm_sq_g"),
    )


_EMBEDDING_ISOTROPY_SQL = """
    WITH el AS (
        SELECT label, vec_id, unnest(embedding::DOUBLE[]) AS v,
               generate_subscripts(embedding, 1) AS j
        FROM embeddings
    ), per_dim AS (
        SELECT label, j,
               CAST(sum(CAST(floor(v * 1000000000 + CAST(0.5 AS DOUBLE))
                             AS BIGINT)) AS BIGINT) AS s_g,
               CAST(count(*) AS BIGINT) AS n
        FROM el GROUP BY 1, 2
    ), mean_norm AS (
        SELECT label,
               sum((s_g / CAST(1000000000.0 AS DOUBLE) / n)
                   * (s_g / CAST(1000000000.0 AS DOUBLE) / n))
                   AS mean_norm_sq,
               min(n) AS n_vecs
        FROM per_dim GROUP BY label
    ), self_norm AS (
        SELECT label,
               CAST(sum(CAST(floor(v * v * 1000000000
                                   + CAST(0.5 AS DOUBLE)) AS BIGINT))
                    AS BIGINT) / CAST(1000000000.0 AS DOUBLE)
                   AS sum_norm_sq
        FROM el GROUP BY label
    )
    SELECT m.label, CAST(m.n_vecs AS BIGINT) AS n_vecs,
           CAST(floor(m.mean_norm_sq * 1e6 + CAST(0.5 AS DOUBLE))
                AS BIGINT) AS mean_norm_sq_g,
           CAST(floor(s.sum_norm_sq / m.n_vecs * 1e6 + CAST(0.5 AS DOUBLE))
                AS BIGINT) AS avg_self_norm_sq_g
    FROM mean_norm m JOIN self_norm s ON s.label = m.label
"""



def q_cluster_purity_nmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """External clustering evaluation: purity and NMI of the gated
    k-means assignments (operators/clustering.kmeans_assignments, k=4,
    2 Lloyd passes) against the embeddings' true labels — the quality
    gate a clustering stage ships with. Purity is a pure BIGINT ratio;
    MI and the entropies are count-weighted ln terms on a 1e-9 grid
    pre-sum (the info_gain recipe), NMI = MI/√(H(C)·H(Y)) pure IEEE on
    the exact sums. One contingency groupBy after the assignment join."""
    from m13_sparkstreaming_python_azure_spark.operators.clustering import (
        kmeans_assignments,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    assign = kmeans_assignments(emb, k=4, iterations=2)
    joined = assign.join(
        emb.select("vec_id", "label"), "vec_id"
    )
    g = 1_000_000_000
    cells = joined.groupBy("cluster", "label").agg(
        F.count(F.lit(1)).alias("n_cy")
    ).persist()
    n_c = cells.groupBy("cluster").agg(F.sum("n_cy").alias("n_c"))
    n_y = cells.groupBy("label").agg(F.sum("n_cy").alias("n_y"))
    n_tot = int(joined.count())
    mi = (
        cells.join(n_c, "cluster")
        .join(n_y, "label")
        .agg(
            F.sum(
                F.col("n_cy")
                * F.floor(
                    F.log(
                        (F.col("n_cy") * F.lit(n_tot))
                        / (F.col("n_c") * F.col("n_y"))
                    )
                    * g
                    + F.lit(0.5)
                ).cast("long")
            ).alias("mi_g")
        )
    )
    hc = n_c.agg(
        F.sum(
            F.col("n_c")
            * F.floor(
                F.log(F.col("n_c") / F.lit(n_tot)) * g + F.lit(0.5)
            ).cast("long")
        ).alias("hc_g")
    )
    hy = n_y.agg(
        F.sum(
            F.col("n_y")
            * F.floor(
                F.log(F.col("n_y") / F.lit(n_tot)) * g + F.lit(0.5)
            ).cast("long")
        ).alias("hy_g")
    )
    purity = (
        cells.groupBy("cluster")
        .agg(F.max("n_cy").alias("n_max"))
        .agg(F.sum("n_max").alias("n_pure"))
    )
    return (
        mi.crossJoin(F.broadcast(hc))
        .crossJoin(F.broadcast(hy))
        .crossJoin(F.broadcast(purity))
        .select(
            F.lit(n_tot).cast("long").alias("n"),
            F.col("n_pure").cast("long").alias("n_pure"),
            (F.col("n_pure") / F.lit(n_tot)).alias("purity"),
            F.floor(
                (
                    F.col("mi_g")
                    / F.sqrt(
                        F.col("hc_g").cast("double")
                        * F.col("hy_g").cast("double")
                    )
                )
                * 1e6
                + F.lit(0.5)
            )
            .cast("long")
            .alias("nmi_g"),
        )
    )


def _cluster_purity_sql() -> str:
    kmeans = """
        WITH vecs AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        c0 AS (
            SELECT vec_id AS cid, v AS c FROM vecs WHERE vec_id < 4
        ),
        a1 AS (
            SELECT vec_id, cid AS cluster, v FROM (
                SELECT vec_id, cid, v, row_number() OVER (
                    PARTITION BY vec_id ORDER BY
                    list_reduce(list_transform(range(1, len(v)+1),
                        i -> (v[i]-c[i])*(v[i]-c[i])), (acc,x) -> acc+x),
                    cid) AS rn
                FROM vecs CROSS JOIN c0
            ) WHERE rn = 1
        ),
        dims1 AS (
            SELECT cluster, t.idx,
                   floor(CAST(sum(CAST(v[t.idx] AS DECIMAL(27,12)))
                              AS DOUBLE) / count(*) * 1e9 + 0.5) / 1e9 AS cv
            FROM a1 CROSS JOIN range(1, 65) t(idx)
            GROUP BY cluster, t.idx
        ),
        cent1 AS (
            SELECT cluster AS cid, list(cv ORDER BY idx) AS c
            FROM dims1 GROUP BY cluster
        ),
        assign AS (
            SELECT vec_id, cluster FROM (
                SELECT vec_id, cid AS cluster, row_number() OVER (
                    PARTITION BY vec_id ORDER BY
                    list_reduce(list_transform(range(1, len(v)+1),
                        i -> (v[i]-c[i])*(v[i]-c[i])), (acc,x) -> acc+x),
                    cid) AS rn
                FROM vecs CROSS JOIN cent1
            ) WHERE rn = 1
        )"""
    return (
        kmeans
        + """,
        joined AS (
            SELECT a.vec_id, a.cluster, e.label
            FROM assign a JOIN embeddings e ON e.vec_id = a.vec_id
        ),
        cells AS (
            SELECT cluster, label, CAST(count(*) AS BIGINT) AS n_cy
            FROM joined GROUP BY 1, 2
        ),
        nc AS (
            SELECT cluster, CAST(sum(n_cy) AS BIGINT) AS n_c
            FROM cells GROUP BY cluster
        ),
        ny AS (
            SELECT label, CAST(sum(n_cy) AS BIGINT) AS n_y
            FROM cells GROUP BY label
        ),
        nt AS (SELECT CAST(count(*) AS BIGINT) AS n FROM joined),
        mi AS (
            SELECT CAST(sum(c.n_cy * CAST(floor(
                       ln((c.n_cy * nt.n) / (CAST(nc.n_c AS DOUBLE) * ny.n_y))
                       * 1000000000 + CAST(0.5 AS DOUBLE)) AS BIGINT))
                   AS BIGINT) AS mi_g
            FROM cells c
            JOIN nc ON nc.cluster = c.cluster
            JOIN ny ON ny.label = c.label
            CROSS JOIN nt
        ),
        hc AS (
            SELECT CAST(sum(n_c * CAST(floor(
                       ln(n_c / CAST(nt.n AS DOUBLE)) * 1000000000
                       + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS BIGINT) AS hc_g
            FROM nc CROSS JOIN nt
        ),
        hy AS (
            SELECT CAST(sum(n_y * CAST(floor(
                       ln(n_y / CAST(nt.n AS DOUBLE)) * 1000000000
                       + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS BIGINT) AS hy_g
            FROM ny CROSS JOIN nt
        ),
        pur AS (
            SELECT CAST(sum(n_max) AS BIGINT) AS n_pure FROM (
                SELECT cluster, max(n_cy) AS n_max FROM cells GROUP BY cluster
            )
        )
        SELECT nt.n, pur.n_pure,
               pur.n_pure / CAST(nt.n AS DOUBLE) AS purity,
               CAST(floor((mi.mi_g / sqrt(CAST(hc.hc_g AS DOUBLE)
                                          * CAST(hy.hy_g AS DOUBLE))) * 1e6
                          + CAST(0.5 AS DOUBLE)) AS BIGINT) AS nmi_g
        FROM mi CROSS JOIN hc CROSS JOIN hy CROSS JOIN pur CROSS JOIN nt
    """
    )



def q_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curves: customers cohort by first-order
    month (integer month index = year·12 + month — no date-truncation
    engine drift), monthly cohort revenue accumulates with a window
    cumsum, LTV = cumulative cents / cohort size. Exact BIGINT cents and
    counts; the LTV ratio is one IEEE division. Two keyed aggregates +
    one cohort-partitioned window."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        (
            F.year("o_orderdate") * 12 + F.month("o_orderdate")
        ).alias("m_idx"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    firsts = orders.groupBy("o_custkey").agg(
        F.min("m_idx").alias("cohort_m")
    )
    sizes = firsts.groupBy("cohort_m").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    monthly = (
        orders.join(firsts, "o_custkey")
        .groupBy("cohort_m", (F.col("m_idx") - F.col("cohort_m")).alias("age"))
        .agg(F.sum("cents").alias("rev_cents"))
    )
    w = (
        Window.partitionBy("cohort_m")
        .orderBy("age")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        monthly.withColumn("cum_cents", F.sum("rev_cents").over(w))
        .join(F.broadcast(sizes), "cohort_m")
        .select(
            "cohort_m",
            "age",
            "cohort_size",
            "cum_cents",
            (F.col("cum_cents") / F.col("cohort_size")).alias("ltv_cents"),
        )
    )


_COHORT_LTV_SQL = """
    WITH o AS (
        SELECT o_custkey,
               CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
                   AS m_idx,
               CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        FROM orders
    ), firsts AS (
        SELECT o_custkey, min(m_idx) AS cohort_m FROM o GROUP BY 1
    ), sizes AS (
        SELECT cohort_m, CAST(count(*) AS BIGINT) AS cohort_size
        FROM firsts GROUP BY 1
    ), monthly AS (
        SELECT f.cohort_m, o.m_idx - f.cohort_m AS age,
               CAST(sum(o.cents) AS BIGINT) AS rev_cents
        FROM o JOIN firsts f USING (o_custkey)
        GROUP BY 1, 2
    )
    SELECT m.cohort_m, m.age, s.cohort_size,
           CAST(sum(m.rev_cents) OVER (
               PARTITION BY m.cohort_m ORDER BY m.age
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS cum_cents,
           CAST(sum(m.rev_cents) OVER (
               PARTITION BY m.cohort_m ORDER BY m.age
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) / s.cohort_size AS ltv_cents
    FROM monthly m JOIN sizes s ON s.cohort_m = m.cohort_m
"""


def q_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """View→purchase conversion latency distribution: per user, micros
    between first view and first subsequent purchase; p50/p90 via EXACT
    integer rank selection (k = ⌈n·p/100⌉ over the (latency, user)
    total order — no float quantiles, both engines pick the identical
    element). The rank comes from ``operators/window.global_rank``
    (range shuffle — r8 swap; the old unpartitioned row_number put every
    conversion on one task as conversions grow with the table)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    views = ev.filter(F.col("event_type") == "view").groupBy(
        "user_id"
    ).agg(F.min("us").alias("v_us"))
    buys = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("us").alias("p_us")
    )
    lat = (
        buys.join(views, "user_id")
        .filter(F.col("p_us") >= F.col("v_us"))
        .groupBy("user_id", "v_us")
        .agg(F.min("p_us").alias("first_p"))
        .select(
            "user_id", (F.col("first_p") - F.col("v_us")).alias("lat_us")
        )
    )
    from m13_sparkstreaming_python_azure_spark.operators.window import (
        global_rank,
    )

    ranked = global_rank(
        lat, [F.col("lat_us").asc(), F.col("user_id").asc()], out_col="rn"
    )
    n = lat.count()
    k50, k90 = (n * 50 + 99) // 100, (n * 90 + 99) // 100
    return (
        ranked.filter(F.col("rn").isin(int(k50), int(k90)))
        .select(
            F.lit(int(n)).alias("n_converted"),
            F.when(F.col("rn") == k50, F.lit("p50"))
            .otherwise(F.lit("p90"))
            .alias("pct"),
            F.col("lat_us").alias("latency_us"),
        )
    )


_CONVERSION_LATENCY_SQL = """
    WITH ev AS (
        SELECT user_id, event_type, CAST(epoch_us(ts) AS BIGINT) AS us
        FROM events
    ), views AS (
        SELECT user_id, min(us) AS v_us FROM ev
        WHERE event_type = 'view' GROUP BY 1
    ), lat AS (
        SELECT b.user_id, min(b.us) - v.v_us AS lat_us
        FROM ev b JOIN views v USING (user_id)
        WHERE b.event_type = 'purchase' AND b.us >= v.v_us
        GROUP BY b.user_id, v.v_us
    ), ranked AS (
        SELECT user_id, lat_us,
               row_number() OVER (ORDER BY lat_us ASC, user_id ASC) AS rn,
               count(*) OVER () AS n
        FROM lat
    )
    SELECT CAST(n AS BIGINT) AS n_converted,
           CASE WHEN rn = (n * 50 + 99) // 100 THEN 'p50' ELSE 'p90' END
               AS pct,
           CAST(lat_us AS BIGINT) AS latency_us
    FROM ranked
    WHERE rn = (n * 50 + 99) // 100 OR rn = (n * 90 + 99) // 100
"""

R6_QUERIES = {
    "deletion_vector_delete": q_deletion_vector_delete,
    "check_constraints": q_check_constraints,
    "streaming_cdc_upsert": q_streaming_cdc_upsert,
    "nb_domain_classifier": q_nb_domain_classifier,
    "hits_scores": q_hits_scores,
    "info_gain_features": q_info_gain_features,
    "majority_vote_labels": q_majority_vote_labels,
    "bm25_prf_search": q_bm25_prf_search,
    "ql_dirichlet_search": q_ql_dirichlet_search,
    "ngram_novelty": q_ngram_novelty,
    "oov_rate": q_oov_rate,
    "fuzzy_decontamination": q_fuzzy_decontamination,
    "ccf_lag": q_ccf_lag,
    "quantile_regression_p90": q_quantile_regression_p90,
    "partitioned_snapshot_prune": q_partitioned_snapshot_prune,
    "streaming_expectations": q_streaming_expectations,
    "random_projection": q_random_projection,
    "binary_ann_search": q_binary_ann_search,
    "tokenizer_fertility": q_tokenizer_fertility,
    "domain_mixture_weights": q_domain_mixture_weights,
    "personalized_pagerank": q_personalized_pagerank,
    "streaming_gdpr_erasure": q_streaming_gdpr_erasure,
    "unseen_mass_good_turing": q_unseen_mass_good_turing,
    "embedding_isotropy": q_embedding_isotropy,
    "cluster_purity_nmi": q_cluster_purity_nmi,
    "cohort_ltv": q_cohort_ltv,
    "conversion_latency": q_conversion_latency,
}

R6_ORACLES = {
    "deletion_vector_delete": _DELETION_VECTOR_SQL,
    "check_constraints": _CHECK_CONSTRAINTS_SQL,
    "streaming_cdc_upsert": _STREAMING_CDC_UPSERT_SQL,
    "nb_domain_classifier": _NB_DOMAIN_SQL,
    "hits_scores": _hits_oracle_sql(6),
    "info_gain_features": _INFO_GAIN_SQL,
    "majority_vote_labels": _MAJORITY_VOTE_SQL,
    "bm25_prf_search": _BM25_PRF_SQL,
    "ql_dirichlet_search": _QL_DIRICHLET_SQL,
    "ngram_novelty": _NGRAM_NOVELTY_SQL,
    "oov_rate": _OOV_RATE_SQL,
    "fuzzy_decontamination": _FUZZY_DECONTAM_SQL,
    "ccf_lag": _CCF_LAG_SQL,
    "quantile_regression_p90": _qr_sql(),
    "partitioned_snapshot_prune": _PARTITIONED_SNAPSHOT_SQL,
    "streaming_expectations": _STREAMING_EXPECTATIONS_SQL,
    "random_projection": _RANDOM_PROJECTION_SQL,
    "binary_ann_search": _BINARY_ANN_SQL,
    "tokenizer_fertility": _TOKENIZER_FERTILITY_SQL,
    "domain_mixture_weights": _DOMAIN_MIXTURE_SQL,
    "personalized_pagerank": _ppr_sql(4),
    "streaming_gdpr_erasure": _STREAMING_GDPR_SQL,
    "unseen_mass_good_turing": _GOOD_TURING_SQL,
    "embedding_isotropy": _EMBEDDING_ISOTROPY_SQL,
    "cluster_purity_nmi": _cluster_purity_sql(),
    "cohort_ltv": _COHORT_LTV_SQL,
    "conversion_latency": _CONVERSION_LATENCY_SQL,
}
