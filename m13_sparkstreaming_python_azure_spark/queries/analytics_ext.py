"""Round-2 analytics extensions — sequence/interval/frequency analytics a
production telemetry + training-data pipeline needs beyond the reference's
daily-aggregate surface (stream.ipynb:117-121 is its only aggregate).

Every query here is oracle-gated (DuckDB twin in ANALYTICS_ORACLES).
Float discipline follows the repo rule (core.py header): ratios of
identically-derived integers are bit-equal across engines and need no
rounding; anything touching ln/pow/sqrt gets a 1e-4/1e-6 floor-snap grid
on BOTH sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from m13_sparkstreaming_python_azure_spark.catalog import load_table
from m13_sparkstreaming_python_azure_spark.operators.intervals import (
    merge_intervals,
)


def q_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of per-user event sequences:
    for each (current, next) event_type bigram, the transition count and
    conditional probability P(next | current).

    Scale: one shuffle on user_id for the lead() window (the same shuffle
    sessionization needs), then a map-side-combining groupBy on the tiny
    (type, type) key space. Probabilities are ratios of identically-
    derived BIGINTs — bit-equal across engines, no rounding grid needed.
    """
    ev = load_table(spark, sf_dir, "events")
    seq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    bigrams = (
        ev.withColumn("next_type", F.lead("event_type").over(seq))
        .filter(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("cur_type"), "next_type"
        )
        .agg(F.count(F.lit(1)).alias("n_trans"))
    )
    totals = Window.partitionBy("cur_type")
    return bigrams.withColumn(
        "prob",
        F.col("n_trans") / F.sum("n_trans").over(totals),
    )


def q_interval_merge_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands sessionization via general interval merge
    (operators/intervals.merge_intervals): each event spans
    [ts, ts+10min]; overlapping-or-touching spans per user collapse into
    maximal sessions. Unlike session_windows (fixed-gap builtin), this is
    the general interval-algebra operator (bookings, locks, GPU
    reservations)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 10 MINUTES")).alias("e"),
    )
    merged = merge_intervals(ev, "user_id", "s", "e", "event_id")
    return merged.select(
        "user_id",
        F.date_format("island_start", "yyyy-MM-dd HH:mm:ss").alias(
            "session_start"
        ),
        F.date_format("island_end", "yyyy-MM-dd HH:mm:ss").alias(
            "session_end"
        ),
        F.col("n_merged").alias("n_events"),
    )


def q_price_decile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile binning (feature-engineering primitive): exact deciles of
    order totalprice with per-bin counts and exact-decimal revenue.
    Ties broken by o_orderkey so decile assignment is engine-independent.

    Scale: deciles come from ``operators.window.exact_ntile``
    (distributed rank: range repartition → per-partition row_number →
    broadcast offsets), not an unpartitioned ntile window whose
    single-partition sort dies at 100 TB (VERDICT r6 weak-item #2).
    Bit-identical to SQL ntile, so the DuckDB oracle is unchanged.
    Project the two ordering columns FIRST — the rank passes move only
    16 bytes/row.
    """
    from m13_sparkstreaming_python_azure_spark.operators.window import (
        exact_ntile,
    )

    orders = load_table(spark, sf_dir, "orders")
    binned = exact_ntile(
        orders.select("o_totalprice", "o_orderkey"),
        10,
        [F.col("o_totalprice"), F.col("o_orderkey")],
        out_col="decile",
    ).select("o_totalprice", "decile")
    dec_sum = F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
    return binned.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
        F.round(dec_sum, 2).cast("double").alias("sum_price"),
    )


def q_data_quality_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style expectation suite (operators/quality): completeness,
    uniqueness, and predicate compliance on orders evaluate in ONE
    aggregate pass; lineitem compliance in a second; referential
    integrity lineitem→orders via LEFT ANTI orphan count. One row per
    check with pass/fail against declared thresholds."""
    from m13_sparkstreaming_python_azure_spark.operators.quality import (
        evaluate_suite,
        referential_integrity,
        single_table_metrics,
    )

    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    om = single_table_metrics(
        orders,
        completeness=["o_custkey", "o_orderdate"],
        uniqueness=["o_orderkey"],
        compliance={
            "positive_price": F.col("o_totalprice") > 0,
            "valid_status": F.col("o_orderstatus").isin("F", "O", "P"),
        },
    )
    lm = single_table_metrics(
        lineitem,
        compliance={
            "discount_range": (F.col("l_discount") >= 0)
            & (F.col("l_discount") <= 0.1),
            "quantity_range": (F.col("l_quantity") >= 1)
            & (F.col("l_quantity") <= 50),
        },
    )
    ref = referential_integrity(lineitem, "l_orderkey", orders, "o_orderkey")
    metrics = om.unionByName(lm).unionByName(ref)
    thresholds = {
        "completeness:o_custkey": 1.0,
        "completeness:o_orderdate": 1.0,
        "uniqueness:o_orderkey": 1.0,
        "compliance:positive_price": 1.0,
        "compliance:valid_status": 1.0,
        "compliance:discount_range": 1.0,
        "compliance:quantity_range": 1.0,
        "referential:l_orderkey": 1.0,
    }
    return evaluate_suite(metrics, thresholds)


def q_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules (operators/frequency): orders are
    baskets, part brands are items; directed rules with support /
    confidence / lift for pairs co-occurring in >= 300 baskets. Pairs
    explode within the per-basket array (bounded basket size) — no
    item-table self-join."""
    from m13_sparkstreaming_python_azure_spark.operators.frequency import (
        association_rules,
    )

    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    baskets = lineitem.join(
        F.broadcast(part.select("p_partkey", "p_brand")),
        lineitem.l_partkey == part.p_partkey,
    ).select(F.col("l_orderkey").alias("basket"), F.col("p_brand"))
    return association_rules(baskets, "basket", "p_brand", 300)


def q_item_cf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative filtering (operators/frequency.
    item_cf_topk): orders are baskets, part brands are items; top-5
    cosine neighbors per item for pairs co-occurring in >= 8 baskets —
    the "users-also-bought" recommendation primitive. Pairs explode
    within the per-basket array (bounded basket size, never an
    item-table self-join); cosine divides BIGINT co-counts by the
    correctly-rounded sqrt of a BIGINT product, so the oracle
    hash-matches bit-for-bit."""
    from m13_sparkstreaming_python_azure_spark.operators.frequency import (
        item_cf_topk,
    )

    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    baskets = lineitem.join(
        F.broadcast(part.select("p_partkey", "p_brand")),
        lineitem.l_partkey == part.p_partkey,
    ).select(F.col("l_orderkey").alias("basket"), F.col("p_brand"))
    return item_cf_topk(baskets, "basket", "p_brand", k=5, min_pair_count=8)


_ITEM_CF_SQL = """
    WITH items AS (
        SELECT DISTINCT l.l_orderkey AS b, p.p_brand AS item
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ), ic AS (
        SELECT item, CAST(count(*) AS BIGINT) AS n_item
        FROM items GROUP BY item
    ), pc AS (
        SELECT a.item AS item, c.item AS neighbor,
               CAST(count(*) AS BIGINT) AS n_ab
        FROM items a JOIN items c ON a.b = c.b AND a.item <> c.item
        GROUP BY 1, 2 HAVING count(*) >= 8
    ), sc AS (
        SELECT pc.item, pc.neighbor, pc.n_ab,
               floor(pc.n_ab / sqrt(CAST(ia.n_item * ja.n_item AS DOUBLE))
                     * 1e6 + 0.5) / 1e6 AS cosine
        FROM pc
        JOIN ic ia ON ia.item = pc.item
        JOIN ic ja ON ja.item = pc.neighbor
    )
    SELECT item, neighbor, n_ab, cosine, rk FROM (
        SELECT item, neighbor, n_ab, cosine,
               CAST(row_number() OVER (PARTITION BY item
                    ORDER BY cosine DESC, neighbor) AS INT) AS rk
        FROM sc
    ) WHERE rk <= 5
"""


def q_heavy_hitter_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy hitters (operators/frequency.heavy_hitters) over the
    document word-bigram stream: bigrams with global share >= phi.
    Candidate pass = per-partition local-share pruning (no false
    negatives); exact recount touches candidates only. phi=0.0015 keeps
    a meaningful head/tail split on the fixture corpus."""
    from m13_sparkstreaming_python_azure_spark.operators.frequency import (
        heavy_hitters,
    )
    from m13_sparkstreaming_python_azure_spark.operators.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    arr = docs.select(tokens("text").alias("t")).filter(F.size("t") >= 2)
    bigrams = arr.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("t") - 1),
                lambda i: F.concat(
                    F.element_at("t", i),
                    F.lit(" "),
                    F.element_at("t", i + 1),
                ),
            )
        ).alias("bigram")
    )
    return heavy_hitters(bigrams, "bigram", 0.0015).withColumnRenamed(
        "item", "bigram"
    )


def _daily_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(event_type, day) series: n_events and the exact-decimal daily
    sum surfaced as a 2-decimal double (bit-equal across engines — no
    division, so no fold-order exposure)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum(F.col("value").cast("decimal(18,6)")), 2)
        .cast("double")
        .alias("day_sum"),
    )


def q_changepoint_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single changepoint per event_type (operators/timeseries
    .changepoint_mean_shift) over the daily-sum series: the day that
    maximizes the before/after mean shift, both segments >= 3 days.
    Decimal prefix sums make the shift statistic bit-equal across
    engines; ties break to the earliest day."""
    from m13_sparkstreaming_python_azure_spark.operators.timeseries import (
        changepoint_mean_shift,
    )

    series = _daily_series(spark, sf_dir)
    return changepoint_mean_shift(
        series, "event_type", "day", "day_sum", min_segment=3
    ).select("event_type", "split_point", "mean_before", "mean_after", "shift")


def q_linear_interpolation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap repair by linear interpolation (operators/timeseries
    .interpolate_linear): events bucket to an hourly mean per event_type;
    the dense hour spine (min..max hour index per key) left-joins the
    buckets, and missing hours fill by exact linear interpolation
    (clamped at the series edges). Hour index is epoch//3600 — session
    timezone is pinned UTC so Spark and the oracle agree."""
    from m13_sparkstreaming_python_azure_spark.operators.timeseries import (
        interpolate_linear,
    )

    ev = load_table(spark, sf_dir, "events")
    buckets = ev.groupBy(
        "event_type",
        F.floor(F.unix_timestamp("ts") / 3600).alias("hour_idx"),
    ).agg(
        (
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 2)
            .cast("double")
            / F.count(F.lit(1))
        ).alias("hour_mean")
    )
    spine = (
        buckets.groupBy("event_type")
        .agg(
            F.min("hour_idx").alias("lo"), F.max("hour_idx").alias("hi")
        )
        .select(
            "event_type",
            F.explode(F.sequence("lo", "hi")).alias("hour_idx"),
        )
    )
    dense = spine.join(buckets, ["event_type", "hour_idx"], "left")
    out = interpolate_linear(dense, "event_type", "hour_idx", "hour_mean")
    snap = F.floor(F.col("filled") * 1e6 + F.lit(0.5)) / 1e6
    return out.select(
        "event_type",
        "hour_idx",
        snap.alias("filled_value"),
        F.col("hour_mean").isNull().alias("was_gap"),
    )


def q_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day Pearson correlation between daily event count and
    daily value sum, per event_type (operators/timeseries
    .rolling_correlation). Moment sums fold as exact decimals (order-
    independent) and the closed-form corr is grid-snapped at 1e-6, so
    the statistic is hash-comparable across engines."""
    from m13_sparkstreaming_python_azure_spark.operators.timeseries import (
        rolling_correlation,
    )

    series = _daily_series(spark, sf_dir)
    return rolling_correlation(
        series, "event_type", "day", "n_events", "day_sum", window_rows=7
    )


def q_bfs_shortest_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-source BFS shortest paths (operators/graph.bfs_distances)
    over the deterministic customer tree+chain graph (same construction
    as triangle_counts), symmetrized, from node 1, 6 hops. The oracle is
    a recursive CTE taking min(dist) over all enumerated (node, dist)
    pairs — the textbook SQL twin of level-synchronous BFS."""
    from m13_sparkstreaming_python_azure_spark.operators.graph import (
        bfs_distances,
    )

    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("bigint").alias("k")
    )
    tree = cust.filter(F.col("k") >= 2).select(
        F.col("k").alias("src"), (F.col("k") / 2).cast("bigint").alias("dst")
    )
    chain = cust.filter(F.col("k") >= 1).select(
        F.col("k").alias("src"), (F.col("k") - 1).alias("dst")
    )
    ed = tree.unionByName(chain)
    sym = ed.unionByName(
        ed.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    return bfs_distances(sym, source=1, max_hops=6)


def q_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank keyword extraction (Mihalcea & Tarau 2004): PageRank
    over the corpus word-adjacency graph — words are nodes, adjacent
    token pairs are (symmetrized) edges — surfacing the top-20 global
    keywords. Reuses operators/graph.pagerank wholesale (5 power
    iterations, 1e9 per-iteration grid — the supplier_pagerank
    determinism contract), so the oracle unrolls the identical five
    iterations as CTEs over SQL-built bigram edges. Edge generation is
    one groupBy-free pass: per-document token arrays explode to
    adjacent pairs inside codegen (same shape as heavy_hitter_bigrams),
    then distinct — never a token self-join."""
    from m13_sparkstreaming_python_azure_spark.operators.graph import (
        pagerank,
    )
    from m13_sparkstreaming_python_azure_spark.operators.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    arr = docs.select(tokens("text").alias("t")).filter(F.size("t") >= 2)
    pairs = arr.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("t") - 1),
                lambda i: F.struct(
                    F.element_at("t", i).alias("src"),
                    F.element_at("t", i + 1).alias("dst"),
                ),
            )
        ).alias("p")
    ).select("p.src", "p.dst").filter(F.col("src") != F.col("dst"))
    sym = pairs.unionByName(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    ranked = pagerank(sym, iterations=5).select(
        F.col("node").alias("word"), "rank"
    )
    w = Window.orderBy(F.col("rank").desc(), F.col("word"))
    return (
        ranked.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 20)
    )


_TEXTRANK_ITER = """
            SELECT e.dst AS node,
                   floor((0.15 + 0.85 * CAST(sum(CAST(r.rank / deg.d
                              AS DECIMAL(27,12))) AS DOUBLE)) * 1e9 + 0.5)
                       / 1e9 AS rank
            FROM edges e
            JOIN r{prev} r ON e.src = r.node
            JOIN deg ON deg.src = e.src
            GROUP BY e.dst
"""

_TEXTRANK_SQL = (
    """
    WITH d AS (
        SELECT list_filter(string_split_regex(lower(text), '\\s+'),
                           x -> x <> '') AS t
        FROM documents
    ), bg AS (
        SELECT unnest(list_transform(range(1, len(t)),
                      i -> struct_pack(src := t[i], dst := t[i+1]))) AS p
        FROM d WHERE len(t) >= 2
    ), e0 AS (
        SELECT p.src AS src, p.dst AS dst FROM bg WHERE p.src <> p.dst
    ), edges AS (
        SELECT DISTINCT src, dst FROM (
            SELECT src, dst FROM e0
            UNION ALL
            SELECT dst AS src, src AS dst FROM e0
        )
    ), deg AS (
        SELECT src, count(*) AS d FROM edges GROUP BY src
    ), r0 AS (
        SELECT DISTINCT src AS node, CAST(1.0 AS DOUBLE) AS rank
        FROM edges
    ), r1 AS ("""
    + _TEXTRANK_ITER.format(prev=0)
    + "), r2 AS ("
    + _TEXTRANK_ITER.format(prev=1)
    + "), r3 AS ("
    + _TEXTRANK_ITER.format(prev=2)
    + "), r4 AS ("
    + _TEXTRANK_ITER.format(prev=3)
    + "), r5 AS ("
    + _TEXTRANK_ITER.format(prev=4)
    + """)
    SELECT word, rank, rk FROM (
        SELECT node AS word, rank,
               CAST(row_number() OVER (ORDER BY rank DESC, node) AS INT)
                   AS rk
        FROM r5
    ) WHERE rk <= 20
"""
)


def q_bellman_ford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-source WEIGHTED shortest paths (operators/graph.
    bellman_ford_distances, 6 relaxation rounds) over the deterministic
    customer tree+chain graph (same construction as bfs_shortest_paths),
    symmetrized, with BIGINT edge weight w = (src + dst) % 7 + 1 —
    symmetric in (src, dst), so both directions of an undirected edge
    carry the same cost. Distances are exact integer sums; the oracle
    enumerates (node, dist, hop) states in a recursive CTE with UNION
    dedup and takes min(dist) per node."""
    from m13_sparkstreaming_python_azure_spark.operators.graph import (
        bellman_ford_distances,
    )

    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("bigint").alias("k")
    )
    tree = cust.filter(F.col("k") >= 2).select(
        F.col("k").alias("src"), (F.col("k") / 2).cast("bigint").alias("dst")
    )
    chain = cust.filter(F.col("k") >= 1).select(
        F.col("k").alias("src"), (F.col("k") - 1).alias("dst")
    )
    ed = tree.unionByName(chain)
    sym = ed.unionByName(
        ed.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).withColumn(
        "w", F.pmod(F.col("src") + F.col("dst"), F.lit(7)) + F.lit(1)
    )
    return bellman_ford_distances(sym, source=1, max_hops=6)


_BELLMAN_SQL = """
    WITH RECURSIVE ed AS (
        SELECT src, dst FROM (
            SELECT c_custkey AS src, c_custkey // 2 AS dst
            FROM customer WHERE c_custkey >= 2
            UNION ALL
            SELECT c_custkey AS src, c_custkey - 1 AS dst
            FROM customer WHERE c_custkey >= 1
        )
    ), sym AS (
        SELECT DISTINCT src, dst, (src + dst) % 7 + 1 AS w FROM (
            SELECT src, dst FROM ed
            UNION ALL
            SELECT dst AS src, src AS dst FROM ed
        )
    ), walk AS (
        SELECT CAST(1 AS BIGINT) AS node, CAST(0 AS BIGINT) AS dist,
               0 AS hop
        UNION
        SELECT e.dst, w.dist + e.w, w.hop + 1
        FROM walk w JOIN sym e ON e.src = w.node
        WHERE w.hop < 6
    )
    SELECT node, min(dist) AS dist FROM walk GROUP BY node
"""


def q_skyline_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D Pareto frontier (operators/skyline.skyline_2d): orders not
    dominated on (minimize totalprice, minimize orderdate) — cheapest-
    earliest frontier. Dominance via running minima over the x-ordered
    distinct point set: no self-join, no quadratic NOT EXISTS (and the
    oracle uses the same window form, because the naive NOT EXISTS twin
    is quadratic in DuckDB too)."""
    from m13_sparkstreaming_python_azure_spark.operators.skyline import (
        skyline_2d,
    )

    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_totalprice").alias("price"), F.col("o_orderdate").alias("d")
    )
    sky = skyline_2d(orders, "price", "d")
    return sky.select(
        "price",
        F.date_format("d", "yyyy-MM-dd").alias("order_date"),
        "n_rows",
    )


def q_gdpr_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten over the keyed snapshot layer: events land
    as a latest-state keyed table (keyed_batch_sink), then every
    user_id ≡ 3 (mod 7) is deleted via sources/snapshots.delete_keys —
    only the buckets holding those keys rewrite; the commit is an atomic
    manifest swap and prior versions stay time-travelable until vacuum.
    Returns the surviving latest-state rows, hash-checked against the
    batch argmax-with-filter oracle."""
    import os
    import tempfile
    import uuid

    from m13_sparkstreaming_python_azure_spark.sources.snapshots import (
        delete_keys,
        keyed_batch_sink,
        read_snapshot,
    )

    ev = load_table(spark, sf_dir, "events")
    tdir = os.path.join(
        tempfile.gettempdir(), f"gdpr-{uuid.uuid4().hex[:10]}"
    )
    sink = keyed_batch_sink(
        tdir, ["user_id"], mode="latest", order_cols=["ts", "event_id"]
    )
    sink(ev, 0)
    forget = ev.select("user_id").distinct().filter(
        F.col("user_id") % 7 == 3
    )
    delete_keys(spark, tdir, forget)
    return read_snapshot(spark, tdir).select(
        "user_id",
        F.col("event_type").alias("last_type"),
        F.col("value").alias("last_value"),
    )


def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE vocabulary induction (operators/bpe.learn_bpe): 40 merge
    rules learned from the documents corpus. The corpus pass (word
    frequencies) is the distributed step; the merge loop runs on the
    bounded word-frequency table driver-side (the HF-tokenizers
    architecture). HASH gate since r11 (VERDICT r10 #5 — the last
    rows-only conversion): ``bpe_oracle_values`` recomputes the exact
    merge sequence through a fully independent path (DuckDB-SQL word
    frequencies + the pure-Python reference loop of operators/bpe_ref)
    and emits it as a VALUES oracle, so rank, pair, and order are all
    value-hashed."""
    from m13_sparkstreaming_python_azure_spark.operators.bpe import learn_bpe

    docs = load_table(spark, sf_dir, "documents")
    return learn_bpe(docs, "text", n_merges=40, min_pair_count=2)


def bpe_oracle_values() -> dict[str, str]:
    """Live oracle generation for ``bpe_merges`` (VERDICT r10 #5):
    DuckDB-SQL word frequencies + the independent pure-Python merge
    loop (operators/bpe_ref), emitted as a VALUES table. Called LAZILY
    from ``__spark_entry__.oracle_sql()`` — the merge sequence is
    corpus-dependent, so the recomputation reads the SAME sf dir the
    driver gates at (sf0.01 by contract; tools/check_correctness.py
    exports SPARK_GRAFT_ORACLE_SF_DIR when pointed elsewhere)."""
    import os as _os

    from m13_sparkstreaming_python_azure_spark.operators.bpe_ref import (
        ref_bpe_merge_rows,
    )

    sf_dir = _os.environ.get(
        "SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01"
    )
    rows = ref_bpe_merge_rows(sf_dir, n_merges=40, min_pair_count=2)

    def _sq(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    vals = ",\n".join(
        f"({i}, {_sq(a)}, {_sq(b)}, {_sq(m)})" for i, a, b, m in rows
    )
    return {
        "bpe_merges": f"""
            SELECT CAST(rank AS INT) AS rank,
                   "left", "right", merged
            FROM (VALUES {vals}) AS t(rank, "left", "right", merged)
        """
    }


def q_bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document BPE encoding under the learned vocabulary — HASH
    gate since r10 via the derived-invariant shape (operators/bpe
    .bpe_segmentation_audit): the oracle replays the pretokenization
    facts per document (word count, total word chars — same whitespace
    tokenizer in SQL) and pins the in-gate flags TRUE: the encoded
    token count is bounded by [n_words, n_word_chars] (segmentation
    validity) and every distinct word's tokens concatenate back to the
    word. Each DISTINCT word still encodes once (broadcast merge ranks,
    mapInPandas over the word table), joined back through the exploded
    corpus. The merge SEQUENCE stays pinned by the pure-Python
    reference in tests/test_bpe.py."""
    from m13_sparkstreaming_python_azure_spark.operators.bpe import (
        bpe_segmentation_audit,
        learn_bpe,
    )

    docs = load_table(spark, sf_dir, "documents")
    merges = learn_bpe(docs, "text", n_merges=40, min_pair_count=2)
    return bpe_segmentation_audit(docs, "doc_id", "text", merges)


def q_streaming_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming sessionization under the gate (streaming/stateful
    .sessions_with_state): events replay as a 3-chunk event-time-ordered
    file stream; per-user GroupState carries the open session across
    micro-batches and closed sessions emit in append mode. A final
    sentinel chunk (one far-future event per user) flushes every open
    session, so the emitted set must hash-match the BATCH gaps-and-
    islands oracle — streaming↔batch parity for order-dependent session
    state, the same contract streaming_ewma proves for folds."""
    import os
    import tempfile
    import uuid

    from m13_sparkstreaming_python_azure_spark.sources.filestream import (
        parquet_file_stream,
    )
    from m13_sparkstreaming_python_azure_spark.sources.replay import publish_chunk
    from m13_sparkstreaming_python_azure_spark.streaming.stateful import (
        sessions_with_state,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id"
    )
    root = tempfile.mkdtemp(prefix="sess-stream-")
    land, ck = (os.path.join(root, d) for d in ("land", "ck"))
    chunks = [
        ev.filter(F.col("ts") < "2024-01-11"),
        ev.filter(
            (F.col("ts") >= "2024-01-11") & (F.col("ts") < "2024-01-21")
        ),
        ev.filter(F.col("ts") >= "2024-01-21"),
    ]
    # sentinel flush: one event per user far beyond any session's end —
    # it opens a throwaway session (never emitted) and closes the real one
    sentinel = ev.groupBy("user_id").agg(
        F.lit(-1).cast("long").alias("event_id"),
        (F.max("ts") + F.expr("INTERVAL 30 DAYS")).alias("ts"),
    ).select("event_id", "ts", "user_id")
    publish_chunk(chunks[0], land)
    stream = parquet_file_stream(spark, land, ev.schema)
    name = f"sess_stream_{uuid.uuid4().hex[:8]}"
    q = (
        sessions_with_state(stream, gap_minutes=10)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ck)
        .start()
    )
    q.processAllAvailable()
    for ch in chunks[1:] + [sentinel]:
        publish_chunk(ch, land)
        q.processAllAvailable()
    q.stop()
    out = spark.table(name)
    return out.select(
        "user_id",
        F.date_format(
            F.timestamp_micros("session_start"), "yyyy-MM-dd HH:mm:ss"
        ).alias("session_start"),
        F.date_format(
            F.timestamp_micros("session_end"), "yyyy-MM-dd HH:mm:ss"
        ).alias("session_end"),
        "n_events",
    )


def q_chi_square_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square independence test (operators/stats) between
    event_type and day-of-week (dow = epoch//86400 mod 7 — engine-
    independent, unlike dayofweek()'s differing conventions). One
    contingency groupBy + window marginals; empty cells absorbed by the
    closed form N*sum(n²/(ra*cb)) - N."""
    from m13_sparkstreaming_python_azure_spark.operators.stats import (
        chi_square_independence,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        (
            F.floor(F.unix_timestamp("ts") / 86400).cast("bigint") % 7
        ).alias("dow"),
    )
    return chi_square_independence(ev, "event_type", "dow")


def q_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact WEIGHTED median per group — the order statistic
    value_percentiles can't express (each row counts with its weight:
    the median unit shipped, not the median line item): per return
    flag, the lower weighted median of extended price (integer cents)
    weighted by quantity. Selection is PURE integers: sort by (cents,
    orderkey, linenumber) — a total order, so ties are deterministic —
    take the first row whose doubled cumulative weight reaches the
    group total. One shuffle on the group key; the running sum and the
    pick ride the same per-group sort. All-BIGINT output — bit-equal
    with no snapping."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
        F.col("l_quantity").cast("long").alias("w"),
        "l_orderkey",
        "l_linenumber",
    )
    w_order = Window.partitionBy("flag").orderBy(
        "cents", "l_orderkey", "l_linenumber"
    )
    w_run = w_order.rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy("flag")
    scored = li.select(
        "flag",
        "cents",
        F.sum("w").over(w_run).alias("cum_w"),
        F.sum("w").over(w_all).alias("total_w"),
        F.count(F.lit(1)).over(w_all).alias("n_rows"),
        F.row_number().over(w_order).alias("rn"),
    ).filter(F.lit(2) * F.col("cum_w") >= F.col("total_w"))
    w_pick = Window.partitionBy("flag").orderBy("rn")
    return (
        scored.withColumn("pick", F.row_number().over(w_pick))
        .filter(F.col("pick") == 1)
        .select(
            "flag",
            F.col("cents").alias("median_cents"),
            "total_w",
            "n_rows",
        )
    )


_WMEDIAN_SQL = """
    WITH li AS (
        SELECT l_returnflag AS flag,
               CAST(floor(l_extendedprice * 100 + CAST(0.5 AS DOUBLE))
                    AS BIGINT) AS cents,
               CAST(l_quantity AS BIGINT) AS w,
               l_orderkey, l_linenumber
        FROM lineitem
    ), scored AS (
        SELECT flag, cents,
               sum(w) OVER (PARTITION BY flag
                   ORDER BY cents, l_orderkey, l_linenumber
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum_w,
               sum(w) OVER (PARTITION BY flag) AS total_w,
               count(*) OVER (PARTITION BY flag) AS n_rows,
               row_number() OVER (PARTITION BY flag
                   ORDER BY cents, l_orderkey, l_linenumber) AS rn
        FROM li
    )
    SELECT flag, CAST(cents AS BIGINT) AS median_cents,
           CAST(total_w AS BIGINT) AS total_w,
           CAST(n_rows AS BIGINT) AS n_rows
    FROM (
        SELECT flag, cents, total_w, n_rows,
               row_number() OVER (PARTITION BY flag ORDER BY rn) AS pick
        FROM scored WHERE 2 * cum_w >= total_w
    ) WHERE pick = 1
"""


def q_winsorized_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized per-type mean (operators/stats.winsorized_stats):
    values clip at the exact interpolated [p05, p95] before averaging —
    the outlier-resistant complement to stats_moments. Bounds grid-snap
    at 1e-6 and broadcast back; the clipped mean uses the decimal-sum
    rule."""
    from m13_sparkstreaming_python_azure_spark.operators.stats import (
        winsorized_stats,
    )

    ev = load_table(spark, sf_dir, "events")
    return winsorized_stats(ev, "event_type", "value", 0.05, 0.95)


def q_pca_explained_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA spectrum of the embeddings table (operators/pca.pca_fit):
    top-8 components. HASH gate since r10 (VERDICT r9 #4 pattern): the
    oracle replays the EXACT-integer covariance trace (Σ_j of
    n·Σx_j²−(Σx_j)² — arbitrary-precision in-gate, HUGEINT in DuckDB,
    one identical int→double conversion then identical divisions) and
    pins the in-gate spectrum invariants as literal TRUE — eigenvalues
    non-negative, non-increasing, cumulative explained ratio ≤ 1, and
    the eigh model's float trace within 1e-6 of the exact-integer twin.
    Only eigh itself stays un-replayed (numpy parity + orthonormality
    pinned in tests/test_pca.py)."""
    import math

    from m13_sparkstreaming_python_azure_spark.operators.pca import (
        covariance_int_moments,
        pca_fit,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    model = pca_fit(emb, "embedding", k=8)
    n, s, o = covariance_int_moments(emb, "embedding")
    trace_num = sum(n * o[j][j] - s[j] * s[j] for j in range(len(s)))
    trace = float(trace_num) / float(n) / float(n - 1) / 1e12
    trace6 = math.floor(trace * 1e6 + 0.5) / 1e6
    eigs = [float(v) for v in model.eigenvalues]
    cum = 0.0
    rows = []
    for i, lam in enumerate(eigs):
        cum += lam
        rows.append(
            (
                i,
                trace6,
                bool(lam >= -1e-9),
                bool(i == 0 or lam <= eigs[i - 1] + 1e-9),
                bool(cum / model.total_variance <= 1.0 + 1e-6),
                bool(
                    abs(model.total_variance - trace)
                    <= 1e-6 * max(trace, 1.0)
                ),
            )
        )
    return spark.createDataFrame(
        rows,
        "component int, trace double, eig_nonneg boolean, "
        "eig_monotone boolean, cum_ratio_ok boolean, trace_match boolean",
    )


def q_pca_embedding_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-component PCA projection of every embedding (operators/pca
    .pca_project — broadcast matmul per Arrow batch). HASH gate since
    r10 (VERDICT r9 #4) via projection INVARIANTS: per row the
    oracle-replayable raw squared norm anchors row identity, and the
    in-gate flags — Bessel (pc1²+pc2² ≤ ‖x−mean‖²+1e-9, per row),
    component orthonormality (Gram ≈ I within 1e-9), projection
    centering (|avg pc| ≤ 1e-6), and variance ordering (Σpc1² ≥ Σpc2²)
    — are pinned TRUE by the oracle, so a broken eigh/projection
    mismatches the driver hash. Only eigh itself stays un-replayed
    (numpy parity pinned in tests/test_pca.py)."""
    import numpy as np

    from m13_sparkstreaming_python_azure_spark.operators.pca import (
        pca_fit,
        pca_project,
    )

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.col("embedding").cast("array<double>").alias("x"),
    )
    model = pca_fit(emb, "x", k=2)
    proj = pca_project(emb, "x", model)
    gram = model.components @ model.components.T
    gram_ok = bool(np.abs(gram - np.eye(len(gram))).max() <= 1e-9)
    mean_arr = F.array(*[F.lit(float(v)) for v in model.mean])
    joined = proj.join(emb.select("vec_id", "x"), "vec_id")
    norm2 = (
        F.floor(
            F.aggregate(
                F.col("x"), F.lit(0.0), lambda acc, v: acc + v * v
            )
            * F.lit(1e6)
            + F.lit(0.5)
        )
        / F.lit(1e6)
    )
    cnorm2 = F.aggregate(
        F.zip_with(F.col("x"), mean_arr, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    rows = joined.select(
        "vec_id",
        "label",
        norm2.alias("norm2"),
        F.element_at("proj", 1).alias("__p1"),
        F.element_at("proj", 2).alias("__p2"),
        cnorm2.alias("__c2"),
    )
    flags = rows.agg(
        F.avg("__p1").alias("__m1"),
        F.avg("__p2").alias("__m2"),
        F.sum(F.col("__p1") * F.col("__p1")).alias("__s1"),
        F.sum(F.col("__p2") * F.col("__p2")).alias("__s2"),
    ).select(
        (
            (F.abs(F.col("__m1")) <= 1e-6) & (F.abs(F.col("__m2")) <= 1e-6)
        ).alias("center_ok"),
        (F.col("__s1") >= F.col("__s2") - F.lit(1e-9)).alias("order_ok"),
    )
    return rows.crossJoin(F.broadcast(flags)).select(
        "vec_id",
        "label",
        "norm2",
        (
            F.col("__p1") * F.col("__p1") + F.col("__p2") * F.col("__p2")
            <= F.col("__c2") + F.lit(1e-9)
        ).alias("bessel_ok"),
        F.lit(gram_ok).alias("gram_ok"),
        "center_ok",
        "order_ok",
    )


def q_pca_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upper-triangle covariance matrix of the embedding column under the
    FULL hash gate (operators/pca.covariance_int_moments): elements snap
    to the 1e-6 grid, the (n, Σx, Σxy) moments are exact integers from
    one distributed mapInPandas pass, and cov_ij = (n·Σxy − Σx·Σy) /
    n / (n−1) / scale² — IEEE division of identically-derived integers,
    bit-equal vs the DuckDB oracle. This gates the O(d²) data pass of
    pca_fit; only the driver-side eigh remains rows-only (its numpy
    parity is pinned in tests/test_pca.py)."""
    from m13_sparkstreaming_python_azure_spark.operators.pca import (
        covariance_int_moments,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    n, s, o = covariance_int_moments(emb, "embedding")
    rows = [
        (
            i,
            j,
            float(n * o[i][j] - s[i] * s[j])
            / float(n)
            / float(n - 1)
            / 1e12,
        )
        for i in range(len(s))
        for j in range(i, len(s))
    ]
    return spark.createDataFrame(rows, "i int, j int, cov double")


def q_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive seasonal decomposition of the daily event-value series
    (operators/timeseries.seasonal_decompose): value = trend (centered
    7-day MA) + weekly seasonal (per-phase mean of detrended, centered)
    + remainder. The daily aggregate is the distributed pass; the
    decomposition windows run on the tiny series. Exact-decimal sums +
    IEEE divisions of identical operands + 1e-6 snaps make all three
    components hash-equal vs the DuckDB twin."""
    from m13_sparkstreaming_python_azure_spark.operators.timeseries import (
        seasonal_decompose,
    )

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.floor(F.unix_timestamp("ts") / 86400).cast("long").alias("t")
    ).agg(
        F.sum(F.col("value").cast("decimal(18,6)")).alias("v")
    )
    return seasonal_decompose(daily, "t", "v", period=7)


def q_loo_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding of event_type by value — the
    feature-engineering staple with the leakage guard built in: each
    row's encoding is (Σ_group − own) / (n_group − 1), so a row never
    sees its own target. One window per group (sum + count), no join.
    Exact-decimal group sums; the subtraction stays in decimals; the
    final division is IEEE on identically-derived operands + 1e-6 snap.
    Groups of size 1 emit NULL (no peers to average)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type")
    vdec = F.col("value").cast("decimal(18,6)")
    enc = (
        (F.sum(vdec).over(w) - vdec).cast("double")
        / (F.count(F.lit(1)).over(w) - 1).cast("double")
    )
    snap = F.floor(enc * 1e6 + F.lit(0.5)) / 1e6
    return ev.select(
        "event_id",
        "event_type",
        F.when(F.count(F.lit(1)).over(w) > 1, snap).alias("loo_encoding"),
    )


def q_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group quantile (rank) normalization of value — the monotone
    transform ML preprocessing applies before models that assume uniform
    marginals: pr = (rank − 1) / (n − 1) within event_type, ties share a
    rank. A ratio of identically-derived ints — bit-equal across engines
    with no rounding grid at all."""
    ev = load_table(spark, sf_dir, "events")
    wg = Window.partitionBy("event_type")
    wr = Window.partitionBy("event_type").orderBy(F.col("value").asc())
    n = F.count(F.lit(1)).over(wg)
    pr = (F.rank().over(wr) - 1).cast("double") / (n - 1).cast("double")
    return ev.select(
        "event_id",
        "event_type",
        "value",
        F.when(n > 1, pr).alias("quantile_norm"),
    )


def q_bigram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated-bigram perplexity filter (operators/lm
    .bigram_logppl): self-trained bigram+unigram counts, mixture
    p = 0.7·ML-bigram + 0.3·smoothed-unigram, per-doc mean −ln p over
    transitions. The order-2 upgrade of perplexity_scores, same float
    contract (explicit mixture literals, 1e-9 ln grid, decimal sums)."""
    from m13_sparkstreaming_python_azure_spark.operators.lm import (
        bigram_logppl,
        train_bigram_model,
    )

    docs = load_table(spark, sf_dir, "documents")
    uni, bi = train_bigram_model(docs, "text")
    return bigram_logppl(docs, uni, bi)


def q_record_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi–Sunter record linkage (operators/linkage.fs_score) over
    SORTED-NEIGHBORHOOD candidates (Hernández–Stolfo): customers are
    sorted once on (name, custkey) and each record is paired with its
    next 10 neighbors only — candidates are O(10·n), linear with the
    table, where the previous (nation, segment) key blocking had
    constant block cardinality (~125) and therefore a quadratic
    within-block pair join at scale. Neighbor pairing is
    ``operators/linkage.sorted_neighborhood`` — global_rank's
    distributed total order (range shuffle, no single-partition
    WindowExec) + an equi-join on the dense rank — so candidates stay
    linear AND the plan stays partitioned. Scoring — name edit-distance
    and balance proximity with fixed m/u priors, two thresholds
    splitting match / possible / non-match — is one codegen'd
    projection; ln weights snap at 1e-9. The DuckDB oracle mirrors the
    same neighborhood via row_number rank offsets."""
    from m13_sparkstreaming_python_azure_spark.operators.linkage import (
        fs_score,
        sorted_neighborhood,
    )

    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("key"),
        F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("bal"),
    )
    pairs = sorted_neighborhood(
        cust, [F.col("name"), F.col("key")], window=10
    ).select(
        F.col("key_a"),
        "name_a",
        "bal_a",
        F.col("key_b"),
        "name_b",
        "bal_b",
    )
    scored = fs_score(
        pairs,
        agreements={
            "name": F.levenshtein("name_a", "name_b") <= 2,
            "balance": F.abs(F.col("bal_a") - F.col("bal_b")) < 100,
        },
        mu={"name": (0.95, 0.01), "balance": (0.8, 0.05)},
        lower=-3.0,
        upper=4.0,
    )
    return scored.select("key_a", "key_b", "score", "decision")


def q_k_core_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-core of the deterministic customer tree+chain graph
    (operators/graph.k_core): iterative peel — degree aggregate + two
    semi-joins per round, monotonically shrinking edge list, truncated
    at max_iter=30 rounds. Hash-gated against a DuckDB recursive-CTE
    oracle that peels the SAME 30 rounds (DuckDB permits aggregation
    over the recursive reference, so each iteration recomputes induced
    degrees); peel semantics additionally pinned on known graphs in
    tests/test_kcore_ids.py. k_core symmetrizes internally, so the
    one-row-per-undirected-edge list is passed as-is."""
    from m13_sparkstreaming_python_azure_spark.operators.graph import k_core

    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("bigint").alias("k")
    )
    tree = cust.filter(F.col("k") >= 2).select(
        F.col("k").alias("src"), (F.col("k") / 2).cast("bigint").alias("dst")
    )
    chain = cust.filter(F.col("k") >= 1).select(
        F.col("k").alias("src"), (F.col("k") - 1).alias("dst")
    )
    return k_core(tree.unionByName(chain), k=3)


def q_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection on the customer tree+chain graph via
    synchronous label propagation (operators/graph.label_propagation, 5
    fixed rounds): each node adopts its neighbors' most frequent label,
    ties to the smallest — the per-round argmax encoded as one exact
    BIGINT so both engines agree bit-for-bit. The DuckDB oracle unrolls
    the SAME 5 synchronous rounds in a recursive CTE (aggregation over
    the recursive reference, k-core-style). Communities summarized as
    (community, n_members, min/max node) — node-level labels fold into
    a stable aggregate."""
    from m13_sparkstreaming_python_azure_spark.operators.graph import (
        label_propagation,
    )

    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("bigint").alias("k")
    )
    tree = cust.filter(F.col("k") >= 2).select(
        F.col("k").alias("id_a"), (F.col("k") / 2).cast("bigint").alias("id_b")
    )
    chain = cust.filter(F.col("k") >= 1).select(
        F.col("k").alias("id_a"), (F.col("k") - 1).alias("id_b")
    )
    lp = label_propagation(tree.unionByName(chain), iterations=5)
    return lp.groupBy("community").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.min("node").alias("min_node"),
        F.max("node").alias("max_node"),
    )


def q_stable_row_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense 0..n-1 id assignment without a global sort (operators/util
    .stable_ids — the zipWithIndex pattern): per-partition counts fold
    into broadcast prefix offsets, then a shuffle-free vectorized local
    assignment. WHICH id lands on which row depends on partition layout
    (the zipWithIndex contract), so the gate hashes the layout-free
    DENSITY invariant instead (VERDICT r8 #3): n distinct ids == n rows,
    min 0, max n-1 — any duplicate, gap, or offset error flips it.
    Per-row uniqueness/order invariants stay pinned in tests."""
    from m13_sparkstreaming_python_azure_spark.operators.util import (
        stable_ids,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return stable_ids(docs).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("row_id").alias("n_distinct_ids"),
        F.min("row_id").alias("min_id"),
        F.max("row_id").alias("max_id"),
    )


def q_topn_with_other(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contribution analysis: revenue by part brand, top-5 brands kept,
    the tail collapsed into an OTHER bucket, with share-of-total. The
    BI rollup shape: one groupBy on the brand key, a rank window over
    the (tiny) aggregate, and a re-aggregate of the tail — fact rows
    shuffle once. Shares are exact-decimal revenue over the decimal
    total (identical derivation both engines)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    rev = (
        lineitem.join(
            F.broadcast(part.select("p_partkey", "p_brand")),
            lineitem.l_partkey == part.p_partkey,
        )
        .groupBy("p_brand")
        .agg(
            F.sum(
                (
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                ).cast("decimal(18,6)")
            ).alias("rev")
        )
    )
    w = Window.orderBy(F.col("rev").desc(), F.col("p_brand"))
    ranked = rev.withColumn("__rk", F.row_number().over(w))
    bucketed = ranked.select(
        F.when(F.col("__rk") <= 5, F.col("p_brand"))
        .otherwise(F.lit("OTHER"))
        .alias("brand"),
        "rev",
    )
    agg = bucketed.groupBy("brand").agg(
        F.round(F.sum("rev"), 2).cast("double").alias("revenue")
    )
    total = Window.partitionBy()
    # total folds as exact decimal — a double window-sum's fold order is
    # engine-unspecified over an unordered frame
    tot = F.sum(F.col("revenue").cast("decimal(18,6)")).over(total)
    return agg.select(
        "brand",
        "revenue",
        (F.col("revenue") / tot.cast("double")).alias("share"),
    )


def q_week_over_week(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week growth per market segment: weekly order revenue
    (week = epoch-day // 7 — engine-independent, no ISO-week ambiguity),
    previous week via lag, growth as a ratio of identically-derived
    2-decimal revenue doubles (bit-equal; null on the first week)."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    weekly = (
        orders.join(
            F.broadcast(cust.select("c_custkey", "c_mktsegment")),
            orders.o_custkey == cust.c_custkey,
        )
        .groupBy(
            "c_mktsegment",
            (F.floor(F.unix_timestamp("o_orderdate") / 86400) / 7)
            .cast("bigint")
            .alias("week"),
        )
        .agg(
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(18,6)")), 2
            )
            .cast("double")
            .alias("revenue")
        )
    )
    w = Window.partitionBy("c_mktsegment").orderBy("week")
    prev = F.lag("revenue").over(w)
    return weekly.select(
        F.col("c_mktsegment").alias("segment"),
        "week",
        "revenue",
        (F.col("revenue") / prev - 1).alias("wow_growth"),
    )


def q_ab_test_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample z-test per event_type: users split A/B by md5 parity
    (engine-independent assignment — the repo's deterministic-randomness
    rule), then z = (meanA − meanB)/sqrt(varA/nA + varB/nB) from
    decimal-exact moment sums, 1e-6-snapped. The experimentation-
    analysis shape: one groupBy computes both arms' moments via
    conditional aggregation — the fact table shuffles once."""
    ev = load_table(spark, sf_dir, "events")
    arm = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % 2
    )
    v = F.col("value")
    dv = v.cast("decimal(18,6)")
    dv2 = (dv * dv).cast("decimal(38,12)")
    is_a = arm == 0
    g = ev.groupBy("event_type").agg(
        F.sum(F.when(is_a, 1).otherwise(0)).cast("bigint").alias("n_a"),
        F.sum(F.when(~is_a, 1).otherwise(0)).cast("bigint").alias("n_b"),
        F.sum(F.when(is_a, dv)).cast("double").alias("s_a"),
        F.sum(F.when(~is_a, dv)).cast("double").alias("s_b"),
        F.sum(F.when(is_a, dv2)).cast("double").alias("q_a"),
        F.sum(F.when(~is_a, dv2)).cast("double").alias("q_b"),
    )
    m_a, m_b = F.col("s_a") / F.col("n_a"), F.col("s_b") / F.col("n_b")
    var_a = (F.col("q_a") - F.col("s_a") * F.col("s_a") / F.col("n_a")) / (
        F.col("n_a") - 1
    )
    var_b = (F.col("q_b") - F.col("s_b") * F.col("s_b") / F.col("n_b")) / (
        F.col("n_b") - 1
    )
    z = (m_a - m_b) / F.sqrt(var_a / F.col("n_a") + var_b / F.col("n_b"))
    snap = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    return g.select(
        "event_type",
        "n_a",
        "n_b",
        snap(m_a).alias("mean_a"),
        snap(m_b).alias("mean_b"),
        snap(z).alias("z_score"),
        (F.abs(z) > 1.96).alias("significant"),
    )


def q_hybrid_rrf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval via reciprocal-rank fusion: BM25 lexical ranks
    (operators/retrieval.bm25_scores, 1e-4-snapped scores) fuse with
    exact-cosine vector ranks against vec 0's embedding (round-6 cosine,
    the embedding_pairs_exact contract) as
    rrf = Σ 1/(60 + rank) — the RAG-stack ranker that needs no score
    calibration between modalities. Ranks are integers and the RRF terms
    are exact int ratios, so fusion is bit-equal across engines; a rank
    of 0 means 'absent from that modality's list'. Both modality ranks
    come from ``operators/window.global_rank`` (range shuffle — no
    single-partition WindowExec over the scored lists, which grow with
    the corpus), and the final top-20 is ORDER BY + LIMIT
    (TakeOrderedAndProject's bounded per-partition heap)."""
    from m13_sparkstreaming_python_azure_spark.operators.retrieval import (
        bm25_scores,
    )
    from m13_sparkstreaming_python_azure_spark.operators.similarity import (
        dot,
        l2_norm,
    )
    from m13_sparkstreaming_python_azure_spark.operators.window import (
        global_rank,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    lex = bm25_scores(docs, ["hash", "join", "stream"])
    lexr = global_rank(
        lex, [F.col("bm25").desc(), F.asc("doc_id")], out_col="rank_lex"
    ).select("doc_id", "rank_lex")
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    qv = emb.filter(F.col("vec_id") == 0).select(F.col("v").alias("qv"))
    vec = emb.crossJoin(F.broadcast(qv)).select(
        F.col("vec_id").alias("doc_id"),
        F.round(
            dot(F.col("v"), F.col("qv"))
            / (l2_norm(F.col("v")) * l2_norm(F.col("qv"))),
            6,
        ).alias("cos"),
    )
    vecr = global_rank(
        vec, [F.col("cos").desc(), F.asc("doc_id")], out_col="rank_vec"
    ).select("doc_id", "rank_vec")
    fused = (
        lexr.join(vecr, on="doc_id", how="full_outer")
        .select(
            "doc_id",
            F.coalesce("rank_lex", F.lit(0)).alias("rank_lex"),
            F.coalesce("rank_vec", F.lit(0)).alias("rank_vec"),
        )
        .withColumn(
            "rrf_score",
            F.when(
                F.col("rank_lex") > 0,
                F.lit(1.0) / (F.lit(60) + F.col("rank_lex")),
            ).otherwise(F.lit(0.0))
            + F.when(
                F.col("rank_vec") > 0,
                F.lit(1.0) / (F.lit(60) + F.col("rank_vec")),
            ).otherwise(F.lit(0.0)),
        )
    )
    return fused.orderBy(F.col("rrf_score").desc(), "doc_id").limit(20)


def q_json_dlq_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corrupt-record routing (the ingest dead-letter-queue pattern):
    props JSON is deterministically mangled for event_id ≡ 0 (mod 13),
    then parsed permissively — unparseable rows route to 'dlq', valid
    rows to 'valid' with their extracted field aggregated. At scale this
    is the foreachBatch split-sink shape: bad rows quarantine with full
    payload instead of poisoning the batch. Corruption is TRUNCATION
    (unclosed object) — rejected by any JSON grammar; trailing-garbage
    corruption would NOT work here, Spark's Jackson parser accepts it
    while strict validators refuse."""
    ev = load_table(spark, sf_dir, "events")
    mangled = F.when(
        F.col("event_id") % 13 == 0,
        F.expr("substring(props, 1, length(props) - 2)"),
    ).otherwise(F.col("props"))
    parsed = F.from_json(mangled, "k int")
    routed = ev.select(
        F.when(parsed["k"].isNotNull(), F.lit("valid"))
        .otherwise(F.lit("dlq"))
        .alias("route"),
        parsed["k"].cast("bigint").alias("k"),
    )
    return routed.groupBy("route").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("k").cast("bigint").alias("sum_k"),
    )


def q_sorted_neighborhood_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood blocking (the third entity-resolution
    candidate generator, after symmetric-delete fuzzy and key blocking):
    sort names once, compare each to its next 5 neighbors only —
    candidates are LINEAR in n with a fixed window, the classic
    alternative when no natural blocking key exists. Implemented with
    ``operators/linkage.sorted_neighborhood`` — global_rank's
    distributed total order (range shuffle, NEVER a single-partition
    ``Window.orderBy`` sort) + an equi-join on the dense rank, so the
    plan stays partitioned at any scale; exact levenshtein verify keeps
    pairs within distance 2. No cross-partition pairs are missed: the
    rank is globally dense, so rank+i addresses the true i-th neighbor
    regardless of which range partition it landed in."""
    from m13_sparkstreaming_python_azure_spark.operators.linkage import (
        sorted_neighborhood,
    )

    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_name").alias("name")
    ).distinct()
    pairs = sorted_neighborhood(cust, [F.col("name")], window=5).select(
        F.col("name_a").alias("name"), F.col("name_b").alias("other")
    )
    return pairs.withColumn(
        "edit_distance", F.levenshtein("name", "other", 2)
    ).filter(
        (F.col("edit_distance") >= 0) & (F.col("edit_distance") <= 2)
    ).select(
        F.col("name").alias("name_a"),
        F.col("other").alias("name_b"),
        "edit_distance",
    )


def q_corpus_datacard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-card statistics for the documents corpus in one long
    table (metric, value): counts, token/char volume, exact-duplicate
    rate (md5 content identity — engine-portable), interpolated length
    percentiles, and per-language shares. Two aggregate passes (scalar
    + per-lang), both map-side combining; shares and rates are exact
    int ratios, percentiles snap at 1e-6."""
    from m13_sparkstreaming_python_azure_spark.operators.text import (
        token_count,
    )

    docs = load_table(spark, sf_dir, "documents")
    snap = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    scalar = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count("text")).alias("total_tokens"),
        F.sum("n_chars").alias("total_chars"),
        F.count_distinct(F.md5("text")).alias("distinct_texts"),
        snap(F.percentile(F.col("n_chars"), F.lit(0.5))).alias("p50"),
        snap(F.percentile(F.col("n_chars"), F.lit(0.9))).alias("p90"),
    )
    base = scalar.select(
        F.expr(
            "stack(6, 'n_docs', CAST(n_docs AS DOUBLE),"
            " 'total_tokens', CAST(total_tokens AS DOUBLE),"
            " 'total_chars', CAST(total_chars AS DOUBLE),"
            " 'dup_rate', 1.0 - CAST(distinct_texts AS DOUBLE) / n_docs,"
            " 'p50_chars', p50,"
            " 'p90_chars', p90) as (metric, value)"
        )
    )
    n_total = docs.count()
    langs = docs.groupBy("lang").agg(
        (F.count(F.lit(1)) / F.lit(n_total)).alias("value")
    ).select(
        F.concat(F.lit("lang_share:"), F.col("lang")).alias("metric"),
        "value",
    )
    return base.unionByName(langs)


def q_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-frequency analysis of the corpus vocabulary: OLS slope
    of ln(freq) on ln(rank) — the corpus-health diagnostic (natural text
    ≈ −1; synthetic/boilerplate text flattens). One vocab-keyed count,
    one rank window over the (vocabulary-sized) aggregate, then a
    single-row regression from decimal-accumulated sums of 1e-9-snapped
    logs."""
    from m13_sparkstreaming_python_azure_spark.operators.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    vocab = (
        docs.select(F.explode(tokens("text")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.orderBy(F.col("n").desc(), "term")
    ranked = vocab.select(
        F.row_number().over(w).alias("rank"), "n"
    )
    snap9 = lambda c: F.floor(c * 1e9 + F.lit(0.5)) / 1e9  # noqa: E731
    pts = ranked.select(
        snap9(F.log(F.col("rank").cast("double"))).alias("x"),
        snap9(F.log(F.col("n").cast("double"))).alias("y"),
    )
    d = lambda c: F.sum(c.cast("decimal(27,12)")).cast("double")  # noqa: E731
    agg = pts.agg(
        F.count(F.lit(1)).alias("k"),
        d(F.col("x")).alias("sx"),
        d(F.col("y")).alias("sy"),
        d(F.col("x") * F.col("x")).alias("sxx"),
        d(F.col("x") * F.col("y")).alias("sxy"),
    )
    slope = (F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    snap6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    intercept = (F.col("sy") - slope * F.col("sx")) / F.col("k")
    return agg.select(
        F.col("k").alias("vocab_size"),
        snap6(slope).alias("zipf_slope"),
        snap6(intercept).alias("intercept"),
    )


def q_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probability-calibration audit (the model-eval op): a deterministic
    pseudo-prediction (md5 uniform per event — the repo's engine-
    independent randomness) is binned into deciles and compared to the
    realized outcome (event_type = 'purchase'): per bin, count, mean
    predicted probability, observed positive rate, and |gap| — the rows
    a reliability diagram plots and ECE sums. All ratios of identically-
    derived ints except mean_pred (decimal-summed uniforms)."""
    ev = load_table(spark, sf_dir, "events")
    u = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("cal:"), F.col("event_id"))), 1, 8),
            16,
            10,
        ).cast("bigint")
        / F.lit(4294967296.0)
    )
    binned = ev.select(
        F.least(F.floor(u * 10).cast("int"), F.lit(9)).alias("bin"),
        u.alias("pred"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    dec = F.sum(F.col("pred").cast("decimal(18,12)"))
    snap = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    agg = binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        snap(dec.cast("double") / F.count(F.lit(1))).alias("mean_pred"),
        (F.sum("y") / F.count(F.lit(1))).alias("frac_pos"),
    )
    return agg.withColumn(
        "abs_gap", snap(F.abs(F.col("mean_pred") - F.col("frac_pos")))
    )


def q_streaming_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream LEFT OUTER interval join under the gate
    — the §2.9 semantic the inner-join gate can't prove: UNMATCHED
    purchases must null-pad, and Spark only emits them when the
    watermark closes their interval (state eviction). Events replay as
    3 event-time-ordered chunks with a REALISTIC 3-day delay (not the
    span-exceeding delay the inner gate uses), then two far-future
    sentinel rows push the watermark past every real interval so all
    outer rows flush — the emitted set must equal the batch LEFT join
    exactly."""
    import os
    import tempfile
    import uuid

    from m13_sparkstreaming_python_azure_spark.sources.filestream import (
        parquet_file_stream,
    )
    from m13_sparkstreaming_python_azure_spark.sources.replay import publish_chunk
    from m13_sparkstreaming_python_azure_spark.streaming.stateful import (
        stream_stream_interval_join,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type"
    )
    root = tempfile.mkdtemp(prefix="souter-")
    land, ck = (os.path.join(root, d) for d in ("land", "ck"))
    chunks = [
        ev.filter(F.col("ts") < "2024-01-11"),
        ev.filter(
            (F.col("ts") >= "2024-01-11") & (F.col("ts") < "2024-01-21")
        ),
        ev.filter(F.col("ts") >= "2024-01-21"),
    ]
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    # each stream's watermark advances only on rows that SURVIVE its
    # filter — so every sentinel batch must carry BOTH event types, or
    # the global watermark (min over operators) stays pinned and the
    # trailing unmatched rows never flush
    sentinels = [
        spark.createDataFrame(
            [
                (-1 - 2 * i, max_ts, -1, "purchase"),
                (-2 - 2 * i, max_ts, -2, "click"),
            ],
            ev.schema,
        ).select(
            F.col("event_id"),
            (F.col("ts") + F.expr(f"INTERVAL {60 + i} DAYS")).alias("ts"),
            "user_id",
            "event_type",
        )
        for i in range(2)
    ]
    publish_chunk(chunks[0], land)
    s1 = parquet_file_stream(spark, land, ev.schema)
    s2 = parquet_file_stream(spark, land, ev.schema)
    joined = stream_stream_interval_join(
        s1.filter(F.col("event_type") == "purchase"),
        s2.filter(F.col("event_type") == "click"),
        key="user_id",
        max_lag="24 hours",
        watermark_delay="3 days",
        how="leftOuter",
    ).select(
        F.date_format(F.col("l.ts"), "yyyy-MM-dd").alias("purchase_date"),
        F.col("l.event_id").alias("purchase_id"),
        F.col("r.event_id").alias("click_id"),
    )
    name = f"souter_{uuid.uuid4().hex[:8]}"
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    # 2 partitions: a stream-stream join carries FOUR state stores per
    # partition, so per-batch commit cost scales with the partition
    # count; the replay fixture is tiny and the aggregate output is
    # partitioning-independent (r9 floor shave, rows verified equal)
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try:
        q = (
            joined.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", ck)
            .start()
        )
        q.processAllAvailable()
        for ch in chunks[1:] + sentinels:
            publish_chunk(ch, land)
            q.processAllAvailable()
        q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    return (
        spark.table(name)
        .filter(F.col("purchase_id") >= 0)
        .groupBy("purchase_date")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.count("click_id").alias("n_matched"),
            F.sum(
                F.when(F.col("click_id").isNull(), 1).otherwise(0)
            ).cast("bigint").alias("n_unmatched"),
        )
    )


def q_streaming_full_outer_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream FULL OUTER interval join with BOTH-side watermark
    eviction, fed through a ``dropDuplicatesWithinWatermark`` stage
    (VERDICT r4 #6) — the remaining §2.9 outer-join semantics a real
    pipeline hits: late duplicate events AND unmatched rows on both
    sides. The replay re-publishes chunk 1's trailing 2 days inside
    chunk 2 (late duplicates, still within the 3-day watermark); each
    side dedups on event_id BEFORE the join, so the quiesced append sink
    must equal the batch FULL join over the distinct events — duplicates
    surviving to the join would double matched pairs, and a missing
    both-side eviction would never emit the unmatched rows. Chained
    stateful operators (dedup → join) share the upstream watermark
    (``rewatermark=False`` — Spark ≥3.5 forbids redefining it).
    State: dedup keys live for the delay window; join buffers
    rate × (delay + lag) per side — both bounded, RocksDB-ready."""
    import os
    import tempfile
    import uuid

    from m13_sparkstreaming_python_azure_spark.sources.filestream import (
        parquet_file_stream,
    )
    from m13_sparkstreaming_python_azure_spark.sources.replay import publish_chunk
    from m13_sparkstreaming_python_azure_spark.streaming.stateful import (
        stream_stream_interval_join,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type"
    )
    root = tempfile.mkdtemp(prefix="sfo-")
    land, ck = (os.path.join(root, d) for d in ("land", "ck"))
    chunks = [
        ev.filter(F.col("ts") < "2024-01-11"),
        ev.filter(
            (F.col("ts") >= "2024-01-11") & (F.col("ts") < "2024-01-21")
        ),
        ev.filter(F.col("ts") >= "2024-01-21"),
    ]
    # late duplicates: chunk 1's trailing 2 days replayed inside chunk 2
    # — event-time >= watermark (chunk-1 max − 3 days), so the dedup
    # state must be what drops them, not the late-row filter
    dup = ev.filter((F.col("ts") >= "2024-01-09") & (F.col("ts") < "2024-01-11"))
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    # sentinel batches carry BOTH event types (watermark = min over
    # operators — see q_streaming_outer_join) to flush both sides
    sentinels = [
        spark.createDataFrame(
            [
                (-1 - 2 * i, max_ts, -1, "purchase"),
                (-2 - 2 * i, max_ts, -2, "click"),
            ],
            ev.schema,
        ).select(
            "event_id",
            (F.col("ts") + F.expr(f"INTERVAL {60 + i} DAYS")).alias("ts"),
            "user_id",
            "event_type",
        )
        for i in range(2)
    ]
    publish_chunk(chunks[0], land)
    s1 = parquet_file_stream(spark, land, ev.schema)
    s2 = parquet_file_stream(spark, land, ev.schema)

    def _deduped_side(s, typ):
        return (
            s.filter(F.col("event_type") == typ)
            .withWatermark("ts", "3 days")
            .dropDuplicatesWithinWatermark(["event_id"])
        )

    joined = stream_stream_interval_join(
        _deduped_side(s1, "purchase"),
        _deduped_side(s2, "click"),
        key="user_id",
        max_lag="24 hours",
        watermark_delay="3 days",
        how="fullOuter",
        rewatermark=False,
    ).select(
        F.coalesce(
            F.date_format(F.col("l.ts"), "yyyy-MM-dd"),
            F.date_format(F.col("r.ts"), "yyyy-MM-dd"),
        ).alias("day"),
        F.col("l.event_id").alias("purchase_id"),
        F.col("r.event_id").alias("click_id"),
    )
    name = f"sfo_{uuid.uuid4().hex[:8]}"
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    # 2 partitions: a stream-stream join carries FOUR state stores per
    # partition, so per-batch commit cost scales with the partition
    # count; the replay fixture is tiny and the aggregate output is
    # partitioning-independent (r9 floor shave, rows verified equal)
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try:
        q = (
            joined.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", ck)
            .start()
        )
        q.processAllAvailable()
        for ch in [chunks[1].unionAll(dup)] + chunks[2:] + sentinels:
            publish_chunk(ch, land)
            q.processAllAvailable()
        q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    return (
        spark.table(name)
        .filter(
            (F.col("purchase_id").isNull() | (F.col("purchase_id") >= 0))
            & (F.col("click_id").isNull() | (F.col("click_id") >= 0))
        )
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(
                F.when(
                    F.col("purchase_id").isNotNull()
                    & F.col("click_id").isNotNull(),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_matched"),
            F.sum(F.when(F.col("click_id").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_purchase_only"),
            F.sum(F.when(F.col("purchase_id").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_click_only"),
        )
    )


def q_cms_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch frequency estimates (operators/cms) over the
    document word-bigram stream: a deterministic probe subset (md5(b) ≡
    0 mod 37) queried against a 4×256 sketch, reported next to the true
    counts — (bigram, estimate, true_count), estimate ≥ true always.
    The md5-seeded bucket grid makes the sketch CONTENTS engine-
    identical, so even the approximate answers hash-match the SQL
    oracle."""
    from m13_sparkstreaming_python_azure_spark.operators.cms import (
        cms_build,
        cms_estimate,
    )
    from m13_sparkstreaming_python_azure_spark.operators.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    arr = docs.select(tokens("text").alias("t")).filter(F.size("t") >= 2)
    bigrams = arr.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("t") - 1),
                lambda i: F.concat(
                    F.element_at("t", i),
                    F.lit(" "),
                    F.element_at("t", i + 1),
                ),
            )
        ).alias("bigram")
    )
    cms = cms_build(bigrams, "bigram")
    truth = bigrams.groupBy("bigram").agg(
        F.count(F.lit(1)).alias("true_count")
    )
    probes = truth.filter(
        F.conv(F.substring(F.md5("bigram"), 1, 8), 16, 10).cast("bigint")
        % 37
        == 0
    )
    est = cms_estimate(cms, probes.select("bigram"), "bigram")
    return est.join(probes, on="bigram").select(
        "bigram", "estimate", "true_count"
    )


def q_streaming_late_data_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark LATE-DATA DROP semantics under the gate — the inverse
    of streaming_append_windows (which proves what IS emitted): events
    replay OUT OF ORDER — days 1-10, then days 20+, then days 11-19
    arriving last — with a 2-day watermark on daily tumbling counts in
    update mode. After the second chunk the watermark sits ~2 days
    behind day 30, so the ENTIRE late middle chunk is older than the
    watermark and must be dropped from the aggregation state. The final
    per-window maxima (update-mode counts only grow) must equal the
    batch daily counts computed WITHOUT the middle chunk — the drop set
    is exact and deterministic, not best-effort."""
    import os
    import tempfile
    import uuid

    from m13_sparkstreaming_python_azure_spark.sources.filestream import (
        parquet_file_stream,
    )
    from m13_sparkstreaming_python_azure_spark.sources.replay import publish_chunk

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type", "value"
    )
    root = tempfile.mkdtemp(prefix="late-drop-")
    land, ck = (os.path.join(root, d) for d in ("land", "ck"))
    on_time_1 = ev.filter(F.col("ts") < "2024-01-11")
    on_time_2 = ev.filter(F.col("ts") >= "2024-01-20")
    late = ev.filter(
        (F.col("ts") >= "2024-01-11") & (F.col("ts") < "2024-01-20")
    )
    publish_chunk(on_time_1, land)
    stream = parquet_file_stream(spark, land, ev.schema)
    agg = (
        stream.withWatermark("ts", "2 days")
        .groupBy(F.window("ts", "1 day").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd").alias("day"),
            "n",
        )
    )
    name = f"late_drop_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ck)
        .start()
    )
    q.processAllAvailable()
    for ch in (on_time_2, late):
        publish_chunk(ch, land)
        q.processAllAvailable()
    q.stop()
    # update mode re-emits a window each time its count grows; the final
    # value per window is the max. Windows fed ONLY by the dropped late
    # chunk never emit at all.
    return (
        spark.table(name)
        .groupBy("day")
        .agg(F.max("n").alias("n_events"))
    )


def q_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day Holt double-exponential-smoothing forecast of daily event
    counts per event type (operators/timeseries.holt_forecast) — the
    trend-aware forecasting stage on top of the same daily aggregate
    seasonal_decompose consumes. The recursion runs as one Arrow batch
    per series (applyInPandas, the documented §2.10 escape hatch —
    sequential in t, parallel across series); the DuckDB oracle unrolls
    the identical IEEE recursion in a recursive CTE, so forecasts
    hash-match bit-for-bit before the 1e-6 output snap."""
    from m13_sparkstreaming_python_azure_spark.operators.timeseries import (
        holt_forecast,
    )

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.floor(F.unix_micros(F.col("ts")) / 86_400_000_000)
        .cast("long")
        .alias("day"),
    ).agg(F.count(F.lit(1)).alias("y"))
    return holt_forecast(
        daily, "event_type", "day", "y", alpha=0.2, beta=0.1, horizon=7
    )


_HOLT_SQL = """
    WITH RECURSIVE daily AS (
        SELECT event_type,
               CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS day,
               CAST(count(*) AS BIGINT) AS y
        FROM events GROUP BY 1, 2
    ), idxd AS (
        SELECT event_type, y,
               CAST(row_number() OVER (PARTITION BY event_type
                    ORDER BY day) AS BIGINT) AS idx
        FROM daily
    ), last_idx AS (
        SELECT event_type, max(idx) AS n FROM idxd GROUP BY event_type
    ), state AS (
        SELECT i.event_type, CAST(1 AS BIGINT) AS t,
               CAST(i.y AS DOUBLE) AS l,
               CAST(j.y AS DOUBLE) - i.y AS b
        FROM idxd i
        JOIN idxd j ON i.event_type = j.event_type
                   AND i.idx = 1 AND j.idx = 2
        UNION ALL
        SELECT s.event_type, s.t + 1,
               CAST(0.2 AS DOUBLE) * d.y
                   + (CAST(1.0 AS DOUBLE) - CAST(0.2 AS DOUBLE))
                     * (s.l + s.b),
               CAST(0.1 AS DOUBLE)
                   * ((CAST(0.2 AS DOUBLE) * d.y
                       + (CAST(1.0 AS DOUBLE) - CAST(0.2 AS DOUBLE))
                         * (s.l + s.b)) - s.l)
                   + (CAST(1.0 AS DOUBLE) - CAST(0.1 AS DOUBLE)) * s.b
        FROM state s
        JOIN idxd d ON d.event_type = s.event_type AND d.idx = s.t + 1
    ), final AS (
        SELECT s.event_type, s.l, s.b
        FROM state s JOIN last_idx m
          ON s.event_type = m.event_type AND s.t = m.n
    )
    SELECT f.event_type, h.h,
           floor((f.l + h.h * f.b) * 1e6 + 0.5) / 1e6 AS forecast,
           floor(f.l * 1e6 + 0.5) / 1e6 AS level,
           floor(f.b * 1e6 + 0.5) / 1e6 AS trend
    FROM final f
    CROSS JOIN (SELECT CAST(unnest(generate_series(1, 7)) AS BIGINT)
                    AS h) h
"""


def q_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day Holt-Winters ADDITIVE seasonal forecast of daily event
    counts per event type (operators/timeseries.holt_winters_forecast,
    α=0.3 β=0.1 γ=0.05, weekly period m=7) — the seasonal upgrade of
    ``holt_forecast`` for the metric every ops dashboard actually has
    (weekday shape). The recursion runs one Arrow batch per series
    (applyInPandas — sequential in t, parallel across series); the
    DuckDB oracle replays the IDENTICAL IEEE expression tree in a
    recursive CTE whose state carries (level, trend) plus the length-7
    seasonal list shifted one slot per step, so forecasts hash-match
    bit-for-bit before the 1e-6 output snap."""
    from m13_sparkstreaming_python_azure_spark.operators.timeseries import (
        holt_winters_forecast,
    )

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.floor(F.unix_micros(F.col("ts")) / 86_400_000_000)
        .cast("long")
        .alias("day"),
    ).agg(F.count(F.lit(1)).alias("y"))
    return holt_winters_forecast(
        daily, "event_type", "day", "y",
        alpha=0.3, beta=0.1, gamma=0.05, period=7, horizon=7,
    )


# State recursion mirrors operators/timeseries.holt_winters_forecast
# term for term: l' = α(y − s[1]) + (1−α)(l + b) appears three times
# (level, inside trend, inside seasonal) exactly as the Python local
# `lvl` is reused — DuckDB folds the common subexpression; either way
# the value is the same double. s[2:7] || [s_new] is the one-slot shift.
_HW_SQL = """
    WITH RECURSIVE daily AS (
        SELECT event_type,
               CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS day,
               CAST(count(*) AS BIGINT) AS y
        FROM events GROUP BY 1, 2
    ), idxd AS (
        SELECT event_type, y,
               CAST(row_number() OVER (PARTITION BY event_type
                    ORDER BY day) AS BIGINT) AS idx
        FROM daily
    ), last_idx AS (
        SELECT event_type, max(idx) AS n FROM idxd
        GROUP BY event_type HAVING max(idx) >= 14
    ), l0 AS (
        SELECT event_type, sum(y) / CAST(7 AS DOUBLE) AS l
        FROM idxd WHERE idx <= 7 GROUP BY event_type
    ), b0 AS (
        SELECT i.event_type,
               (sum(i.y) / CAST(7 AS DOUBLE) - l0.l) / CAST(7 AS DOUBLE)
                   AS b
        FROM idxd i JOIN l0 ON l0.event_type = i.event_type
        WHERE i.idx BETWEEN 8 AND 14 GROUP BY i.event_type, l0.l
    ), s0 AS (
        SELECT i.event_type, list(i.y - l0.l ORDER BY i.idx) AS s
        FROM idxd i JOIN l0 ON l0.event_type = i.event_type
        WHERE i.idx <= 7 GROUP BY i.event_type
    ), init AS (
        SELECT l0.event_type, CAST(7 AS BIGINT) AS t, l0.l, b0.b, s0.s
        FROM l0
        JOIN b0 ON b0.event_type = l0.event_type
        JOIN s0 ON s0.event_type = l0.event_type
        JOIN last_idx m ON m.event_type = l0.event_type
    ), state AS (
        SELECT * FROM init
        UNION ALL
        SELECT s.event_type, s.t + 1,
               CAST(0.3 AS DOUBLE) * (d.y - s.s[1])
                   + (CAST(1.0 AS DOUBLE) - CAST(0.3 AS DOUBLE))
                     * (s.l + s.b),
               CAST(0.1 AS DOUBLE)
                   * ((CAST(0.3 AS DOUBLE) * (d.y - s.s[1])
                       + (CAST(1.0 AS DOUBLE) - CAST(0.3 AS DOUBLE))
                         * (s.l + s.b)) - s.l)
                   + (CAST(1.0 AS DOUBLE) - CAST(0.1 AS DOUBLE)) * s.b,
               s.s[2:7] || [
                   CAST(0.05 AS DOUBLE)
                       * (d.y - (CAST(0.3 AS DOUBLE) * (d.y - s.s[1])
                           + (CAST(1.0 AS DOUBLE) - CAST(0.3 AS DOUBLE))
                             * (s.l + s.b)))
                   + (CAST(1.0 AS DOUBLE) - CAST(0.05 AS DOUBLE)) * s.s[1]
               ]
        FROM state s
        JOIN idxd d ON d.event_type = s.event_type AND d.idx = s.t + 1
    ), final AS (
        SELECT s.event_type, s.l, s.b, s.s
        FROM state s JOIN last_idx m
          ON s.event_type = m.event_type AND s.t = m.n
    )
    SELECT f.event_type, h.h,
           floor((f.l + h.h * f.b
                  + f.s[CAST((h.h - 1) % 7 AS INT) + 1]) * 1e6 + 0.5)
               / 1e6 AS forecast,
           floor(f.l * 1e6 + 0.5) / 1e6 AS level,
           floor(f.b * 1e6 + 0.5) / 1e6 AS trend,
           floor(f.s[CAST((h.h - 1) % 7 AS INT) + 1] * 1e6 + 0.5) / 1e6
               AS seasonal
    FROM final f
    CROSS JOIN (SELECT CAST(unnest(generate_series(1, 7)) AS BIGINT)
                    AS h) h
"""


def q_entity_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end entity resolution: bounded fuzzy candidate generation →
    transitive-closure clustering — the step AFTER ``record_linkage``
    scores pairs (pairwise decisions alone aren't entities; A≈B and B≈C
    must land A, B, C in ONE entity even when A and C don't match
    directly). Match predicate: same (nation, segment) AND
    Levenshtein(name) ≤ 2. Candidates come from symmetric-delete
    blocking (``operators/fuzzy.fuzzy_pairs`` — every name within edit
    distance 2 shares a deletion variant, so the variant equi-join is a
    COMPLETE candidate set that grows linearly in n), never from a
    quadratic key-block self-join: the old (nation, segment) blocking
    had constant cardinality (~125 blocks), so block size — and the
    within-block pair join — grew quadratically with the table.
    (nation, segment) equality is now a post-filter on the linear
    candidate set; identical-name pairs (edit distance 0, which the
    distinct-name generator can't emit) are recovered by an exact
    name equi-join. Then ``operators/graph.connected_components``
    (hash-min label propagation, O(log n) rounds, localCheckpoint
    lineage truncation) assigns entity_id = min custkey of the
    component. Output is the multi-member entity census. The DuckDB
    oracle computes the SAME match predicate from the naive blocked
    join + recursive transitive closure — a different algorithm AND a
    different candidate generator, so the hash check pins semantics
    (including candidate completeness), not the implementation."""
    from m13_sparkstreaming_python_azure_spark.operators.fuzzy import (
        fuzzy_pairs,
    )
    from m13_sparkstreaming_python_azure_spark.operators.graph import (
        connected_components,
    )

    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("key"),
        F.col("c_name").alias("name"),
        F.col("c_nationkey").alias("nation"),
        F.col("c_mktsegment").alias("segment"),
    )
    # linear-candidate generator over DISTINCT (name, nation, segment)
    # tuples. The (nation, segment) equality the match predicate requires
    # is folded INTO the variant join key (fuzzy_pairs block_cols):
    # candidate completeness for the predicate is preserved — a matching
    # pair shares both a deletion variant AND the block — while the
    # candidate volume drops by the block count. Without it, the serial-
    # id name corpus (every name within distance 2 of hundreds of
    # others) makes the unblocked variant join output-quadratic-ish in
    # practice (measured 168 s at sf0.1 vs ~3 s blocked).
    name_pairs = fuzzy_pairs(
        cust.select("name", "nation", "segment"),
        "name",
        max_dist=2,
        block_cols=["nation", "segment"],
    ).select(
        F.col("key_a").alias("name_a"),
        F.col("key_b").alias("name_b"),
        "nation",
        "segment",
    )
    a = cust.select(
        F.col("name").alias("name_a"),
        F.col("key").alias("key_a"),
        "nation",
        "segment",
    )
    b = cust.select(
        F.col("name").alias("name_b"),
        F.col("key").alias("key_b"),
        "nation",
        "segment",
    )
    fuzzy_edges = (
        name_pairs.join(a, ["name_a", "nation", "segment"])
        .join(b, ["name_b", "nation", "segment"])
        .select("key_a", "key_b")
    )
    # edit-distance-0 pairs: distinct customers sharing the exact name
    # (an equi-join, output-sized; empty under TPC-H's unique names)
    same_name = a.join(
        b,
        (F.col("name_a") == F.col("name_b"))
        & (a["nation"] == b["nation"])
        & (a["segment"] == b["segment"])
        & (F.col("key_a") < F.col("key_b")),
    ).select("key_a", "key_b")
    comp = connected_components(
        fuzzy_edges.unionByName(same_name), "key_a", "key_b"
    )
    return (
        comp.groupBy(F.col("component").alias("entity_id"))
        .agg(F.count(F.lit(1)).alias("n_members"))
        .filter(F.col("n_members") >= 2)
    )


_ENTITY_SQL = """
    WITH RECURSIVE pairs AS (
        SELECT a.c_custkey AS u, b.c_custkey AS v
        FROM customer a JOIN customer b
          ON a.c_nationkey = b.c_nationkey
         AND a.c_mktsegment = b.c_mktsegment
         AND a.c_custkey < b.c_custkey
         AND levenshtein(a.c_name, b.c_name) <= 2
    ), sym AS (
        SELECT DISTINCT u, v FROM (
            SELECT u, v FROM pairs
            UNION ALL
            SELECT v AS u, u AS v FROM pairs
        )
    ), reach AS (
        SELECT DISTINCT u AS node, u AS r FROM sym
        UNION
        SELECT re.node, s.v AS r
        FROM reach re JOIN sym s ON re.r = s.u
    ), comp AS (
        SELECT node, CAST(min(r) AS BIGINT) AS entity_id
        FROM reach GROUP BY node
    )
    SELECT entity_id, CAST(count(*) AS BIGINT) AS n_members
    FROM comp GROUP BY entity_id HAVING count(*) >= 2
"""


def q_streaming_dim_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment where the static side EVOLVES mid-stream
    — the Delta/Iceberg "streaming-static join" pattern: Spark resolves
    a static DataFrame once per QUERY, so a dimension that changes while
    the stream runs silently serves stale rows unless each micro-batch
    re-reads it. Here foreachBatch re-reads the dimension SNAPSHOT
    (sources/snapshots.read_snapshot — an atomic manifest pointer, so a
    batch never sees a half-committed dim) at batch time: events replay
    as two atomic chunks with a dim overwrite (v1→v2 multipliers)
    committed strictly between them, and the result must show chunk-1
    rows priced under v1 and chunk-2 rows under v2 — which the oracle
    states directly. Per-batch output dirs are the idempotence unit, as
    in every foreachBatch sink here."""
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
        write_snapshot,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    types = ev.select("event_type").distinct()
    root = tempfile.mkdtemp(prefix="dimrefresh-")
    land, ck, sink, dim = (
        os.path.join(root, d) for d in ("land", "ck", "sink", "dim")
    )
    write_snapshot(
        types.select(
            "event_type",
            (F.length("event_type") % 3 + 1).cast("long").alias("mult"),
        ),
        dim,
    )  # v1

    def _apply(bdf, batch_id):
        s = bdf.sparkSession
        d = read_snapshot(s, dim)
        out = bdf.join(F.broadcast(d), on="event_type").select(
            "event_type",
            "event_id",
            (F.col("cents") * F.col("mult")).alias("weighted"),
        )
        out.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(sink, f"batch={batch_id}")
        )

    chunk1 = ev.filter(F.col("event_id") % 2 == 0)
    chunk2 = ev.filter(F.col("event_id") % 2 == 1)
    publish_chunk(chunk1, land)
    stream = parquet_file_stream(spark, land, ev.schema)
    q = (
        stream.writeStream.foreachBatch(_apply)
        .queryName(f"dimrefresh_{uuid.uuid4().hex[:8]}")
        .option("checkpointLocation", ck)
        .start()
    )
    q.processAllAvailable()
    # the dim evolves strictly between the two replay chunks
    write_snapshot(
        types.select(
            "event_type",
            (F.length("event_type") % 5 + 2).cast("long").alias("mult"),
        ),
        dim,
    )  # v2
    publish_chunk(chunk2, land)
    q.processAllAvailable()
    q.stop()
    return (
        spark.read.parquet(sink)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("weighted").alias("weighted_cents"),
        )
    )


_DIM_REFRESH_SQL = """
    WITH ev AS (
        SELECT event_id, event_type,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        FROM events
    ), priced AS (
        SELECT event_type,
               cents * (length(event_type) % 3 + 1) AS weighted
        FROM ev WHERE event_id % 2 = 0
        UNION ALL
        SELECT event_type,
               cents * (length(event_type) % 5 + 2) AS weighted
        FROM ev WHERE event_id % 2 = 1
    )
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(weighted) AS BIGINT) AS weighted_cents
    FROM priced GROUP BY event_type
"""


ANALYTICS_QUERIES = {
    "holt_forecast": q_holt_forecast,
    "holt_winters": q_holt_winters,
    "item_cf_recommend": q_item_cf,
    "bellman_ford_paths": q_bellman_ford,
    "textrank_keywords": q_textrank_keywords,
    "weighted_median": q_weighted_median,
    "streaming_dim_refresh": q_streaming_dim_refresh,
    "entity_clusters": q_entity_clusters,
    "markov_transitions": q_markov_transitions,
    "interval_merge_sessions": q_interval_merge_sessions,
    "price_decile_stats": q_price_decile_stats,
    "data_quality_suite": q_data_quality_suite,
    "association_rules": q_association_rules,
    "heavy_hitter_bigrams": q_heavy_hitter_bigrams,
    "changepoint_detect": q_changepoint_detect,
    "linear_interpolation": q_linear_interpolation,
    "rolling_corr": q_rolling_corr,
    "bfs_shortest_paths": q_bfs_shortest_paths,
    "skyline_orders": q_skyline_orders,
    "gdpr_delete": q_gdpr_delete,
    "bpe_merges": q_bpe_merges,
    "bpe_token_counts": q_bpe_token_counts,
    "streaming_sessions": q_streaming_sessions,
    "chi_square_independence": q_chi_square_independence,
    "winsorized_value_stats": q_winsorized_value_stats,
    "pca_explained_variance": q_pca_explained_variance,
    "pca_embedding_projection": q_pca_embedding_projection,
    "pca_covariance": q_pca_covariance,
    "seasonal_decompose": q_seasonal_decompose,
    "loo_target_encoding": q_loo_target_encoding,
    "quantile_normalize": q_quantile_normalize,
    "bigram_perplexity": q_bigram_perplexity,
    "record_linkage": q_record_linkage,
    "k_core_customers": q_k_core_customers,
    "label_propagation": q_label_propagation,
    "stable_row_ids": q_stable_row_ids,
    "topn_with_other": q_topn_with_other,
    "week_over_week": q_week_over_week,
    "ab_test_zscore": q_ab_test_zscore,
    "hybrid_rrf_search": q_hybrid_rrf_search,
    "json_dlq_routing": q_json_dlq_routing,
    "sorted_neighborhood_pairs": q_sorted_neighborhood_pairs,
    "corpus_datacard": q_corpus_datacard,
    "zipf_slope": q_zipf_slope,
    "calibration_bins": q_calibration_bins,
    "streaming_outer_join": q_streaming_outer_join,
    "streaming_full_outer_dedup": q_streaming_full_outer_dedup,
    "cms_frequencies": q_cms_frequencies,
    "streaming_late_data_drop": q_streaming_late_data_drop,
}

_DAILY_SERIES_SQL = """
        SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)
                   AS day_sum
        FROM events GROUP BY 1, 2
"""

ANALYTICS_ORACLES = {
    "holt_forecast": _HOLT_SQL,
    "holt_winters": _HW_SQL,
    "item_cf_recommend": _ITEM_CF_SQL,
    "bellman_ford_paths": _BELLMAN_SQL,
    "textrank_keywords": _TEXTRANK_SQL,
    "weighted_median": _WMEDIAN_SQL,
    "entity_clusters": _ENTITY_SQL,
    "streaming_dim_refresh": _DIM_REFRESH_SQL,
    "markov_transitions": """
        WITH seq AS (
            SELECT event_type AS cur_type,
                   lead(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS next_type
            FROM events
        ), bigrams AS (
            SELECT cur_type, next_type,
                   CAST(count(*) AS BIGINT) AS n_trans
            FROM seq WHERE next_type IS NOT NULL
            GROUP BY cur_type, next_type
        )
        SELECT cur_type, next_type, n_trans,
               CAST(n_trans AS DOUBLE)
                   / sum(n_trans) OVER (PARTITION BY cur_type) AS prob
        FROM bigrams
    """,
    "interval_merge_sessions": """
        WITH iv AS (
            SELECT user_id, event_id, ts AS s,
                   ts + INTERVAL 10 MINUTE AS e
            FROM events
        ), pm AS (
            SELECT user_id, event_id, s, e,
                   max(e) OVER (
                       PARTITION BY user_id ORDER BY s, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ) AS prev_max_e
            FROM iv
        ), flagged AS (
            SELECT user_id, s, e,
                   CASE WHEN prev_max_e IS NULL OR s > prev_max_e
                        THEN 1 ELSE 0 END AS ni,
                   event_id
            FROM pm
        ), isl AS (
            SELECT user_id, s, e,
                   sum(ni) OVER (
                       PARTITION BY user_id ORDER BY s, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS island
            FROM flagged
        )
        SELECT user_id,
               strftime(min(s), '%Y-%m-%d %H:%M:%S') AS session_start,
               strftime(max(e), '%Y-%m-%d %H:%M:%S') AS session_end,
               CAST(count(*) AS BIGINT) AS n_events
        FROM isl GROUP BY user_id, island
    """,
    "price_decile_stats": """
        WITH binned AS (
            SELECT o_totalprice,
                   ntile(10) OVER (
                       ORDER BY o_totalprice, o_orderkey
                   ) AS decile
            FROM orders
        )
        SELECT decile,
               CAST(count(*) AS BIGINT) AS n_orders,
               round(min(o_totalprice), 2) AS min_price,
               round(max(o_totalprice), 2) AS max_price,
               CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2)
                    AS DOUBLE) AS sum_price
        FROM binned GROUP BY decile
    """,
    "data_quality_suite": """
        WITH o AS (
            SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(count(o_custkey) AS BIGINT) AS c_cust,
                   CAST(count(o_orderdate) AS BIGINT) AS c_date,
                   CAST(count(DISTINCT o_orderkey) AS BIGINT) AS d_key,
                   CAST(sum(CASE WHEN o_totalprice > 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS ok_price,
                   CAST(sum(CASE WHEN o_orderstatus IN ('F','O','P')
                            THEN 1 ELSE 0 END) AS BIGINT) AS ok_status
            FROM orders
        ), l AS (
            SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(CASE WHEN l_discount >= 0 AND l_discount <= 0.1
                            THEN 1 ELSE 0 END) AS BIGINT) AS ok_disc,
                   CAST(sum(CASE WHEN l_quantity >= 1 AND l_quantity <= 50
                            THEN 1 ELSE 0 END) AS BIGINT) AS ok_qty
            FROM lineitem
        ), ref AS (
            SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(CASE WHEN o.o_orderkey IS NOT NULL
                            THEN 1 ELSE 0 END) AS BIGINT) AS ok
            FROM lineitem li
            LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
              ON li.l_orderkey = o.o_orderkey
        ), m AS (
            SELECT 'completeness:o_custkey' AS check,
                   (SELECT CAST(c_cust AS DOUBLE)/n FROM o) AS metric
            UNION ALL SELECT 'completeness:o_orderdate',
                   (SELECT CAST(c_date AS DOUBLE)/n FROM o)
            UNION ALL SELECT 'uniqueness:o_orderkey',
                   (SELECT CAST(d_key AS DOUBLE)/n FROM o)
            UNION ALL SELECT 'compliance:positive_price',
                   (SELECT CAST(ok_price AS DOUBLE)/n FROM o)
            UNION ALL SELECT 'compliance:valid_status',
                   (SELECT CAST(ok_status AS DOUBLE)/n FROM o)
            UNION ALL SELECT 'compliance:discount_range',
                   (SELECT CAST(ok_disc AS DOUBLE)/n FROM l)
            UNION ALL SELECT 'compliance:quantity_range',
                   (SELECT CAST(ok_qty AS DOUBLE)/n FROM l)
            UNION ALL SELECT 'referential:l_orderkey',
                   (SELECT CAST(ok AS DOUBLE)/n FROM ref)
        )
        SELECT "check", metric,
               CASE WHEN metric >= CAST(1.0 AS DOUBLE)
                    THEN TRUE ELSE FALSE END AS passed
        FROM m
    """,
    "association_rules": """
        WITH items AS (
            SELECT DISTINCT l.l_orderkey AS b, p.p_brand AS item
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        ), pc AS (
            SELECT a.item AS antecedent, c.item AS consequent,
                   CAST(count(*) AS BIGINT) AS n_ab
            FROM items a JOIN items c
              ON a.b = c.b AND a.item <> c.item
            GROUP BY 1, 2 HAVING count(*) >= 300
        ), ic AS (
            SELECT item, CAST(count(*) AS BIGINT) AS n
            FROM items GROUP BY item
        ), tot AS (
            SELECT CAST(count(DISTINCT b) AS BIGINT) AS nb FROM items
        )
        SELECT p.antecedent, p.consequent, p.n_ab,
               CAST(p.n_ab AS DOUBLE) / (SELECT nb FROM tot) AS support,
               CAST(p.n_ab AS DOUBLE) / a.n AS confidence,
               (CAST(p.n_ab AS DOUBLE) / a.n)
                   / (CAST(c.n AS DOUBLE) / (SELECT nb FROM tot)) AS lift
        FROM pc p
        JOIN ic a ON p.antecedent = a.item
        JOIN ic c ON p.consequent = c.item
    """,
    "heavy_hitter_bigrams": """
        WITH d AS (
            SELECT list_filter(string_split_regex(lower(text), '\\s+'),
                               x -> x <> '') AS t
            FROM documents
        ), bg AS (
            SELECT unnest(list_transform(range(1, len(t)),
                          i -> t[i] || ' ' || t[i+1])) AS bigram
            FROM d WHERE len(t) >= 2
        ), tot AS (SELECT count(*) AS n FROM bg)
        SELECT bigram, CAST(count(*) AS BIGINT) AS n
        FROM bg GROUP BY bigram
        HAVING count(*) >= CAST(0.0015 AS DOUBLE) * (SELECT n FROM tot)
    """,
    "changepoint_detect": f"""
        WITH series AS ({_DAILY_SERIES_SQL}),
        pref AS (
            SELECT event_type, day,
                   row_number() OVER wo AS t,
                   sum(CAST(day_sum AS DECIMAL(18,6))) OVER (
                       PARTITION BY event_type ORDER BY day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS psum,
                   sum(CAST(day_sum AS DECIMAL(18,6))) OVER (
                       PARTITION BY event_type
                   ) AS tsum,
                   count(*) OVER (PARTITION BY event_type) AS n
            FROM series
            WINDOW wo AS (PARTITION BY event_type ORDER BY day)
        ), scored AS (
            SELECT event_type, day AS split_point,
                   CAST(psum AS DOUBLE) / t AS mean_before,
                   CAST(tsum - psum AS DOUBLE) / (n - t) AS mean_after
            FROM pref WHERE t >= 3 AND n - t >= 3
        ), ranked AS (
            SELECT *,
                   abs(mean_after - mean_before) AS shift,
                   row_number() OVER (
                       PARTITION BY event_type
                       ORDER BY abs(mean_after - mean_before) DESC,
                                split_point
                   ) AS rk
            FROM scored
        )
        SELECT event_type, split_point, mean_before, mean_after, shift
        FROM ranked WHERE rk = 1
    """,
    "linear_interpolation": """
        WITH b AS (
            SELECT event_type,
                   CAST(floor(epoch(ts)/3600) AS BIGINT) AS hour_idx,
                   CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2)
                        AS DOUBLE) / count(*) AS hour_mean
            FROM events GROUP BY 1, 2
        ), bounds AS (
            SELECT event_type, min(hour_idx) AS lo, max(hour_idx) AS hi
            FROM b GROUP BY 1
        ), spine AS (
            SELECT event_type, unnest(range(lo, hi + 1)) AS hour_idx
            FROM bounds
        ), dense AS (
            SELECT s.event_type, s.hour_idx, b.hour_mean
            FROM spine s LEFT JOIN b
              ON s.event_type = b.event_type AND s.hour_idx = b.hour_idx
        ), wv AS (
            SELECT event_type, hour_idx, hour_mean,
                   last_value(hour_mean IGNORE NULLS) OVER wb AS prev_v,
                   first_value(hour_mean IGNORE NULLS) OVER wf AS next_v,
                   last_value(CASE WHEN hour_mean IS NOT NULL
                              THEN hour_idx END IGNORE NULLS)
                       OVER wb AS prev_i,
                   first_value(CASE WHEN hour_mean IS NOT NULL
                               THEN hour_idx END IGNORE NULLS)
                       OVER wf AS next_i
            FROM dense
            WINDOW wb AS (
                PARTITION BY event_type ORDER BY hour_idx
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
            ), wf AS (
                PARTITION BY event_type ORDER BY hour_idx
                ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING
            )
        )
        SELECT event_type, hour_idx,
               floor((CASE WHEN hour_mean IS NOT NULL THEN hour_mean
                      ELSE coalesce(
                          prev_v + (next_v - prev_v)
                              * ((hour_idx - prev_i)
                                 / (next_i - prev_i)),
                          prev_v, next_v) END) * 1e6
                     + CAST(0.5 AS DOUBLE)) / 1e6 AS filled_value,
               hour_mean IS NULL AS was_gap
        FROM wv
    """,
    "rolling_corr": f"""
        WITH series AS ({_DAILY_SERIES_SQL}),
        w AS (
            SELECT event_type, day, n_events, day_sum,
                   CAST(count(*) OVER fr AS DOUBLE) AS n,
                   CAST(sum(CAST(n_events AS DECIMAL(18,6))) OVER fr
                        AS DOUBLE) AS sx,
                   CAST(sum(CAST(day_sum AS DECIMAL(18,6))) OVER fr
                        AS DOUBLE) AS sy,
                   CAST(sum(CAST(CAST(n_events AS DECIMAL(19,6))
                                 * CAST(n_events AS DECIMAL(19,6))
                                 AS DECIMAL(38,12))) OVER fr
                        AS DOUBLE) AS sxx,
                   CAST(sum(CAST(CAST(day_sum AS DECIMAL(19,6))
                                 * CAST(day_sum AS DECIMAL(19,6))
                                 AS DECIMAL(38,12))) OVER fr
                        AS DOUBLE) AS syy,
                   CAST(sum(CAST(CAST(n_events AS DECIMAL(19,6))
                                 * CAST(day_sum AS DECIMAL(19,6))
                                 AS DECIMAL(38,12))) OVER fr
                        AS DOUBLE) AS sxy
            FROM series
            WINDOW fr AS (
                PARTITION BY event_type ORDER BY day
                ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
            )
        )
        SELECT event_type, day, n_events, day_sum,
               CASE WHEN n >= 2
                         AND sqrt((n*sxx - sx*sx) * (n*syy - sy*sy)) > 0
                    THEN floor(((n*sxy - sx*sy)
                                / sqrt((n*sxx - sx*sx)
                                       * (n*syy - sy*sy))) * 1e6
                               + CAST(0.5 AS DOUBLE)) / 1e6
               END AS rolling_corr
        FROM w
    """,
    "loo_target_encoding": """
        WITH g AS (
            SELECT event_id, event_type,
                   CAST(value AS DECIMAL(18,6)) AS vdec,
                   sum(CAST(value AS DECIMAL(18,6)))
                       OVER (PARTITION BY event_type) AS gsum,
                   count(*) OVER (PARTITION BY event_type) AS n
            FROM events
        )
        SELECT event_id, event_type,
               CASE WHEN n > 1
                    THEN floor(CAST(gsum - vdec AS DOUBLE)
                               / CAST(n - 1 AS DOUBLE) * 1e6 + 5e-1) / 1e6
               END AS loo_encoding
        FROM g
    """,
    "quantile_normalize": """
        WITH g AS (
            SELECT event_id, event_type, value,
                   rank() OVER (
                       PARTITION BY event_type ORDER BY value ASC
                   ) AS r,
                   count(*) OVER (PARTITION BY event_type) AS n
            FROM events
        )
        SELECT event_id, event_type, value,
               CASE WHEN n > 1
                    THEN CAST(r - 1 AS DOUBLE) / CAST(n - 1 AS DOUBLE)
               END AS quantile_norm
        FROM g
    """,
    "seasonal_decompose": """
        WITH daily AS (
            SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS t,
                   CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(18,6))
                       AS vd
            FROM events GROUP BY 1
        ), tr AS (
            SELECT t, CAST(vd AS DOUBLE) AS value, t % 7 AS phase,
                   CASE WHEN count(*) OVER w = 7
                        THEN CAST(sum(vd) OVER w AS DOUBLE)
                             / CAST(7 AS DOUBLE)
                   END AS trend
            FROM daily
            WINDOW w AS (ORDER BY t ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
        ), detr AS (
            SELECT *,
                   CAST(floor((value - trend) * 1e6 + 5e-1) / 1e6
                        AS DECIMAL(18,6)) AS ddec
            FROM tr
        ), seas AS (
            SELECT phase,
                   CAST(sum(ddec) AS DOUBLE) / CAST(count(*) AS DOUBLE)
                       AS sraw
            FROM detr WHERE trend IS NOT NULL GROUP BY phase
        ), seas2 AS (
            SELECT phase, sraw,
                   CAST(floor(sraw * 1e6 + 5e-1) / 1e6 AS DECIMAL(18,6))
                       AS sdec
            FROM seas
        ), ctr AS (
            SELECT CAST(sum(sdec) AS DOUBLE) / CAST(count(*) AS DOUBLE)
                       AS m
            FROM seas2
        ), seasonal AS (
            SELECT phase, floor((sraw - m) * 1e6 + 5e-1) / 1e6 AS seasonal
            FROM seas2 CROSS JOIN ctr
        )
        SELECT d.t, d.value,
               floor(d.trend * 1e6 + 5e-1) / 1e6 AS trend,
               CASE WHEN d.trend IS NOT NULL THEN s.seasonal END
                   AS seasonal,
               CASE WHEN d.trend IS NOT NULL
                    THEN floor((d.value - d.trend - s.seasonal) * 1e6 + 5e-1)
                         / 1e6
               END AS remainder
        FROM detr d LEFT JOIN seasonal s ON d.phase = s.phase
    """,
    # segmentation-invariant oracle (r10): pretokenization facts
    # replayed with the same whitespace tokenizer; flags pinned TRUE
    "bpe_token_counts": """
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(text), '\\s+'),
                               x -> x <> '') AS t
            FROM documents
        )
        SELECT doc_id,
               CAST(len(t) AS BIGINT) AS n_words,
               CAST(list_sum(list_transform(t, x -> len(x))) AS BIGINT)
                   AS n_word_chars,
               TRUE AS bounds_ok,
               TRUE AS roundtrip_ok
        FROM toks WHERE len(t) >= 1
    """,
    # spectrum-invariant oracle (VERDICT r9 #4): the exact-integer
    # covariance trace replayed in HUGEINT SQL; flags pinned TRUE
    "pca_explained_variance": """
        WITH el AS (
            SELECT vec_id,
                   generate_subscripts(embedding, 1) AS i,
                   CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1e6 + 0.5)
                        AS BIGINT) AS x
            FROM embeddings
        ), nn AS (
            SELECT count(*) AS n FROM embeddings
        ), sums AS (
            SELECT i, sum(x) AS sx, sum(x * x) AS sxx FROM el GROUP BY i
        ), tr AS (
            SELECT CAST(sum(nn.n * s.sxx - s.sx * s.sx) AS DOUBLE)
                   / CAST(nn.n AS DOUBLE) / CAST(nn.n - 1 AS DOUBLE)
                   / 1e12 AS trace
            FROM sums s CROSS JOIN nn GROUP BY nn.n
        )
        SELECT CAST(c AS INTEGER) AS component,
               floor(tr.trace * 1e6 + CAST(0.5 AS DOUBLE)) / 1e6 AS trace,
               TRUE AS eig_nonneg,
               TRUE AS eig_monotone,
               TRUE AS cum_ratio_ok,
               TRUE AS trace_match
        FROM generate_series(0, 7) AS g(c) CROSS JOIN tr
    """,
    # projection-invariant oracle (VERDICT r9 #4): raw squared norm
    # anchors row identity; the invariant flags are pinned literal TRUE
    "pca_embedding_projection": """
        SELECT vec_id, label,
               floor(list_sum(list_transform(embedding::DOUBLE[],
                     v -> v * v)) * 1e6 + CAST(0.5 AS DOUBLE)) / 1e6
                   AS norm2,
               TRUE AS bessel_ok,
               TRUE AS gram_ok,
               TRUE AS center_ok,
               TRUE AS order_ok
        FROM embeddings
    """,
    "pca_covariance": """
        WITH el AS (
            SELECT vec_id,
                   generate_subscripts(embedding, 1) AS i,
                   CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1e6 + 0.5)
                        AS BIGINT) AS x
            FROM embeddings
        ), nn AS (
            SELECT count(*) AS n FROM embeddings
        ), sums AS (
            SELECT i, sum(x) AS sx FROM el GROUP BY i
        ), prods AS (
            SELECT a.i AS i, b.i AS j, sum(a.x * b.x) AS sxy
            FROM el a JOIN el b ON a.vec_id = b.vec_id AND a.i <= b.i
            GROUP BY a.i, b.i
        )
        SELECT CAST(p.i - 1 AS INTEGER) AS i,
               CAST(p.j - 1 AS INTEGER) AS j,
               CAST(nn.n * p.sxy - sa.sx * sb.sx AS DOUBLE)
                   / CAST(nn.n AS DOUBLE)
                   / CAST(nn.n - 1 AS DOUBLE)
                   / 1e12 AS cov
        FROM prods p
        CROSS JOIN nn
        JOIN sums sa ON sa.i = p.i
        JOIN sums sb ON sb.i = p.j
    """,
    "label_propagation": """
        WITH RECURSIVE base AS (
            SELECT CAST(c_custkey AS BIGINT) AS k FROM customer
        ), ed AS (
            SELECT k AS src, CAST(k // 2 AS BIGINT) AS dst
            FROM base WHERE k >= 2
            UNION ALL
            SELECT k, k - 1 FROM base WHERE k >= 1
        ), sym AS (
            SELECT DISTINCT src, dst FROM (
                SELECT src, dst FROM ed
                UNION ALL
                SELECT dst, src FROM ed
            ) WHERE src <> dst
        ), lp(iter, node, label) AS (
            SELECT 0, src, src FROM sym GROUP BY src
            UNION
            SELECT iter + 1, u,
                   min((100000 - cnt) * 10000000 + label) % 10000000
            FROM (
                SELECT l.iter AS iter, e.src AS u, l.label AS label,
                       CAST(count(*) AS BIGINT) AS cnt
                FROM sym e JOIN lp l ON e.dst = l.node
                GROUP BY l.iter, e.src, l.label
            )
            WHERE iter < 5
            GROUP BY iter + 1, u
        )
        SELECT label AS community,
               CAST(count(*) AS BIGINT) AS n_members,
               min(node) AS min_node,
               max(node) AS max_node
        FROM lp WHERE iter = 5 GROUP BY label
    """,
    "k_core_customers": """
        WITH RECURSIVE base AS (
            SELECT CAST(c_custkey AS BIGINT) AS k FROM customer
        ), ed AS (
            SELECT k AS src, CAST(k // 2 AS BIGINT) AS dst
            FROM base WHERE k >= 2
            UNION ALL
            SELECT k, k - 1 FROM base WHERE k >= 1
        ), sym AS (
            -- explicit DISTINCT: under WITH RECURSIVE, a plain UNION here
            -- fails to dedup duplicates WITHIN a branch (ed carries (2,1)
            -- from both the tree and the chain), which inflates degrees
            SELECT DISTINCT src, dst FROM (
                SELECT src, dst FROM ed
                UNION ALL
                SELECT dst, src FROM ed
            ) WHERE src <> dst
        ), live(iter, node) AS (
            SELECT 0, src FROM sym GROUP BY src
            UNION
            -- one peel round per iteration: recompute degrees on the
            -- subgraph induced by the previous round's node set, keep
            -- degree >= 3; capped at the SAME 30 rounds as the Spark
            -- operator's max_iter truncation
            SELECT iter + 1, src FROM (
                SELECT l.iter AS iter, e.src AS src, count(*) AS deg
                FROM sym e
                JOIN live l ON e.src = l.node
                JOIN live l2 ON e.dst = l2.node AND l2.iter = l.iter
                GROUP BY l.iter, e.src
            ) WHERE deg >= 3 AND iter < 30
        ), final AS (
            SELECT node FROM live WHERE iter = 30
        ), fdeg AS (
            SELECT e.src AS node, CAST(count(*) AS BIGINT) AS degree
            FROM sym e
            JOIN final a ON e.src = a.node
            JOIN final b ON e.dst = b.node
            GROUP BY e.src
        )
        SELECT node, degree FROM fdeg WHERE degree >= 3
    """,
    "bfs_shortest_paths": """
        WITH RECURSIVE base AS (
            SELECT CAST(c_custkey AS BIGINT) AS k FROM customer
        ), ed AS (
            SELECT k AS src, CAST(k // 2 AS BIGINT) AS dst
            FROM base WHERE k >= 2
            UNION ALL
            SELECT k, k - 1 FROM base WHERE k >= 1
        ), sym AS (
            SELECT src, dst FROM ed
            UNION
            SELECT dst, src FROM ed
        ), bfs AS (
            SELECT CAST(1 AS BIGINT) AS node, 0 AS dist
            UNION
            SELECT sym.dst, bfs.dist + 1
            FROM bfs JOIN sym ON bfs.node = sym.src
            WHERE bfs.dist < 6
        )
        SELECT node, CAST(min(dist) AS INTEGER) AS dist
        FROM bfs GROUP BY node
    """,
    "stable_row_ids": """
        SELECT CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(*) AS BIGINT) AS n_distinct_ids,
               CAST(0 AS BIGINT) AS min_id,
               CAST(count(*) - 1 AS BIGINT) AS max_id
        FROM documents
    """,
    "skyline_orders": """
        WITH pts AS (
            SELECT o_totalprice AS price, o_orderdate AS d,
                   CAST(count(*) AS BIGINT) AS n_rows
            FROM orders GROUP BY 1, 2
        ), px AS (
            SELECT *, min(d) OVER (PARTITION BY price) AS mx FROM pts
        ), dx AS (
            SELECT price,
                   min(mx) OVER (
                       ORDER BY price
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ) AS mb
            FROM (SELECT DISTINCT price, mx FROM px)
        )
        SELECT p.price, strftime(p.d, '%Y-%m-%d') AS order_date, p.n_rows
        FROM px p JOIN dx x ON p.price = x.price
        WHERE NOT ((x.mb IS NOT NULL AND x.mb <= p.d) OR (p.mx < p.d))
    """,
    "gdpr_delete": """
        WITH ranked AS (
            SELECT user_id, event_type, value,
                   row_number() OVER (
                       PARTITION BY user_id
                       ORDER BY ts DESC, event_id DESC
                   ) AS rn
            FROM events
        )
        SELECT user_id, event_type AS last_type, value AS last_value
        FROM ranked WHERE rn = 1 AND user_id % 7 <> 3
    """,
    "chi_square_independence": """
        WITH base AS (
            SELECT event_type AS a,
                   CAST(floor(epoch(ts)/86400) AS BIGINT) % 7 AS b
            FROM events
        ), cells AS (
            SELECT a, b, CAST(count(*) AS BIGINT) AS n
            FROM base GROUP BY 1, 2
        ), marg AS (
            SELECT n,
                   CAST(sum(n) OVER (PARTITION BY a) AS BIGINT) AS ra,
                   CAST(sum(n) OVER (PARTITION BY b) AS BIGINT) AS cb,
                   CAST(sum(n) OVER () AS BIGINT) AS nn
            FROM cells
        ), agg AS (
            SELECT CAST(sum(CAST(CAST(n*n AS DOUBLE)
                                 / CAST(ra*cb AS DOUBLE)
                                 AS DECIMAL(28,12))) AS DOUBLE) AS s,
                   max(nn) AS n_rows
            FROM marg
        ), dims AS (
            SELECT CAST(count(DISTINCT a) AS BIGINT) AS r,
                   CAST(count(DISTINCT b) AS BIGINT) AS c
            FROM cells
        )
        SELECT floor((n_rows*s - n_rows) * 1e6
                     + CAST(0.5 AS DOUBLE)) / 1e6 AS chi2,
               (r-1)*(c-1) AS dof,
               n_rows,
               floor(sqrt((n_rows*s - n_rows)
                          / (n_rows * least(r-1, c-1))) * 1e6
                     + CAST(0.5 AS DOUBLE)) / 1e6 AS cramers_v
        FROM agg, dims
    """,
    "winsorized_value_stats": """
        WITH bounds AS (
            SELECT event_type,
                   floor(quantile_cont(value, 0.05) * 1e6
                         + CAST(0.5 AS DOUBLE)) / 1e6 AS lo,
                   floor(quantile_cont(value, 0.95) * 1e6
                         + CAST(0.5 AS DOUBLE)) / 1e6 AS hi
            FROM events GROUP BY 1
        ), clipped AS (
            SELECT e.event_type,
                   least(greatest(e.value, b.lo), b.hi) AS w,
                   b.lo, b.hi
            FROM events e JOIN bounds b USING (event_type)
        )
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_values,
               min(lo) AS p_lo,
               min(hi) AS p_hi,
               CAST(round(sum(CAST(w AS DECIMAL(18,6))), 2) AS DOUBLE)
                   / count(*) AS winsorized_mean
        FROM clipped GROUP BY event_type
    """,
    "bigram_perplexity": """
        WITH d AS (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(text), '\\s+'),
                               x -> x <> '') AS t
            FROM documents
        ), tok AS (
            SELECT unnest(t) AS term FROM d
        ), uni AS (
            SELECT term, CAST(count(*) AS BIGINT) AS n
            FROM tok GROUP BY 1
        ), stats AS (
            SELECT CAST(sum(n) AS BIGINT) AS nn,
                   CAST(count(*) AS BIGINT) AS vv
            FROM uni
        ), pairs AS (
            SELECT doc_id,
                   unnest(t[1:len(t)-1]) AS t1,
                   unnest(t[2:len(t)]) AS t2
            FROM d WHERE len(t) >= 2
        ), bi AS (
            SELECT t1, t2, CAST(count(*) AS BIGINT) AS n12
            FROM pairs GROUP BY 1, 2
        ), scored AS (
            SELECT p.doc_id,
                   floor(ln(CAST(0.7 AS DOUBLE)
                              * (CAST(coalesce(b.n12, 0) AS DOUBLE)
                                 / u1.n)
                            + CAST(0.3 AS DOUBLE)
                              * ((coalesce(u2.n, 0) + CAST(1.0 AS DOUBLE))
                                 / (s.nn + s.vv + CAST(1.0 AS DOUBLE))))
                         * 1e9 + CAST(0.5 AS DOUBLE)) / 1e9 AS lp
            FROM pairs p
            LEFT JOIN bi b ON p.t1 = b.t1 AND p.t2 = b.t2
            JOIN uni u1 ON p.t1 = u1.term
            LEFT JOIN uni u2 ON p.t2 = u2.term
            CROSS JOIN stats s
        )
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_transitions,
               -CAST(sum(CAST(lp AS DECIMAL(27,12))) AS DOUBLE)
                   / count(*) AS logppl
        FROM scored GROUP BY doc_id
    """,
    "record_linkage": """
        WITH ranked AS (
            SELECT c_custkey AS key, c_name AS name, c_acctbal AS bal,
                   row_number() OVER (ORDER BY c_name, c_custkey) AS rn
            FROM customer
        ), pairs AS (
            SELECT a.key AS key_a, b.key AS key_b,
                   a.name AS name_a, b.name AS name_b,
                   a.bal AS bal_a, b.bal AS bal_b
            FROM ranked a JOIN ranked b
              ON b.rn BETWEEN a.rn + 1 AND a.rn + 10
        ), scored AS (
            SELECT key_a, key_b,
                   floor((
                       CASE WHEN levenshtein(name_a, name_b) <= 2
                            THEN ln(CAST(0.95 AS DOUBLE)
                                    / CAST(0.01 AS DOUBLE))
                            ELSE ln((CAST(1.0 AS DOUBLE)
                                     - CAST(0.95 AS DOUBLE))
                                    / (CAST(1.0 AS DOUBLE)
                                       - CAST(0.01 AS DOUBLE))) END
                     + CASE WHEN abs(bal_a - bal_b)
                                 < CAST(100 AS DOUBLE)
                            THEN ln(CAST(0.8 AS DOUBLE)
                                    / CAST(0.05 AS DOUBLE))
                            ELSE ln((CAST(1.0 AS DOUBLE)
                                     - CAST(0.8 AS DOUBLE))
                                    / (CAST(1.0 AS DOUBLE)
                                       - CAST(0.05 AS DOUBLE))) END
                   ) * 1e9 + CAST(0.5 AS DOUBLE)) / 1e9 AS score
            FROM pairs
        )
        SELECT key_a, key_b, score,
               CASE WHEN score >= CAST(4.0 AS DOUBLE) THEN 'match'
                    WHEN score <= CAST(-3.0 AS DOUBLE) THEN 'non_match'
                    ELSE 'possible' END AS decision
        FROM scored
    """,
    "topn_with_other": """
        WITH rev AS (
            SELECT p.p_brand,
                   sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                            AS DECIMAL(18,6))) AS r
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
            GROUP BY 1
        ), ranked AS (
            SELECT p_brand, r,
                   row_number() OVER (ORDER BY r DESC, p_brand) AS rk
            FROM rev
        ), bucketed AS (
            SELECT CASE WHEN rk <= 5 THEN p_brand ELSE 'OTHER' END
                       AS brand,
                   r
            FROM ranked
        ), agg AS (
            SELECT brand,
                   CAST(round(sum(r), 2) AS DOUBLE) AS revenue
            FROM bucketed GROUP BY brand
        )
        SELECT brand, revenue,
               revenue / CAST(sum(CAST(revenue AS DECIMAL(18,6)))
                              OVER () AS DOUBLE) AS share
        FROM agg
    """,
    "week_over_week": """
        WITH weekly AS (
            SELECT c.c_mktsegment,
                   CAST(floor(epoch(o.o_orderdate)/86400) AS BIGINT) // 7
                       AS week,
                   CAST(round(sum(CAST(o.o_totalprice
                                       AS DECIMAL(18,6))), 2)
                        AS DOUBLE) AS revenue
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY 1, 2
        )
        SELECT c_mktsegment AS segment, week, revenue,
               revenue / lag(revenue) OVER (
                   PARTITION BY c_mktsegment ORDER BY week
               ) - 1 AS wow_growth
        FROM weekly
    """,
    "ab_test_zscore": """
        WITH armed AS (
            SELECT event_type,
                   ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 8))
                       ::BIGINT % 2 AS arm,
                   CAST(value AS DECIMAL(18,6)) AS dv,
                   CAST(CAST(value AS DECIMAL(19,6))
                        * CAST(value AS DECIMAL(19,6))
                        AS DECIMAL(38,12)) AS dv2
            FROM events
        ), g AS (
            SELECT event_type,
                   CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_a,
                   CAST(sum(CASE WHEN arm <> 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_b,
                   CAST(sum(CASE WHEN arm = 0 THEN dv END) AS DOUBLE)
                       AS s_a,
                   CAST(sum(CASE WHEN arm <> 0 THEN dv END) AS DOUBLE)
                       AS s_b,
                   CAST(sum(CASE WHEN arm = 0 THEN dv2 END) AS DOUBLE)
                       AS q_a,
                   CAST(sum(CASE WHEN arm <> 0 THEN dv2 END) AS DOUBLE)
                       AS q_b
            FROM armed GROUP BY event_type
        )
        SELECT event_type, n_a, n_b,
               floor((s_a/n_a) * 1e6 + CAST(0.5 AS DOUBLE))/1e6 AS mean_a,
               floor((s_b/n_b) * 1e6 + CAST(0.5 AS DOUBLE))/1e6 AS mean_b,
               floor(((s_a/n_a - s_b/n_b)
                      / sqrt(((q_a - s_a*s_a/n_a)/(n_a - 1))/n_a
                             + ((q_b - s_b*s_b/n_b)/(n_b - 1))/n_b))
                     * 1e6 + CAST(0.5 AS DOUBLE))/1e6 AS z_score,
               abs((s_a/n_a - s_b/n_b)
                   / sqrt(((q_a - s_a*s_a/n_a)/(n_a - 1))/n_a
                          + ((q_b - s_b*s_b/n_b)/(n_b - 1))/n_b))
                   > CAST(1.96 AS DOUBLE) AS significant
        FROM g
    """,
}

# the streaming sessionizer must reproduce the batch islands exactly —
# same oracle as the batch interval-merge query (streaming↔batch parity
# as a driver-checked invariant)
ANALYTICS_ORACLES["streaming_sessions"] = ANALYTICS_ORACLES[
    "interval_merge_sessions"
]

# hybrid RRF reuses the bm25_search oracle verbatim as its lexical arm —
# one source of truth for the BM25 formula (nested WITH inside a derived
# CTE is legal in DuckDB)
from m13_sparkstreaming_python_azure_spark.queries.llm import (  # noqa: E402
    LLM_ORACLES as _LLM_ORACLES,
)

ANALYTICS_ORACLES["hybrid_rrf_search"] = f"""
    WITH lex AS ({_LLM_ORACLES["bm25_search"]}),
    lexr AS (
        SELECT doc_id,
               CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id)
                    AS INTEGER) AS rank_lex
        FROM lex
    ), q AS (
        SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0
    ), vec AS (
        SELECT e.vec_id AS doc_id,
               round(list_cosine_similarity(e.embedding::DOUBLE[], q.qv),
                     6) AS c
        FROM embeddings e CROSS JOIN q
    ), vecr AS (
        SELECT doc_id,
               CAST(row_number() OVER (ORDER BY c DESC, doc_id)
                    AS INTEGER) AS rank_vec
        FROM vec
    ), fused AS (
        SELECT coalesce(l.doc_id, v.doc_id) AS doc_id,
               coalesce(l.rank_lex, 0) AS rank_lex,
               coalesce(v.rank_vec, 0) AS rank_vec,
               (CASE WHEN coalesce(l.rank_lex, 0) > 0
                     THEN CAST(1.0 AS DOUBLE) / (60 + l.rank_lex)
                     ELSE CAST(0.0 AS DOUBLE) END
                + CASE WHEN coalesce(v.rank_vec, 0) > 0
                       THEN CAST(1.0 AS DOUBLE) / (60 + v.rank_vec)
                       ELSE CAST(0.0 AS DOUBLE) END) AS rrf_score
        FROM lexr l FULL OUTER JOIN vecr v ON l.doc_id = v.doc_id
    )
    SELECT doc_id, rank_lex, rank_vec, rrf_score
    FROM (
        SELECT *, row_number() OVER (
                   ORDER BY rrf_score DESC, doc_id) AS rk
        FROM fused
    ) WHERE rk <= 20
"""

ANALYTICS_ORACLES["json_dlq_routing"] = """
    WITH m AS (
        SELECT CASE WHEN event_id % 13 = 0
                    THEN substring(props, 1, length(props) - 2)
                    ELSE props END AS p
        FROM events
    ), r AS (
        SELECT CASE WHEN json_valid(p) THEN 'valid' ELSE 'dlq' END
                   AS route,
               CASE WHEN json_valid(p)
                    THEN CAST(json_extract(p, '$.k') AS BIGINT) END AS k
        FROM m
    )
    SELECT route, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(k) AS BIGINT) AS sum_k
    FROM r GROUP BY route
"""

ANALYTICS_ORACLES["sorted_neighborhood_pairs"] = """
    WITH names AS (
        SELECT DISTINCT c_name AS name FROM customer
    ), led AS (
        SELECT name,
               [lead(name, 1) OVER w, lead(name, 2) OVER w,
                lead(name, 3) OVER w, lead(name, 4) OVER w,
                lead(name, 5) OVER w] AS nbrs
        FROM names WINDOW w AS (ORDER BY name)
    ), nb AS (
        SELECT name, unnest(nbrs) AS other FROM led
    )
    SELECT name AS name_a, other AS name_b,
           CAST(levenshtein(name, other) AS INTEGER) AS edit_distance
    FROM nb
    WHERE other IS NOT NULL AND levenshtein(name, other) <= 2
"""

ANALYTICS_ORACLES["corpus_datacard"] = """
    WITH base AS (
        SELECT n_chars, text, lang,
               len(list_filter(string_split_regex(lower(text), '\\s+'),
                               x -> x <> '')) AS tc
        FROM documents
    ), s AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(tc) AS BIGINT) AS tt,
               CAST(sum(n_chars) AS BIGINT) AS ch,
               CAST(count(DISTINCT md5(text)) AS BIGINT) AS dt,
               floor(quantile_cont(n_chars, 0.5) * 1e6
                     + CAST(0.5 AS DOUBLE)) / 1e6 AS p50,
               floor(quantile_cont(n_chars, 0.9) * 1e6
                     + CAST(0.5 AS DOUBLE)) / 1e6 AS p90
        FROM base
    )
    SELECT 'n_docs' AS metric, CAST(n AS DOUBLE) AS value FROM s
    UNION ALL SELECT 'total_tokens', CAST(tt AS DOUBLE) FROM s
    UNION ALL SELECT 'total_chars', CAST(ch AS DOUBLE) FROM s
    UNION ALL SELECT 'dup_rate',
               CAST(1.0 AS DOUBLE) - CAST(dt AS DOUBLE) / n FROM s
    UNION ALL SELECT 'p50_chars', p50 FROM s
    UNION ALL SELECT 'p90_chars', p90 FROM s
    UNION ALL
    SELECT 'lang_share:' || lang,
           CAST(count(*) AS DOUBLE) / (SELECT n FROM s)
    FROM base GROUP BY lang
"""

ANALYTICS_ORACLES["zipf_slope"] = """
    WITH tok AS (
        SELECT unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                  x -> x <> '')) AS term
        FROM documents
    ), vocab AS (
        SELECT term, CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY 1
    ), ranked AS (
        SELECT CAST(row_number() OVER (ORDER BY n DESC, term) AS BIGINT)
                   AS rank,
               n
        FROM vocab
    ), pts AS (
        SELECT floor(ln(CAST(rank AS DOUBLE)) * 1e9
                     + CAST(0.5 AS DOUBLE)) / 1e9 AS x,
               floor(ln(CAST(n AS DOUBLE)) * 1e9
                     + CAST(0.5 AS DOUBLE)) / 1e9 AS y
        FROM ranked
    ), agg AS (
        SELECT CAST(count(*) AS BIGINT) AS k,
               CAST(sum(CAST(x AS DECIMAL(27,12))) AS DOUBLE) AS sx,
               CAST(sum(CAST(y AS DECIMAL(27,12))) AS DOUBLE) AS sy,
               CAST(sum(CAST(x*x AS DECIMAL(27,12))) AS DOUBLE) AS sxx,
               CAST(sum(CAST(x*y AS DECIMAL(27,12))) AS DOUBLE) AS sxy
        FROM pts
    )
    SELECT k AS vocab_size,
           floor(((k*sxy - sx*sy) / (k*sxx - sx*sx)) * 1e6
                 + CAST(0.5 AS DOUBLE)) / 1e6 AS zipf_slope,
           floor(((sy - ((k*sxy - sx*sy) / (k*sxx - sx*sx)) * sx) / k)
                 * 1e6 + CAST(0.5 AS DOUBLE)) / 1e6 AS intercept
    FROM agg
"""

ANALYTICS_ORACLES["calibration_bins"] = """
    WITH u AS (
        SELECT ('0x' || substring(md5('cal:' || CAST(event_id AS VARCHAR)),
                                  1, 8))::BIGINT
                   / CAST(4294967296 AS DOUBLE) AS pred,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        FROM events
    ), b AS (
        SELECT least(CAST(floor(pred * 10) AS INTEGER), 9) AS bin,
               pred, y
        FROM u
    ), g AS (
        SELECT bin, CAST(count(*) AS BIGINT) AS n,
               floor((CAST(sum(CAST(pred AS DECIMAL(18,12))) AS DOUBLE)
                      / count(*)) * 1e6 + CAST(0.5 AS DOUBLE)) / 1e6
                   AS mean_pred,
               CAST(sum(y) AS DOUBLE) / count(*) AS frac_pos
        FROM b GROUP BY bin
    )
    SELECT bin, n, mean_pred, frac_pos,
           floor(abs(mean_pred - frac_pos) * 1e6
                 + CAST(0.5 AS DOUBLE)) / 1e6 AS abs_gap
    FROM g
"""

ANALYTICS_ORACLES["streaming_outer_join"] = """
    WITH p AS (
        SELECT event_id AS pid, ts AS pts, user_id
        FROM events WHERE event_type = 'purchase'
    ), c AS (
        SELECT event_id AS cid, ts AS cts, user_id
        FROM events WHERE event_type = 'click'
    ), j AS (
        SELECT p.pid, strftime(p.pts, '%Y-%m-%d') AS d, c.cid
        FROM p LEFT JOIN c
          ON p.user_id = c.user_id
         AND c.cts >= p.pts - INTERVAL 24 HOUR
         AND c.cts <= p.pts
    )
    SELECT d AS purchase_date,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(count(cid) AS BIGINT) AS n_matched,
           CAST(sum(CASE WHEN cid IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_unmatched
    FROM j GROUP BY d
"""

ANALYTICS_ORACLES["streaming_full_outer_dedup"] = """
    WITH p AS (
        SELECT event_id AS pid, ts AS pts, user_id
        FROM events WHERE event_type = 'purchase'
    ), c AS (
        SELECT event_id AS cid, ts AS cts, user_id
        FROM events WHERE event_type = 'click'
    ), j AS (
        SELECT p.pid, p.pts, c.cid, c.cts
        FROM p FULL JOIN c
          ON p.user_id = c.user_id
         AND c.cts >= p.pts - INTERVAL 24 HOUR
         AND c.cts <= p.pts
    )
    SELECT coalesce(strftime(pts, '%Y-%m-%d'), strftime(cts, '%Y-%m-%d'))
               AS day,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN pid IS NOT NULL AND cid IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
           CAST(sum(CASE WHEN cid IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_purchase_only,
           CAST(sum(CASE WHEN pid IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_click_only
    FROM j GROUP BY day
"""

ANALYTICS_ORACLES["cms_frequencies"] = """
    WITH d AS (
        SELECT list_filter(string_split_regex(lower(text), '\\s+'),
                           x -> x <> '') AS t
        FROM documents
    ), bg AS (
        SELECT unnest(list_transform(range(1, len(t)),
                      i -> t[i] || ' ' || t[i+1])) AS bigram
        FROM d WHERE len(t) >= 2
    ), cells AS (
        SELECT dep, bkt, CAST(count(*) AS BIGINT) AS n
        FROM (
            SELECT unnest(range(0, 4)) AS dep, bigram FROM bg
        ) x,
        LATERAL (
            SELECT ('0x' || substring(md5('cms' || CAST(dep AS VARCHAR)
                                          || ':' || bigram), 1, 8))
                       ::BIGINT % 256 AS bkt
        )
        GROUP BY dep, bkt
    ), truth AS (
        SELECT bigram, CAST(count(*) AS BIGINT) AS true_count
        FROM bg GROUP BY bigram
    ), probes AS (
        SELECT bigram, true_count FROM truth
        WHERE ('0x' || substring(md5(bigram), 1, 8))::BIGINT % 37 = 0
    ), keyed AS (
        SELECT p.bigram, p.true_count, dd.dep,
               ('0x' || substring(md5('cms' || CAST(dd.dep AS VARCHAR)
                                      || ':' || p.bigram), 1, 8))
                   ::BIGINT % 256 AS bkt
        FROM probes p CROSS JOIN (SELECT unnest(range(0, 4)) AS dep) dd
    )
    SELECT k.bigram,
           CAST(min(coalesce(c.n, 0)) AS BIGINT) AS estimate,
           k.true_count
    FROM keyed k LEFT JOIN cells c
      ON k.dep = c.dep AND k.bkt = c.bkt
    GROUP BY k.bigram, k.true_count
"""

ANALYTICS_ORACLES["streaming_late_data_drop"] = """
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           CAST(count(*) AS BIGINT) AS n_events
    FROM events
    WHERE ts < TIMESTAMP '2024-01-11'
       OR ts >= TIMESTAMP '2024-01-20'
    GROUP BY 1
"""
