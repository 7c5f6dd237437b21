"""Extended relational surface — SURVEY.md §2 GAP rows beyond core.py:
pivot, grouping sets, the rank-family window functions, correlated/scalar
subqueries, and the string / datetime / array / JSON scalar-function
classes (§2.8 lists them as out-of-reference-scope; a user switching from
the reference still expects them from any Spark engine).

Same float-hash rule as core.py: round sums to 2 decimals on both sides,
derive averages from rounded sums, round unit-scale floats to 4-6 decimals.
All queries are pure Catalyst expression plans (no UDFs) — they fold into
the scan stage or a single shuffle, so they scale with the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from m13_sparkstreaming_python_azure_spark.catalog import load_table, register_views

_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
_PRIORITY_ALIASES = ["n_urgent", "n_high", "n_medium", "n_not_specified", "n_low"]


def q_pivot_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long→wide reshape): order counts per status × priority.
    Explicit pivot value list — with it Catalyst plans ONE pass (pivot
    compiles to a single aggregate over `count(CASE WHEN ...)` columns);
    without it Spark must first scan for distinct values (two jobs), which
    at 100 TB doubles the read."""
    orders = load_table(spark, sf_dir, "orders")
    wide = (
        orders.groupBy("o_orderstatus")
        .pivot("o_orderpriority", _PRIORITIES)
        .agg(F.count(F.lit(1)))
    )
    cols = [F.col("o_orderstatus")] + [
        F.coalesce(F.col(f"`{val}`"), F.lit(0)).alias(alias)
        for val, alias in zip(_PRIORITIES, _PRIORITY_ALIASES)
    ]
    return wide.select(*cols)


def q_grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS (the general form of rollup/cube): per-status and
    per-priority subtotals plus the grand total in one Expand + single
    hash aggregate — one shuffle instead of three separate groupBys.
    grouping() flags disambiguate subtotal NULLs from data NULLs."""
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               grouping(o_orderstatus) AS g_status,
               grouping(o_orderpriority) AS g_priority,
               count(*) AS n_rows,
               round(sum(o_totalprice), 2) AS sum_total
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


def q_window_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The rank-family window functions (rank / dense_rank / ntile /
    percent_rank / cume_dist / first_value) in one Window spec — one sort
    per partition serves all six. Deterministic total order
    (o_totalprice DESC, o_orderkey) so ranks and quartiles are stable."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 3000)
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return orders.select(
        "o_orderkey",
        "o_orderstatus",
        F.round("o_totalprice", 2).alias("price"),
        F.rank().over(w).alias("price_rank"),
        F.dense_rank().over(w).alias("price_dense_rank"),
        F.ntile(4).over(w).alias("price_quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume_dist"),
        F.first_value(F.col("o_orderkey")).over(w).alias("top_orderkey"),
    )


def q_subquery_big_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery + correlated EXISTS: above-average-balance customers
    holding at least one 300k+ order. Catalyst decorrelates the EXISTS into
    a left-semi join and broadcasts the single-row scalar aggregate — no
    per-row re-execution at any scale."""
    register_views(spark, sf_dir, ("customer", "orders"))
    return spark.sql(
        """
        SELECT c_custkey, c_name, round(c_acctbal, 2) AS acctbal
        FROM customer c
        WHERE c_acctbal > (SELECT round(sum(c_acctbal), 2) / count(*) FROM customer)
          AND EXISTS (
              SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
          )
        """
    )


def q_lateral_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery (the SQL:2016 lateral-join surface,
    Spark 3.2+): per BUILDING-segment customer, that customer's top-2
    orders by price via a per-row ordered-limit subquery. Catalyst
    decorrelates the lateral into a join + per-key WindowGroupLimit-
    style rank — no per-row re-execution; DuckDB runs the identical
    text."""
    register_views(spark, sf_dir, ("customer", "orders"))
    return spark.sql(
        """
        SELECT c.c_custkey, l.o_orderkey, l.o_totalprice, l.rnk
        FROM customer c,
        LATERAL (
            SELECT o_orderkey, o_totalprice,
                   row_number() OVER (
                       ORDER BY o_totalprice DESC, o_orderkey ASC
                   ) AS rnk
            FROM orders o
            WHERE o.o_custkey = c.c_custkey
            ORDER BY o_totalprice DESC, o_orderkey ASC
            LIMIT 2
        ) l
        WHERE c.c_mktsegment = 'BUILDING'
        """
    )


def q_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 string-function class over part: case, pad, split, replace,
    regexp, edit distance — all JVM expressions that fold into the scan
    projection (no shuffle, no Python)."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.length("p_name").alias("name_len"),
        F.lpad("p_type", 12, "_").alias("type_padded"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("first_word"),
        F.regexp_replace("p_name", "[aeiou]", "").alias("name_novowels"),
        F.regexp_extract("p_brand", r"#(\d+)", 1).cast("int").alias("brand_num"),
        F.reverse(F.col("p_type")).alias("type_reversed"),
        F.repeat(F.substring("p_type", 1, 1), 3).alias("type_initial_x3"),
        F.instr(F.col("p_name"), "e").alias("first_e_pos"),
        F.levenshtein(F.col("p_name"), F.col("p_type")).alias("name_type_dist"),
        F.startswith(F.col("p_name"), F.lit("red")).cast("int").alias("is_red"),
        F.contains(F.col("p_name"), F.lit("bolt")).cast("int").alias("has_bolt"),
    )


def q_datetime_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 datetime-function class over orders: truncation, field
    extraction, date arithmetic — the building blocks of every
    time-partitioned pipeline (e.g. the reference's year/month/day layout)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
            "month_start"
        ),
        F.quarter("o_orderdate").alias("order_quarter"),
        F.dayofmonth("o_orderdate").alias("order_dom"),
        F.dayofweek("o_orderdate").alias("order_dow"),
        F.dayofyear("o_orderdate").alias("order_doy"),
        F.weekofyear("o_orderdate").alias("order_isoweek"),
        F.date_format(F.date_add(F.col("o_orderdate"), 30), "yyyy-MM-dd").alias(
            "due_date"
        ),
        F.date_format(F.last_day("o_orderdate"), "yyyy-MM-dd").alias("month_end"),
        F.datediff(F.lit("1998-01-01"), F.col("o_orderdate")).alias("days_to_1998"),
    )


def q_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 array + higher-order-function class over the embedding column:
    size / element access / transform / filter / exists / aggregate — the
    JVM-side lambda surface that keeps vector math out of Python when a
    full matmul isn't needed."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    sum_all = F.aggregate("e", F.lit(0.0), lambda acc, v: acc + v)
    sum_abs = F.aggregate("e", F.lit(0.0), lambda acc, v: acc + F.abs(v))
    return emb.select(
        "vec_id",
        F.size("e").alias("dim"),
        F.round(F.element_at("e", 1), 6).alias("first_elem"),
        F.round(sum_all, 4).alias("sum_all"),
        F.round(sum_abs / F.size("e"), 4).alias("mean_abs"),
        F.round(F.array_max("e"), 6).alias("max_elem"),
        F.round(F.array_min("e"), 6).alias("min_elem"),
        F.size(F.filter("e", lambda v: v > 0)).alias("n_positive"),
        F.exists("e", lambda v: v > 2.0).cast("int").alias("has_gt2"),
    )


def q_json_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 JSON class over events.props: typed extraction with from_json
    (schema'd, vectorizable — the scale path; get_json_object re-parses per
    call, from_json parses once per row), then a grouped aggregate over the
    extracted field."""
    ev = load_table(spark, sf_dir, "events")
    k = F.from_json("props", "k BIGINT").getField("k")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.count_distinct(F.col("k")).alias("distinct_k"),
        )
    )


def q_embedding_pairs_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact within-label cosine pairs — the oracle-checkable anchor for
    embedding near-dup detection (embedding_similar_pairs is its
    LSH-approximate scale path). `label` acts as the blocking key, the
    realistic pattern at 100 TB: an all-pairs cross join is quadratic and
    unshippable, an equi-join on a blocking key shuffles both sides once
    and is quadratic only within blocks."""
    from m13_sparkstreaming_python_azure_spark.operators.similarity import (
        dot,
        l2_norm,
    )

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("e")
    ).withColumn("n", l2_norm(F.col("e")))
    a = emb.select(
        F.col("vec_id").alias("id_a"),
        "label",
        F.col("e").alias("ea"),
        F.col("n").alias("na"),
    )
    b = emb.select(
        F.col("vec_id").alias("id_b"),
        "label",
        F.col("e").alias("eb"),
        F.col("n").alias("nb"),
    )
    return (
        a.join(b, on="label")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cosine_sim",
            F.round(dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb")), 6),
        )
        .filter(F.col("cosine_sim") >= 0.1)
        .select("label", "id_a", "id_b", "cosine_sim")
    )


def q_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 map-type class: construct, probe, and measure map columns.
    Only extracted scalars are emitted — raw map columns don't hash
    portably across engines."""
    orders = load_table(spark, sf_dir, "orders")
    m = F.create_map(
        F.lit("status"), F.col("o_orderstatus"),
        F.lit("priority"), F.col("o_orderpriority"),
    )
    return orders.select(
        "o_orderkey",
        F.size(m).alias("m_size"),
        F.element_at(m, F.lit("status")).alias("status_from_map"),
        F.element_at(m, F.lit("priority")).alias("priority_from_map"),
        F.map_contains_key(m, F.lit("status")).cast("int").alias("has_status"),
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys_sorted"),
    )


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified Bernoulli sampling — the downsampling/rebalancing step
    of corpus curation. Hash-gated (VERDICT r8 #3) by deriving each
    row's uniform from md5(salt || event_id) instead of sampleBy's
    engine-seeded RNG: the selection is a pure function of the data, so
    the per-stratum counts (and the sample itself) reproduce bit-exactly
    in any engine — ALSO the property a 100 TB pipeline wants anyway
    (re-runs and backfills select identical rows; ``sampleBy`` remains
    the built-in alternative when engine-level reproducibility
    suffices)."""
    ev = load_table(spark, sf_dir, "events")
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("strat:"), F.col("event_id").cast("string")
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        / F.lit(4294967296.0)
    )
    frac = (
        F.when(F.col("event_type") == "click", F.lit(0.1))
        .when(F.col("event_type") == "view", F.lit(0.2))
        .when(F.col("event_type") == "signup", F.lit(0.5))
        .otherwise(F.lit(1.0))
    )
    return (
        ev.filter(u < frac)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_sampled"))
    )


def q_misc_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional/boolean/arg-extremum aggregate class: count_if,
    bool_and/bool_or, min_by/max_by (arg-extrema are safe here — synthetic
    double prices make exact ties improbable), plus null-handling scalars
    (nullif/coalesce) feeding an aggregate."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.count_if(F.col("o_totalprice") > 100000).alias("n_big"),
        F.bool_and(F.col("o_totalprice") > 0).cast("int").alias("all_positive"),
        F.bool_or(F.col("o_totalprice") > 400000).cast("int").alias("any_huge"),
        F.max_by("o_orderkey", "o_totalprice").alias("priciest_order"),
        F.min_by("o_orderkey", "o_totalprice").alias("cheapest_order"),
        F.count(F.nullif(F.col("o_orderpriority"), F.lit("5-LOW"))).alias(
            "n_not_low"
        ),
    )


def q_unpivot_order_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt (wide→long, the inverse reshape of pivot): order
    numeric columns to (key, metric, value) rows — an Expand node, one
    pass, no shuffle."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.round("o_totalprice", 2).alias("totalprice"),
        F.col("o_custkey").cast("double").alias("custkey"),
    ).unpivot(
        ids=["o_orderkey"],
        values=["totalprice", "custkey"],
        variableColumnName="metric",
        valueColumnName="value",
    )


def q_collect_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set/collect_list aggregate class: per event_type, the sorted
    distinct user-id residues as one string (arrays are order-normalized
    before comparison — collection aggregates have no inherent order)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.array_join(
            F.array_sort(F.collect_set((F.col("user_id") % 10).cast("long"))), ","
        ).alias("user_residues"),
        F.size(F.collect_set("user_id")).alias("n_distinct_users"),
        F.size(F.collect_list("user_id")).alias("n_rows"),
    )


def q_variant_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT path (Spark 4): parse_json once into the
    binary variant encoding, then typed variant_get extraction — unlike
    get_json_object (re-parse per access), a variant column parses once
    and serves any number of typed probes; the 100 TB default for JSON
    event payloads."""
    ev = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    return ev.select(
        "event_id",
        F.variant_get(v, "$.k", "bigint").alias("k_typed"),
        F.variant_get(v, "$.missing", "string").alias("k_missing"),
        F.schema_of_variant(v).alias("v_schema"),
    )


def q_merge_orders_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE/upsert (CDC apply step): a simulated change feed — price
    corrections for keys ≡ 0-4 (mod 100), brand-new orders for keys ≡ 5 —
    merged into orders. Updates replace the full row, inserts append,
    untouched rows pass through, tagged with the action taken."""
    from m13_sparkstreaming_python_azure_spark.operators.merge import merge_upsert

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", F.round("o_totalprice", 2).alias("o_totalprice")
    )
    updates = orders.filter(F.col("o_orderkey") % 100 < 5).select(
        "o_orderkey",
        F.lit("U").alias("o_orderstatus"),
        F.round(F.col("o_totalprice") * 1.1, 2).alias("o_totalprice"),
    )
    inserts = orders.filter(F.col("o_orderkey") % 100 == 5).select(
        (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
        F.lit("N").alias("o_orderstatus"),
        "o_totalprice",
    )
    merged = merge_upsert(
        orders, updates.unionByName(inserts), ["o_orderkey"], with_action=True
    )
    return merged.select("o_orderkey", "o_orderstatus", "o_totalprice", "action")


def q_rolling_revenue_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day revenue per order priority: a RANGE-framed window
    (rangeBetween over a day-number key) on top of a daily pre-aggregate,
    plus percent-of-partition-total — the time-series analytic frame the
    rank-family queries don't cover. Daily and trailing sums stay exact
    decimals until the final cast; the share quotient uses the floor
    rounding trick so both engines divide identical doubles."""
    orders = load_table(spark, sf_dir, "orders")
    daily = (
        orders.withColumn(
            "day_num", F.datediff("o_orderdate", F.lit("1995-01-01"))
        )
        .groupBy("o_orderpriority", "day_num")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,6)")).alias("rev_dec")
        )
    )
    w7 = (
        Window.partitionBy("o_orderpriority")
        .orderBy("day_num")
        .rangeBetween(-6, 0)
    )
    wall = Window.partitionBy("o_orderpriority")
    trailing = F.sum("rev_dec").over(w7)
    total = F.sum("rev_dec").over(wall)
    share_inputs = (
        F.round(trailing, 2).cast("double"),
        F.round(total, 2).cast("double"),
    )
    return daily.select(
        "o_orderpriority",
        "day_num",
        F.round("rev_dec", 2).cast("double").alias("daily_revenue"),
        F.round(trailing, 2).cast("double").alias("trailing_7d_revenue"),
        (
            F.floor(share_inputs[0] / share_inputs[1] * 1e6 + F.lit(0.5)) / 1e6
        ).alias("share_of_total"),
    )


def q_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-handling semantics pinned as data: null-safe equality join
    (eqNullSafe / IS NOT DISTINCT FROM), nulls as a grouping key, and
    explicit NULLS FIRST ordering (captured via the min row_number per
    group, since hash comparison is order-insensitive). The 3-row dim is
    a broadcast local relation. The global NULLS FIRST rank comes from
    ``operators/window.global_rank`` (range shuffle, never a
    single-partition WindowExec) — identical rn values, scale-safe."""
    from m13_sparkstreaming_python_azure_spark.operators.window import (
        global_rank,
    )

    orders = load_table(spark, sf_dir, "orders")
    base = orders.select(
        "o_orderkey",
        F.nullif(F.col("o_orderstatus"), F.lit("F")).alias("status_n"),
    )
    ranked = global_rank(
        base,
        [F.asc_nulls_first("status_n"), F.asc("o_orderkey")],
        out_col="rn",
    )
    dim = spark.createDataFrame(
        [("P", "pending"), ("O", "open"), (None, "final")],
        "status string, label string",
    )
    return (
        ranked.join(
            F.broadcast(dim), F.col("status_n").eqNullSafe(F.col("status"))
        )
        .groupBy("label", "status_n")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("rn").alias("first_rank"),
        )
    )


def q_recursive_tree_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4 `WITH RECURSIVE`, executed as UnionLoop):
    BFS over the implicit binary tree on customer keys (parent = k div 2),
    one equi-join per level — the iterative-SQL operator class (hierarchy
    walks, transitive closure) with log-depth recursion, no driver loop.
    Per-level counts are exact ints."""
    from m13_sparkstreaming_python_azure_spark.catalog import register_views

    register_views(spark, sf_dir, ("customer",))
    return spark.sql("""
        WITH RECURSIVE tree(k, depth) AS (
            SELECT CAST(c_custkey AS BIGINT), 0 FROM customer WHERE c_custkey = 1
            UNION ALL
            SELECT CAST(c.c_custkey AS BIGINT), t.depth + 1
            FROM customer c JOIN tree t ON c.c_custkey div 2 = t.k
            WHERE c.c_custkey > 1
        )
        SELECT depth, count(*) AS n_nodes,
               min(k) AS min_key, max(k) AS max_key
        FROM tree GROUP BY depth
    """)


def q_fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution fuzzy self-join: all customer-name pairs within
    Levenshtein distance 1, via symmetric-delete blocking + exact verify
    (operators/fuzzy.fuzzy_pairs) — linear candidate generation instead
    of the O(n²) cross join the oracle uses, same exact result."""
    from m13_sparkstreaming_python_azure_spark.operators.fuzzy import (
        fuzzy_pairs,
    )

    cust = load_table(spark, sf_dir, "customer").select("c_name")
    return fuzzy_pairs(cust, "c_name", max_dist=1)


EXT_QUERIES = {
    "fuzzy_name_pairs": q_fuzzy_name_pairs,
    "lateral_top_orders": q_lateral_top_orders,
    "recursive_tree_depth": q_recursive_tree_depth,
    "pivot_status_priority": q_pivot_status_priority,
    "grouping_sets_orders": q_grouping_sets_orders,
    "window_ranks": q_window_ranks,
    "subquery_big_spenders": q_subquery_big_spenders,
    "string_functions": q_string_functions,
    "datetime_functions": q_datetime_functions,
    "array_functions": q_array_functions,
    "json_functions": q_json_functions,
    "embedding_pairs_exact": q_embedding_pairs_exact,
    "merge_orders_upsert": q_merge_orders_upsert,
    "map_functions": q_map_functions,
    "misc_aggregates": q_misc_aggregates,
    "unpivot_order_metrics": q_unpivot_order_metrics,
    "collect_aggregates": q_collect_aggregates,
    "variant_functions": q_variant_functions,
    "stratified_sample": q_stratified_sample,
    "rolling_revenue_7d": q_rolling_revenue_7d,
    "null_semantics": q_null_semantics,
}

EXT_ORACLES = {
    "lateral_top_orders": """
        SELECT c.c_custkey, l.o_orderkey, l.o_totalprice, l.rnk
        FROM customer c,
        LATERAL (
            SELECT o_orderkey, o_totalprice,
                   row_number() OVER (
                       ORDER BY o_totalprice DESC, o_orderkey ASC
                   ) AS rnk
            FROM orders o
            WHERE o.o_custkey = c.c_custkey
            ORDER BY o_totalprice DESC, o_orderkey ASC
            LIMIT 2
        ) l
        WHERE c.c_mktsegment = 'BUILDING'
    """,
    "fuzzy_name_pairs": """
        WITH v AS (SELECT DISTINCT c_name AS k FROM customer)
        SELECT a.k AS key_a, b.k AS key_b,
               levenshtein(a.k, b.k) AS edit_distance
        FROM v a JOIN v b
          ON a.k < b.k AND levenshtein(a.k, b.k) <= 1
    """,
    "recursive_tree_depth": """
        WITH RECURSIVE tree(k, depth) AS (
            SELECT CAST(c_custkey AS BIGINT), 0 FROM customer WHERE c_custkey = 1
            UNION ALL
            SELECT CAST(c.c_custkey AS BIGINT), t.depth + 1
            FROM customer c JOIN tree t ON c.c_custkey // 2 = t.k
            WHERE c.c_custkey > 1
        )
        SELECT depth, count(*) AS n_nodes,
               min(k) AS min_key, max(k) AS max_key
        FROM tree GROUP BY depth
    """,
    "null_semantics": """
        WITH base AS (
            SELECT o_orderkey, nullif(o_orderstatus, 'F') AS status_n
            FROM orders
        ), rn AS (
            SELECT *, row_number() OVER (
                ORDER BY status_n ASC NULLS FIRST, o_orderkey
            ) AS rn FROM base
        ), dim(status, label) AS (
            VALUES ('P', 'pending'), ('O', 'open'), (NULL, 'final')
        )
        SELECT label, status_n, count(*) AS n_rows, min(rn) AS first_rank
        FROM rn JOIN dim ON status_n IS NOT DISTINCT FROM status
        GROUP BY label, status_n
    """,
    "rolling_revenue_7d": """
        WITH daily AS (
            SELECT o_orderpriority,
                   date_diff('day', TIMESTAMP '1995-01-01', o_orderdate)
                       AS day_num,
                   sum(CAST(o_totalprice AS DECIMAL(18,6))) AS rev_dec
            FROM orders
            GROUP BY o_orderpriority,
                     date_diff('day', TIMESTAMP '1995-01-01', o_orderdate)
        )
        SELECT o_orderpriority, day_num,
               CAST(round(rev_dec, 2) AS DOUBLE) AS daily_revenue,
               CAST(round(sum(rev_dec) OVER w7, 2) AS DOUBLE)
                   AS trailing_7d_revenue,
               floor(CAST(round(sum(rev_dec) OVER w7, 2) AS DOUBLE)
                     / CAST(round(sum(rev_dec) OVER wall, 2) AS DOUBLE)
                     * 1e6 + 0.5) / 1e6 AS share_of_total
        FROM daily
        WINDOW w7 AS (PARTITION BY o_orderpriority ORDER BY day_num
                      RANGE BETWEEN 6 PRECEDING AND CURRENT ROW),
               wall AS (PARTITION BY o_orderpriority)
    """,
    "pivot_status_priority": """
        SELECT o_orderstatus,
               count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS n_urgent,
               count(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS n_high,
               count(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS n_medium,
               count(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED')
                   AS n_not_specified,
               count(*) FILTER (WHERE o_orderpriority = '5-LOW') AS n_low
        FROM orders
        GROUP BY o_orderstatus
    """,
    "grouping_sets_orders": """
        SELECT o_orderstatus, o_orderpriority,
               CAST(grouping(o_orderstatus) AS INTEGER) AS g_status,
               CAST(grouping(o_orderpriority) AS INTEGER) AS g_priority,
               count(*) AS n_rows,
               round(sum(o_totalprice), 2) AS sum_total
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    "window_ranks": """
        SELECT o_orderkey, o_orderstatus,
               round(o_totalprice, 2) AS price,
               rank() OVER w AS price_rank,
               dense_rank() OVER w AS price_dense_rank,
               ntile(4) OVER w AS price_quartile,
               round(percent_rank() OVER w, 6) AS pct_rank,
               round(cume_dist() OVER w, 6) AS cume_dist,
               first_value(o_orderkey) OVER w AS top_orderkey
        FROM orders
        WHERE o_orderkey < 3000
        WINDOW w AS (PARTITION BY o_orderstatus
                     ORDER BY o_totalprice DESC, o_orderkey ASC)
    """,
    "subquery_big_spenders": """
        SELECT c_custkey, c_name, round(c_acctbal, 2) AS acctbal
        FROM customer c
        WHERE c_acctbal > (SELECT round(sum(c_acctbal), 2) / count(*) FROM customer)
          AND EXISTS (
              SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
          )
    """,
    "string_functions": """
        SELECT p_partkey,
               upper(p_name) AS name_upper,
               lower(p_brand) AS brand_lower,
               length(p_name) AS name_len,
               lpad(p_type, 12, '_') AS type_padded,
               split_part(p_name, ' ', 1) AS first_word,
               regexp_replace(p_name, '[aeiou]', '', 'g') AS name_novowels,
               CAST(regexp_extract(p_brand, '#(\\d+)', 1) AS INTEGER) AS brand_num,
               reverse(p_type) AS type_reversed,
               repeat(substr(p_type, 1, 1), 3) AS type_initial_x3,
               CAST(coalesce(position('e' IN p_name), 0) AS INTEGER) AS first_e_pos,
               levenshtein(p_name, p_type) AS name_type_dist,
               CAST(starts_with(p_name, 'red') AS INTEGER) AS is_red,
               CAST(contains(p_name, 'bolt') AS INTEGER) AS has_bolt
        FROM part
    """,
    "datetime_functions": """
        SELECT o_orderkey,
               strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
               quarter(o_orderdate) AS order_quarter,
               dayofmonth(o_orderdate) AS order_dom,
               dayofweek(o_orderdate) + 1 AS order_dow,
               dayofyear(o_orderdate) AS order_doy,
               weekofyear(o_orderdate) AS order_isoweek,
               strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date,
               strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
               date_diff('day', o_orderdate, TIMESTAMP '1998-01-01') AS days_to_1998
        FROM orders
    """,
    "array_functions": """
        SELECT vec_id,
               len(e) AS dim,
               round(e[1], 6) AS first_elem,
               round(list_sum(e), 4) AS sum_all,
               round(list_sum(list_transform(e, x -> abs(x))) / len(e), 4)
                   AS mean_abs,
               round(list_max(e), 6) AS max_elem,
               round(list_min(e), 6) AS min_elem,
               len(list_filter(e, x -> x > 0)) AS n_positive,
               CAST(len(list_filter(e, x -> x > 2.0)) > 0 AS INTEGER) AS has_gt2
        FROM (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)
    """,
    "json_functions": """
        SELECT event_type,
               count(*) AS n_events,
               CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
               min(CAST(props->>'$.k' AS BIGINT)) AS min_k,
               max(CAST(props->>'$.k' AS BIGINT)) AS max_k,
               count(DISTINCT CAST(props->>'$.k' AS BIGINT)) AS distinct_k
        FROM events
        GROUP BY event_type
    """,
    "stratified_sample": """
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_sampled
        FROM events
        WHERE ('0x' || substring(md5('strat:' ||
                                     CAST(event_id AS VARCHAR)), 1, 8)
              )::BIGINT / CAST(4294967296 AS DOUBLE)
              < CASE event_type
                    WHEN 'click' THEN CAST(0.1 AS DOUBLE)
                    WHEN 'view' THEN CAST(0.2 AS DOUBLE)
                    WHEN 'signup' THEN CAST(0.5 AS DOUBLE)
                    ELSE CAST(1.0 AS DOUBLE)
                END
        GROUP BY event_type
    """,
    "misc_aggregates": """
        SELECT o_orderstatus,
               CAST(count_if(o_totalprice > 100000) AS BIGINT) AS n_big,
               CAST(bool_and(o_totalprice > 0) AS INTEGER) AS all_positive,
               CAST(bool_or(o_totalprice > 400000) AS INTEGER) AS any_huge,
               arg_max(o_orderkey, o_totalprice) AS priciest_order,
               arg_min(o_orderkey, o_totalprice) AS cheapest_order,
               count(nullif(o_orderpriority, '5-LOW')) AS n_not_low
        FROM orders
        GROUP BY o_orderstatus
    """,
    "unpivot_order_metrics": """
        SELECT o_orderkey, 'totalprice' AS metric,
               round(o_totalprice, 2) AS value FROM orders
        UNION ALL
        SELECT o_orderkey, 'custkey', CAST(o_custkey AS DOUBLE) FROM orders
    """,
    "collect_aggregates": """
        SELECT event_type,
               array_to_string(list_sort(list(DISTINCT user_id % 10)), ',')
                   AS user_residues,
               CAST(count(DISTINCT user_id) AS INTEGER) AS n_distinct_users,
               CAST(count(user_id) AS INTEGER) AS n_rows
        FROM events
        GROUP BY event_type
    """,
    "variant_functions": """
        SELECT event_id,
               CAST(props->>'$.k' AS BIGINT) AS k_typed,
               CAST(NULL AS VARCHAR) AS k_missing,
               'OBJECT<k: BIGINT>' AS v_schema
        FROM events
    """,
    "map_functions": """
        SELECT o_orderkey,
               CAST(cardinality(m) AS INTEGER) AS m_size,
               m['status'][1] AS status_from_map,
               m['priority'][1] AS priority_from_map,
               CAST(list_contains(map_keys(m), 'status') AS INTEGER)
                   AS has_status,
               array_to_string(list_sort(map_keys(m)), ',') AS keys_sorted
        FROM (
            SELECT o_orderkey,
                   map(['status', 'priority'],
                       [o_orderstatus, o_orderpriority]) AS m
            FROM orders
        )
    """,
    "merge_orders_upsert": """
        WITH t AS (
            SELECT o_orderkey, o_orderstatus,
                   round(o_totalprice, 2) AS o_totalprice
            FROM orders
        ), src AS (
            SELECT o_orderkey, 'U' AS o_orderstatus,
                   round(o_totalprice * 1.1, 2) AS o_totalprice
            FROM t WHERE o_orderkey % 100 < 5
            UNION ALL
            SELECT o_orderkey + 10000000, 'N', o_totalprice
            FROM t WHERE o_orderkey % 100 = 5
        )
        SELECT coalesce(s.o_orderkey, t.o_orderkey) AS o_orderkey,
               CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_orderstatus
                    ELSE t.o_orderstatus END AS o_orderstatus,
               CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_totalprice
                    ELSE t.o_totalprice END AS o_totalprice,
               CASE WHEN s.o_orderkey IS NOT NULL AND t.o_orderkey IS NOT NULL
                         THEN 'update'
                    WHEN t.o_orderkey IS NULL THEN 'insert'
                    ELSE 'keep' END AS action
        FROM t FULL OUTER JOIN src s ON t.o_orderkey = s.o_orderkey
    """,
    "embedding_pairs_exact": """
        WITH e AS (
            SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
        )
        SELECT a.label, a.vec_id AS id_a, b.vec_id AS id_b,
               round(list_cosine_similarity(a.v, b.v), 6) AS cosine_sim
        FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
        WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.1
    """,
}
