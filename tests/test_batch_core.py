"""t1 smoke (SURVEY.md §5.1): batch operator inventory on sf0.001."""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from m13_sparkstreaming_python_azure_spark.catalog import load_table
from m13_sparkstreaming_python_azure_spark.operators.aggregate import (
    grouped_stats,
    weather_daily_aggregate,
)
from m13_sparkstreaming_python_azure_spark.operators.window import (
    best_day_per_city_top10,
    top1_per_group,
    topk,
)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert "distinct_users" in df.columns


def test_all_queries_run_sf0001(spark, sf_dir):
    for name, fn in entrymod.queries().items():
        df = fn(spark, sf_dir)
        assert df.count() >= 0, name


def test_oracle_keys_subset_of_queries():
    qs = set(entrymod.queries())
    assert set(entrymod.oracle_sql()) <= qs


def test_grouped_stats_exact_vs_approx_tolerance(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    exact = grouped_stats(
        events, ["event_type"], "user_id", "value", approx=False
    ).collect()
    approx = {
        r["event_type"]: r["distinct_count"]
        for r in grouped_stats(
            events, ["event_type"], "user_id", "value", approx=True
        ).collect()
    }
    for r in exact:
        e, a = r["distinct_count"], approx[r["event_type"]]
        # HLL++ rsd 0.05 → allow generous 4-sigma band
        assert abs(a - e) <= max(5, 0.2 * e), (r["event_type"], e, a)


def test_sketch_rollup_tolerance_and_mergeability(spark, sf_dir):
    """Unioned per-day sketches estimate per-type distincts within HLL
    tolerance of exact, and match a directly-built per-type sketch."""
    from m13_sparkstreaming_python_azure_spark.operators.aggregate import (
        build_distinct_sketches,
        rollup_distinct_from_sketches,
    )
    from m13_sparkstreaming_python_azure_spark.catalog import load_table
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events").withColumn(
        "event_date", F.date_format("ts", "yyyy-MM-dd")
    )
    daily = build_distinct_sketches(ev, ["event_type", "event_date"], "user_id")
    rolled = {
        r["event_type"]: r["distinct_estimate"]
        for r in rollup_distinct_from_sketches(daily, ["event_type"]).collect()
    }
    direct = {
        r["event_type"]: r["distinct_estimate"]
        for r in rollup_distinct_from_sketches(
            build_distinct_sketches(ev, ["event_type"], "user_id"),
            ["event_type"],
        ).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(rolled) == set(exact)
    for t, n in exact.items():
        assert abs(rolled[t] - n) <= max(3, 0.05 * n), (t, rolled[t], n)
        # sketch union must equal building the sketch at the coarse key
        assert rolled[t] == direct[t], t


def test_topk_deterministic(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    a = topk(orders, [F.desc("o_totalprice"), F.asc("o_orderkey")], 5).collect()
    b = topk(orders, [F.desc("o_totalprice"), F.asc("o_orderkey")], 5).collect()
    assert [r.o_orderkey for r in a] == [r.o_orderkey for r in b]
    prices = [r.o_totalprice for r in a]
    assert prices == sorted(prices, reverse=True)


def test_top1_per_group_unique(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    best = top1_per_group(
        orders, ["o_custkey"], [F.desc("o_totalprice"), F.asc("o_orderkey")]
    )
    dup = best.groupBy("o_custkey").count().filter(F.col("count") > 1).count()
    assert dup == 0


def test_weather_aggregate_shape(spark, sf_dir):
    """Reference-schema parity: build a hotel-weather-shaped frame from
    events and run the verbatim reference aggregate + flagship query."""
    ev = load_table(spark, sf_dir, "events")
    hw = ev.select(
        F.col("event_type").alias("city"),
        F.date_format("ts", "yyyy-MM-dd").alias("wthr_date"),
        F.col("user_id").cast("string").alias("id"),
        F.col("value").alias("avg_tmpr_c"),
    )
    agg = weather_daily_aggregate(hw)
    assert set(agg.columns) == {
        "city",
        "wthr_date",
        "distinct_hotels",
        "avg_temperature",
        "max_temperature",
        "min_temperature",
    }
    top10 = best_day_per_city_top10(agg)
    rows = top10.collect()
    assert len(rows) <= 10
    # one row per city, sorted by peak distinct hotels
    assert len({r.city for r in rows}) == len(rows)


def test_merge_upsert_null_semantics(spark):
    """A source row with a NULL non-key column must still overwrite the
    matched target row; NULL-key rows merge null-safely instead of being
    treated as unmatched."""
    from m13_sparkstreaming_python_azure_spark.operators.merge import merge_upsert

    target = spark.createDataFrame(
        [(1, "a"), (2, "b"), (None, "nullkey-t")], "k int, v string"
    )
    source = spark.createDataFrame(
        [(1, None), (3, "new"), (None, "nullkey-s")], "k int, v string"
    )
    out = {
        (r["k"], r["v"], r["action"])
        for r in merge_upsert(target, source, ["k"], with_action=True).collect()
    }
    assert out == {
        (1, None, "update"),      # NULL v from source wins
        (2, "b", "keep"),
        (3, "new", "insert"),
        (None, "nullkey-s", "update"),  # null-safe key match
    }


def test_approx_percentiles_within_tolerance(spark, sf_dir):
    """percentile_approx guarantees RANK error (<= 1/accuracy), not value
    error — in a distribution's tail, tiny rank errors can be large value
    gaps. Assert the rank of each approximate answer."""
    from m13_sparkstreaming_python_azure_spark.catalog import load_table
    from m13_sparkstreaming_python_azure_spark.queries.core import (
        q_value_percentiles_approx,
    )

    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    approx = {
        r["event_type"]: r
        for r in ev.groupBy("event_type")
        .agg(
            F.percentile_approx("value", 0.5, 10000).alias("p50"),
            F.percentile_approx("value", 0.9, 10000).alias("p90"),
            F.percentile_approx("value", 0.99, 10000).alias("p99"),
        )
        .collect()
    }
    for et, a in approx.items():
        vals = sorted(
            r["value"] for r in ev.filter(F.col("event_type") == et).collect()
        )
        n = len(vals)
        for q, target in (("p50", 0.5), ("p90", 0.9), ("p99", 0.99)):
            rank = sum(v <= a[q] for v in vals) / n
            assert abs(rank - target) < 0.02, (et, q, a[q], rank)
    # the gate query's rank-ok flags (r9: the hash-gated invariant)
    for r in q_value_percentiles_approx(spark, sf_dir).collect():
        assert r["p50_rank_ok"] == 1 and r["p90_rank_ok"] == 1
        assert r["p99_rank_ok"] == 1


def test_stratified_sample_deterministic_and_proportional(spark, sf_dir):
    """sampleBy with a fixed seed: identical across runs, and per-stratum
    counts near the requested fractions."""
    from m13_sparkstreaming_python_azure_spark.queries.relational_ext import (
        q_stratified_sample,
    )
    from m13_sparkstreaming_python_azure_spark.catalog import load_table

    a = {r["event_type"]: r["n_sampled"] for r in q_stratified_sample(spark, sf_dir).collect()}
    b = {r["event_type"]: r["n_sampled"] for r in q_stratified_sample(spark, sf_dir).collect()}
    assert a == b
    totals = {
        r["event_type"]: r["n"]
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    fracs = {"click": 0.1, "view": 0.2, "purchase": 1.0, "error": 1.0, "signup": 0.5}
    for et, frac in fracs.items():
        got = a.get(et, 0) / totals[et]
        # sf0.001 strata are ~200 rows; 3-sigma binomial noise at
        # p=0.5 is ~0.11 — the bound checks stratum targeting, not variance
        assert abs(got - frac) < 0.15, (et, got, frac)


def test_asof_join_forward_direction(spark):
    """Forward as-of: earliest right row at-or-after each left timestamp,
    equal timestamps matching; keys never cross."""
    from m13_sparkstreaming_python_azure_spark.operators.join import asof_join

    left = spark.createDataFrame(
        [(1, 10, "l1"), (1, 25, "l2"), (2, 5, "l3"), (2, 99, "l4")],
        "k int, ts int, lv string",
    )
    right = spark.createDataFrame(
        [(1, 10, "r10"), (1, 20, "r20"), (1, 30, "r30"), (2, 7, "r7")],
        "k int, rts int, rv string",
    )
    got = {
        (r["k"], r["ts"]): r["rv"]
        for r in asof_join(
            left, right, on=["k"], left_ts="ts", right_ts="rts",
            direction="forward",
        ).collect()
    }
    assert got == {
        (1, 10): "r10",   # equal ts matches
        (1, 25): "r30",
        (2, 5): "r7",
        (2, 99): None,    # nothing after
    }


def test_sessionize_gap_semantics(spark):
    """Session boundaries: a gap of exactly the threshold stays in-session;
    one microsecond over starts a new one; numbering restarts per user."""
    import datetime as dt

    from m13_sparkstreaming_python_azure_spark.queries.behavior import sessionize

    base = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: 0s, +1800s (boundary, same session), +1800.000001s (new)
        (1, base, 10),
        (2, base + dt.timedelta(seconds=1800), 10),
        (3, base + dt.timedelta(seconds=3600, microseconds=1), 10),
        # user 2: independent numbering
        (4, base, 20),
    ]
    ev = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long")
    got = {
        r["event_id"]: r["session_id"]
        for r in sessionize(ev, gap_sec=1800).collect()
    }
    assert got == {1: 1, 2: 1, 3: 2, 4: 1}


def test_merge_into_insert_values_nulls_unspecified(spark):
    """Delta MERGE parity (ADVICE r4 #2): WHEN NOT MATCHED THEN INSERT
    with an explicit values dict inserts NULL for target columns the dict
    omits — never silently pulling the source's same-named column, and
    never failing analysis when the source lacks it."""
    from m13_sparkstreaming_python_azure_spark.operators.merge import (
        NotMatchedInsert,
        merge_into,
    )

    target = spark.createDataFrame(
        [(1, "a", 10.0)], "k int, v string, w double"
    )
    source = spark.createDataFrame(
        [(2, "src-v", 99.0)], "k int, v string, w double"
    )
    # explicit values names only k and v → w must become NULL, not 99.0
    out = merge_into(
        target,
        source,
        ["k"],
        [NotMatchedInsert(values={"k": "s.k", "v": "upper(s.v)"})],
    )
    rows = {tuple(r) for r in out.collect()}
    assert rows == {(1, "a", 10.0), (2, "SRC-V", None)}

    # INSERT * (values=None) keeps full source passthrough
    out2 = merge_into(target, source, ["k"], [NotMatchedInsert()])
    assert {tuple(r) for r in out2.collect()} == {
        (1, "a", 10.0),
        (2, "src-v", 99.0),
    }


def test_histogram_sketch_mergeable_and_bounded_error(spark, sf_dir):
    """Sketch invariants: (1) merging per-day sketches equals the sketch
    built in one pass (mergeability); (2) sum(n) == row count (totality);
    (3) quantile estimates are within one bin width of exact percentiles."""
    from pyspark.sql import functions as F

    from m13_sparkstreaming_python_azure_spark.catalog import load_table
    from m13_sparkstreaming_python_azure_spark.operators.histogram import (
        build_histogram,
        histogram_quantiles,
        merge_histograms,
    )

    ev = load_table(spark, sf_dir, "events").withColumn(
        "event_date", F.date_format("ts", "yyyy-MM-dd")
    )
    lo, hi, bins = 0.0, 500.0, 100
    width = (hi - lo) / bins
    daily = build_histogram(ev, "value", ["event_type", "event_date"], lo, hi, bins)
    merged = merge_histograms(daily, ["event_type"])
    direct = build_histogram(ev, "value", ["event_type"], lo, hi, bins)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )
    assert merged.agg(F.sum("n")).first()[0] == ev.count()

    qs = [0.5, 0.9, 0.99]
    est = {
        (r["event_type"], r["q"]): r["quantile_est"]
        for r in histogram_quantiles(merged, ["event_type"], qs, lo, hi, bins).collect()
    }
    # The histogram guarantee is vs the inverse-CDF order statistic (the
    # ceil(q*n)-th smallest value lands in the chosen bin), NOT vs
    # interpolated type-7 percentile() — in a sparse tail those two exact
    # definitions themselves differ by more than a bin.
    import math

    vals = {
        r["event_type"]: sorted(r["vs"])
        for r in ev.groupBy("event_type")
        .agg(F.collect_list("value").alias("vs"))
        .collect()
    }
    for et, vs in vals.items():
        for q in qs:
            k = max(1, math.ceil(q * len(vs)))
            x = vs[k - 1]
            assert abs(est[(et, q)] - x) <= width, (et, q, est[(et, q)], x)


def test_pagerank_known_graphs(spark):
    """Sanity on analytically-known graphs: a symmetric cycle is uniform
    (rank 1.0 everywhere); in a symmetric star the hub outranks leaves
    and ordering is stable across iterations."""
    from m13_sparkstreaming_python_azure_spark.operators.graph import pagerank

    cycle = spark.createDataFrame(
        [(i, (i + 1) % 4) for i in range(4)]
        + [((i + 1) % 4, i) for i in range(4)],
        "src long, dst long",
    )
    got = {r["node"]: r["rank"] for r in pagerank(cycle, iterations=5).collect()}
    assert got == {0: 1.0, 1: 1.0, 2: 1.0, 3: 1.0}

    star = spark.createDataFrame(
        [(0, i) for i in range(1, 5)] + [(i, 0) for i in range(1, 5)],
        "src long, dst long",
    )
    ranks = {r["node"]: r["rank"] for r in pagerank(star, iterations=5).collect()}
    hub, leaves = ranks[0], [ranks[i] for i in range(1, 5)]
    assert all(hub > lv for lv in leaves)
    assert len(set(leaves)) == 1  # symmetric leaves tie exactly
    # total rank is conserved up to the 1e-9 grid (no dangling nodes)
    assert abs(sum(ranks.values()) - 5.0) < 1e-6


def test_pagerank_releases_intermediate_caches(spark):
    """pagerank must not leak executor storage: after the result is
    materialized, only the RETURNED ranks stay persisted — the trailing
    previous-iteration cache and the loop-invariant edge/node caches are
    all released (ADVICE r1)."""
    from m13_sparkstreaming_python_azure_spark.operators.graph import pagerank

    from m13_sparkstreaming_python_azure_spark.operators.util import (
        release_local_checkpoint,
    )

    sc = spark.sparkContext
    jsc = sc._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    edges = spark.createDataFrame(
        [(i, (i * 7 + 1) % 50) for i in range(200)], "src long, dst long"
    )
    ranks = pagerank(edges, iterations=4)
    ranks.count()
    during = jsc.getPersistentRDDs().size()
    assert during <= before + 1  # the returned ranks only (r12: an
    # eager localCheckpoint — self-contained, so every intermediate
    # round's blocks were released inside pagerank)
    release_local_checkpoint(ranks)
    assert jsc.getPersistentRDDs().size() <= before


def test_zscore_pandas_twin_matches_jvm(spark, sf_dir):
    """The applyInPandas grouped-map implementation must equal the JVM
    window implementation bit-for-bit (both ground moments in exact
    decimal sums and floor-round at 1e-4)."""
    from m13_sparkstreaming_python_azure_spark.operators.feature import (
        zscore_grouped_pandas,
        zscore_window,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    jvm = sorted(map(tuple, zscore_window(ev, ["event_type"], "value").collect()))
    pds = sorted(
        map(tuple, zscore_grouped_pandas(ev, ["event_type"], "value").collect())
    )
    assert jvm == pds


def test_operators_handle_empty_input(spark):
    """Degenerate-input robustness: zero-row frames must flow through the
    newer operators without exceptions and produce zero rows."""
    from m13_sparkstreaming_python_azure_spark.operators.feature import (
        zscore_window,
    )
    from m13_sparkstreaming_python_azure_spark.operators.graph import pagerank
    from m13_sparkstreaming_python_azure_spark.operators.histogram import (
        build_histogram,
        histogram_quantiles,
        merge_histograms,
    )
    from m13_sparkstreaming_python_azure_spark.queries.behavior import sessionize

    empty_ev = spark.createDataFrame(
        [], "event_id long, ts timestamp, user_id long, value double"
    )
    assert sessionize(empty_ev).count() == 0
    assert zscore_window(
        empty_ev.selectExpr("event_id", "'x' AS event_type", "value"),
        ["event_type"], "value",
    ).count() == 0
    hist = build_histogram(empty_ev, "value", ["user_id"], 0.0, 10.0, 4)
    assert hist.count() == 0
    merged = merge_histograms(hist, ["user_id"])
    assert histogram_quantiles(merged, ["user_id"], [0.5], 0.0, 10.0, 4).count() == 0
    empty_edges = spark.createDataFrame([], "src long, dst long")
    assert pagerank(empty_edges, iterations=2).count() == 0


def test_apply_cdc_semantics(spark):
    """I/U/D in one pass: delete drops the matched row, delete for an
    absent key is a no-op, update overwrites, insert appends, null-safe
    key matching applies to deletes too."""
    from m13_sparkstreaming_python_azure_spark.operators.merge import apply_cdc

    target = spark.createDataFrame(
        [(1, "a"), (2, "b"), (None, "nk")], "k int, v string"
    )
    changes = spark.createDataFrame(
        [
            (1, None, "D"),      # delete existing
            (9, None, "D"),      # delete absent → no-op
            (2, "b2", "U"),      # update
            (3, "c", "I"),       # insert
            (None, None, "D"),   # null-safe delete of the null-key row
        ],
        "k int, v string, op string",
    )
    out = {(r["k"], r["v"]) for r in apply_cdc(target, changes, ["k"]).collect()}
    assert out == {(2, "b2"), (3, "c")}


def test_tpch_ext_shape_invariants(spark, sf_dir):
    """Structural invariants of the TPC-H shape adaptations that the
    value-hash oracle can't express: partition-of-total for the Q13
    double aggregate, max-equality for the Q15 join-back, threshold
    respect for the Q18 having, and at-most-once semi-join semantics
    for Q4."""
    from m13_sparkstreaming_python_azure_spark.queries.tpch_ext import (
        q_customer_order_distribution,
        q_large_volume_customers,
        q_order_priority_count,
        q_top_supplier_revenue,
    )

    n_cust = load_table(spark, sf_dir, "customer").count()
    dist = q_customer_order_distribution(spark, sf_dir).collect()
    # every customer lands in exactly one count bucket (outer join keeps
    # zero-order customers)
    assert sum(r["custdist"] for r in dist) == n_cust

    top = q_top_supplier_revenue(spark, sf_dir).collect()
    assert len(top) >= 1
    assert len({r["total_revenue"] for r in top}) == 1  # all tied at max

    for r in q_large_volume_customers(spark, sf_dir).collect():
        assert r["sum_qty"] > 250

    n_orders_window = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= "1996-01-01")
            & (F.col("o_orderdate") < "1997-01-01")
        )
        .count()
    )
    counted = sum(
        r["order_count"] for r in q_order_priority_count(spark, sf_dir).collect()
    )
    # left-semi: each qualifying order contributes at most once
    assert 0 < counted <= n_orders_window


def test_recursive_cte_binary_tree(spark):
    """WITH RECURSIVE over keys 1..7 (parent = k div 2): depths 0/1/2 with
    1/2/4 nodes — pins Spark 4's UnionLoop execution of recursive CTEs."""
    spark.createDataFrame(
        [(k,) for k in range(1, 8)], "c_custkey int"
    ).createOrReplaceTempView("customer")
    rows = spark.sql("""
        WITH RECURSIVE tree(k, depth) AS (
            SELECT CAST(c_custkey AS BIGINT), 0 FROM customer WHERE c_custkey = 1
            UNION ALL
            SELECT CAST(c.c_custkey AS BIGINT), t.depth + 1
            FROM customer c JOIN tree t ON c.c_custkey div 2 = t.k
            WHERE c.c_custkey > 1
        )
        SELECT depth, count(*) AS n FROM tree GROUP BY depth ORDER BY depth
    """).collect()
    assert [(r["depth"], r["n"]) for r in rows] == [(0, 1), (1, 2), (2, 4)]


def test_plan_invariants_on_representative_queries(spark):
    """The scale-critical plan properties (pushdown, broadcast joins, top-k
    physical ops, no accidental NLJ) asserted in CI for a representative
    query slice — regressions surface in tests, not only when PLANS.md is
    regenerated. Full-inventory audit: tools/plan_audit.py."""
    import os
    import sys

    sys.path.insert(
        0,
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tools",
        ),
    )
    import plan_audit

    from m13_sparkstreaming_python_azure_spark.queries import QUERIES

    representative = [
        "pricing_summary",        # pushdown
        "revenue_by_nation",      # broadcast dim chain
        "topk_orders",            # TakeOrderedAndProject
        "frequent_users",         # WindowGroupLimit
        "ann_lsh",                # single-shuffle dedup+rank
        "min_cost_supplier",      # partsupp window-min chain
        "shipping_priority",      # TPC-H join shape
    ]
    sf = "/root/testdata/sf0.001"
    for name in representative:
        df = QUERIES[name](spark, sf)
        problems, _plan = plan_audit.audit_one(name, df)
        assert not problems, f"{name}: {problems}"


def test_subsequence_search_finds_known_window(spark):
    """Hand-built series: the pattern appears exactly at offset 3 → distance
    0 there; earliest-start tie-break when a duplicate match exists later."""
    from m13_sparkstreaming_python_azure_spark.operators.timeseries import (
        subsequence_search,
    )

    vals = [9.0, 7.0, 5.0, 1.0, 2.0, 3.0, 8.0, 1.0, 2.0, 3.0]
    rows = [(1, float(i), i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "user_id int, ts double, event_id int, value double"
    )
    out = subsequence_search(
        df, "user_id", [1.0, 2.0, 3.0], ts_col="ts"
    ).collect()
    assert len(out) == 1
    r = out[0]
    # exact match at 1-based offset 4 (index 3); the later duplicate at
    # offset 8 loses the earliest-start tie-break
    assert (r["best_start"], r["best_dist2"], r["n_points"]) == (4, 0.0, 10)


def test_spread_is_size_aware(spark):
    """spread() fans out only when the optimizer-estimated input justifies
    it: tiny inputs keep their partitioning (no shuffle added), inputs past
    the byte target grow toward the session parallelism."""
    from m13_sparkstreaming_python_azure_spark.operators.util import spread

    from m13_sparkstreaming_python_azure_spark.catalog import load_table

    small = load_table(spark, "/root/testdata/sf0.001", "nation")
    assert spread(small).rdd.getNumPartitions() == small.rdd.getNumPartitions()
    big = load_table(spark, "/root/testdata/sf0.001", "documents")
    fanned = spread(big, target_bytes_per_partition=1 << 10)
    assert fanned.rdd.getNumPartitions() > big.rdd.getNumPartitions()


def test_triangle_counts_known_graphs(spark):
    from m13_sparkstreaming_python_azure_spark.operators.graph import (
        triangle_counts,
    )

    # K4 (every node in 3 triangles), plus a pendant node in none
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    edges = spark.createDataFrame(k4 + [(3, 9)], ["src", "dst"])
    got = {r["node"]: r["n_triangles"] for r in triangle_counts(edges).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3, 9: 0}

    # duplicate / reversed / self-loop edges must not inflate counts
    noisy = spark.createDataFrame(
        [(0, 1), (1, 0), (1, 2), (2, 0), (0, 0), (2, 1)], ["src", "dst"]
    )
    got = {r["node"]: r["n_triangles"] for r in triangle_counts(noisy).collect()}
    assert got == {0: 1, 1: 1, 2: 1}
