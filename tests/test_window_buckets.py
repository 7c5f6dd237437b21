"""global_rank / global_cumsum bucket machinery — round 11 rebuild:

- VERDICT r10 #3: bucket lookup is an O(log p) binary search with O(1)
  expression size (the r10 when-chain of p−1 additions overflowed the
  driver stack at p=2000).
- VERDICT r10 #2: a HOT leading value (≥80% ties) sub-buckets its tie
  group by the second sort column instead of concentrating one window
  task — when the lead surrogate is injective; otherwise the plan
  degrades to the old single-bucket-per-tie shape, never to a wrong
  answer.
- ADVICE r10: `_lead_spec` infers only plain identifiers; expressions
  must pass lead= explicitly.

Every rank assertion here is against a driver-side sorted() reference —
implementation-independent."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from m13_sparkstreaming_python_azure_spark.operators.window import (
    _lead_spec,
    global_cumsum,
    global_rank,
    rank_bucket_census,
)


def _expected_ranks(rows, key):
    order = sorted(rows, key=key)
    return {r: i + 1 for i, r in enumerate(order)}


def test_hot_leading_value_ranks_exact_and_balanced(spark):
    # 85% of rows tie on score=1.0; unique id is the tie-break
    n = 4000
    rows = [
        (i, 1.0 if i % 100 < 85 else float(i % 100)) for i in range(n)
    ]
    df = spark.createDataFrame(rows, "id long, score double")
    out = global_rank(
        df, [F.asc("score"), F.asc("id")], num_partitions=16
    ).collect()
    exp = _expected_ranks(rows, key=lambda r: (r[1], r[0]))
    assert all(exp[(r["id"], r["score"])] == r["rank"] for r in out)
    # balance: the 3400-row tie group must NOT land in one bucket
    census = rank_bucket_census(
        df, [F.asc("score"), F.asc("id")], num_partitions=16
    ).collect()
    biggest = max(r["rows"] for r in census)
    assert biggest < 0.85 * n / 2, (
        f"hot tie group not split: max bucket {biggest} of {n}"
    )


def test_hot_value_desc_second_key_with_nulls(spark):
    # second key descending with nulls (DESC → NULLS LAST default)
    rows = [(i, 2.5, (None if i % 7 == 0 else i * 1.0)) for i in range(800)]
    rows += [(i + 800, float(i % 5), i * 1.0) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, score double, w double")
    out = global_rank(
        df,
        [F.asc("score"), F.desc("w"), F.asc("id")],
        num_partitions=8,
    ).collect()
    exp = _expected_ranks(
        rows,
        key=lambda r: (
            r[1],
            (1, 0.0) if r[2] is None else (0, -r[2]),  # DESC NULLS LAST
            r[0],
        ),
    )
    assert all(exp[(r["id"], r["score"], r["w"])] == r["rank"] for r in out)


def test_string_lead_pinned_hot_value_splits_and_stays_exact(spark):
    """VERDICT r11 #2: a hot string lead whose tie group is ONE exact
    string (min == max in the bounded hot job) sub-buckets by the
    second sort column — the low-cardinality status/category shape that
    used to land 85% of rows in one bucket by design."""
    rows = [(i, "hotkey-shared-prefix") for i in range(1700)]
    rows += [(i + 1700, f"k{i % 100:03d}") for i in range(300)]
    df = spark.createDataFrame(rows, "id long, s string")
    order = [F.asc("s"), F.asc("id")]
    out = global_rank(df, order, num_partitions=16)
    exp = _expected_ranks(rows, key=lambda r: (r[1], r[0]))
    assert all(
        exp[(r["id"], r["s"])] == r["rank"] for r in out.collect()
    )
    census = rank_bucket_census(df, order, num_partitions=16).collect()
    biggest = max(r["rows"] for r in census)
    assert biggest <= 4 * 2000 // 16, (
        f"pinned hot string not split: max bucket {biggest} of 2000"
    )


def test_string_lead_prefix_family_splits_on_second_level(spark):
    """VERDICT r11 #2, mixed case: a hot 6-byte prefix shared by
    SEVERAL distinct strings (min != max) splits along the
    second-LEVEL surrogate (bytes 7-12) — down to per-string
    granularity, never inverting the total order."""
    rows = [(i, f"prefix-{i % 5:03d}") for i in range(1700)]
    rows += [(i + 1700, f"z{i % 100:03d}") for i in range(300)]
    df = spark.createDataFrame(rows, "id long, s string")
    order = [F.asc("s"), F.asc("id")]
    out = global_rank(df, order, num_partitions=16)
    exp = _expected_ranks(rows, key=lambda r: (r[1], r[0]))
    assert all(
        exp[(r["id"], r["s"])] == r["rank"] for r in out.collect()
    )
    census = rank_bucket_census(df, order, num_partitions=16).collect()
    biggest = max(r["rows"] for r in census)
    # bound = one full string's rows (340) — the documented residual:
    # a 12-byte-pinned sub-group is not split further by the 2nd column
    assert biggest <= 1700 // 5 + 60, (
        f"prefix family not split by bytes 7-12: max bucket {biggest}"
    )


def test_short_string_lead_folds_job_b_and_stays_exact(spark):
    """VERDICT r12 #5: a string lead whose values all fit 6 NUL-free
    bytes (the null_semantics status shape) proves every hot tie group
    is ONE exact string from job A alone — construction runs a SINGLE
    aggregation job (job B folded away), sub-boundaries come from the
    speculative global second-column sketch, and ranks stay exact."""
    from m13_sparkstreaming_python_azure_spark.operators import window as W

    # P/O are the hot one-string groups; a few nulls exercise the
    # sentinel route (nulls are never sub-bucketed — keep them small so
    # the balance assertion sees the hot groups, not the null group)
    rows = [
        (
            i,
            None if i % 100 == 0
            else (["P", "O"][i % 2] if i % 10 < 9 else f"k{i % 7}"),
        )
        for i in range(3000)
    ]
    df = spark.createDataFrame(rows, "id long, s string")
    order = [F.asc_nulls_first("s"), F.asc("id")]

    calls = {"n": 0}
    orig = W._plan_items_bounds

    def counting(dfi, items, p):
        import pyspark.sql.classic.dataframe as cd

        orig_first = cd.DataFrame.first

        def first_counted(self, *a, **k):
            calls["n"] += 1
            return orig_first(self, *a, **k)

        cd.DataFrame.first = first_counted
        try:
            return orig(dfi, items, p)
        finally:
            cd.DataFrame.first = orig_first

    W._plan_items_bounds = counting
    try:
        out = global_rank(df, order, num_partitions=16)
        got = out.collect()
    finally:
        W._plan_items_bounds = orig
    assert calls["n"] == 1, (
        f"short-string construction ran {calls['n']} aggregation jobs; "
        "job B should fold into job A"
    )
    exp = _expected_ranks(
        rows, key=lambda r: ((0, "") if r[1] is None else (1, r[1]), r[0])
    )
    assert all(exp[(r["id"], r["s"])] == r["rank"] for r in got)
    # the hot one-string groups must still split (load balance held)
    census = rank_bucket_census(df, order, num_partitions=16).collect()
    biggest = max(r["rows"] for r in census)
    assert biggest <= 4 * 3000 // 16, (
        f"short hot string not split: max bucket {biggest} of 3000"
    )


def test_string_lead_desc_hot_value_exact(spark):
    rows = [(i, "hotkey-shared-prefix") for i in range(850)]
    rows += [(i + 850, f"k{i % 40:03d}") for i in range(150)]
    df = spark.createDataFrame(rows, "id long, s string")
    out = global_rank(
        df, [F.desc("s"), F.desc("id")], num_partitions=16
    )
    order = sorted(rows, key=lambda r: (r[1], r[0]), reverse=True)
    exp = {(r[0], r[1]): i + 1 for i, r in enumerate(order)}
    assert all(
        exp[(r["id"], r["s"])] == r["rank"] for r in out.collect()
    )


def test_far_range_timestamp_declines_subbucket_and_stays_exact(spark):
    """ADVICE r11 (medium): unix_micros beyond ±2^53 merges distinct
    instants in the double surrogate — the magnitude check must refuse
    sub-bucketing there (wrong-order risk), keeping ranks exact via the
    single-bucket tie group."""
    import datetime

    far = datetime.datetime(3000, 1, 1)  # |unix_micros| > 2^53
    rows = [
        (
            i,
            far if i % 10 < 8
            else datetime.datetime(3000, 1, 1 + (i % 10)),
        )
        for i in range(500)
    ]
    df = spark.createDataFrame(rows, "id long, ts timestamp")
    order = [F.asc("ts"), F.asc("id")]
    out = global_rank(df, order, num_partitions=8)
    exp = _expected_ranks(rows, key=lambda r: (r[1], r[0]))
    assert all(
        exp[(r["id"], r["ts"])] == r["rank"] for r in out.collect()
    )
    # the hot far-range group must stay WHOLE (refusal, not a split)
    census = rank_bucket_census(df, order, num_partitions=8).collect()
    assert max(r["rows"] for r in census) >= 400


def test_near_range_timestamp_hot_value_splits(spark):
    import datetime

    base = datetime.datetime(2020, 1, 1)
    rows = [
        (
            i,
            base if i % 10 < 8
            else base + datetime.timedelta(seconds=i % 10),
        )
        for i in range(2000)
    ]
    df = spark.createDataFrame(rows, "id long, ts timestamp")
    order = [F.asc("ts"), F.asc("id")]
    out = global_rank(df, order, num_partitions=16)
    exp = _expected_ranks(rows, key=lambda r: (r[1], r[0]))
    assert all(
        exp[(r["id"], r["ts"])] == r["rank"] for r in out.collect()
    )
    census = rank_bucket_census(df, order, num_partitions=16).collect()
    assert max(r["rows"] for r in census) <= 4 * 2000 // 16


def test_exact_ntile_multi_matches_chained_exact_ntile(spark):
    """VERDICT r11 #3: the batched construction + literal-offset data
    branch must assign bit-identical tiles to chained exact_ntile."""
    from m13_sparkstreaming_python_azure_spark.operators.window import (
        exact_ntile,
        exact_ntile_multi,
    )

    rows = [
        (i, (i * 7) % 13, (i * 31) % 5, (i * 17) % 1000)
        for i in range(3000)
    ]
    df = spark.createDataFrame(rows, "id long, a long, b long, m long")
    specs = [
        [F.desc("a"), F.col("id")],
        [F.col("b"), F.col("id")],
        [F.col("m"), F.col("id")],
    ]
    multi = exact_ntile_multi(
        df, 5, specs, ["ta", "tb", "tm"], num_partitions=16
    )
    chained = exact_ntile(
        df, 5, specs[0], out_col="ta", num_partitions=16,
        materialize=True,
    )
    chained = exact_ntile(
        chained, 5, specs[1], out_col="tb", num_partitions=16,
        materialize=True,
    )
    chained = exact_ntile(
        chained, 5, specs[2], out_col="tm", num_partitions=16,
        materialize=True,
    )
    got = {r["id"]: (r["ta"], r["tb"], r["tm"]) for r in multi.collect()}
    exp = {r["id"]: (r["ta"], r["tb"], r["tm"]) for r in chained.collect()}
    assert got == exp


def test_plan_rank_bounds_precomputed_equals_inline(spark):
    from m13_sparkstreaming_python_azure_spark.operators.window import (
        plan_rank_bounds,
    )

    rows = [(i, float(i % 9), i % 7) for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, x double, y int")
    spec = [F.asc("x"), F.desc("y"), F.asc("id")]
    bounds = plan_rank_bounds(df, [spec], num_partitions=16)[0]
    with_b = global_rank(df, spec, num_partitions=16, bounds=bounds)
    inline = global_rank(df, spec, num_partitions=16)
    got = {r["id"]: r["rank"] for r in with_b.collect()}
    exp = {r["id"]: r["rank"] for r in inline.collect()}
    assert got == exp


def test_bigint_beyond_2_53_declines_subbucket_and_stays_exact(spark):
    big = 2**60
    rows = [(i, big + (i % 3)) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, v long")
    out = global_rank(df, [F.asc("v"), F.asc("id")], num_partitions=8)
    exp = _expected_ranks(rows, key=lambda r: (r[1], r[0]))
    assert all(
        exp[(r["id"], r["v"])] == r["rank"] for r in out.collect()
    )


def test_global_cumsum_hot_leading_value_exact(spark):
    n = 2000
    rows = [
        (i, 7.0 if i % 10 < 8 else float(i % 10), 1) for i in range(n)
    ]
    df = spark.createDataFrame(rows, "id long, score double, one int")
    out = global_cumsum(
        df, ["score", "id"], ["one"], num_partitions=16
    ).collect()
    order = sorted(rows, key=lambda r: (r[1], r[0]))
    exp = {(r[0], r[1]): i + 1 for i, r in enumerate(order)}
    assert all(
        exp[(r["id"], r["score"])] == r["cum_one"] for r in out
    )


def test_p2000_compiles_and_runs(spark):
    """The r10 when-chain crashed with java.lang.StackOverflowError at
    p=2000 during column→expression conversion; the binary search must
    build and run at that width."""
    df = spark.range(5000).select(
        F.col("id"), (F.col("id") % 991 * 1.7).alias("x")
    )
    out = global_rank(df, [F.asc("x"), F.asc("id")], num_partitions=2000)
    assert out.count() == 5000
    got = {r["id"]: r["rank"] for r in out.collect()}
    rows = [(i, (i % 991) * 1.7) for i in range(5000)]
    exp = _expected_ranks(rows, key=lambda r: (r[1], r[0]))
    assert all(got[i] == exp[(i, x)] for i, x in rows)


def test_lead_spec_rejects_expressions(spark):
    with pytest.raises(ValueError, match="lead="):
        _lead_spec(F.upper(F.col("name")).asc())
    c, asc, nf = _lead_spec(F.desc("price"))
    assert asc is False and nf is False


def test_nan_leading_values_rank_last(spark):
    rows = [(0, float("nan")), (1, 5.0), (2, float("nan")), (3, 1.0)]
    df = spark.createDataFrame(rows, "id long, x double")
    out = {
        r["id"]: r["rank"]
        for r in global_rank(
            df, [F.asc("x"), F.asc("id")], num_partitions=4
        ).collect()
    }
    # Spark orders NaN greater than any double
    assert out == {3: 1, 1: 2, 0: 3, 2: 4}


def test_hot_value_above_tree_threshold_struct_search(spark):
    """n > _TREE_MAX boundaries WITH sub-triples exercises the struct
    F.aggregate binary-search regime (the small-p tests compile the
    nested-when tree instead)."""
    n = 3000
    rows = [
        (i, 5.5 if i % 10 < 8 else float(i % 997) * 0.37)
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, "id long, score double")
    out = global_rank(
        df, [F.asc("score"), F.asc("id")], num_partitions=300
    ).collect()
    exp = _expected_ranks(rows, key=lambda r: (r[1], r[0]))
    assert all(exp[(r["id"], r["score"])] == r["rank"] for r in out)
