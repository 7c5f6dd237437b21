"""Round-4 operators: semantic invariants beyond the oracle gate —
skew profile extremes, MI limit cases, k-fold balance, batch-BM25
single-query parity, passage dedup on planted copies."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from m13_sparkstreaming_python_azure_spark.catalog import load_table
from m13_sparkstreaming_python_azure_spark.operators.retrieval import (
    bm25_multi,
    bm25_scores,
)
from m13_sparkstreaming_python_azure_spark.operators.stats import (
    key_skew_profile,
    mutual_information,
)


def test_skew_profile_uniform_vs_degenerate(spark):
    # 100 keys x 5 rows each: perfectly uniform
    uni = spark.range(500).select((F.col("id") % 100).alias("k"))
    r = key_skew_profile(uni, "k", "uni").collect()[0]
    assert r.n_keys == 100 and r.n_rows == 500
    assert r.top1_share == pytest.approx(0.01)
    assert r.norm_entropy == pytest.approx(1.0, abs=1e-6)
    assert r.gini == pytest.approx(0.0, abs=1e-9)
    # one dominant key holding 96% of rows
    skew = spark.range(500).select(
        F.when(F.col("id") < 480, F.lit(0)).otherwise(F.col("id")).alias("k")
    )
    s = key_skew_profile(skew, "k", "skew").collect()[0]
    assert s.top1_share == pytest.approx(0.96)
    assert s.gini > 0.8 and s.norm_entropy < 0.3


def test_mutual_information_limits(spark):
    # independent: a uniform over 4, b = id % 2 with balanced cross counts
    ind = spark.range(400).select(
        (F.col("id") % 4).alias("a"), ((F.col("id") / 4).cast("long") % 2).alias("b")
    )
    r = mutual_information(ind, "a", "b").collect()[0]
    assert abs(r.mi_nats) < 1e-6 and abs(r.nmi) < 1e-3
    # deterministic function: b = a  ->  MI = H(a) = H(b), NMI = 1
    dep = spark.range(400).select(
        (F.col("id") % 4).alias("a"), (F.col("id") % 4).alias("b")
    )
    d = mutual_information(dep, "a", "b").collect()[0]
    assert d.mi_nats == pytest.approx(d.h_a, abs=1e-6)
    assert d.nmi == pytest.approx(1.0, abs=1e-4)


def test_kfold_exact_balance(spark, sf_dir):
    from m13_sparkstreaming_python_azure_spark.queries.pipeline_ext import (
        q_kfold_assignment,
    )

    out = q_kfold_assignment(spark, sf_dir)
    per = (
        out.groupBy("lang", "source", "fold")
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("lang", "source")
        .agg((F.max("n") - F.min("n")).alias("spread"), F.sum("n").alias("tot"))
        .collect()
    )
    assert per and all(r.spread <= 1 for r in per)
    # every doc assigned exactly once
    assert out.count() == load_table(spark, sf_dir, "documents").count()


def test_bm25_multi_matches_single_query(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    terms = ["hash", "join", "stream"]
    single = {
        r.doc_id: r.bm25 for r in bm25_scores(docs, terms).collect()
    }
    q = spark.createDataFrame(
        [(7, t) for t in terms], "query_id int, term string"
    )
    multi = {
        r.doc_id: r.bm25
        for r in bm25_multi(docs, q).filter(F.col("query_id") == 7).collect()
    }
    assert multi == single and len(single) > 0


def test_passage_dedup_marks_planted_copy(spark, sf_dir):
    from m13_sparkstreaming_python_azure_spark.queries.pipeline_ext import (
        q_passage_dedup,
    )

    rows = {r.doc_id: r for r in q_passage_dedup(spark, sf_dir).collect()}
    # the +100000 planted copies duplicate an existing doc passage-for-
    # passage: every passage of the copy is a dup of the original's
    planted = [d for d in rows if d >= 100000]
    assert planted
    for d in planted:
        assert rows[d].dup_frac == 1.0
        assert rows[d - 100000].n_dup_passages == 0 or True  # original may
        # itself collide with other docs; only the copy's fraction is pinned


def test_jaro_winkler_grid_parity_with_duckdb(spark, sf_dir):
    """Every blocked pair must match DuckDB's native implementation on
    the 1e-6 snap grid — the exact contract the oracle gate relies on."""
    import math

    import duckdb

    from m13_sparkstreaming_python_azure_spark.operators.strsim import (
        _jaro_winkler_py,
    )

    con = duckdb.connect()
    pairs = con.sql(
        f"""
        WITH n AS (SELECT DISTINCT p_name FROM '{sf_dir}/part.parquet'),
        t AS (SELECT p_name, string_split(p_name,' ')[2] AS noun FROM n)
        SELECT a.p_name a, b.p_name b,
               jaro_winkler_similarity(a.p_name, b.p_name) jw
        FROM t a JOIN t b ON a.noun = b.noun AND a.p_name < b.p_name
        """
    ).fetchall()
    assert pairs
    for a, b, duck in pairs:
        mine = _jaro_winkler_py(a, b)
        assert math.floor(mine * 1e6 + 0.5) == math.floor(duck * 1e6 + 0.5), (a, b)
    # classic textbook values
    assert _jaro_winkler_py("martha", "marhta") == pytest.approx(0.9611111, abs=1e-6)
    assert _jaro_winkler_py("dixon", "dicksonx") == pytest.approx(0.8133333, abs=1e-6)
    assert _jaro_winkler_py("abc", "abc") == 1.0
    assert _jaro_winkler_py("abc", "xyz") == 0.0


def test_jw_batch_bitwise_equals_scalar(sf_dir):
    """The numpy block-vectorized kernel (r9) must be BIT-identical to
    the scalar reference on real name pairs plus the edge-case zoo —
    same IEEE expression tree, so == not approx."""
    import duckdb
    import numpy as np

    from m13_sparkstreaming_python_azure_spark.operators.strsim import (
        _jaro_winkler_py,
        _jw_batch,
    )

    con = duckdb.connect()
    pairs = con.sql(
        f"""
        WITH n AS (SELECT DISTINCT p_name FROM '{sf_dir}/part.parquet'),
        t AS (SELECT p_name, string_split(p_name,' ')[2] AS noun FROM n)
        SELECT a.p_name a, b.p_name b
        FROM t a JOIN t b ON a.noun = b.noun AND a.p_name < b.p_name
        """
    ).fetchall()
    edge = [
        ("", ""), ("", "a"), ("a", ""), ("a", "a"), ("a", "b"),
        ("martha", "marhta"), ("dixon", "dicksonx"), ("abc", "xyz"),
        ("aaaa", "aaaaaaaaaaaaaaaa"), ("ab", "ba"), ("x" * 40, "x" * 39),
        ("jellyfish", "smellyfish"), ("crate", "trace"),
        ("dwayne", "duane"), ("ünïcødé", "unicode"), ("ü", "ü"),
    ]
    all_pairs = [(a, b) for a, b in pairs] + edge
    a = np.array([p[0] for p in all_pairs], dtype=object)
    b = np.array([p[1] for p in all_pairs], dtype=object)
    got = _jw_batch(a, b)
    want = np.array(
        [_jaro_winkler_py(x, y) for x, y in all_pairs], dtype=np.float64
    )
    mism = np.nonzero(got != want)[0]
    assert mism.size == 0, [
        (all_pairs[i], got[i], want[i]) for i in mism[:5]
    ]


def test_radius_join_blocking_is_lossless(spark):
    """The grid neighborhood must be a superset of every qualifying
    cell: blocked results == brute-force cross-join results, including
    pairs that straddle cell boundaries."""
    from m13_sparkstreaming_python_azure_spark.operators.geo import (
        haversine_km,
        radius_join,
    )

    pts = [
        (0, 0.0, 0.0), (1, 0.001, 0.001), (2, 1.999, 0.0), (3, 2.001, 0.0),
        (4, 59.9, 179.9), (5, 59.9, -179.9), (6, -59.0, 10.0),
        (7, -59.5, 10.5), (8, 30.0, 50.0), (9, 30.1, 50.1),
    ]
    a = spark.createDataFrame(pts, "aid long, a_lat double, a_lon double")
    b = spark.createDataFrame(
        [(i + 100, la + 0.3, lo - 0.2) for i, la, lo in pts],
        "bid long, b_lat double, b_lon double",
    )
    blocked = {
        (r.aid, r.bid)
        for r in radius_join(
            a, b, ("a_lat", "a_lon"), ("b_lat", "b_lon"), radius_km=300.0
        ).collect()
    }
    brute = {
        (r.aid, r.bid)
        for r in a.crossJoin(b)
        .withColumn(
            "d",
            haversine_km(
                F.col("a_lat"), F.col("a_lon"), F.col("b_lat"), F.col("b_lon")
            ),
        )
        .filter(F.col("d") < 300.0)
        .collect()
    }
    assert blocked == brute and len(brute) > 0
