"""Round-7 operators: Gopher rules, C4 line predicate, URL
canonicalization, boolean retrieval."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from m13_sparkstreaming_python_azure_spark.operators.retrieval import (
    boolean_search,
)
from m13_sparkstreaming_python_azure_spark.operators.text import (
    c4_keep_line,
    gopher_rules,
)
from m13_sparkstreaming_python_azure_spark.operators.webcuration import (
    canonicalize_url,
)


def test_gopher_rules_flags(spark):
    long_good = "the quick brown fox and the lazy dog " * 8  # 64 words
    docs = spark.createDataFrame(
        [
            (1, "s", long_good),
            (2, "s", "too short to pass the word count rule"),
            # 64 good words + 8 symbol words = 72 total; 80 > 72 → >10%
            (3, "s", long_good + " ### ### ### ### ### ### ### ###"),
            (4, "s", long_good + (" a" * 80)),  # mean length < 3
            (5, "s", ("zzz " * 60) + "qqq"),  # no stopwords
        ],
        "doc_id long, source string, text string",
    )
    r = {x["doc_id"]: x for x in gopher_rules(docs).collect()}
    assert r[1]["pass_all"]
    assert not r[2]["pass_word_count"] and r[2]["pass_mean_len"]
    assert not r[3]["pass_symbols"] and r[3]["pass_word_count"]
    assert not r[4]["pass_mean_len"]
    assert not r[5]["pass_stopwords"]


def test_c4_keep_line_rules(spark):
    lines = [
        (1, "this line ends with a period."),
        (2, "no terminal punctuation here"),
        (3, "short one."),  # < 3 words... actually 2 words
        (4, "enable javascript to view this page."),
        (5, 'a quoted ending works too"'),
    ]
    df = spark.createDataFrame(lines, "id long, line string")
    got = {
        r["id"]: r["keep"]
        for r in df.select("id", c4_keep_line(F.col("line")).alias("keep"))
        .collect()
    }
    assert got == {1: True, 2: False, 3: False, 4: False, 5: True}


@pytest.mark.parametrize(
    "url,want",
    [
        (
            "HTTPS://WWW.Example.COM:443/a/b/?utm_source=x&id=3#frag",
            "www.example.com/a/b?id=3",
        ),
        ("http://host:8080/p?b=2&a=1&fbclid=zz", "host:8080/p?a=1&b=2"),
        ("http://host.com", "host.com"),
        ("host.com/path/", "host.com/path"),  # scheme-less
        ("http://h.io/?utm_a=1&utm_b=2", "h.io"),  # all params stripped
    ],
)
def test_canonicalize_url(spark, url, want):
    got = (
        spark.range(1)
        .select(canonicalize_url(F.lit(url)).alias("c"))
        .collect()[0]["c"]
    )
    assert got == want, f"{url} -> {got}, want {want}"


def test_boolean_search_dnf(spark):
    docs = spark.createDataFrame(
        [
            (1, "spark window functions"),        # clause 0
            (2, "spark window merge conflict"),   # excluded by NOT merge
            (3, "hash join strategies"),          # clause 1
            (4, "spark window hash join"),        # both → lowest clause 0
            (5, "nothing relevant"),
        ],
        "doc_id long, text string",
    )
    clauses = [
        {"all": ["spark", "window"], "none": ["merge"]},
        {"all": ["hash", "join"]},
    ]
    got = {
        r["doc_id"]: r["clause"]
        for r in boolean_search(docs, clauses).collect()
    }
    assert got == {1: 0, 3: 1, 4: 0}
    with pytest.raises(ValueError):
        boolean_search(docs, [{"all": []}])


def test_winnowing_guarantee_shared_run_yields_shared_fingerprint(spark):
    from m13_sparkstreaming_python_azure_spark.operators.spans import (
        winnowing_fingerprints,
        winnowing_matches,
    )

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    docs = spark.createDataFrame(
        [
            (1, "xx yy " + shared + " zz ww"),
            (2, "completely different prefix then " + shared),
            (3, "nothing in common with the others at all here ok"),
        ],
        "doc_id long, text string",
    )
    fps = winnowing_fingerprints(docs, "doc_id", k=5, w=4)
    # k+w-1 = 8 shared tokens → the guarantee applies to docs 1 and 2
    pairs = {
        (r["id_a"], r["id_b"])
        for r in winnowing_matches(fps, "doc_id", min_shared=1).collect()
    }
    assert (1, 2) in pairs
    assert not any(3 in p for p in pairs)
    # density: ~2/(w+1) of grams selected — must be well below all grams
    n_grams = 8 + 2 + 2 - 4  # doc1 token count - k + 1
    n_sel = fps.filter("doc_id = 1").count()
    assert 0 < n_sel < n_grams


def test_winnowing_selection_is_deterministic(spark):
    from m13_sparkstreaming_python_azure_spark.operators.spans import (
        winnowing_fingerprints,
    )

    docs = spark.createDataFrame(
        [(i, f"w{i} " + "a b c d e f g h i j k l m n") for i in range(20)],
        "doc_id long, text string",
    ).repartition(7)
    a = sorted(map(tuple, winnowing_fingerprints(docs, "doc_id").collect()))
    b = sorted(
        map(
            tuple,
            winnowing_fingerprints(docs.repartition(3), "doc_id").collect(),
        )
    )
    assert a == b  # partition-layout independent


def test_negative_sampling_census(spark):
    from m13_sparkstreaming_python_azure_spark.operators.sampling import (
        negative_sampling,
    )

    # one dominant token and two rare ones: draws should concentrate on
    # the dominant token but the ^0.75 flattening keeps rare ones alive
    docs = spark.createDataFrame(
        [(0, ("big " * 900) + "rare1 rare2")], "doc_id long, text string"
    )
    got = {
        r["token"]: r["n_draws"]
        for r in negative_sampling(docs, 2000, salt="t").collect()
    }
    assert sum(got.values()) == 2000
    assert got["big"] > got.get("rare1", 0) > 0
    # unigram^0.75: P(big) = 900^.75/(900^.75+2) ≈ 0.988 — rare tokens
    # together should land well above the raw-unigram expectation (~4.4)
    assert 5 <= 2000 - got["big"] <= 60
    # salt redraws
    got2 = {
        r["token"]: r["n_draws"]
        for r in negative_sampling(docs, 2000, salt="u").collect()
    }
    assert got2 != got and sum(got2.values()) == 2000


def test_triangle_clustering_known_graph(spark):
    from m13_sparkstreaming_python_azure_spark.operators.graph import (
        triangle_clustering,
    )

    # K4 on {1,2,3,4} plus a pendant node 5: every K4 node is in C(3,2)=3
    # triangles with clustering 1.0; the pendant has none
    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    edges = spark.createDataFrame(
        k4 + [(4, 5), (5, 4)], "src long, dst long"  # duplicate direction
    )
    got = {
        r["node"]: (r["degree"], r["n_triangles"], r["clustering"])
        for r in triangle_clustering(edges).collect()
    }
    assert got[1] == (3, 3, 1.0) and got[2] == (3, 3, 1.0)
    assert got[3] == (3, 3, 1.0)
    assert got[4][0] == 4 and got[4][1] == 3  # K4 triangles only
    assert abs(got[4][2] - 0.5) < 1e-12  # 2*3/(4*3)
    assert got[5] == (1, 0, 0.0)


def test_triangle_clustering_matches_id_ordered_counts(spark):
    from pyspark.sql import functions as F

    from m13_sparkstreaming_python_azure_spark.operators.graph import (
        triangle_clustering,
        triangle_counts,
    )

    # chain + chord graph: a triangle at every consecutive triple
    n = 60
    base = spark.range(n)
    edges = base.filter("id >= 1").select(
        F.col("id").alias("src"), (F.col("id") - 1).alias("dst")
    ).unionByName(
        base.filter("id >= 2").select(
            F.col("id").alias("src"), (F.col("id") - 2).alias("dst")
        )
    )
    a = {
        r["node"]: r["n_triangles"]
        for r in triangle_clustering(edges).collect()
    }
    b = {
        r["node"]: r["n_triangles"]
        for r in triangle_counts(edges, "src", "dst").collect()
    }
    assert a == b  # degree-ordered and id-ordered enumerations agree


def test_k_truss_drops_bridges_keeps_cliques(spark):
    from m13_sparkstreaming_python_azure_spark.operators.graph import k_truss

    # two K4 cliques {1..4} and {11..14} joined by the bridge 4—11:
    # every clique edge sits in 2 triangles (4-truss); the bridge in none
    k4a = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    k4b = [(a, b) for a in range(11, 15) for b in range(a + 1, 15)]
    edges = spark.createDataFrame(
        k4a + k4b + [(4, 11)], "src long, dst long"
    )
    got = {
        (r["a"], r["b"]): r["support"]
        for r in k_truss(edges, k=4, rounds=4).collect()
    }
    assert set(got) == set(k4a) | set(k4b)
    assert all(v == 2 for v in got.values())
    # k=5 needs support >= 3: a K4 can't provide it — everything peels
    from m13_sparkstreaming_python_azure_spark.operators.graph import (
        k_truss as kt,
    )

    assert kt(edges, k=5, rounds=4).count() == 0
    import pytest as _pytest

    with _pytest.raises(ValueError):
        kt(edges, k=2)


def test_trailing_distinct_users_window(spark, sf_dir):
    from m13_sparkstreaming_python_azure_spark.queries.round7_ext import (
        q_trailing_distinct_users,
    )

    rows = {r["day"]: r["n_active_7d"] for r in
            q_trailing_distinct_users(spark, sf_dir).collect()}
    assert rows
    # trailing-7 >= the single busiest day it covers, and is monotone vs
    # the per-day distinct count on every day
    from m13_sparkstreaming_python_azure_spark.catalog import load_table
    from pyspark.sql import functions as F

    per_day = {
        r["day"]: r["n"]
        for r in load_table(spark, sf_dir, "events")
        .select(
            F.floor(
                F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000
            ).cast("long").alias("day"),
            "user_id",
        )
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for day, n7 in rows.items():
        assert n7 >= per_day.get(day, 0)
