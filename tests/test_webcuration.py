"""Tests for web-corpus curation (operators/webcuration)."""

from __future__ import annotations

from pyspark.sql import functions as F

from m13_sparkstreaming_python_azure_spark.operators.webcuration import (
    blocklist_filter,
    extract_host,
    normalize_url,
    per_domain_cap,
    registered_domain,
)


def _urls(spark):
    rows = [
        (1, "HTTPS://WWW.Example.COM/a/b/?q=1#frag"),
        (2, "http://cdn.news.example.com:8080/x"),
        (3, "example.com/plain"),
        (4, "https://sub.deep.host.co/path/"),
        (5, "ftp://files.archive.org/f.txt"),
    ]
    return spark.createDataFrame(rows, ["id", "url"])


def test_normalize_url(spark):
    out = dict(
        _urls(spark)
        .select("id", normalize_url(F.col("url")).alias("u"))
        .collect()
    )
    assert out[1] == "www.example.com/a/b"
    assert out[3] == "example.com/plain"
    assert out[5] == "files.archive.org/f.txt"
    # idempotent: normalizing a normalized URL is a no-op
    df = _urls(spark).select(normalize_url(F.col("url")).alias("u"))
    twice = df.select(normalize_url(F.col("u")).alias("u"))
    assert df.collect() == twice.collect()


def test_extract_host_and_domain(spark):
    out = {
        r["id"]: (r["h"], r["d"])
        for r in _urls(spark)
        .select(
            "id",
            extract_host(F.col("url")).alias("h"),
            registered_domain(extract_host(F.col("url"))).alias("d"),
        )
        .collect()
    }
    assert out[1] == ("www.example.com", "example.com")
    assert out[2] == ("cdn.news.example.com", "example.com")  # port stripped
    assert out[3] == ("example.com", "example.com")
    assert out[4] == ("sub.deep.host.co", "host.co")
    assert out[5] == ("files.archive.org", "archive.org")


def test_blocklist_filter_list_and_dataframe(spark):
    df = spark.createDataFrame(
        [(1, "spam.com"), (2, "ok.org"), (3, "bad.net")], ["id", "domain"]
    )
    kept = blocklist_filter(df, "domain", ["spam.com", "bad.net"])
    assert sorted(r["id"] for r in kept.collect()) == [2]
    bl = spark.createDataFrame([("spam.com",)], ["domain"])
    kept2 = blocklist_filter(df, "domain", bl)
    assert sorted(r["id"] for r in kept2.collect()) == [2, 3]


def test_per_domain_cap(spark):
    rows = [(i, "a.com" if i < 8 else "b.com", 100 - i) for i in range(10)]
    df = spark.createDataFrame(rows, ["id", "domain", "score"])
    capped = per_domain_cap(
        df, "domain", [F.col("score").desc(), F.col("id")], cap=3
    )
    got = sorted((r["domain"], r["id"]) for r in capped.collect())
    # a.com best-3 by score desc = ids 0,1,2; b.com has only 2 rows
    assert got == [("a.com", 0), ("a.com", 1), ("a.com", 2), ("b.com", 8), ("b.com", 9)]
