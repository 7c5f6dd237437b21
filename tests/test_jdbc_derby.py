"""End-to-end execution of the JDBC wrapper (VERDICT r7 #5): Apache Derby
ships ON Spark's default classpath (derby-10.16.1.1.jar — Spark uses it
for the embedded Hive metastore), so ``spark.read.jdbc`` can be exercised
for real in this container: write a table through df.write.jdbc, read it
back through ``sources/external.jdbc_reader`` with range partitioning,
and verify partition counts, filter pushdown, and the explicit-predicates
path. The embedded driver runs inside the (single, local-mode) JVM —
exactly the surface a real cluster uses, minus the network."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from m13_sparkstreaming_python_azure_spark.sources.external import (
    jdbc_partition_predicates,
    jdbc_reader,
)

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def derby_url(spark, tmp_path_factory):
    home = tmp_path_factory.mktemp("derby")
    # keep derby.log out of the repo root
    spark._jvm.java.lang.System.setProperty("derby.system.home", str(home))
    url = f"jdbc:derby:{home}/db;create=true"
    src = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    src.write.jdbc(
        url, "t1", mode="overwrite", properties={"driver": DRIVER}
    )
    return url


def test_jdbc_roundtrip_partitioned(spark, derby_url):
    got = jdbc_reader(
        spark,
        derby_url,
        "t1",
        partition_column="k",
        lower_bound=0,
        upper_bound=99,
        num_partitions=4,
        properties={"driver": DRIVER},
    ).load()
    assert got.rdd.getNumPartitions() == 4
    rows = sorted((r[0], r[1]) for r in got.collect())
    assert rows == [(i, 2 * i) for i in range(100)]


def test_jdbc_unpartitioned_single_connection(spark, derby_url):
    got = jdbc_reader(
        spark, derby_url, "t1", properties={"driver": DRIVER}
    ).load()
    assert got.rdd.getNumPartitions() == 1  # the documented naive shape
    assert got.count() == 100


def test_jdbc_filter_pushdown(spark, derby_url):
    got = (
        jdbc_reader(
            spark,
            derby_url,
            "t1",
            partition_column="k",
            lower_bound=0,
            upper_bound=99,
            num_partitions=4,
            properties={"driver": DRIVER},
        )
        .load()
        .filter(F.col("k") < 10)
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "k" in plan.lower()
    assert got.count() == 10


def test_jdbc_explicit_predicates(spark, derby_url):
    # the helper takes the column as SQL text — quote it for dialects
    # (Derby) that fold unquoted identifiers to uppercase
    preds = jdbc_partition_predicates('"k"', 0, 99, 3)
    got = spark.read.jdbc(
        url=derby_url,
        table="t1",
        predicates=preds,
        properties={"driver": DRIVER},
    )
    assert got.rdd.getNumPartitions() == 3
    # predicates are disjoint + covering: exact row parity, no dup/loss
    assert got.count() == 100
    assert got.select(F.sum("v")).collect()[0][0] == sum(2 * i for i in range(100))
