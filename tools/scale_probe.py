"""Scale probes: time selected operators at 1× and 10× replicated input
and report the time ratio — the local proxy for "does the plan's cost
track input size or output size?" (a super-linear ratio flags a shape
that won't survive 100 TB).

Replication perturbs identifiers so keyed operators see genuinely larger
domains (10× users, 10× docs), and perturbs text so near-dup/contamination
probes face the adversarial almost-duplicate case rather than exact
copies.

Usage: python tools/scale_probe.py [sf_dir] [replicas]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from m13_sparkstreaming_python_azure_spark.catalog import load_table
from m13_sparkstreaming_python_azure_spark.session import get_spark


def replicate(df: DataFrame, id_col: str, n: int, id_stride: int) -> DataFrame:
    parts = [
        df.withColumn(id_col, F.col(id_col) + F.lit(i * id_stride))
        for i in range(n)
    ]
    r = parts[0]
    for p in parts[1:]:
        r = r.unionByName(p)
    return r


def timed(fn) -> tuple[float, int]:
    t0 = time.perf_counter()
    n = fn()
    return round(time.perf_counter() - t0, 2), n


def main(sf_dir: str = "/root/testdata/sf0.1", replicas: int = 10) -> None:
    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    ev1 = load_table(spark, sf_dir, "events")
    evN = replicate(ev1, "user_id", replicas, 1_000_000)
    docs1 = load_table(spark, sf_dir, "documents")
    docsN = replicate(docs1, "doc_id", replicas, 1_000_000).withColumn(
        "text",
        F.concat(F.col("text"), F.lit(" rep"), (F.col("doc_id") / 1_000_000).cast("int").cast("string")),
    )

    from m13_sparkstreaming_python_azure_spark.operators.dedup import (
        contamination_stats,
    )
    from m13_sparkstreaming_python_azure_spark.operators.histogram import (
        build_histogram,
        histogram_quantiles,
        merge_histograms,
    )
    from m13_sparkstreaming_python_azure_spark.queries.behavior import sessionize

    def probe_sessionize(ev):
        def _run():
            return (
                sessionize(ev)
                .groupBy("user_id", "session_id")
                .count()
                .count()
            )
        return _run

    def probe_histogram(ev):
        def _run():
            h = merge_histograms(
                build_histogram(
                    ev.withColumn("d", F.to_date("ts")),
                    "value", ["event_type", "d"], 0.0, 500.0, 100,
                ),
                ["event_type"],
            )
            return histogram_quantiles(
                h, ["event_type"], [0.5, 0.99], 0.0, 500.0, 100
            ).count()
        return _run

    def probe_contamination(docs):
        def _run():
            bench = docs.filter(F.col("doc_id") % 97 == 0)
            return contamination_stats(docs, bench, n=5).count()
        return _run

    emb1 = load_table(spark, sf_dir, "embeddings")
    embN = replicate(emb1, "vec_id", replicas, 1_000_000)
    li1 = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    # replicate orders (not suppliers): the semi/anti self-joins shuffle
    # on l_orderkey, so a 10× order domain is the scale axis that matters
    liN = replicate(li1, "l_orderkey", replicas, 100_000_000)

    def probe_kmeans(emb):
        def _run():
            from m13_sparkstreaming_python_azure_spark.operators.clustering import (
                kmeans_assignments,
            )

            return kmeans_assignments(emb, k=4, iterations=2).count()
        return _run

    def probe_late_semi_anti(li):
        # the waiting_suppliers shape: late lines ⋉ other-supplier lines
        # ⋉̸ other-supplier late lines, all shuffled on l_orderkey
        def _run():
            late = li.filter(
                F.dayofmonth("l_shipdate") <= 10
            ).select("l_orderkey", "l_suppkey")
            others = li.select(
                F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2")
            )
            late_others = late.select(
                F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("s3")
            )
            kept = late.join(
                others,
                (F.col("l_orderkey") == F.col("k2"))
                & (F.col("l_suppkey") != F.col("s2")),
                "left_semi",
            ).join(
                late_others,
                (F.col("l_orderkey") == F.col("k3"))
                & (F.col("l_suppkey") != F.col("s3")),
                "left_anti",
            )
            return kept.groupBy("l_suppkey").count().count()
        return _run


    def probe_repetition(docs):
        # scan-shaped: per-row array HOFs, no shuffle — ratio should track
        # input size only
        def _run():
            from m13_sparkstreaming_python_azure_spark.operators.text import (
                with_repetition_stats,
            )

            return (
                with_repetition_stats(docs)
                .filter(F.col("dup_word_frac") > 0.5)
                .count()
            )
        return _run

    ps1 = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    psN = replicate(ps1, "l_partkey", replicas, 100_000_000)

    def probe_partsupp_mincost(li):
        # the Q2 shape: one l_partkey shuffle serves the (partkey, suppkey)
        # aggregate AND the per-part window min
        def _run():
            from pyspark.sql import Window

            ps = (
                li.repartition("l_partkey")
                .groupBy("l_partkey", "l_suppkey")
                .agg(F.min("l_extendedprice").alias("c"))
            )
            w = Window.partitionBy("l_partkey")
            return (
                ps.withColumn("m", F.min("c").over(w))
                .filter(F.col("c") == F.col("m"))
                .count()
            )
        return _run

    probes = [
        ("sessionize+agg", probe_sessionize(ev1), probe_sessionize(evN)),
        ("histogram sketch e2e", probe_histogram(ev1), probe_histogram(evN)),
        ("contamination", probe_contamination(docs1), probe_contamination(docsN)),
        ("kmeans 2-pass", probe_kmeans(emb1), probe_kmeans(embN)),
        ("late semi+anti self-join", probe_late_semi_anti(li1), probe_late_semi_anti(liN)),
        ("repetition stats (scan)", probe_repetition(docs1), probe_repetition(docsN)),
        ("partsupp min-cost window", probe_partsupp_mincost(ps1), probe_partsupp_mincost(psN)),
    ]
    # warm up
    ev1.count(); docs1.count()
    print(f"{'probe':>22} | {'t_1x':>7} | {'rows_1x':>9} | {'t_Nx':>7} | {'rows_Nx':>9} | ratio")
    for name, p1, pN in probes:
        t1, n1 = timed(p1)
        tN, nN = timed(pN)
        print(
            f"{name:>22} | {t1:>6.2f}s | {n1:>9} | {tN:>6.2f}s | {nN:>9} |"
            f" {tN / max(t1, 0.01):.1f}x"
        )
    spark.stop()


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    main(sf, n)
