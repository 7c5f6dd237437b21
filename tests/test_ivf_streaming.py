"""Streaming-maintained IVF index (operators/similarity.ivf_index_sink /
ivf_probe_snapshot): frozen codebook, exactly-once cell-file appends,
and probe parity with an independent in-memory recomputation."""

from __future__ import annotations

import os
import tempfile

import numpy as np
from pyspark.sql import functions as F

from m13_sparkstreaming_python_azure_spark.operators.similarity import (
    _cell_assign_udf,
    brute_force_topk,
    ivf_index_sink,
    ivf_probe_snapshot,
)
from m13_sparkstreaming_python_azure_spark.catalog import load_table
from m13_sparkstreaming_python_azure_spark.sources.snapshots import (
    read_manifest,
)

SF = "/root/testdata/sf0.001"


def _stream_in(spark, sink, emb, n_chunks=3):
    for i in range(n_chunks):
        sink(emb.filter(F.col("vec_id") % n_chunks == i), i)


def test_streamed_index_probe_matches_recomputation(spark):
    emb = load_table(spark, SF, "embeddings")
    idx = os.path.join(tempfile.mkdtemp(prefix="ivf-s-"), "index")
    sink = ivf_index_sink(idx, n_cells=8, seed=7)
    _stream_in(spark, sink, emb)

    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = {
        (r["query_id"], r["neighbor_id"], r["cosine_sim"], r["rank"])
        for r in ivf_probe_snapshot(
            spark, idx, queries, k=5, nprobe=3
        ).collect()
    }

    # independent recomputation: same frozen codebook, same nprobe cells,
    # exact cosine over exactly those cells' members via brute_force_topk
    cent = np.array(
        [
            r["centroid"]
            for r in spark.read.parquet(idx + "__centroids")
            .orderBy("cell")
            .collect()
        ]
    )
    a1 = _cell_assign_udf(cent, 1)
    a3 = _cell_assign_udf(cent, 3)
    base = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    base_cells = base.withColumn("cell", F.element_at(a1(F.col("v")), 1))
    q_cells = queries.select(
        "query_id", F.col("embedding").cast("array<double>").alias("v")
    ).withColumn("cell", F.explode(a3(F.col("v"))))
    want = set()
    cand = base_cells.join(
        q_cells.select("query_id", "cell").distinct(), on="cell"
    ).select("query_id", "vec_id")
    # per query, brute-force over its candidate set
    for qid in [0, 1, 2, 3, 4]:
        ids = [
            r["vec_id"] for r in cand.filter(F.col("query_id") == qid).collect()
        ]
        sub = emb.filter(F.col("vec_id").isin(ids))
        qdf = queries.filter(F.col("query_id") == qid)
        for r in brute_force_topk(sub, qdf, k=5).collect():
            want.add(
                (r["query_id"], r["neighbor_id"], r["cosine_sim"], r["rank"])
            )
    assert got == want
    # index is complete: every vector landed in exactly one cell
    assert read_manifest(idx)["rows"] == emb.count()


def test_replay_commits_nothing(spark):
    emb = load_table(spark, SF, "embeddings")
    idx = os.path.join(tempfile.mkdtemp(prefix="ivf-r-"), "index")
    sink = ivf_index_sink(idx, n_cells=8, seed=7)
    _stream_in(spark, sink, emb)
    m = read_manifest(idx)
    sink(emb.filter(F.col("vec_id") % 3 == 2), 2)  # crash replay
    m2 = read_manifest(idx)
    assert (m2["version"], m2["rows"]) == (m["version"], m["rows"])


def test_self_query_ranks_first(spark):
    emb = load_table(spark, SF, "embeddings")
    idx = os.path.join(tempfile.mkdtemp(prefix="ivf-q-"), "index")
    sink = ivf_index_sink(idx, n_cells=8, seed=7)
    _stream_in(spark, sink, emb)
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    top1 = {
        r["query_id"]: r["neighbor_id"]
        for r in ivf_probe_snapshot(spark, idx, queries, k=1, nprobe=2)
        .collect()
    }
    # the query vector itself is in the index → cosine 1.0, min-id tiebreak
    assert top1 == {i: i for i in range(8)}


def test_empty_first_batch_skips_without_codebook(spark):
    emb = load_table(spark, SF, "embeddings")
    idx = os.path.join(tempfile.mkdtemp(prefix="ivf-e-"), "index")
    sink = ivf_index_sink(idx, n_cells=8, seed=7)
    sink(emb.filter(F.col("vec_id") < 0), 0)  # empty first batch
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        read_manifest(idx)
    # a later non-empty batch still bootstraps normally
    sink(emb, 1)
    assert read_manifest(idx)["rows"] == emb.count()
