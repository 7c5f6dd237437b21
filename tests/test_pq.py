"""Product quantization (operators/similarity): deterministic codebooks
and codes across partition layouts, bounded reconstruction error, and
ADC top-k recall against the exact L2 ranking."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from m13_sparkstreaming_python_azure_spark.catalog import load_table
from m13_sparkstreaming_python_azure_spark.operators import similarity as sim


def _emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )


def test_pq_codes_layout_independent(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    books = sim.train_pq_codebooks(emb, m=8, k=16, sample_size=400, seed=3)
    alt = sim.train_pq_codebooks(
        emb.repartition(32), m=8, k=16, sample_size=400, seed=3
    )
    assert np.allclose(books, alt)
    c1 = {
        r.vec_id: tuple(r.pq_code)
        for r in sim.pq_encode(emb.coalesce(1), books).collect()
    }
    c2 = {
        r.vec_id: tuple(r.pq_code)
        for r in sim.pq_encode(emb.repartition(7, "vec_id"), books).collect()
    }
    assert c1 == c2
    assert all(len(v) == 8 and max(v) < 16 for v in c1.values())


def test_pq_reconstruction_beats_zero_codebook(spark, sf_dir):
    """Quantizing to the nearest centroid must reconstruct far better
    than collapsing to the origin: MSE(PQ) << mean squared norm."""
    emb = _emb(spark, sf_dir)
    books = sim.train_pq_codebooks(emb, m=16, k=16, sample_size=400, seed=3)
    rows = sim.pq_encode(emb, books).join(emb, "vec_id").collect()
    m, _, sub = books.shape
    errs, norms = [], []
    for r in rows:
        v = np.asarray(r.embedding)
        rec = np.concatenate([books[j][r.pq_code[j]] for j in range(m)])
        errs.append(((v - rec) ** 2).sum())
        norms.append((v ** 2).sum())
    assert np.mean(errs) < 0.45 * np.mean(norms)


def test_pq_adc_and_rerank_recall_vs_exact_l2(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    books = sim.train_pq_codebooks(emb, m=16, k=64, sample_size=400, seed=3)
    codes = sim.pq_encode(emb, books).persist()
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    adc = {}
    for r in sim.pq_adc_topk(codes, queries, books, k=10).collect():
        adc.setdefault(r.query_id, set()).add(r.neighbor_id)
    rr = {}
    for r in sim.pq_shortlist_rerank(
        codes, emb, queries, books, k=10, shortlist=100
    ).collect():
        rr.setdefault(r.query_id, set()).add(r.neighbor_id)

    vecs = {r.vec_id: np.asarray(r.embedding) for r in emb.collect()}
    ids = sorted(vecs)
    mat = np.stack([vecs[i] for i in ids])
    adc_recalls, rr_recalls = [], []
    for q in range(10):
        d = ((mat - vecs[q]) ** 2).sum(axis=1)
        order = np.lexsort((ids, d))
        exact = {ids[i] for i in order[:10]}
        adc_recalls.append(len(exact & adc[q]) / 10)
        rr_recalls.append(len(exact & rr[q]) / 10)
    # raw ADC is the cheap shortlist stage; rerank is the answer quality
    assert np.mean(adc_recalls) >= 0.45, adc_recalls
    assert np.mean(rr_recalls) >= 0.9, rr_recalls
    # the query's own vector is its 0-distance neighbor — ADC must keep it
    assert all(q in adc[q] for q in range(10))


def test_ivfpq_recall_and_determinism(spark, sf_dir):
    """IVF-PQ (residual-encoded, nprobe cells, ADC shortlist + exact
    rerank): recall@10 against exact L2 must be high even though the
    candidate pass touches only probed cells' codes; training and
    encoding are layout-independent."""
    emb = _emb(spark, sf_dir)
    cent, books = sim.train_ivfpq(
        emb, n_cells=8, m=16, kq=16, sample_size=400, seed=3
    )
    cent2, books2 = sim.train_ivfpq(
        emb.repartition(17), n_cells=8, m=16, kq=16, sample_size=400, seed=3
    )
    assert np.allclose(cent, cent2) and np.allclose(books, books2)

    index = sim.ivfpq_encode(emb, cent, books).persist()
    assert index.filter(F.col("cell") < 0).count() == 0
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = {}
    for r in sim.ivfpq_topk(
        index, emb, queries, cent, books, k=10, nprobe=4, shortlist=100
    ).collect():
        got.setdefault(r.query_id, set()).add(r.neighbor_id)

    vecs = {r.vec_id: np.asarray(r.embedding) for r in emb.collect()}
    ids = sorted(vecs)
    mat = np.stack([vecs[i] for i in ids])
    recalls = []
    for q in range(10):
        d = ((mat - vecs[q]) ** 2).sum(axis=1)
        order = np.lexsort((ids, d))
        exact = {ids[i] for i in order[:10]}
        recalls.append(len(exact & got[q]) / 10)
    # nprobe=4 of 8 cells: neighbors outside probed cells are honest
    # misses, everything inside should survive the residual-ADC shortlist
    assert np.mean(recalls) >= 0.7, recalls
    assert all(q in got[q] for q in range(10))
