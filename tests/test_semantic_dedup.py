"""Tests for SemDeDup cluster-then-prune (operators/similarity)."""

from __future__ import annotations

from m13_sparkstreaming_python_azure_spark.operators.similarity import (
    semantic_dedup,
)


def _vecs(spark, rows):
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_near_duplicate_dropped_senior_kept(spark):
    base = [1.0, 0.0, 0.0, 0.0]
    near = [0.999, 0.01, 0.0, 0.0]
    far = [0.0, 1.0, 0.0, 0.0]
    df = _vecs(spark, [(0, base), (1, far), (5, near)])
    out = {r["vec_id"]: r["kept"] for r in
           semantic_dedup(df, k=2, iterations=1, threshold=0.95).collect()}
    assert out[0] is True      # senior copy survives
    assert out[5] is False     # its near-dup is dropped
    assert out[1] is True      # orthogonal vector untouched


def test_all_kept_without_near_dups(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0, 0.0]),
        (2, [0.0, 0.0, 1.0, 0.0]),
        (3, [0.0, 0.0, 0.0, 1.0]),
    ]
    out = semantic_dedup(_vecs(spark, rows), k=2, iterations=1, threshold=0.95)
    assert all(r["kept"] for r in out.collect())
    assert out.count() == 4


def test_threshold_controls_pruning(spark):
    a = [1.0, 0.0]
    b = [0.9, 0.436]  # cosine ~0.9 to a
    df = _vecs(spark, [(0, a), (1, b)])
    strict = semantic_dedup(df, k=1, iterations=1, threshold=0.95)
    loose = semantic_dedup(df, k=1, iterations=1, threshold=0.85)
    assert all(r["kept"] for r in strict.collect())
    assert sum(not r["kept"] for r in loose.collect()) == 1
