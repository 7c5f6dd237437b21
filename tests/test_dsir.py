"""Tests for DSIR importance scoring/resampling (operators/lm)."""

from __future__ import annotations

from pyspark.sql import functions as F

from m13_sparkstreaming_python_azure_spark.operators.lm import (
    dsir_resample,
    importance_scores,
    train_unigram_model,
)


def _corpus(spark):
    # two vocab regimes: "science" docs vs "sports" docs
    sci = [(i, "quantum field theory entropy boson lattice", "sci") for i in range(10)]
    spo = [(i + 10, "goal match striker penalty referee season", "spo") for i in range(10)]
    return spark.createDataFrame(sci + spo, ["doc_id", "text", "kind"])


def test_importance_ranks_target_like_docs_higher(spark):
    docs = _corpus(spark)
    tgt = train_unigram_model(docs.filter(F.col("kind") == "sci"))
    bg = train_unigram_model(docs)
    scores = {
        r["doc_id"]: r["importance"]
        for r in importance_scores(docs, tgt, bg).collect()
    }
    sci_mean = sum(scores[i] for i in range(10)) / 10
    spo_mean = sum(scores[i + 10] for i in range(10)) / 10
    assert sci_mean > spo_mean
    assert all(scores[i] > scores[j + 10] for i in range(10) for j in range(10))


def test_dsir_selects_mostly_target_like(spark):
    docs = _corpus(spark)
    target = docs.filter(F.col("kind") == "sci")
    out = dsir_resample(docs, target, docs, k=8)
    rows = out.collect()
    assert len(rows) == 8
    kinds = (
        docs.join(out.select("doc_id"), "doc_id")
        .groupBy("kind")
        .count()
        .collect()
    )
    by_kind = {r["kind"]: r["count"] for r in kinds}
    # exp(importance) strongly favors sci docs
    assert by_kind.get("sci", 0) > by_kind.get("spo", 0)


def test_dsir_deterministic(spark):
    docs = _corpus(spark)
    target = docs.filter(F.col("kind") == "sci")
    a = sorted(r["doc_id"] for r in dsir_resample(docs, target, docs, k=5).collect())
    b = sorted(r["doc_id"] for r in dsir_resample(docs, target, docs, k=5).collect())
    assert a == b
