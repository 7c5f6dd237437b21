"""End-to-end LLM training-data pipeline on the documents fixture.

The full curation chain, each stage a first-class engine operator:
  1. text stats + Gopher-style quality & repetition gates (operators/text.py)
  2. exact dedup on normalized content        (operators/dedup.py)
  3. MinHash-LSH near-dup pair removal        (operators/dedup.py)
  4. benchmark decontamination (5-gram hit)   (operators/dedup.py)
  5. unigram-LM perplexity filter             (operators/lm.py)
  6. PII redaction                            (operators/text.py)
  7. heuristic language ID                    (operators/text.py)
  8. temperature mixture rebalance (τ=0.7)    (operators/sampling.py)
  9. overlapping token chunks                 (operators/chunking.py)
 10. deterministic md5 train/val/test split   (operators/chunking.py)
 11. write parquet partitioned by (split)     (sources/files.py)

Every stage is a declarative DataFrame plan: quality/lang/chunk fold into
the scan stage, dedup is one keyed shuffle, near-dup cost tracks LSH
collisions — the same plan shapes hold at 100 TB with more partitions.

Run: python examples/training_data_pipeline.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from m13_sparkstreaming_python_azure_spark.catalog import load_table
from m13_sparkstreaming_python_azure_spark.operators.chunking import (
    chunk_documents,
    hash_split,
)
from m13_sparkstreaming_python_azure_spark.operators.dedup import (
    contamination_stats,
    exact_dedup,
    minhash_lsh_pairs,
)
from m13_sparkstreaming_python_azure_spark.operators.text import (
    redact_pii,
    with_lang_id,
    with_quality_score,
    with_repetition_stats,
)
from m13_sparkstreaming_python_azure_spark.session import get_spark


def run(spark, sf_dir: str, out_dir: str) -> dict[str, int]:
    docs = load_table(spark, sf_dir, "documents")
    n_raw = docs.count()

    kept = with_quality_score(docs).filter(F.col("quality_keep")).select(
        "doc_id", "text"
    )
    # repetition gate (Gopher): drop docs dominated by one repeated n-gram
    # or with heavy duplicate-word mass — both quality filters fold into
    # the same scan stage (no extra pass over the corpus)
    kept = (
        with_repetition_stats(kept)
        .filter(
            (F.col("dup_word_frac") < 0.9) & (F.col("top_bigram_frac") < 0.5)
        )
        .select("doc_id", "text")
    )
    deduped = exact_dedup(kept, "doc_id")

    near_pairs = minhash_lsh_pairs(deduped, "doc_id", shingle_k=3, threshold=0.5)
    losers = near_pairs.select(F.col("id_b").alias("doc_id")).distinct()
    surviving = deduped.join(losers, on="doc_id", how="left_anti")

    # decontaminate vs a held-out eval set (here: a deterministic pseudo-
    # benchmark slice), dropping docs with heavy 5-gram overlap
    benchmark = docs.filter(F.col("doc_id") % 97 == 0)
    contam = contamination_stats(surviving, benchmark, n=5)
    clean = surviving.join(
        contam.filter(F.col("contamination_ratio") > 0.8).select("doc_id"),
        on="doc_id",
        how="left_anti",
    )

    # perplexity gate: score every survivor under a unigram LM trained on
    # the clean slice itself and drop the garbled tail (in production the
    # model trains once on a trusted reference corpus and persists)
    from m13_sparkstreaming_python_azure_spark.operators.lm import (
        perplexity_filter,
        train_unigram_model,
        unigram_logppl,
    )

    lm = train_unigram_model(clean)
    cut = unigram_logppl(clean, lm).agg(
        F.expr("percentile(logppl, 0.95)")
    ).head()[0]
    fluent = perplexity_filter(clean, lm, max_logppl=cut).select(
        "doc_id", "text"
    )

    # scrub PII before anything downstream sees the text
    scrubbed = redact_pii(fluent).select(
        "doc_id", F.col("redacted").alias("text")
    )

    # rebalance the source mixture sublinearly (τ=0.7) toward the kept
    # volume — one tiny count aggregate + a stateless md5-Bernoulli keep
    from m13_sparkstreaming_python_azure_spark.operators.sampling import (
        temperature_resample,
    )

    sourced = scrubbed.join(
        docs.select("doc_id", "source"), on="doc_id"
    )
    n_fluent = sourced.count()
    scrubbed = temperature_resample(
        sourced, "source", n_fluent, "doc_id", tau=0.7
    ).select("doc_id", "text")

    tagged = with_lang_id(scrubbed).select("doc_id", "text", "lang_pred")
    chunks = chunk_documents(tagged, chunk_size=50, stride=40)
    ready = hash_split(
        chunks.join(tagged.select("doc_id", "lang_pred"), on="doc_id"),
        id_col="doc_id",
    )

    ready.write.mode("overwrite").partitionBy("split").parquet(out_dir)

    # embedding side: normalize+quantize for serving, cluster the corpus
    # into codebook cells (distributed Lloyd — the IVF build path when a
    # driver-side sample won't do)
    from m13_sparkstreaming_python_azure_spark.operators.clustering import (
        kmeans_assignments,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    clusters = kmeans_assignments(emb, k=4, iterations=2)

    out = spark.read.parquet(out_dir)
    stats = {
        "raw_docs": n_raw,
        "quality_kept": kept.count(),  # incl. repetition gate
        "after_exact_dedup": deduped.count(),
        "after_near_dedup": surviving.count(),
        "after_decontam": clean.count(),
        "after_ppl_filter": n_fluent,
        "after_mixing": scrubbed.count(),
        "chunks_written": out.count(),
        "train_chunks": out.filter(F.col("split") == "train").count(),
        "embedding_clusters": clusters.select("cluster").distinct().count(),
    }
    return stats


def main(
    sf_dir: str = "/root/testdata/sf0.01", out_dir: str | None = None
) -> None:
    out_dir = out_dir or tempfile.mkdtemp(prefix="training-data-")
    spark = get_spark("training-data-pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    stats = run(spark, sf_dir, out_dir)
    for k, v in stats.items():
        print(f"{k:>18}: {v}")
    print(f"{'output':>18}: {out_dir} (hive-partitioned by split)")
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:])
