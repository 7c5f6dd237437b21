"""Retrieval + vector-search tour on the documents/embeddings fixtures.

The full search stack, each stage a first-class engine operator:
  1. persisted inverted text index (bucketed postings)   (operators/retrieval.py)
  2. BM25 probe over the index — bucket-pruned scan      (operators/retrieval.py)
  3. batch BM25 for an offline eval set in ONE pass      (operators/retrieval.py)
  4. retrieval metrics: precision@10 / MRR / NDCG@10     (queries/pipeline_ext.py)
  5. exact ANN baseline (brute-force cosine top-k)       (operators/similarity.py)
  6. IVF-PQ: coarse cells + residual PQ codes, nprobe
     probing, ADC shortlist, exact rerank                (operators/similarity.py)
  7. hybrid fusion of lexical + vector rankings (RRF)    (queries/analytics_ext.py)

Cost shapes to notice (the 100 TB story):
- the text index probe reads only the probed buckets' postings;
- batch BM25 is O(corpus + matches), not one scan per query;
- IVF-PQ's candidate pass touches (4 + m)-byte codes in probed cells
  only — full vectors appear twice: once at encode time, once for the
  ~100-row rerank per query.

Run: python examples/retrieval_ann_tour.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from m13_sparkstreaming_python_azure_spark.catalog import load_table  # noqa: E402
from m13_sparkstreaming_python_azure_spark.operators import retrieval  # noqa: E402
from m13_sparkstreaming_python_azure_spark.operators import similarity as sim  # noqa: E402
from m13_sparkstreaming_python_azure_spark.queries.pipeline_ext import (  # noqa: E402
    q_retrieval_eval,
)
from m13_sparkstreaming_python_azure_spark.session import get_spark  # noqa: E402


def main(sf_dir: str = "/root/testdata/sf0.01") -> None:
    spark = get_spark("retrieval-ann-tour")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )

    # 1-2. persisted index + bucket-pruned BM25 probe
    idx_dir = os.path.join(tempfile.mkdtemp(prefix="tour-"), "text_index")
    retrieval.build_text_index(docs, idx_dir)
    probe = retrieval.query_text_index(
        spark, idx_dir, ["hash", "join", "stream"]
    )
    print("-- BM25 via persisted index (top 5) --")
    probe.orderBy(F.desc("bm25"), "doc_id").show(5, truncate=False)

    # 3-4. one-pass batch eval
    print("-- retrieval eval (10 queries, one corpus pass) --")
    q_retrieval_eval(spark, sf_dir).orderBy("query_id").show(10)

    # 5. exact baseline for 3 probe vectors
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    print("-- exact cosine top-3 --")
    sim.brute_force_topk(emb, queries, k=3).orderBy("query_id", "rank").show()

    # 6. IVF-PQ: train, compress, probe, rerank
    cent, books = sim.train_ivfpq(
        emb, n_cells=8, m=16, kq=16, sample_size=400, seed=3
    )
    index = sim.ivfpq_encode(emb, cent, books)
    print("-- IVF-PQ top-3 (codes-only candidate pass, exact rerank) --")
    sim.ivfpq_topk(
        index, emb, queries, cent, books, k=3, nprobe=4, shortlist=50
    ).orderBy("query_id", "rank").show()

    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:])
