"""Round-4 extensions — exact similarity joins, evaluation metrics, and
dataset-diagnostic analytics for the training-data pipeline.

Every query is oracle-gated (DuckDB twin in PIPELINE_ORACLES) unless
documented otherwise. Float discipline follows the repo rule (core.py
header): ratios of identically-derived BIGINTs are bit-equal across
engines and need no rounding; anything touching ln/log/pow gets a
1e-6 floor-snap grid on BOTH sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from m13_sparkstreaming_python_azure_spark.catalog import load_table

# DuckDB-side tokenization + word-3-gram shingling shared by the
# set-similarity oracles (identical to queries/llm.py's recipe so both
# families tokenize the same way).
_TOKS_SQL = "list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')"
_GRAMS_CTE = f"""
    toks AS (
        SELECT doc_id, {_TOKS_SQL} AS t FROM documents
    ), grams AS (
        SELECT DISTINCT doc_id, gram FROM (
            SELECT doc_id,
                   unnest(list_transform(
                       range(1, greatest(len(t) - 2, 1) + 1),
                       i -> array_to_string(t[i:i+2], ' ')
                   )) AS gram
            FROM toks
        )
    ), sizes AS (
        SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id
    ), inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
        FROM grams a JOIN grams b USING (gram)
        WHERE a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
"""


def q_ppjoin_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT all-pairs Jaccard >= 0.3 over word-3-gram shingle sets via
    prefix filtering (operators/setsim.ppjoin_pairs) — the no-cutoff
    complement to ngram_jaccard_pairs' stop-gram approximation. The
    oracle is the O(n²) brute force; the Spark plan never runs one
    (prefix-only inverted index + candidate verification)."""
    from m13_sparkstreaming_python_azure_spark.operators.setsim import (
        ppjoin_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    return ppjoin_pairs(docs, "doc_id", n=3, threshold=0.3)


def q_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment join (|A∩B| / min >= 0.6) — detects
    quotes/subsets/expanded revisions that Jaccard under-scores
    (operators/setsim.containment_pairs): contained-side prefix probes a
    full-set index, exact verification on survivors."""
    from m13_sparkstreaming_python_azure_spark.operators.setsim import (
        containment_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    return containment_pairs(docs, "doc_id", n=3, threshold=0.6)


PIPELINE_QUERIES = {
    "ppjoin_pairs": q_ppjoin_pairs,
    "containment_pairs": q_containment_pairs,
}

PIPELINE_ORACLES = {
    "ppjoin_pairs": f"""
        WITH {_GRAMS_CTE}
        SELECT id_a, id_b, n_inter,
               sa.n + sb.n - n_inter AS n_union,
               CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter)
                   AS jaccard_sim
        FROM inter
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter)
                  >= CAST(0.3 AS DOUBLE)
    """,
    "containment_pairs": f"""
        WITH {_GRAMS_CTE}
        SELECT id_a, id_b, n_inter,
               CAST(n_inter AS DOUBLE) / least(sa.n, sb.n) AS containment,
               CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter)
                   AS jaccard_sim
        FROM inter
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE CAST(n_inter AS DOUBLE) / least(sa.n, sb.n)
                  >= CAST(0.6 AS DOUBLE)
    """,
}
