"""Exact set-similarity joins with prefix filtering (PPJoin family).

The reference's surface has no similarity join at all (its only join is
the geohash enrichment, stream.ipynb:173); this module adds the EXACT
complement to the approximate dedup family in ``operators/dedup.py``:

- ``minhash_lsh_pairs`` (dedup.py): probabilistic recall, banded index.
- ``ngram_jaccard_pairs`` (dedup.py): exact *given* its stop-gram
  cutoff — a document-frequency cap bounds the posting lists, so pairs
  that only share ultra-common grams are (documented) misses.
- ``ppjoin_pairs`` / ``containment_pairs`` (here): exact with NO
  cutoff. The prefix-filtering principle (Chaudhuri et al., ICDE'06;
  Xiao et al., WWW'08 — public literature, see PAPERS.md) bounds the
  candidate space instead: order every document's shingle set by global
  rarity; two sets can reach Jaccard >= t only if their first
  ``|X| - ceil(t*|X|) + 1`` rarest shingles overlap, so ONLY that
  prefix is indexed. Common grams sit at the back of the ordering and
  never enter the index — the cost cap falls out of the algorithm, not
  an approximation knob.

100 TB shape: one groupBy for document frequencies, one window rank per
document (shuffle on doc id — same width as any tokenize pass), an
equi-join on PREFIX shingles only (posting lists are short by
construction: a shingle appears in a prefix only while it is globally
rare), then exact verification restricted to surviving candidate pairs.
No all-pairs stage anywhere; skew is self-limiting because high-df
shingles are exactly the ones the prefix excludes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from m13_sparkstreaming_python_azure_spark.operators.dedup import (
    TEXT_SPREAD_BYTES,
    word_shingles,
)
from m13_sparkstreaming_python_azure_spark.operators.util import spread


def _distinct_shingles(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    return (
        spread(df, target_bytes_per_partition=TEXT_SPREAD_BYTES)
        .select(
            F.col(id_col).alias("__id"),
            F.explode(word_shingles(text_col, n)).alias("gram"),
        )
        .distinct()
    )


def _ranked_by_rarity(grams: DataFrame) -> DataFrame:
    """Attach each document's shingles' global document frequency and the
    in-document rank under the canonical (df asc, gram asc) ordering —
    the total order every prefix computation shares.

    Downstream joins should filter ``df >= 2``: a shingle appearing in
    exactly one document can never witness a PAIR (neither as a
    candidate-generating prefix entry nor as an intersection member), so
    dropping singletons from the index and the verify side is exact and
    typically removes the long unique-shingle tail."""
    dfreq = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("__id").orderBy("df", "gram")
    return (
        grams.join(dfreq, on="gram")
        .withColumn("r", F.row_number().over(w))
        .withColumn("n_grams", F.count(F.lit(1)).over(Window.partitionBy("__id")))
    )


def _verified_intersections(cand: DataFrame, shared: DataFrame) -> DataFrame:
    """Exact |A∩B| for the surviving candidate pairs only: route A's
    SHARED shingles (df >= 2 — singletons can't be in any intersection)
    through the pair list and probe B's postings — cost is O(candidate
    docs' shared shingles), not O(corpus)."""
    a = shared.select(F.col("__id").alias("id_a"), "gram")
    b = shared.select(F.col("__id").alias("id_b"), "gram")
    return (
        cand.join(a, on="id_a")
        .join(b, on=["id_b", "gram"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )


def ppjoin_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.3,
) -> DataFrame:
    """All pairs with EXACT shingle-set Jaccard >= ``threshold``.

    Prefix filter: a pair can qualify only if the two rarity-ordered
    prefixes (length ``|X| - ceil(t*|X|) + 1``) share a shingle — any
    qualifying pair's intersection is too large to fit entirely behind
    either prefix. Length filter: ``min(|A|,|B|) >= t*max(|A|,|B|)``.
    Both are necessary conditions, so recall is exactly 1; verification
    computes the true intersection for survivors.

    Returns (id_a, id_b, n_inter, n_union, jaccard_sim) with id_a <
    id_b; jaccard_sim is a ratio of identically-derived BIGINTs, so it
    hash-matches the oracle with no rounding grid.
    """
    grams = _distinct_shingles(df, id_col, text_col, n).persist()
    ranked = _ranked_by_rarity(grams).persist()
    shared = ranked.filter(F.col("df") >= 2).select("__id", "gram")
    prefix = ranked.filter(
        (
            F.col("r")
            <= F.col("n_grams")
            - F.ceil(F.lit(threshold) * F.col("n_grams"))
            + 1
        )
        & (F.col("df") >= 2)
    ).select("__id", "gram", "n_grams")

    a = prefix.select(
        F.col("__id").alias("id_a"), "gram", F.col("n_grams").alias("n_a")
    )
    b = prefix.select(
        F.col("__id").alias("id_b"), "gram", F.col("n_grams").alias("n_b")
    )
    cand = (
        a.join(b, on="gram")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(
            F.least("n_a", "n_b")
            >= F.lit(threshold) * F.greatest("n_a", "n_b")
        )
        .select("id_a", "id_b")
        .distinct()
    )

    sizes = grams.groupBy("__id").agg(F.count(F.lit(1)).alias("n"))
    out = (
        _verified_intersections(cand, shared)
        .join(sizes.select(F.col("__id").alias("id_a"), F.col("n").alias("n_a")), "id_a")
        .join(sizes.select(F.col("__id").alias("id_b"), F.col("n").alias("n_b")), "id_b")
        .withColumn("n_union", F.col("n_a") + F.col("n_b") - F.col("n_inter"))
        .withColumn("jaccard_sim", F.col("n_inter") / F.col("n_union"))
        .filter(F.col("jaccard_sim") >= threshold)
        .select("id_a", "id_b", "n_inter", "n_union", "jaccard_sim")
    )
    return out


def containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.6,
) -> DataFrame:
    """Asymmetric containment join: pairs where the SMALLER shingle set
    is mostly inside the larger — ``|A∩B| / min(|A|,|B|) >= t`` — the
    quote/subset/expanded-revision detector Jaccard misses (a 50-shingle
    doc fully contained in a 500-shingle doc has Jaccard 0.1 but
    containment 1.0).

    Prefix filter for containment: only the CONTAINED side's prefix can
    be shortened (``|A| - ceil(t*|A|) + 1``); the containing side must
    index its full set (no length filter exists — any size may contain
    any smaller set). Returns (id_a, id_b, n_inter, containment,
    jaccard_sim) with id_a < id_b; both measures are BIGINT ratios.
    """
    grams = _distinct_shingles(df, id_col, text_col, n).persist()
    ranked = _ranked_by_rarity(grams).persist()
    shared = ranked.filter(F.col("df") >= 2).select("__id", "gram")
    probe = ranked.filter(
        (
            F.col("r")
            <= F.col("n_grams")
            - F.ceil(F.lit(threshold) * F.col("n_grams"))
            + 1
        )
        & (F.col("df") >= 2)
    ).select(F.col("__id").alias("id_p"), "gram")
    full = shared.select(F.col("__id").alias("id_f"), "gram")
    cand = (
        probe.join(full, on="gram")
        .filter(F.col("id_p") != F.col("id_f"))
        .select(
            F.least("id_p", "id_f").alias("id_a"),
            F.greatest("id_p", "id_f").alias("id_b"),
        )
        .distinct()
    )

    sizes = grams.groupBy("__id").agg(F.count(F.lit(1)).alias("n"))
    out = (
        _verified_intersections(cand, shared)
        .join(sizes.select(F.col("__id").alias("id_a"), F.col("n").alias("n_a")), "id_a")
        .join(sizes.select(F.col("__id").alias("id_b"), F.col("n").alias("n_b")), "id_b")
        .withColumn("containment", F.col("n_inter") / F.least("n_a", "n_b"))
        .withColumn(
            "jaccard_sim",
            F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
        )
        .filter(F.col("containment") >= threshold)
        .select("id_a", "id_b", "n_inter", "containment", "jaccard_sim")
    )
    return out
