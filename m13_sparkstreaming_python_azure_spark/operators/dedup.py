"""Deduplication operators — exact, MinHash+LSH, SimHash, n-gram Jaccard.

Core components of a 100 TB training-data pipeline (north_star in
BASELINE.json). All pure DataFrame ops (JVM-side, codegen); hashing uses
seeded ``xxhash64(lit(seed), value)`` instead of `(a*h+b) mod p` universal
hashing — same independence guarantees for sketching, no int64-overflow
hazard under Spark 4's default ANSI mode.

Scale design:
- exact dedup: one hash-partitioned groupBy on a 64-bit content hash —
  map-side partial aggregation collapses copies before the shuffle.
- MinHash+LSH: O(n) signature computation (no shuffle), then candidate
  generation via an equi-join on (band, band_hash) — only colliding docs
  meet, never the O(n²) cross product. Band count tunes the similarity
  threshold: P(collide) = 1-(1-s^r)^b.
- SimHash: 64-bit signature, near-dup candidates via 16-bit chunk buckets
  (pigeonhole: hamming ≤ 3 ⇒ one of 4 chunks equal).
- n-gram Jaccard: exact verification join on shared n-grams with a
  document-frequency cutoff so stop-n-grams don't quadratically explode.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from m13_sparkstreaming_python_azure_spark.operators.text import tokens


def normalized_text(col: Column | str) -> Column:
    """Whitespace-normalized lowercase text — the exact-dup equivalence key."""
    return F.concat_ws(" ", tokens(col))


def exact_dedup_groups(
    df: DataFrame, id_col: str, text_col: str = "text"
) -> DataFrame:
    """Exact dedup bookkeeping: per content hash, the number of copies and
    the canonical (minimum-id) survivor."""
    return (
        df.withColumn("content_hash", F.xxhash64(normalized_text(text_col)))
        .groupBy("content_hash")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min(id_col).alias("keep_id"),
        )
    )


def exact_dedup(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Keep exactly the canonical survivor row per distinct content.
    Deterministic (min id), unlike ``dropDuplicates`` which keeps an
    arbitrary row."""
    groups = exact_dedup_groups(df, id_col, text_col).select(
        F.col("keep_id").alias(id_col)
    )
    return df.join(groups, on=id_col, how="left_semi")


def word_shingles(col: Column | str, k: int = 3) -> Column:
    """Distinct k-word shingles of a document (the MinHash item set).

    Zero-token documents (empty/whitespace/null text) yield an EMPTY set —
    not a [""] artifact — so they generate no LSH bands and never pair."""
    toks = tokens(col)
    return F.when(
        F.size(toks) > 0,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.size(toks) - (k - 1), F.lit(1))),
                lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def minhash_signature(shingles: Column, num_hashes: int = 64) -> Column:
    """MinHash signature: for hash function i, min over shingles of
    xxhash64(i, shingle). One nested HOF expression — O(num_hashes ×
    shingles) inside codegen, zero shuffle."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.array_min(
            F.transform(shingles, lambda s: F.xxhash64(i, s))
        ),
    )


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard similarity of two (distinct-element) arrays."""
    inter = F.size(F.array_intersect(a, b))
    return inter / (F.size(a) + F.size(b) - inter)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Near-duplicate pairs via MinHash + banded LSH + exact verification.

    Returns (id_a, id_b, jaccard_sim) with id_a < id_b and exact shingle
    Jaccard ≥ threshold. With the defaults (b=16, r=4) the LSH collision
    curve's 50%-recall point sits near s≈0.5.
    """
    if num_hashes % bands:
        raise ValueError("num_hashes must be divisible by bands")
    rows_per_band = num_hashes // bands

    docs = (
        df.select(
            F.col(id_col).alias("__id"),
            word_shingles(text_col, shingle_k).alias("__shingles"),
        )
        # zero-token docs have no shingles: drop them here or their NULL
        # signatures all share buckets and jaccard() divides 0/0
        .filter(F.size("__shingles") > 0)
        .withColumn("__sig", minhash_signature(F.col("__shingles"), num_hashes))
    )

    banded = docs.select(
        "__id",
        "__shingles",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        b,
                        F.concat_ws(
                            ",",
                            F.transform(
                                F.slice(F.col("__sig"), b * rows_per_band + 1, rows_per_band),
                                lambda h: h.cast("string"),
                            ),
                        ),
                    ).alias("bucket"),
                ),
            )
        ).alias("__bb"),
    ).select("__id", "__shingles", "__bb.band", "__bb.bucket")

    left = banded.select(
        F.col("__id").alias("id_a"),
        F.col("__shingles").alias("__sh_a"),
        "band",
        "bucket",
    )
    right = banded.select(
        F.col("__id").alias("id_b"),
        F.col("__shingles").alias("__sh_b"),
        "band",
        "bucket",
    )
    candidates = (
        left.join(right, on=["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "__sh_a", "__sh_b")
        .distinct()
    )
    return (
        candidates.withColumn(
            "jaccard_sim", F.round(jaccard(F.col("__sh_a"), F.col("__sh_b")), 4)
        )
        .filter(F.col("jaccard_sim") >= threshold)
        .select("id_a", "id_b", "jaccard_sim")
    )


def simhash_bits(col: Column | str, bits: int = 64) -> Column:
    """SimHash bit vector: bit b is 1 iff the sum over tokens of
    (2·bit_b(xxhash64(token)) − 1) is positive. Returned as array<int> to
    stay sign-safe under ANSI mode (no int64 assembling)."""
    tok_hashes = F.transform(tokens(col), lambda t: F.xxhash64(t))
    return F.transform(
        F.sequence(F.lit(0), F.lit(bits - 1)),
        lambda b: F.when(
            F.aggregate(
                tok_hashes,
                F.lit(0).cast("long"),
                # F.shiftright only takes a literal int shift; the SQL
                # function accepts a column expression for the bit index
                lambda acc, h: acc
                + (
                    F.call_function("shiftright", h, b).bitwiseAND(F.lit(1)) * 2
                    - 1
                ),
            )
            > 0,
            F.lit(1),
        ).otherwise(F.lit(0)),
    )


def hamming(a: Column, b: Column) -> Column:
    return F.size(F.filter(F.zip_with(a, b, lambda x, y: x != y), lambda v: v))


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """SimHash near-dup pairs with hamming distance ≤ max_hamming.

    Candidates via 4 × 16-bit chunk buckets (pigeonhole: hamming ≤ 3 over
    64 bits ⇒ at least one 16-bit chunk is identical), then exact hamming
    verification — never a cross join.
    """
    docs = df.filter(F.size(tokens(text_col)) > 0).select(
        F.col(id_col).alias("__id"), simhash_bits(text_col).alias("__bits")
    )
    chunked = docs.select(
        "__id",
        "__bits",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(3)),
                lambda c: F.struct(
                    c.alias("chunk"),
                    F.xxhash64(
                        c,
                        F.concat_ws(
                            ",",
                            F.transform(
                                F.slice(F.col("__bits"), c * 16 + 1, 16),
                                lambda v: v.cast("string"),
                            ),
                        ),
                    ).alias("bucket"),
                ),
            )
        ).alias("__cb"),
    ).select("__id", "__bits", "__cb.chunk", "__cb.bucket")

    left = chunked.select(
        F.col("__id").alias("id_a"), F.col("__bits").alias("__bits_a"), "chunk", "bucket"
    )
    right = chunked.select(
        F.col("__id").alias("id_b"), F.col("__bits").alias("__bits_b"), "chunk", "bucket"
    )
    return (
        left.join(right, on=["chunk", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "__bits_a", "__bits_b")
        .distinct()
        .withColumn("hamming_dist", hamming(F.col("__bits_a"), F.col("__bits_b")))
        .filter(F.col("hamming_dist") <= max_hamming)
        .select("id_a", "id_b", "hamming_dist")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for all pairs sharing ≥1 n-gram.

    The inverted-index join on n-grams bounds the pair space to documents
    that actually overlap; ``max_doc_freq`` drops stop-n-grams whose
    posting lists would blow up the join (at corpus scale this cutoff is
    what keeps the operator near-linear).
    """
    grams = df.select(
        F.col(id_col).alias("__id"),
        F.explode(word_shingles(text_col, n)).alias("gram"),
    ).distinct()
    if max_doc_freq is not None:
        rare = (
            grams.groupBy("gram")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") <= max_doc_freq)
            .select("gram")
        )
        grams = grams.join(rare, on="gram", how="left_semi")
    sizes = grams.groupBy("__id").agg(F.count(F.lit(1)).alias("n_grams"))

    a = grams.select(F.col("__id").alias("id_a"), "gram")
    b = grams.select(F.col("__id").alias("id_b"), "gram")
    inter = (
        a.join(b, on="gram")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    out = (
        inter.join(
            sizes.select(F.col("__id").alias("id_a"), F.col("n_grams").alias("n_a")),
            on="id_a",
        )
        .join(
            sizes.select(F.col("__id").alias("id_b"), F.col("n_grams").alias("n_b")),
            on="id_b",
        )
        .withColumn(
            "jaccard_sim",
            F.round(
                F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 4
            ),
        )
        .filter(F.col("jaccard_sim") >= threshold)
        .select("id_a", "id_b", "jaccard_sim")
    )
    return out
