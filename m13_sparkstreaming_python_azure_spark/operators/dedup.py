"""Deduplication operators — exact, MinHash+LSH, SimHash, n-gram Jaccard.

Core components of a 100 TB training-data pipeline (north_star in
BASELINE.json). All pure DataFrame ops (JVM-side, codegen); hashing uses
seeded ``xxhash64(lit(seed), value)`` instead of `(a*h+b) mod p` universal
hashing — same independence guarantees for sketching, no int64-overflow
hazard under Spark 4's default ANSI mode.

Scale design:
- exact dedup: one hash-partitioned groupBy on a 64-bit content hash —
  map-side partial aggregation collapses copies before the shuffle.
- MinHash+LSH: signatures via explode → 64 flat hash columns → groupBy(id)
  with 64 ``min`` aggregates. Flat columns keep the whole map side in
  whole-stage codegen and the partial aggregation collapses each document
  to one row before the single keyed shuffle. Candidate generation is an
  equi-join on (band, band_hash) carrying ONLY ids — only colliding docs
  meet, never the O(n²) cross product — with the shingle sets joined back
  afterwards for exact verification. Band count tunes the similarity
  threshold: P(collide) = 1-(1-s^r)^b.
- SimHash: same explode → flat-column → groupBy shape (64 signed-bit sums);
  near-dup candidates via 16-bit chunk buckets (pigeonhole: hamming ≤ 3 ⇒
  one of 4 chunks equal).
- n-gram Jaccard: exact verification join on shared n-grams with a
  document-frequency cutoff so stop-n-grams don't quadratically explode.

⚠️ HOF-inlining hazard (why the pair ops avoid nested higher-order
functions over derived array columns): Catalyst's CollapseProject counts an
alias referenced once inside a ``transform`` lambda as cheap to inline, but
the lambda re-evaluates the inlined expression once per array element — a
``transform(sequence(0,63), i -> ... shingles ...)`` over an aliased
shingle computation silently recomputes the shingling 64× per row. The
column-level helpers (`minhash_signature`, `simhash_bits`) keep the HOF
form for ad-hoc use on *materialized* array columns; the pair operators use
the explode/agg form, whose aggregate boundary makes inlining impossible.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from m13_sparkstreaming_python_azure_spark.operators.text import tokens
from m13_sparkstreaming_python_azure_spark.operators.util import bind, spread

# Shingling/hashing does >>1000× the work per input byte of a plain scan
# (measured: the sketch stage over a 600 KB corpus still speeds up past 9
# partitions), so the fan-out heuristic targets KB-scale partitions where
# scans target MB; spread caps fan-out at the session's parallelism.
TEXT_SPREAD_BYTES = 16 << 10


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
    not a [""] artifact — so they generate no LSH bands and never pair.

    The token array is let-bound (``bind``) so tokenization runs once per
    row — referencing ``tokens(col)`` directly inside the per-position
    lambda would re-tokenize once per shingle position."""
    return bind(
        tokens(col),
        lambda toks: F.when(
            F.size(toks) > 0,
            F.array_distinct(
                F.transform(
                    F.sequence(
                        F.lit(1), F.greatest(F.size(toks) - (k - 1), F.lit(1))
                    ),
                    lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
                )
            ),
        ).otherwise(F.array().cast("array<string>")),
    )


def minhash_signature(shingles: Column, num_hashes: int = 64) -> Column:
    """MinHash signature of a *materialized* shingle-array column: for hash
    function i, min over shingles of xxhash64(i, shingle).

    The shingle array is let-bound so a derived-expression input is
    evaluated once per row, not once per hash function. The pair operator
    below uses the explode/agg equivalent, which produces identical
    signatures with full codegen."""
    return bind(
        shingles,
        lambda sh: F.transform(
            F.sequence(F.lit(0), F.lit(num_hashes - 1)),
            lambda i: F.array_min(F.transform(sh, lambda s: F.xxhash64(i, s))),
        ),
    )


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard similarity of two (distinct-element) arrays."""
    inter = F.size(F.array_intersect(a, b))
    return inter / (F.size(a) + F.size(b) - inter)


def _mh_hash(seed: int, col: Column, hash_family: str) -> Column:
    """Seeded 64-bit (xxhash64) or 60-bit (md5) shingle hash.

    ``md5`` is the PORTABLE family (r9): conv(substring(md5(seed:sh),
    1, 15), 16, 10) — a pure function of the data that any engine with
    md5 reproduces bit-exactly, which is what lets the driver gate
    replicate the ENTIRE LSH pipeline in DuckDB SQL (no tolerance, no
    recall gamble). xxhash64 stays the default production family (no
    hex round-trip in the hot path)."""
    if hash_family == "xxhash64":
        return F.xxhash64(F.lit(seed), col)
    if hash_family != "md5":
        raise ValueError("hash_family must be 'xxhash64' or 'md5'")
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{seed}:"), col)), 1, 15), 16, 10
    ).cast("bigint")


def _minhash_signatures_agg(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int,
    shingle_k: int,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """(id, h_0 … h_{num_hashes-1}) via explode + groupBy.

    Same hash family as `minhash_signature` (seeded by function index
    over the shingle string), but evaluated as flat columns under
    whole-stage codegen with map-side partial ``min`` aggregation — one
    keyed shuffle of (id, 64 longs) per document, independent of document
    length."""
    exploded = df.select(
        F.col(id_col).alias("__id"),
        F.explode(word_shingles(text_col, shingle_k)).alias("__sh"),
    )
    hashed = exploded.select(
        "__id",
        *[
            _mh_hash(i, F.col("__sh"), hash_family).alias(f"__h{i}")
            for i in range(num_hashes)
        ],
    )
    return hashed.groupBy("__id").agg(
        *[F.min(f"__h{i}").alias(f"__h{i}") for i in range(num_hashes)]
    )


def _band_buckets(
    sig_cols: list[str],
    bands: int,
    rows_per_band: int,
    hash_family: str = "xxhash64",
) -> Column:
    """array<struct<band, bucket>> from flat signature columns; bucket is a
    seeded hash of the band's signature slice (same values as hashing the
    sliced array form). The md5 family keeps the bucket as the hex string
    (portable join key — mirrored verbatim by the DuckDB oracle)."""

    def bucket(b: int) -> Column:
        joined = F.concat_ws(
            ",",
            *[
                F.col(c).cast("string")
                for c in sig_cols[b * rows_per_band : (b + 1) * rows_per_band]
            ],
        )
        if hash_family == "md5":
            # gate-only family: string buckets never join against the
            # rowwise/streaming probe index (which stays long-typed)
            return F.md5(F.concat(F.lit(f"{b}|"), joined))
        return F.xxhash64(F.lit(b), joined)

    return F.array(
        *[
            F.struct(
                F.lit(b).alias("band"), bucket(b).alias("bucket")
            )
            for b in range(bands)
        ]
    )


def _candidates_from_bands(banded: DataFrame) -> DataFrame:
    """Distinct (id_a, id_b) candidate pairs from an (id, band, bucket)
    index — the banded self-join shuffles narrow id rows only."""
    left = banded.select(F.col("__id").alias("id_a"), "band", "bucket")
    right = banded.select(F.col("__id").alias("id_b"), "band", "bucket")
    return (
        left.join(right, on=["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def _verify_pairs(
    candidates: DataFrame, shingle_sets: DataFrame, threshold: float
) -> DataFrame:
    """Exact-Jaccard verification of candidate pairs against an
    (__id, __shingles) relation; only candidate ids' shingle arrays cross
    the wire."""
    return (
        candidates.join(
            shingle_sets.select(
                F.col("__id").alias("id_a"), F.col("__shingles").alias("__sh_a")
            ),
            on="id_a",
        )
        .join(
            shingle_sets.select(
                F.col("__id").alias("id_b"), F.col("__shingles").alias("__sh_b")
            ),
            on="id_b",
        )
        .withColumn(
            "jaccard_sim", F.round(jaccard(F.col("__sh_a"), F.col("__sh_b")), 4)
        )
        .filter(F.col("jaccard_sim") >= threshold)
        .select("id_a", "id_b", "jaccard_sim")
    )


def _banded_from_sigs(
    sigs: DataFrame,
    num_hashes: int,
    bands: int,
    hash_family: str = "xxhash64",
) -> DataFrame:
    rows_per_band = num_hashes // bands
    sig_cols = [f"__h{i}" for i in range(num_hashes)]
    return sigs.select(
        "__id",
        F.explode(
            _band_buckets(sig_cols, bands, rows_per_band, hash_family)
        ).alias("__bb"),
    ).select("__id", "__bb.band", "__bb.bucket")


def write_minhash_tables(
    df: DataFrame,
    table_dir: str,
    id_col: str,
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    hash_family: str = "xxhash64",
) -> tuple[str, str]:
    """ONE tokenize pass over the corpus → two materialized parquet tables:

      table_dir/shingles  (__id, __shingles array<string>)
      table_dir/bands     (__id, band, bucket)

    The production shape of MinHash dedup at 100 TB: tokenization (the
    expensive scan) runs exactly once; the shingle table lives on disk,
    columnar-compressed, instead of a cluster-memory persist larger than
    the corpus itself (VERDICT r1); the band table is the reusable LSH
    index (same hash family as ``minhash_band_index`` /
    ``minhash_bands_rowwise``, so streaming probes can join against it).
    Returns (shingles_path, bands_path).
    """
    if num_hashes % bands:
        raise ValueError("num_hashes must be divisible by bands")
    docs = spread(df, target_bytes_per_partition=TEXT_SPREAD_BYTES)
    shingles_path = os.path.join(table_dir, "shingles")
    (
        docs.select(
            F.col(id_col).alias("__id"),
            word_shingles(text_col, shingle_k).alias("__shingles"),
        )
        .filter(F.size("__shingles") > 0)
        .write.mode("overwrite")
        .parquet(shingles_path)
    )
    # signatures derive from the WRITTEN shingle table — no second tokenize
    spark = df.sparkSession
    sh = spark.read.parquet(shingles_path)
    hashed = sh.select(
        "__id", F.explode("__shingles").alias("__sh")
    ).select(
        "__id",
        *[
            _mh_hash(i, F.col("__sh"), hash_family).alias(f"__h{i}")
            for i in range(num_hashes)
        ],
    )
    sigs = hashed.groupBy("__id").agg(
        *[F.min(f"__h{i}").alias(f"__h{i}") for i in range(num_hashes)]
    )
    bands_path = os.path.join(table_dir, "bands")
    _banded_from_sigs(
        sigs, num_hashes, bands, hash_family
    ).write.mode("overwrite").parquet(bands_path)
    return shingles_path, bands_path


def minhash_pairs_from_tables(
    spark: SparkSession,
    shingles_path: str,
    bands_path: str,
    threshold: float = 0.5,
) -> DataFrame:
    """Near-dup pairs from materialized minhash tables (see
    ``write_minhash_tables``): banded self-join for candidates, exact
    Jaccard verify joining the on-disk shingle table twice — parquet
    column pruning + the id equi-join mean only candidate rows' arrays
    are ever read off disk on the verify side."""
    banded = spark.read.parquet(bands_path)
    shingle_sets = spark.read.parquet(shingles_path)
    return _verify_pairs(
        _candidates_from_bands(banded), shingle_sets, threshold
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    threshold: float = 0.5,
    shingle_store: str = "disk",
    work_dir: str | None = None,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Near-duplicate pairs via MinHash + banded LSH + exact verification.

    Returns (id_a, id_b, jaccard_sim) with id_a < id_b and exact shingle
    Jaccard ≥ threshold. With the defaults (b=16, r=4) the LSH collision
    curve's 50%-recall point sits near s≈0.5.

    Plan shape (scale-critical):
      scan → shingle table (parquet) → 64 flat hashes → partial min agg
      → Exchange(id) → final agg (signatures) → band table (parquet)
      → self-join on (band, bucket), ids only
      → distinct pairs → join shingle table back → exact Jaccard filter.
    The band self-join and pair-distinct shuffle narrow (id, id) rows; the
    full shingle arrays cross the wire only for verified candidates.

    ``shingle_store='disk'`` (default) materializes the shingle + band
    tables once via ``write_minhash_tables`` (under ``work_dir`` or a
    temp dir) and generates pairs from them — tokenize runs once and
    nothing corpus-sized is pinned in cluster memory.
    ``shingle_store='memory'`` keeps the single-job persist form (small
    fixtures / no scratch space); both paths share the same hash family
    and verification, so their output is identical (pinned by test).
    """
    if shingle_store == "disk":
        import tempfile

        table_dir = work_dir or tempfile.mkdtemp(prefix="minhash-tables-")
        shingles_path, bands_path = write_minhash_tables(
            df,
            table_dir,
            id_col,
            text_col,
            num_hashes,
            bands,
            shingle_k,
            hash_family,
        )
        return minhash_pairs_from_tables(
            df.sparkSession, shingles_path, bands_path, threshold
        )
    if shingle_store != "memory":
        raise ValueError("shingle_store must be 'disk' or 'memory'")
    if num_hashes % bands:
        raise ValueError("num_hashes must be divisible by bands")

    docs = spread(df, target_bytes_per_partition=TEXT_SPREAD_BYTES)
    sigs = _minhash_signatures_agg(
        docs, id_col, text_col, num_hashes, shingle_k, hash_family
    )
    candidates = _candidates_from_bands(
        _banded_from_sigs(sigs, num_hashes, bands, hash_family)
    )

    # persisted: both verify joins (id_a side, id_b side) consume it, and
    # recomputation means re-tokenizing the corpus twice. MEMORY_AND_DISK
    # spills at scale — the disk shingle_store is the production path.
    shingle_sets = docs.select(
        F.col(id_col).alias("__id"),
        word_shingles(text_col, shingle_k).alias("__shingles"),
    ).filter(F.size("__shingles") > 0).persist()
    return _verify_pairs(candidates, shingle_sets, threshold)


def simhash_bits(col: Column | str, bits: int = 64) -> Column:
    """SimHash bit vector: bit b is 1 iff the sum over tokens of
    (2·bit_b(xxhash64(token)) − 1) is positive. Returned as array<int> to
    stay sign-safe under ANSI mode (no int64 assembling).

    The token-hash array is let-bound so tokenization+hashing runs once per
    row, not once per bit. `simhash_pairs` uses the explode/agg equivalent
    (identical bits) with full codegen."""
    return bind(
        F.transform(tokens(col), lambda t: F.xxhash64(t)),
        lambda tok_hashes: F.transform(
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
        ),
    )


def hamming(a: Column, b: Column) -> Column:
    return F.size(F.filter(F.zip_with(a, b, lambda x, y: x != y), lambda v: v))


def _simhash_bits_agg(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bits: int = 64,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """(id, __bits array<int>) via explode + flat signed-bit sums + groupBy.
    Same bit definition as `simhash_bits`; zero-token docs produce no rows
    (explode of an empty token array), matching the pair op's filter.

    ``hash_family='md5'`` (r9) derives bit b from hex nibble b//4 of
    md5(token) — the portable family the driver gate's DuckDB oracle
    replicates verbatim (see _mh_hash)."""
    tok = df.select(
        F.col(id_col).alias("__id"),
        F.explode(tokens(text_col)).alias("__tok"),
    )
    if hash_family == "md5":
        tok = tok.select("__id", F.md5("__tok").alias("__h"))

        def signed_bit(b: int) -> Column:
            nib = F.conv(
                F.substring("__h", 1 + b // 4, 1), 16, 10
            ).cast("int")
            return (
                F.shiftright(nib, 3 - (b % 4)).bitwiseAND(F.lit(1)) * 2 - 1
            )

    else:
        tok = tok.select("__id", F.xxhash64("__tok").alias("__h"))

        def signed_bit(b: int) -> Column:
            return F.shiftright("__h", b).bitwiseAND(F.lit(1)) * 2 - 1

    signed = tok.select(
        "__id",
        *[signed_bit(b).alias(f"__s{b}") for b in range(bits)],
    )
    sums = signed.groupBy("__id").agg(
        *[F.sum(f"__s{b}").alias(f"__s{b}") for b in range(bits)]
    )
    return sums.select(
        "__id",
        F.array(
            *[
                F.when(F.col(f"__s{b}") > 0, F.lit(1)).otherwise(F.lit(0))
                for b in range(bits)
            ]
        ).alias("__bits"),
    )


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    max_hamming: int = 3,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """SimHash near-dup pairs with hamming distance ≤ max_hamming.

    Candidates via 4 × 16-bit chunk buckets (pigeonhole: hamming ≤ 3 over
    64 bits ⇒ at least one 16-bit chunk is identical), then exact hamming
    verification — never a cross join. Candidates carry ids only; bit
    vectors join back after the pair-distinct (narrow shuffles).

    The signature table is persisted: it feeds the bucketing pass AND both
    verify joins, and without a persist Spark recomputes the full
    explode+sum aggregation three times. Signatures are id + 64 ints —
    tiny relative to the corpus at any scale (production dedup pipelines
    materialize them as a table outright).
    """
    docs = _simhash_bits_agg(
        spread(df, target_bytes_per_partition=TEXT_SPREAD_BYTES),
        id_col,
        text_col,
        hash_family=hash_family,
    ).persist()

    def chunk_bucket(c: int) -> Column:
        joined = F.concat_ws(
            ",",
            F.transform(
                F.slice(F.col("__bits"), c * 16 + 1, 16),
                lambda v: v.cast("string"),
            ),
        )
        if hash_family == "md5":
            return F.md5(F.concat(F.lit(f"{c}|"), joined))
        return F.xxhash64(F.lit(c), joined)

    chunked = docs.select(
        "__id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        chunk_bucket(c).alias("bucket"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("__cb"),
    ).select("__id", "__cb.chunk", "__cb.bucket")

    left = chunked.select(F.col("__id").alias("id_a"), "chunk", "bucket")
    right = chunked.select(F.col("__id").alias("id_b"), "chunk", "bucket")
    candidates = (
        left.join(right, on=["chunk", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    return (
        candidates.join(
            docs.select(F.col("__id").alias("id_a"), F.col("__bits").alias("__bits_a")),
            on="id_a",
        )
        .join(
            docs.select(F.col("__id").alias("id_b"), F.col("__bits").alias("__bits_b")),
            on="id_b",
        )
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
    grams = spread(df, target_bytes_per_partition=TEXT_SPREAD_BYTES).select(
        F.col(id_col).alias("__id"),
        F.explode(word_shingles(text_col, n)).alias("gram"),
    )
    if max_doc_freq is not None:
        rare = (
            grams.groupBy("gram")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") <= max_doc_freq)
            .select("gram")
        )
        grams = grams.join(rare, on="gram", how="left_semi")
    # persisted: the posting list feeds the size aggregate and both sides
    # of the inverted-index join — without it the tokenize + doc-freq
    # semi-join reruns three times
    grams = grams.persist()
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


def contamination_stats(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    n: int = 5,
) -> DataFrame:
    """Benchmark decontamination check: per document, how many of its
    distinct word n-grams appear anywhere in a benchmark/eval set — the
    standard guard against test-set leakage in a training corpus (n-gram
    collision decontamination à la open-data curation pipelines).

    Scale shape: the benchmark side is tiny relative to the corpus, so its
    distinct-gram set BROADCASTS and the contamination probe is a map-side
    left-semi join over the corpus gram stream — the corpus shuffles only
    for its own per-doc aggregate (and that shuffle is on doc id, the
    natural partitioning). No O(corpus × benchmark) anything.

    Returns (id, n_grams, n_contaminated, contamination_ratio) with the
    cross-engine floor-rounding rule on the ratio.
    """
    doc_grams = spread(docs, target_bytes_per_partition=TEXT_SPREAD_BYTES).select(
        F.col(id_col).alias("__id"),
        F.explode(word_shingles(F.col(text_col), n)).alias("gram"),
    )
    bench_grams = (
        benchmark.select(
            F.explode(word_shingles(F.col(bench_text_col), n)).alias("gram")
        )
        .distinct()
    )
    sizes = doc_grams.groupBy("__id").agg(F.count(F.lit(1)).alias("n_grams"))
    hits = (
        doc_grams.join(F.broadcast(bench_grams), on="gram", how="left_semi")
        .groupBy("__id")
        .agg(F.count(F.lit(1)).alias("n_contaminated"))
    )
    ratio = F.col("n_contaminated") / F.col("n_grams")
    return (
        sizes.join(hits, on="__id", how="left")
        .withColumn("n_contaminated", F.coalesce("n_contaminated", F.lit(0)))
        .select(
            F.col("__id").alias(id_col),
            "n_grams",
            "n_contaminated",
            (F.floor(ratio * 10000 + F.lit(0.5)) / 10000).alias(
                "contamination_ratio"
            ),
        )
    )


def minhash_band_index(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
) -> DataFrame:
    """(id, band, bucket) LSH index of a corpus — the persistable /
    broadcastable static side of streaming near-dup detection. Same hash
    family and band bucketing as ``minhash_lsh_pairs``; write it out
    partitioned (or bucketed) by ``band, bucket`` and incoming documents
    probe it with a map-side join."""
    if num_hashes % bands:
        raise ValueError("num_hashes must be divisible by bands")
    rows_per_band = num_hashes // bands
    sig_cols = [f"__h{i}" for i in range(num_hashes)]
    sigs = _minhash_signatures_agg(
        spread(df, target_bytes_per_partition=TEXT_SPREAD_BYTES),
        id_col,
        text_col,
        num_hashes,
        shingle_k,
    )
    return sigs.select(
        F.col("__id").alias(id_col),
        F.explode(_band_buckets(sig_cols, bands, rows_per_band)).alias("__bb"),
    ).select(id_col, "__bb.band", "__bb.bucket")


def minhash_bands_rowwise(
    text_col: Column | str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
) -> Column:
    """array<struct<band,bucket>> of a text column computed PER ROW (pure
    column expression, no aggregate) — bucket values identical to
    ``minhash_band_index``'s, but legal inside a streaming append query
    (streaming forbids the explode/groupBy signature aggregate; this is
    the row-local twin, O(shingles × num_hashes) per row).

    Empty/whitespace docs produce an empty band array (no shingles → no
    buckets), matching the agg form which emits no signature row for them.
    """
    if num_hashes % bands:
        raise ValueError("num_hashes must be divisible by bands")
    r = num_hashes // bands

    def to_bands(s: Column) -> Column:
        return F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda b: F.struct(
                b.cast("int").alias("band"),
                F.xxhash64(
                    b,
                    F.concat_ws(
                        ",",
                        F.transform(
                            F.slice(s, b * r + 1, r),
                            lambda x: x.cast("string"),
                        ),
                    ),
                ).alias("bucket"),
            ),
        )

    # guard on the SHINGLE set: a shingle-less doc must yield an empty band
    # array (the agg form emits no signature row for it) — guarding on the
    # signature would misfire, since min-over-empty makes a 64-null array,
    # not an empty one
    return bind(
        word_shingles(text_col, shingle_k),
        lambda sh: F.when(
            F.size(sh) > 0,
            bind(minhash_signature(sh, num_hashes), to_bands),
        ).otherwise(F.array().cast("array<struct<band:int,bucket:bigint>>")),
    )


def text_fingerprint(col: Column | str) -> Column:
    """Engine-independent 60-bit content fingerprint: the first 15 hex
    digits of md5 over the raw text, as a BIGINT — reproducible in any
    SQL engine (the repo's md5-derivation rule), unlike xxhash64."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def incremental_dedup_sink(
    corpus_dir: str,
    fp_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 16,
):
    """foreachBatch sink for EXACTLY-ONCE streaming corpus dedup against
    ALL history: each micro-batch keeps only docs whose content
    fingerprint was never seen (in this batch — min ``id_col`` wins — or
    any earlier one), appends the survivors to a versioned corpus
    snapshot, and upserts their fingerprints into a BUCKETED keyed
    fingerprint table.

    Scale shape — O(batch), never O(corpus): the seen-set probe computes
    the batch's touched fingerprint buckets and anti-joins against ONLY
    those buckets' files (sources/snapshots.read_keyed_buckets); the
    corpus itself is never re-read. This is the streaming analogue of
    exact_dedup for a corpus that grows forever — the first stage of a
    continuously-crawled training-data pipeline.

    Crash safety / ordering: the corpus version commits FIRST (carrying
    the batch_id high-water mark), the fingerprint append second. A
    replay after a crash between the two skips the corpus append (guard)
    and re-commits only the fingerprints — convergent. The reverse order
    would lose the batch: replayed survivors would anti-join against
    their own fingerprints and vanish before ever reaching the corpus.

    The fingerprint table is APPEND-only (VERDICT r11 #1): ``fresh`` is
    anti-joined against history, so a fingerprint can enter the table at
    most once and the old merge mode's copy-on-write rewrite of touched
    buckets — O(table/n_buckets × touched), i.e. O(table) for uniformly
    hashed keys — bought nothing. Appends keep the per-batch write
    O(batch) regardless of accumulated history; rebucketing compaction
    (``compact_keyed_snapshot(n_buckets=...)``) keeps the PROBE side
    O(batch) as history grows, and both the sink and this probe read the
    live bucket count from the manifest.
    """
    from m13_sparkstreaming_python_azure_spark.sources.snapshots import (
        append_snapshot,
        keyed_append_sink,
        latest_version,
        live_n_buckets,
        read_keyed_buckets,
        read_manifest,
        write_snapshot,
    )

    fp_sink = keyed_append_sink(fp_dir, keys=["fp"], n_buckets=n_buckets)

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        try:
            last = read_manifest(corpus_dir).get("batch_id")
        except FileNotFoundError:
            last = None
        corpus_done = last is not None and batch_id <= last
        nb_fp = live_n_buckets(fp_dir, n_buckets)
        from pyspark.sql import Window

        withfp = batch_df.withColumn("fp", text_fingerprint(text_col))
        w = Window.partitionBy("fp").orderBy(F.col(id_col).asc())
        winners = (
            withfp.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
            .withColumn(
                "__bucket",
                F.pmod(F.xxhash64("fp"), F.lit(nb_fp)).cast("int"),
            )
            .persist()
        )
        touched = sorted(
            r["__bucket"]
            for r in winners.select("__bucket").distinct().collect()
        )
        if not touched:
            winners.unpersist()
            return
        seen = read_keyed_buckets(spark, fp_dir, touched)
        fresh = winners.drop("__bucket")
        if seen is not None:
            fresh = fresh.join(
                seen.select("fp"), on="fp", how="left_anti"
            )
        # both the corpus append and the fingerprint upsert consume
        # ``fresh`` — pin it so the anti-join runs once, not per action
        fresh = fresh.persist()
        if not corpus_done:
            extra = {"batch_id": batch_id, "op": "dedup-append"}
            if latest_version(corpus_dir) is None:
                write_snapshot(fresh, corpus_dir, extra)
            else:
                append_snapshot(fresh, corpus_dir, extra)
        # fingerprint append LAST (see ordering note); keyed sink has its
        # own batch_id guard on fp_dir. fresh's buckets ⊆ touched, so the
        # precomputed set is a valid (super)set for the append sink.
        fp_sink(
            fresh.select("fp", F.col(id_col).alias("first_id")),
            batch_id,
            touched_buckets=touched,
        )
        fresh.unpersist()
        winners.unpersist()

    return _sink


def best_of_dup_groups(
    df: DataFrame,
    id_col: str,
    score_col: str,
    text_col: str = "text",
) -> DataFrame:
    """Quality-aware dedup survivor selection: per content fingerprint
    keep the copy with the HIGHEST ``score_col`` (ties → smallest id) —
    a re-crawled page with cleaner extraction should beat the earlier
    noisy copy, which plain min-id survivorship (exact_dedup) throws
    away. One window over the fingerprint key; same single-shuffle
    shape as exact_dedup."""
    from pyspark.sql import Window

    w = Window.partitionBy("fp").orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("fp", text_fingerprint(text_col))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def md5_minhash_banded(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
) -> tuple[DataFrame, DataFrame]:
    """Engine-independent MinHash LSH index rows: returns
    ``(shingles, banded)`` where shingles is (id, __shingles) for docs
    with a non-empty shingle set and banded is (id, bkt) — one row per
    band, ``bkt`` a 16-hex-char digest of the band's signature slice.

    Unlike the xxhash64 family used by ``minhash_lsh_pairs``, every hash
    here derives from md5 (the repo's cross-engine derivation rule:
    ``h_i(s) = int(md5(i ‖ ':' ‖ s)[:15hex], 16)``), so a SQL oracle can
    reproduce the exact signatures, buckets, candidate set, and
    survivors — which is what lets the STREAMING near-dup gate be
    hash-checked rather than rows-only. Costs ~2× xxhash64; at 100 TB
    you'd flip the family back to xxhash64 (same shapes, same plan)."""
    if num_hashes % bands:
        raise ValueError("num_hashes must be divisible by bands")
    rows_per_band = num_hashes // bands
    sh = df.select(
        F.col(id_col).alias("__id"),
        word_shingles(text_col, shingle_k).alias("__shingles"),
    ).filter(F.size("__shingles") > 0)
    # per-shingle work is the hot loop (docs × shingles × num_hashes):
    # keep only the md5 + substring there. min over FIXED-WIDTH lowercase
    # hex == numeric min (lexicographic order of equal-length hex is the
    # value order), so the radix conversion to bigint — measurably the
    # most expensive scalar here — runs once per DOC per hash after the
    # aggregate, not once per shingle (VERDICT r10 #6: the signature pass
    # was ~half the streaming-minhash gate's wall). Same signatures,
    # same oracle derivation rule h_i = int(md5(i ‖ ':' ‖ s)[:15hex], 16).
    hashed = sh.select(
        "__id", F.explode("__shingles").alias("__sh")
    ).select(
        "__id",
        *[
            F.substring(
                F.md5(F.concat(F.lit(f"{i}:"), F.col("__sh"))), 1, 15
            ).alias(f"__x{i}")
            for i in range(num_hashes)
        ],
    )
    sigs = hashed.groupBy("__id").agg(
        *[F.min(f"__x{i}").alias(f"__x{i}") for i in range(num_hashes)]
    ).select(
        "__id",
        *[
            F.conv(F.col(f"__x{i}"), 16, 10).cast("bigint").alias(f"__h{i}")
            for i in range(num_hashes)
        ],
    )
    banded = sigs.select(
        "__id",
        F.explode(
            F.array(
                *[
                    F.substring(
                        F.md5(
                            F.concat_ws(
                                ",",
                                F.lit(str(b)),
                                *[
                                    F.col(f"__h{i}").cast("string")
                                    for i in range(
                                        b * rows_per_band, (b + 1) * rows_per_band
                                    )
                                ],
                            )
                        ),
                        1,
                        16,
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bkt"),
    )
    return sh, banded


def streaming_minhash_dedup_sink(
    corpus_dir: str,
    bands_dir: str,
    shingles_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
    threshold: float = 0.5,
    n_buckets: int = 16,
):
    """foreachBatch sink for streaming NEAR-duplicate corpus dedup
    against ALL history (VERDICT r4 #7) — the MinHash-LSH analogue of
    ``incremental_dedup_sink``'s exact-fingerprint dedup: each
    micro-batch's docs probe only their own (band, bucket) keys against
    the persisted band index, verify exact shingle Jaccard on the
    candidates, and drop any doc with a verified partner of smaller id
    (in history or in the batch). Survivors append to a versioned corpus
    snapshot; EVERY batch doc's bands + shingles append to the index
    (pair-rule semantics: a dropped near-dup still blocks later copies
    of itself), via ``keyed_append_sink`` — no existing index data is
    ever read when writing.

    Scale shape — O(batch), never O(corpus): the band probe reads only
    the hash-buckets of the batch's own ``bkt`` keys
    (``read_keyed_buckets``); the verify join reads only candidate
    partner ids' shingle buckets; the corpus is never re-read. With
    id-ordered arrival (the replay contract) the result equals the batch
    pair-rule: doc X is dropped iff some doc Y with Y.id < X.id has
    verified Jaccard ≥ threshold with X.

    Crash safety: corpus commits FIRST (batch_id high-water mark), then
    the two index appends (each with its own guard). A replay after any
    crash point recomputes the same survivor set — the batch's own bands
    may already be in history, but self-pairs (equal id) are excluded
    and batch-mate pairs dedup against the within-batch candidate set.
    """
    from m13_sparkstreaming_python_azure_spark.sources.snapshots import (
        append_snapshot,
        keyed_append_sink,
        latest_version,
        live_n_buckets,
        read_keyed_buckets,
        read_manifest,
        write_snapshot,
    )

    bands_sink = keyed_append_sink(bands_dir, keys=["bkt"], n_buckets=n_buckets)
    sh_sink = keyed_append_sink(shingles_dir, keys=["__id"], n_buckets=n_buckets)

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        try:
            last = read_manifest(corpus_dir).get("batch_id")
        except FileNotFoundError:
            last = None
        corpus_done = last is not None and batch_id <= last
        # live bucket counts (VERDICT r11 #1): rebucketing compaction
        # resizes the hash index between batches; probing with a stale
        # constant would read the wrong buckets and MISS duplicates
        nb_bands = live_n_buckets(bands_dir, n_buckets)
        nb_sh = live_n_buckets(shingles_dir, n_buckets)

        # A replayed chunk arrives as ONE file → ONE input partition, so
        # the whole signature DAG (shingles × num_hashes md5s — the
        # measured majority of this sink's wall, VERDICT r10 #6) would
        # run on a single task. Spread narrow batches across the
        # executor cores first; every downstream stage re-shuffles at
        # the session width anyway, so file counts/writes don't widen.
        cores = spark.sparkContext.defaultParallelism
        if batch_df.rdd.getNumPartitions() < cores:
            batch_df = batch_df.repartition(cores)

        sh, banded = md5_minhash_banded(
            batch_df, id_col, text_col, num_hashes, bands, shingle_k
        )
        sh = sh.persist()
        banded = banded.persist()
        # job 1 — signature pass + the shingle sink's touched set in ONE
        # action (r12 floor shave; was a bare count() + a separate
        # two-branch union-distinct job whose branches raced the cache):
        # collecting sh's OWN bucket ids materializes the cache as a side
        # effect, so the banded collect below reads cached shingles
        sh_touched = sorted(
            r["b"]
            for r in sh.select(
                F.pmod(F.xxhash64("__id"), F.lit(nb_sh)).cast("int").alias("b")
            )
            .distinct()
            .collect()
        )
        # job 2 — band digests (from the cache) + the band probe/append
        # touched set; materializes banded's cache
        touched = sorted(
            r["b"]
            for r in banded.select(
                F.pmod(F.xxhash64("bkt"), F.lit(nb_bands)).cast("int").alias("b")
            )
            .distinct()
            .collect()
        )

        # candidate pairs, batch-batch: banded self-join, ids only (the
        # final cand.distinct() dedups — inner distincts were redundant
        # shuffles, VERDICT r10 #6)
        left = banded.select(F.col("__id").alias("id_a"), "bkt")
        right = banded.select(F.col("__id").alias("id_b"), "bkt")
        batch_pairs = (
            left.join(right, on="bkt")
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
        )
        hist_bands = (
            read_keyed_buckets(spark, bands_dir, touched) if touched else None
        )
        if hist_bands is not None:
            hist_pairs = (
                hist_bands.select(F.col("__id").alias("id_a"), "bkt")
                .join(banded.select(F.col("__id").alias("id_b"), "bkt"), on="bkt")
                .filter(F.col("id_a") < F.col("id_b"))
                .select("id_a", "id_b")
            )
            cand = batch_pairs.unionByName(hist_pairs).distinct()
        else:
            cand = batch_pairs.distinct()
        cand = cand.persist()

        # partner (id_a) shingle arrays: batch docs from sh, history docs
        # from the pruned shingle store. job 3 collects the partner ids'
        # shingle-bucket set straight off the candidate set — the r11
        # flow anti-joined batch ids out first (an extra shuffle in the
        # BLOCKING path) to read only history ids' buckets; collecting
        # ALL partner buckets over-reads at most the batch's own buckets
        # and stays exact: the semi-join below keeps only candidate
        # partner rows, and a replayed batch doc present in BOTH sh and
        # the store only duplicates its verified pairs, which collapse
        # in dup_ids' distinct (VERDICT r11 #4 probe/verify fold)
        pids = cand.select(F.col("id_a").alias("__id")).distinct().persist()
        id_buckets = sorted(
            r["b"]
            for r in pids.select(
                F.pmod(F.xxhash64("__id"), F.lit(nb_sh)).cast("int").alias("b")
            )
            .distinct()
            .collect()
        )
        hist_sh = (
            read_keyed_buckets(spark, shingles_dir, id_buckets)
            if id_buckets
            else None
        )
        partner_sh = sh if hist_sh is None else sh.unionByName(
            hist_sh.join(pids, on="__id", how="left_semi")
        )

        verified = (
            cand.join(
                partner_sh.select(
                    F.col("__id").alias("id_a"),
                    F.col("__shingles").alias("__sh_a"),
                ),
                on="id_a",
            )
            .join(
                sh.select(
                    F.col("__id").alias("id_b"),
                    F.col("__shingles").alias("__sh_b"),
                ),
                on="id_b",
            )
            .filter(jaccard(F.col("__sh_a"), F.col("__sh_b")) >= threshold)
        )
        dup_ids = verified.select(F.col("id_b").alias(id_col)).distinct()
        survivors = batch_df.join(dup_ids, on=id_col, how="left_anti").persist()

        # Commit protocol (VERDICT r11 #4 — overlap the three writes):
        # the index DATA files (bands + shingles, reading the persisted
        # caches) write concurrently with the corpus write, but their
        # MANIFESTS commit strictly AFTER the corpus manifest — until a
        # manifest references them the files are unreachable orphans, so
        # the corpus-first crash-safety ordering is untouched: a crash
        # before the corpus commit replays the whole batch (orphan data
        # files are never read); a crash between corpus and index
        # commits replays into the index sinks' own batch_id guards.
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(2) as pool:
            fb = pool.submit(
                bands_sink.prepare, banded, batch_id, touched_buckets=touched
            )
            fsh = pool.submit(
                sh_sink.prepare, sh, batch_id, touched_buckets=sh_touched
            )
            if not corpus_done:
                extra = {"batch_id": batch_id, "op": "near-dup-append"}
                if latest_version(corpus_dir) is None:
                    write_snapshot(survivors, corpus_dir, extra)
                else:
                    append_snapshot(survivors, corpus_dir, extra)
            commit_bands = fb.result()
            commit_sh = fsh.result()
        if commit_bands is not None:
            commit_bands()
        if commit_sh is not None:
            commit_sh()
        survivors.unpersist()
        pids.unpersist()
        cand.unpersist()
        banded.unpersist()
        sh.unpersist()

    return _sink


def fuzzy_contamination_pairs(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
) -> DataFrame:
    """Fuzzy benchmark decontamination (the near-dup analogue of
    ``contamination_stats``, cf. Dolma/RedPajama fuzzy decontam): corpus
    docs that are MinHash-LSH candidates against any benchmark doc are
    verified by exact shingle Jaccard; pairs ≥ threshold come back as
    ``(corpus_id, bench_id, jaccard)`` — the kill list for paraphrased/
    truncated test-set leakage that exact n-gram collision misses.

    Every hash is md5-derived (md5_minhash_banded), so an oracle replays
    signatures, buckets, candidates, and verdicts exactly; jaccard is a
    ratio of exact intersection/union counts (IEEE-identical). Scale:
    banded equi-join corpus×benchmark buckets only (never all pairs);
    verification joins the two bounded shingle sets per candidate."""
    sh_c, bnd_c = md5_minhash_banded(
        corpus, id_col, text_col, num_hashes, bands, shingle_k
    )
    sh_b, bnd_b = md5_minhash_banded(
        benchmark, id_col, text_col, num_hashes, bands, shingle_k
    )
    cand = (
        bnd_c.select(F.col("__id").alias("cid"), "bkt")
        .join(
            bnd_b.select(F.col("__id").alias("bid"), "bkt"), "bkt"
        )
        .select("cid", "bid")
        .distinct()
    )
    a = sh_c.select(
        F.col("__id").alias("cid"), F.col("__shingles").alias("__sa")
    )
    b = sh_b.select(
        F.col("__id").alias("bid"), F.col("__shingles").alias("__sb")
    )
    verified = (
        cand.join(a, "cid")
        .join(b, "bid")
        .select(
            F.col("cid").alias("corpus_id"),
            F.col("bid").alias("bench_id"),
            F.size(F.array_intersect("__sa", "__sb")).alias("__ni"),
            (
                F.size("__sa") + F.size("__sb")
                - F.size(F.array_intersect("__sa", "__sb"))
            ).alias("__nu"),
        )
        .withColumn("jaccard", F.col("__ni") / F.col("__nu"))
        .filter(F.col("jaccard") >= F.lit(threshold))
    )
    return verified.select("corpus_id", "bench_id", "jaccard")
