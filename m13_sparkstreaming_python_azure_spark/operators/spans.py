"""Cross-document repeated-span detection — the exact-substring-dedup
primitive (cf. Lee et al., "Deduplicating Training Data Makes Language
Models Better": long verbatim repeats across documents are memorization
fuel and should be found, measured, and trimmed).

Algorithm (all relational, no Python, no suffix arrays):

1. Tokenize once; emit every n-token shingle WITH its position
   (posexplode). Equal shingles across two documents are points
   (pos_a, pos_b) on that pair's match matrix.
2. Inverted-index equi-join on the shingle string bounds the pair space
   to documents that actually overlap; a ``max_doc_freq`` stop-gram
   cutoff keeps posting lists (and the join) near-linear — identical to
   the proven ``ngram_jaccard_pairs`` shape in operators/dedup.py.
3. Consecutive matches on one DIAGONAL (pos_b − pos_a constant, pos_a
   consecutive) are one shared run: overlapping equal n-grams chain into
   a common substring of run_length + n − 1 tokens. The island trick —
   group by (pair, diagonal, pos_a − row_number) — finds every maximal
   run with one window + one aggregate.
4. Keep each pair's longest span ≥ ``min_span`` (deterministic
   tie-break: earliest a_start, then b_start).

Scale: one shuffle keyed by shingle (bounded by the doc-freq cutoff),
one keyed by candidate pair — nothing quadratic in the corpus, quadratic
only within a shared-shingle posting list. At 100 TB run it per
near-dup-cluster or per LSH band bucket to pre-bound pairs further.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from m13_sparkstreaming_python_azure_spark.operators.text import (
    token_count,
    tokens,
)
from m13_sparkstreaming_python_azure_spark.operators.util import spread

SPAN_SPREAD_BYTES = 1 << 20


def positional_shingles(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """(id, pos, gram) for every n-token shingle; docs shorter than n
    tokens emit nothing (the sequence guard avoids Spark's descending
    sequence when size − n < 0)."""
    toked = (
        spread(df, target_bytes_per_partition=SPAN_SPREAD_BYTES)
        .select(F.col(id_col).alias("__id"), tokens(text_col).alias("__t"))
        .filter(F.size("__t") >= n)
    )
    grams = F.transform(
        F.sequence(F.lit(0), F.size("__t") - n),
        lambda i: F.concat_ws(" ", F.slice("__t", i + 1, n)),
    )
    return toked.select(
        "__id", F.posexplode(grams).alias("pos", "gram")
    )


def repeated_spans(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    n: int = 8,
    min_span: int = 20,
    max_doc_freq: int | None = 50,
) -> DataFrame:
    """Longest shared token span per document pair, as
    (id_a, id_b, span_len, a_start, b_start) with id_a < id_b,
    span_len ≥ ``min_span`` (token positions are 0-based)."""
    grams = positional_shingles(df, id_col, text_col, n)
    if max_doc_freq is not None:
        rare = (
            grams.groupBy("gram")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") <= max_doc_freq)
            .select("gram")
        )
        grams = grams.join(rare, on="gram", how="left_semi")
    a = grams.select(
        F.col("__id").alias("id_a"), F.col("pos").alias("pa"), "gram"
    )
    b = grams.select(
        F.col("__id").alias("id_b"), F.col("pos").alias("pb"), "gram"
    )
    matches = (
        a.join(b, on="gram")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "pa", "pb")
        .withColumn("diag", F.col("pb") - F.col("pa"))
    )
    w_run = Window.partitionBy("id_a", "id_b", "diag").orderBy("pa")
    runs = (
        matches.withColumn(
            "grp", F.col("pa") - F.row_number().over(w_run)
        )
        .groupBy("id_a", "id_b", "diag", "grp")
        .agg(
            (F.count(F.lit(1)) + (n - 1)).alias("span_len"),
            F.min("pa").alias("a_start"),
            F.min("pb").alias("b_start"),
        )
    )
    w_best = Window.partitionBy("id_a", "id_b").orderBy(
        F.col("span_len").desc(), "a_start", "b_start"
    )
    return (
        runs.withColumn("rn", F.row_number().over(w_best))
        .filter((F.col("rn") == 1) & (F.col("span_len") >= min_span))
        .select("id_a", "id_b", "span_len", "a_start", "b_start")
    )


def winnowing_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    k: int = 5,
    w: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD'03 — the MOSS algorithm): hash every k-token gram, slide a
    window of ``w`` consecutive gram hashes, select the minimum of each
    window (rightmost position on ties), dedup the selected set. The
    guarantee: any shared run of ≥ w+k−1 tokens between two documents
    yields at least one IDENTICAL selected fingerprint, while only
    ~2/(w+1) of all grams are kept — fixed-rate sampling that never
    misses a long match (vs MinHash, which is probabilistic).

    Determinism: gram hashes are md5-derived BIGINTs (engine-
    reproducible); rightmost-min selection uses the composite key
    ``hash·2²⁰ + (2²⁰−1−pos)`` with ``min_by`` over a w-row window — the
    key is unique per position, so no tie ambiguity anywhere. The window
    is PARTITIONED by document (never a global sort); everything else is
    explode → window → distinct, all doc-keyed."""
    if w < 1:
        raise ValueError("window w must be >= 1")
    grams = positional_shingles(df, id_col, text_col, n=k)
    hashed = grams.select(
        "__id",
        "pos",
        F.conv(F.substring(F.md5(F.col("gram")), 1, 10), 16, 10)
        .cast("long")
        .alias("h"),
    )
    # rightmost-min of each w-window via a unique composite key:
    # min hash wins; among equal hashes the LARGER pos (smaller 2^20-1-pos).
    # 40-bit hash × 2^20 + 20-bit pos = 60 bits — fits a signed long.
    # The 20-bit pos field requires pos < 2^20 (~1M k-grams/doc); beyond
    # that the pos component goes negative and silently breaks key
    # uniqueness — enforce it IN the key expression (coalesce forces the
    # assert to evaluate; Catalyst can't prune it away).
    key = F.coalesce(
        F.assert_true(
            F.col("pos") < F.lit(1 << 20),
            F.lit(
                "winnowing_fingerprints: document has >= 2^20 k-grams; "
                "the 40-bit/20-bit composite key layout caps positions "
                "at 1,048,575 — chunk the document first"
            ),
        ).cast("long"),
        F.col("h") * F.lit(1 << 20) + (F.lit((1 << 20) - 1) - F.col("pos")),
    )
    win = (
        Window.partitionBy("__id")
        .orderBy("pos")
        .rowsBetween(-(w - 1), 0)
    )
    sel = hashed.withColumn(
        "sel_pos", F.min_by(F.col("pos"), key).over(win)
    ).withColumn("sel_h", F.min_by(F.col("h"), key).over(win))
    # windows shorter than w (the first w-1 rows) still select — matches
    # the paper's prefix behavior of emitting from every window seen
    return (
        sel.select(
            F.col("__id").alias(id_col),
            F.col("sel_pos").alias("pos"),
            F.col("sel_h").alias("fingerprint"),
        )
        .distinct()
    )


def winnowing_matches(
    fps: DataFrame,
    id_col: str,
    min_shared: int = 2,
) -> DataFrame:
    """Document pairs sharing ≥ ``min_shared`` winnowing fingerprints —
    fingerprint-keyed equi-join (each fingerprint bucket joins only its
    own postings, the LSH-band shape; never all-pairs), id_a < id_b."""
    a = fps.select(F.col(id_col).alias("id_a"), "fingerprint")
    b = fps.select(F.col(id_col).alias("id_b"), "fingerprint")
    return (
        a.join(b, "fingerprint")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def exact_substring_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """ExactSubstr deduplication (Lee et al. 2022, the REMOVAL step the
    detection operators above stop short of): every n-token span that
    also appears in an EARLIER document (min id over the corpus owns the
    span) is cut from the later document; the first occurrence survives
    verbatim. Within-document repeats are kept (cross-document
    memorization fuel is the target; in-doc repetition is a quality
    signal handled by with_repetition_stats).

    All relational, no suffix arrays: positional shingles → gram-keyed
    min-id ownership → duplicated-span starts → covered-position explode
    (n per span) → anti-join the token stream → per-doc ordered
    reassembly. Shuffles are keyed by gram / (doc, pos) / doc — nothing
    pairwise, nothing quadratic; the collect_list is per-document,
    bounded by document length like every per-doc text operator here.

    Returns (id, n_tokens, n_removed, redacted) where ``redacted`` is
    the surviving tokens joined by single spaces (tokenization is
    whitespace-lossy by design — the operator's contract is token-level,
    matching how ExactSubstr pipelines re-tokenize anyway)."""
    toks = (
        df.select(F.col(id_col).alias("__id"), tokens(text_col).alias("__t"))
        .select(
            "__id",
            F.size("__t").alias("n_tokens"),
            F.posexplode("__t").alias("pos", "tok"),
        )
    )
    grams = positional_shingles(df, id_col, text_col, n)
    owners = grams.groupBy("gram").agg(F.min("__id").alias("__owner"))
    dup_starts = (
        grams.join(owners, "gram")
        .filter(F.col("__id") > F.col("__owner"))
        .select("__id", F.col("pos").alias("s"))
    )
    covered = dup_starts.select(
        "__id", F.explode(F.sequence(F.col("s"), F.col("s") + n - 1)).alias("pos")
    ).distinct()
    kept = toks.join(covered, ["__id", "pos"], "left_anti")
    rebuilt = kept.groupBy("__id").agg(
        F.first("n_tokens").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda x: x["tok"],
            ),
            " ",
        ).alias("redacted"),
    )
    base = df.select(
        F.col(id_col).alias("__id"), token_count(text_col).alias("n_tokens")
    )
    return (
        base.join(rebuilt.select("__id", "n_kept", "redacted"), "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            "n_tokens",
            (F.col("n_tokens") - F.coalesce(F.col("n_kept"), F.lit(0)))
            .alias("n_removed"),
            F.coalesce(F.col("redacted"), F.lit("")).alias("redacted"),
        )
    )
