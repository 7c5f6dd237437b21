"""Document chunking and deterministic dataset splitting — the two
reshaping steps between a curated corpus and a training run.

Both are pure JVM expression plans (sequence/slice/explode for chunking,
md5-prefix comparison for splitting): they fold into the scan stage, never
touch Python, and scale linearly with the corpus. ``chunk_documents_udtf``
is the same chunker as a Python UDTF — the escape hatch for tokenizers an
expression can't express (real BPE, sentence segmenters); tests pin it to
the expression version so both stay in sync.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from m13_sparkstreaming_python_azure_spark.operators.text import tokens


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_size: int = 50,
    stride: int = 40,
) -> DataFrame:
    """Split each document into token chunks of ``chunk_size`` starting
    every ``stride`` tokens (overlap = chunk_size - stride; the trailing
    chunk may be short). Empty documents produce no chunks.

    One generated array + one explode per row — no shuffle, no UDF; at
    100 TB this runs entirely inside the scan stage and the output is
    repartitionable by (id, chunk_id) for downstream tokenization."""
    toks = tokens(F.col(text_col))
    out = (
        df.select(F.col(id_col), toks.alias("__toks"))
        .filter(F.size("__toks") > 0)
        .select(
            id_col,
            "__toks",
            F.explode(
                F.sequence(F.lit(1), F.size("__toks"), F.lit(stride))
            ).alias("__start"),
        )
    )
    chunk = F.slice(F.col("__toks"), F.col("__start"), chunk_size)
    return out.select(
        F.col(id_col),
        ((F.col("__start") - 1) / stride).cast("int").alias("chunk_id"),
        F.array_join(chunk, " ").alias("chunk_text"),
        F.size(chunk).alias("n_chunk_tokens"),
    )


def chunk_documents_udtf(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_size: int = 50,
    stride: int = 40,
) -> DataFrame:
    """UDTF flavor of ``chunk_documents`` (one input row → N output rows in
    Python). Same output contract; use only when the chunking logic needs a
    real Python tokenizer — the expression version is the scale path."""
    import uuid

    from pyspark.sql.functions import udtf

    @udtf(returnType=f"{id_col} bigint, chunk_id int, chunk_text string, "
                     "n_chunk_tokens int")
    class ChunkDoc:
        def eval(self, doc_id, text):  # noqa: ANN001
            toks = [t for t in (text or "").lower().split() if t]
            for i, start in enumerate(range(0, len(toks), stride)):
                chunk = toks[start : start + chunk_size]
                yield doc_id, i, " ".join(chunk), len(chunk)

    spark = df.sparkSession
    fn = f"chunk_doc_udtf_{uuid.uuid4().hex[:8]}"
    view = f"chunk_src_{uuid.uuid4().hex[:8]}"
    spark.udtf.register(fn, ChunkDoc)
    df.createOrReplaceTempView(view)
    return spark.sql(
        f"SELECT t.* FROM {view} AS d, "
        f"LATERAL {fn}(d.{id_col}, d.{text_col}) AS t"
    )


# 0.9 * 0x10000 = 0xe666; 0.95 * 0x10000 = 0xf333. Comparing the lowercase
# hex md5 prefix lexically == comparing the first 16 bits numerically, and
# every engine's md5 of the same bytes agrees — so the assignment is
# reproducible anywhere, which is the whole point of hash-based splits.
_DEFAULT_CUTS = (("train", "e666"), ("val", "f333"), ("test", None))


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    salt: str = "seed42",
    cuts: tuple = _DEFAULT_CUTS,
) -> DataFrame:
    """Deterministic train/val/test assignment from md5(salt:id) — stable
    under reshuffling, re-runs, and engine changes (unlike rand()-based
    sampling); changing ``salt`` redraws the whole split."""
    h = F.substring(
        F.md5(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string"))), 1, 4
    )
    expr = None
    for name, cut in cuts:
        if cut is None:
            otherwise = F.lit(name)
        elif expr is None:
            expr = F.when(h < cut, name)
        else:
            expr = expr.when(h < cut, name)
    return df.withColumn("split", expr.otherwise(otherwise)).withColumn(
        "hash_prefix", h
    )


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    budget: int = 2048,
    n_shards: int = 32,
) -> DataFrame:
    """Sequence packing for pretraining: assign each document a (shard,
    bin_id, offset_in_bin) so that concatenating a bin's documents in
    ``id_col`` order fills a ~``budget``-token context window — contiguous
    greedy packing (a document that straddles a boundary stays in the bin
    it starts in, so bins overflow by at most one document's tail).

    Scale shape: a GLOBAL packing order would funnel the corpus through
    one cumulative-sum task, so packing is sharded — ``id % n_shards``
    partitions the window, every shard packs independently in parallel,
    and bin identity is the (shard, bin_id) pair. That is also how a
    multi-worker training loader consumes packed data: one shard per
    reader, no cross-shard coordination.

    Deterministic and engine-independent (pure integer window cumsum over
    whitespace token counts), so the oracle reproduces it exactly.
    Returns (id, shard, n_tokens, bin_id, offset_in_bin).
    """
    from pyspark.sql import Window

    sized = df.select(
        F.col(id_col),
        (F.col(id_col) % n_shards).alias("shard"),
        F.size(tokens(F.col(text_col))).cast("bigint").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return sized.select(
        id_col,
        "shard",
        "n_tokens",
        F.floor(cum_before / budget).cast("bigint").alias("bin_id"),
        (cum_before % budget).cast("bigint").alias("offset_in_bin"),
    )


def leakage_safe_split(
    df: DataFrame,
    text_col: str = "text",
    salt: str = "seed42",
    cuts: tuple = _DEFAULT_CUTS,
) -> DataFrame:
    """Train/val/test split that cannot leak duplicate content across
    splits: the assignment hashes the CONTENT FINGERPRINT (exact-dup
    group key), not the row id — every copy of the same text lands in
    the same split by construction. Plain per-id hash_split puts two
    copies of one document on both sides of the train/test wall ~2·p·q
    of the time, which inflates eval scores; group-aware splitting is
    the standard fix (and with a near-dup cluster id as the group key —
    operators/graph.connected components over LSH pairs — the same call
    extends to near-duplicate leakage). One scan, no shuffle: the
    fingerprint and the split are both row-local expressions."""
    from m13_sparkstreaming_python_azure_spark.operators.dedup import (
        text_fingerprint,
    )

    fp = df.withColumn("group_fp", text_fingerprint(text_col))
    out = hash_split(fp, id_col="group_fp", salt=salt, cuts=cuts)
    return out
