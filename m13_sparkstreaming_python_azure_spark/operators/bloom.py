"""Bloom-filter join pruning (semi-join reduction).

The pattern: a selective dimension side would prune most of the fact side,
but the join only drops the non-matching fact rows AFTER the fact has been
shuffled. Spark's own runtime filter (``spark.sql.optimizer.runtime.
bloomFilter.enabled``, the InjectRuntimeFilter rule) closes that gap
automatically for some plan shapes; this operator is the explicit,
caller-sized form — it works across stages, checkpoints and persisted
intermediates where the optimizer rule can't see the join, and it lets the
caller size the filter for the real key cardinality.

Scale design (100 TB):

- The dim side folds to a fixed-size bitmap — ``num_bits/64`` longs
  (16 KiB at the 2^17-bit default) — via one tiny ``bit_or`` aggregate,
  INDEPENDENT of dim row count. Collecting it to the driver is a bounded
  constant, like k-means centroids.
- The probe is pure JVM bit arithmetic (xxhash64 + shiftleft + AND) folded
  into the fact scan's codegen stage — rows are dropped BEFORE the join
  shuffle, so shuffle volume falls by the fact's non-matching fraction.
- False positives only cost wasted shuffle rows; the real join drops them,
  so results are EXACTLY the plain join's (hash-gated by the driver).
- Size ``num_bits`` ≈ 10-16 bits per expected distinct dim key for ~1% FP;
  when the dim keyset is small enough to broadcast outright, a broadcast
  semi-join prefilter is equivalent — the bloom wins when the keyset is
  millions+ (a broadcast set of 10M longs is ~80 MB+ of hash map; the
  bloom is 16 bits/key ≈ 20 MB of flat longs at the same FP rate).

No reference analogue (SURVEY §2.3 lists only J1/J2); this extends the
join family for the 100 TB fact⋈selective-dim case.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _one_shl(bits: Column) -> Column:
    """``1L << bits`` with a per-row shift amount (PySpark's F.shiftleft
    only takes a literal shift count)."""
    return F.call_function("shiftleft", F.lit(1).cast("long"), bits)


def _bit_positions(key: Column, num_bits: int, num_hashes: int) -> list[Column]:
    """k bit positions for a key: pmod(xxhash64(key, seed=i), m)."""
    return [
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(num_bits))
        for i in range(num_hashes)
    ]


def build_bloom(
    dim: DataFrame,
    key_col: str,
    num_bits: int = 1 << 17,
    num_hashes: int = 5,
) -> list[int]:
    """Aggregate ``dim[key_col]`` into a bloom bitmap, returned as the
    driver-side list of ``num_bits // 64`` longs (missing words = 0).

    One narrow projection + one ``bit_or`` aggregate over at most
    ``num_bits/64`` groups — the shuffle carries (word_idx, word) pairs,
    already collapsed map-side, never the keys themselves.
    """
    if num_bits % 64:
        raise ValueError("num_bits must be a multiple of 64")
    key = F.col(key_col)
    pos = F.explode(F.array(*_bit_positions(key, num_bits, num_hashes)))
    words = (
        dim.select(pos.alias("pos"))
        .select(
            (F.col("pos") / 64).cast("long").alias("word_idx"),
            _one_shl((F.col("pos") % 64).cast("int")).alias("bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("bit").alias("word"))
        .collect()
    )
    bitmap = [0] * (num_bits // 64)
    for row in words:
        bitmap[row["word_idx"]] = row["word"]
    return bitmap


def might_contain(
    key: Column,
    bitmap: list[int],
    num_hashes: int = 5,
) -> Column:
    """Column predicate: all ``num_hashes`` bloom bits set for ``key``.

    The bitmap rides along as one literal long-array (a folded constant in
    codegen, materialized once per task, not per row); each probe is k
    element_at + AND operations — no Python, no join, no shuffle.

    r13 (guide §1.2 — driver overhead is real time too): the literal is
    built as ONE ``F.expr("array(CAST(.. AS BIGINT), ..)")`` parsed
    JVM-side (7 ms at the 16 KiB default) instead of ``F.array`` over
    per-word ``F.lit`` columns — the old shape issued
    k·(num_bits/64) py4j round trips just to CONSTRUCT the predicate
    (measured 4.9 s of pure driver time before any job ran) and shipped
    a 2048-child CreateArray into codegen per probe. (``F.lit(list)``
    still converts element-by-element over py4j — measured 1.0 s.)
    CAST keeps min-long words parseable (a bare ``...L`` literal
    overflows the parser's unary-minus shape).
    """
    num_bits = len(bitmap) * 64
    words = F.expr(
        "array(" + ",".join(f"CAST({w} AS BIGINT)" for w in bitmap) + ")"
    )
    checks = []
    for pos in _bit_positions(key, num_bits, num_hashes):
        word = F.element_at(words, (pos / 64).cast("int") + 1)
        bit = _one_shl((pos % 64).cast("int"))
        checks.append(word.bitwiseAND(bit) != 0)
    out = checks[0]
    for c in checks[1:]:
        out = out & c
    return out


def bloom_pruned_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    how: str = "inner",
    num_bits: int = 1 << 17,
    num_hashes: int = 5,
) -> DataFrame:
    """``fact.join(dim, on, how)`` with the fact side bloom-pre-filtered on
    the dim keyset — identical results (false positives die in the real
    join), shuffle volume cut to ~the matching fraction.

    Only inner/right-semi shapes keep semantics under pre-filtering of the
    fact side; left/outer joins must keep non-matching fact rows.
    """
    if how not in ("inner", "left_semi", "semi"):
        raise ValueError("bloom pruning only preserves inner/semi joins")
    bitmap = build_bloom(dim, on, num_bits=num_bits, num_hashes=num_hashes)
    pruned = fact.filter(might_contain(F.col(on), bitmap, num_hashes))
    return pruned.join(dim, on=on, how=how)
