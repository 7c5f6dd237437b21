"""Z-order (Morton-curve) clustered writes — multi-dimensional data
clustering so parquet min/max footer stats prune files on EVERY clustered
column, not just the sort-leading one (SURVEY.md §7 scale extension; the
reference's only layout tool is day-partitioning, upload.py:68-73).

Why: a plain ``sortWithinPartitions(a, b)`` layout gives perfect file
pruning on ``a`` and none on ``b``. Interleaving the bits of (quantized)
``a`` and ``b`` into one Morton key and range-partitioning + sorting by it
makes every file a small hyper-rectangle in (a, b) space — a predicate on
either column overlaps few files, so the scan skips the rest using footer
stats alone. This is the OSS-Spark equivalent of Delta/Iceberg OPTIMIZE
ZORDER, built from pure built-in expressions (bit shifts/masks folded by
codegen — no UDF anywhere).

The key is computed with the SAME closed-form bit arithmetic an ANSI
engine would use, so the driver's DuckDB oracle hash-checks it
bit-for-bit (``zorder_key`` query).
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quantize(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Map a numeric column into [0, 2^bits) integer cells (clamped), the
    normalization step before bit interleaving. Equal-width cells keep the
    expression oracle-checkable; for heavily skewed columns quantize a
    rank (ntile) instead."""
    cells = 1 << bits
    width = (hi - lo) / cells
    raw = F.floor((col - F.lit(lo)) / F.lit(width))
    return F.least(F.lit(cells - 1), F.greatest(F.lit(0), raw)).cast("long")


def morton_key(cols: Sequence[Column], bits: int = 16) -> Column:
    """Interleave ``bits`` low bits of each (already-quantized, long)
    column into one long: output bit (b * n_cols + i) = bit b of col i.
    Pure shift/mask/sum expressions — whole-stage-codegen friendly and
    expressible in any SQL dialect."""
    n = len(cols)
    terms = [
        ((F.shiftright(c, b).bitwiseAND(F.lit(1))) * F.lit(1 << (b * n + i)))
        for b in range(bits)
        for i, c in enumerate(cols)
    ]
    return reduce(lambda a, t: a + t, terms).cast("long")


def write_zordered(
    df: DataFrame,
    path: str,
    zkey: Column,
    n_files: int,
    mode: str = "overwrite",
) -> None:
    """Cluster rows along the Morton curve and write ``n_files`` parquet
    files, each covering a compact z-range (→ a small box in the original
    dimensions).

    ``repartitionByRange`` samples the key to build balanced range bounds
    (one extra pass over the key column, not the data); the within-
    partition sort keeps each file's footer stats tight. At 100 TB this
    layout step is one shuffle — amortized across every later query that
    prunes on any clustered column."""
    (
        df.withColumn("__zkey", zkey)
        .repartitionByRange(n_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode(mode)
        .parquet(path)
    )


def zorder_key_orders_expr() -> Column:
    """The gated demo key: interleave (o_custkey mod 1024, o_orderkey mod
    1024) at 10 bits each — modulo keeps the quantization bound-free and
    deterministic across engines."""
    a = (F.col("o_custkey") % 1024).cast("long")
    b = (F.col("o_orderkey") % 1024).cast("long")
    return morton_key([a, b], bits=10)


def zorder_key_orders_sql() -> str:
    """DuckDB oracle twin of ``zorder_key_orders_expr`` — the identical
    closed-form bit arithmetic, generated term-by-term."""
    terms = []
    for bit in range(10):
        for i, col in enumerate(["o_custkey % 1024", "o_orderkey % 1024"]):
            terms.append(
                f"((({col}) >> {bit}) & 1) * {1 << (bit * 2 + i)}"
            )
    expr = " + ".join(terms)
    return (
        "SELECT o_orderkey, CAST("
        + expr
        + " AS BIGINT) AS zkey FROM orders"
    )
