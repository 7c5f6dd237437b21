"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline; random-hyperplane LSH
bucketing as the scale path (the same signature→band→bucket-join shape as
MinHash dedup). Dot products run as JVM HOF expressions
(``aggregate(zip_with(...))``) — no Python in the loop.

Scale notes:
- Brute force is O(N·Q·d) — fine when the query side is small enough to
  broadcast (the common "probe set vs corpus" case); the corpus side
  streams through codegen with no shuffle except the final per-query top-k.
- LSH: P(same bucket) = (1 − θ/π)^bits; multiple tables trade compute for
  recall. Candidates meet in an equi-join on (table, bucket) — never a
  cross join — then exact cosine re-ranks.
- embedding-cosine near-dup for dedup is ``lsh_ann`` with base == queries
  and a similarity threshold instead of top-k.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def _as_double(col: Column) -> Column:
    return col.cast("array<double>")


def brute_force_topk(
    base: DataFrame,
    queries: DataFrame,
    base_id: str = "vec_id",
    base_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k neighbors per query (the ANN baseline).

    Pre-normalizes both sides (norm computed once per vector, not per
    pair), broadcasts the query side, ranks per query with a deterministic
    (similarity DESC, neighbor id ASC) tie-break.
    """
    b = base.select(
        F.col(base_id).alias("neighbor_id"),
        _as_double(F.col(base_vec)).alias("__bv"),
    ).withColumn("__bn", l2_norm(F.col("__bv")))
    q = queries.select(
        F.col(query_id).alias("query_id"),
        _as_double(F.col(query_vec)).alias("__qv"),
    ).withColumn("__qn", l2_norm(F.col("__qv")))

    scored = b.crossJoin(F.broadcast(q)).withColumn(
        "cosine_sim",
        F.round(
            dot(F.col("__bv"), F.col("__qv")) / (F.col("__bn") * F.col("__qn")), 6
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


def random_hyperplanes(
    dim: int, bits: int, tables: int, seed: int = 42
) -> list[list[list[float]]]:
    """Deterministic Gaussian hyperplanes: ``tables`` tables × ``bits``
    planes × ``dim`` components (driver-side constants, broadcast as
    literals into the plan)."""
    rng = random.Random(seed)
    return [
        [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(bits)]
        for _ in range(tables)
    ]


def _bucket_expr(vec: Column, planes: list[list[float]], table_idx: int) -> Column:
    """Sign-pattern bucket id for one LSH table: bit j = 1 iff vec·plane_j > 0.
    Assembled as a string of sign bits then hashed — overflow-free."""
    bits = [
        F.when(dot(vec, F.lit(p).cast("array<double>")) > 0, F.lit("1")).otherwise(
            F.lit("0")
        )
        for p in planes
    ]
    return F.xxhash64(F.lit(table_idx), F.concat(*bits))


def lsh_ann_topk(
    base: DataFrame,
    queries: DataFrame,
    base_id: str = "vec_id",
    base_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "embedding",
    k: int = 10,
    dim: int = 64,
    bits: int = 8,
    tables: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k: random-hyperplane LSH candidate generation
    (equi-join on (table, bucket)) + exact cosine re-rank within candidates."""
    planes = random_hyperplanes(dim, bits, tables, seed)

    def bucketed(df: DataFrame, idc: str, vecc: str, out_id: str) -> DataFrame:
        d = df.select(
            F.col(idc).alias(out_id), _as_double(F.col(vecc)).alias("__v")
        ).withColumn("__n", l2_norm(F.col("__v")))
        per_table = [
            d.select(
                out_id,
                "__v",
                "__n",
                F.lit(t).alias("table"),
                _bucket_expr(F.col("__v"), planes[t], t).alias("bucket"),
            )
            for t in range(tables)
        ]
        out = per_table[0]
        for p in per_table[1:]:
            out = out.unionByName(p)
        return out

    b = bucketed(base, base_id, base_vec, "neighbor_id")
    q = bucketed(queries, query_id, query_vec, "query_id")

    candidates = (
        b.join(
            q.withColumnRenamed("__v", "__qv").withColumnRenamed("__n", "__qn"),
            on=["table", "bucket"],
        )
        .select("query_id", "neighbor_id", "__v", "__n", "__qv", "__qn")
        .distinct()
    )
    scored = candidates.withColumn(
        "cosine_sim",
        F.round(dot(F.col("__v"), F.col("__qv")) / (F.col("__n") * F.col("__qn")), 6),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    dim: int = 64,
    bits: int = 8,
    tables: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cosine ≥ threshold), LSH
    candidate generation against itself + exact verification."""
    pairs = lsh_ann_topk(
        df,
        df.select(F.col(id_col).alias("query_id"), F.col(vec_col)),
        base_id=id_col,
        base_vec=vec_col,
        query_id="query_id",
        query_vec=vec_col,
        k=1 << 30,
        dim=dim,
        bits=bits,
        tables=tables,
        seed=seed,
    )
    return (
        pairs.filter(
            (F.col("query_id") < F.col("neighbor_id"))
            & (F.col("cosine_sim") >= threshold)
        )
        .select(
            F.col("query_id").alias("id_a"),
            F.col("neighbor_id").alias("id_b"),
            "cosine_sim",
        )
    )
