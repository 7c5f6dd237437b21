"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline; random-hyperplane LSH
bucketing as the scale path (the same signature→band→bucket-join shape as
MinHash dedup). Dot products run as JVM HOF expressions
(``aggregate(zip_with(...))``) — no Python in the loop.

Scale notes:
- Brute force is O(N·Q·d) — fine when the query side is small enough to
  broadcast (the common "probe set vs corpus" case); the corpus side
  streams through codegen with no shuffle except the final per-query top-k.
- LSH: P(same bucket) = (1 − θ/π)^bits per table; more tables trade
  compute for recall. All tables' buckets are produced in ONE pass over
  the data (the plane tensor is a literal array constant in the plan, the
  table index an ``explode``) — not one scan per table.
- Candidate pairs travel as (query_id, neighbor_id) only; vectors re-join
  after the distinct so the pair shuffle stays narrow.
- embedding-cosine near-dup for dedup is the same candidate generator with
  a similarity threshold instead of a per-query top-k window.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from m13_sparkstreaming_python_azure_spark.operators.util import spread


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


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
    b = spread(base).select(
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
    planes × ``dim`` components (driver-side constants, broadcast as one
    literal tensor into the plan)."""
    rng = random.Random(seed)
    return [
        [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(bits)]
        for _ in range(tables)
    ]


def _bucketed(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    out_id: str,
    planes: list[list[list[float]]],
) -> DataFrame:
    """One row per (vector, table) with the table's sign-pattern bucket —
    a single scan; the plane tensor is a plan literal indexed per table."""
    planes_lit = F.lit(planes).cast("array<array<array<double>>>")
    tables = len(planes)
    d = df.select(F.col(id_col).alias(out_id), _as_double(F.col(vec_col)).alias("__v"))
    return d.select(
        out_id,
        "__v",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(tables - 1)),
                lambda t: F.struct(
                    t.alias("table"),
                    F.xxhash64(
                        t,
                        F.array_join(
                            F.transform(
                                F.element_at(planes_lit, t + 1),
                                lambda plane: F.when(
                                    dot(F.col("__v"), plane) > 0, F.lit("1")
                                ).otherwise(F.lit("0")),
                            ),
                            "",
                        ),
                    ).alias("bucket"),
                ),
            )
        ).alias("__tb"),
    ).select(out_id, "__tb.table", "__tb.bucket")


def lsh_candidates(
    base: DataFrame,
    queries: DataFrame,
    base_id: str,
    base_vec: str,
    query_id: str,
    query_vec: str,
    dim: int,
    bits: int,
    tables: int,
    seed: int = 42,
) -> DataFrame:
    """(query_id, neighbor_id) candidate pairs that share ≥1 LSH bucket."""
    planes = random_hyperplanes(dim, bits, tables, seed)
    base = spread(base)
    b = _bucketed(base, base_id, base_vec, "neighbor_id", planes).select(
        "neighbor_id", "table", "bucket"
    )
    q = _bucketed(queries, query_id, query_vec, "query_id", planes).select(
        "query_id", "table", "bucket"
    )
    return b.join(q, on=["table", "bucket"]).select("query_id", "neighbor_id").distinct()


def _score_candidates(
    candidates: DataFrame,
    base: DataFrame,
    queries: DataFrame,
    base_id: str,
    base_vec: str,
    query_id: str,
    query_vec: str,
    broadcast_queries: bool = True,
) -> DataFrame:
    """Re-join vectors onto id-only candidate pairs and compute cosine.
    ``broadcast_queries=False`` for self-joins where the "query" side is
    the full corpus (near-dup) — that join must shuffle, not broadcast."""
    b = base.select(
        F.col(base_id).alias("neighbor_id"),
        _as_double(F.col(base_vec)).alias("__bv"),
    ).withColumn("__bn", l2_norm(F.col("__bv")))
    q = queries.select(
        F.col(query_id).alias("query_id"),
        _as_double(F.col(query_vec)).alias("__qv"),
    ).withColumn("__qn", l2_norm(F.col("__qv")))
    if broadcast_queries:
        q = F.broadcast(q)
    return (
        candidates.join(b, on="neighbor_id")
        .join(q, on="query_id")
        .withColumn(
            "cosine_sim",
            F.round(
                dot(F.col("__bv"), F.col("__qv")) / (F.col("__bn") * F.col("__qn")),
                6,
            ),
        )
    )


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
    """Approximate cosine top-k: LSH candidate generation + exact cosine
    re-rank within candidates."""
    cand = lsh_candidates(
        base, queries, base_id, base_vec, query_id, query_vec, dim, bits, tables, seed
    )
    scored = _score_candidates(
        cand, base, queries, base_id, base_vec, query_id, query_vec
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
    """Embedding-cosine near-duplicate pairs (cosine ≥ threshold): LSH
    self-candidates + exact verification, threshold filter instead of a
    top-k window (no ranking shuffle)."""
    df = spread(df)
    self_q = df.select(F.col(id_col).alias("__qid"), F.col(vec_col).alias("__qvec"))
    cand = lsh_candidates(
        df, self_q, id_col, vec_col, "__qid", "__qvec", dim, bits, tables, seed
    ).filter(F.col("query_id") < F.col("neighbor_id"))
    scored = _score_candidates(
        cand, df, self_q, id_col, vec_col, "__qid", "__qvec", broadcast_queries=False
    )
    return scored.filter(F.col("cosine_sim") >= threshold).select(
        F.col("query_id").alias("id_a"),
        F.col("neighbor_id").alias("id_b"),
        "cosine_sim",
    )
