"""Distributed Lloyd k-means over an embedding column — the scale path
for building IVF codebooks and corpus partitions when a driver-side
sample (similarity.train_ivf_centroids) isn't representative.

Design (pagerank-style broadcast-iterate, operators/graph.py):
- The codebook is tiny (k × dim) and lives on the driver between
  iterations; each assignment pass broadcasts it into the plan as a
  literal array of (cid, vector) structs — the corpus is scanned once
  per iteration with NO shuffle for the assignment itself.
- Centroid recomputation long-forms the assigned vectors with
  posexplode and aggregates per (cluster, dim) — k×dim groups, one
  shuffle per iteration whose width is independent of corpus size.
- Cross-engine determinism: distances fold dimensions sequentially in
  doubles (bit-identical to DuckDB list_reduce over range order);
  per-dim sums are decimal(27,12) (exact, fold-order independent);
  recomputed centroid values snap to a 1e-9 grid via floor(x*1e9+0.5)
  so both engines carry identical codebooks into the next iteration;
  argmin ties break on centroid id via struct ordering.

Reference scope: the reference engine has no clustering operator — this
extends the similarity-search surface (SURVEY.md §7 phase 4) the same
way IVF does, but with the codebook trained on the FULL corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _sq_dist(vec: Column, centroid: list[float]) -> Column:
    """Sequential-fold squared L2 distance to a literal centroid —
    term order is dimension order, matching DuckDB's
    list_reduce(list_transform(range(...)), +)."""
    lit_c = F.array(*[F.lit(float(x)) for x in centroid])
    return F.aggregate(
        F.zip_with(vec, lit_c, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def assign_clusters(
    vecs: DataFrame,
    centroids: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "v",
) -> DataFrame:
    """(id, cluster) for the nearest centroid; ties break on the lower
    centroid id (struct min over (dist, cid))."""
    choices = F.array(
        *[
            F.struct(
                _sq_dist(F.col(vec_col), c).alias("dist"),
                F.lit(int(cid)).alias("cid"),
            )
            for cid, c in centroids
        ]
    )
    return vecs.select(
        id_col, F.array_min(choices).getField("cid").alias("cluster"), vec_col
    )


def recompute_centroids(
    assigned: DataFrame,
    vec_col: str = "v",
) -> list[tuple[int, list[float]]]:
    """Per-cluster mean vector, exact and grid-snapped: per-(cluster,dim)
    decimal sums, double quotient, floor(x*1e9+0.5)/1e9. Returns the
    (small) codebook to the driver for the next broadcast. Clusters that
    lost every member drop out (both engines agree). The assignment
    carries the vector, so the only shuffle per iteration is this
    k×dim-wide aggregate — corpus-size independent."""
    long_form = assigned.select(
        "cluster", F.posexplode(vec_col).alias("pos", "val")
    )
    dims = (
        long_form.groupBy("cluster", "pos")
        .agg(
            F.sum(F.col("val").cast("decimal(27,12)")).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "cluster",
            "pos",
            (
                F.floor(
                    F.col("s").cast("double") / F.col("n") * 1e9 + F.lit(0.5)
                )
                / 1e9
            ).alias("cv"),
        )
        .collect()
    )
    by_cluster: dict[int, dict[int, float]] = {}
    for r in dims:
        by_cluster.setdefault(r["cluster"], {})[r["pos"]] = r["cv"]
    return [
        (cid, [vals[i] for i in sorted(vals)])
        for cid, vals in sorted(by_cluster.items())
    ]


def kmeans_assignments(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 4,
    iterations: int = 2,
) -> DataFrame:
    """Lloyd k-means: ``iterations`` assignment passes with
    ``iterations - 1`` centroid recomputations between them. Init is
    deterministic: the vectors with the ``k`` smallest ids. Returns the
    final (id, cluster) assignment."""
    vecs = df.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    init = (
        vecs.filter(F.col("vec_id") < k)
        .select(F.col("vec_id").alias("cid"), "v")
        .collect()
    )
    centroids = sorted((int(r["cid"]), list(r["v"])) for r in init)
    assigned = assign_clusters(vecs, centroids)
    for _ in range(iterations - 1):
        centroids = recompute_centroids(assigned)
        assigned = assign_clusters(vecs, centroids)
    return assigned.select("vec_id", "cluster")
