"""PCA over an embedding column — the dimensionality-reduction /
whitening step a vector pipeline runs before ANN indexing or clustering
(e.g. OPQ-style rotation, IVF cell training on reduced vectors).

Scale architecture (the only one that works at 100 TB of vectors):
- The data pass computes per-partition moment partials — (n, sum-vector,
  outer-product sum) — via Arrow-batched mapInPandas; each partial is
  O(d²) doubles regardless of partition row count (d=64 → 32 KiB).
  Partials collect to the driver (executors × 32 KiB, trivial).
- The d×d eigendecomposition runs driver-side with numpy — O(d³) on a
  matrix that fits in L2 cache; distributing it would be pure overhead.
  (This is the same distributed-moments + local-solve split k-means and
  IVF training use, clustering.py / similarity.py.)
- Projection is a broadcast matmul: components ship to executors once,
  each Arrow batch projects with one BLAS call. Corpus rows never
  round-trip through per-row Python.

Determinism: eigh on a symmetric matrix is deterministic for a fixed
BLAS; eigenvector SIGN is not mathematically determined, so each
component is canonicalized (its largest-|coefficient| entry made
positive) — making projections reproducible across runs and platforms
modulo float noise, which tests bound."""

from __future__ import annotations

from typing import Iterator, NamedTuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class PCAModel(NamedTuple):
    mean: np.ndarray          # (d,)
    components: np.ndarray    # (k, d) rows = principal axes
    eigenvalues: np.ndarray   # (k,) variances along components
    total_variance: float     # trace of the covariance
    n_rows: int


def _moment_partials(vec_col: str):
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n, s, o = 0, None, None
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf[vec_col].to_numpy())
            n += x.shape[0]
            s = x.sum(axis=0) if s is None else s + x.sum(axis=0)
            xo = x.T @ x
            o = xo if o is None else o + xo
        if n:
            yield pd.DataFrame(
                {
                    "n": [n],
                    "s": [s.astype("float64")],
                    "o": [o.astype("float64").ravel()],
                }
            )

    return fn


def covariance_int_moments(
    df: DataFrame, vec_col: str, scale: int = 1_000_000
) -> tuple[int, list[int], list[list[int]]]:
    """Exact integer-quantized covariance moments of an embedding column —
    the hash-gateable twin of the float moment pass in ``pca_fit``.

    Each element is snapped to a 1/``scale`` grid (floor(x*scale + 0.5),
    the engine-independent rounding this repo's oracles use), then the
    (n, Σx, Σxy) moments are EXACT integers: the same distributed one-pass
    mapInPandas partial scheme as ``_moment_partials``, folded driver-side
    in arbitrary-precision Python ints. From these, covariance derives by
    IEEE division of identically-valued integers — bit-equal across
    engines, which is what lets the O(d²) moment matrix sit under the
    DuckDB hash gate while only the eigh step stays rows-only.

    Per-partition partials accumulate in int64: |x|<=scale ⇒ each product
    <= scale², so a partition stays exact while rows/partition <=
    2^62/scale² (~4.6e6 at the default scale) — repartition wider before
    calling at larger volumes (asserted in the partial)."""
    limit = (1 << 62) // (scale * scale)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n, s, o = 0, None, None
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype("float64")
            xi = np.floor(x * scale + 0.5).astype("int64")
            # The row-count bound below assumes every product <= scale²,
            # i.e. |x| <= 1 after quantization. Components outside [-1,1]
            # would wrap the int64 partial SILENTLY (ADVICE r3 #4) — fail
            # loudly instead; callers with unnormalized embeddings must
            # pre-scale or raise `scale` headroom.
            mx = int(np.abs(xi).max(initial=0))
            assert mx <= scale, (
                f"covariance_int_moments: |x| up to {mx/scale:.3f} exceeds "
                "1.0 — int64 partials would overflow silently; normalize "
                "the vectors or lower `scale`"
            )
            n += xi.shape[0]
            assert n <= limit, (
                f"covariance_int_moments: >{limit} rows in one partition "
                "overflows the int64 partial — repartition wider"
            )
            s = xi.sum(axis=0) if s is None else s + xi.sum(axis=0)
            xo = xi.T @ xi
            o = xo if o is None else o + xo
        if n:
            yield pd.DataFrame({"n": [n], "s": [s], "o": [o.ravel()]})

    partials = df.select(vec_col).mapInPandas(
        fn, schema="n long, s array<long>, o array<long>"
    ).collect()
    if not partials:
        raise ValueError("covariance_int_moments: empty input")
    d = len(partials[0]["s"])
    n = 0
    s = [0] * d
    o = [[0] * d for _ in range(d)]
    for p in partials:
        n += int(p["n"])
        ps, po = p["s"], p["o"]
        for i in range(d):
            s[i] += int(ps[i])
            row = o[i]
            base = i * d
            for j in range(d):
                row[j] += int(po[base + j])
    return n, s, o


def pca_fit(df: DataFrame, vec_col: str, k: int) -> PCAModel:
    """Fit PCA on ``df[vec_col]`` (array<numeric>), keep top-``k``
    components by eigenvalue."""
    partials = df.select(vec_col).mapInPandas(
        _moment_partials(vec_col),
        schema="n long, s array<double>, o array<double>",
    ).collect()
    if not partials:
        raise ValueError("pca_fit: empty input")
    n = sum(p["n"] for p in partials)
    d = len(partials[0]["s"])
    s = np.zeros(d)
    o = np.zeros((d, d))
    for p in partials:
        s += np.asarray(p["s"])
        o += np.asarray(p["o"]).reshape(d, d)
    mean = s / n
    cov = (o - n * np.outer(mean, mean)) / (n - 1)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    idx = np.argsort(evals)[::-1][:k]
    comps = evecs[:, idx].T.copy()
    # canonical sign: largest-|coeff| entry of each component positive
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return PCAModel(
        mean=mean,
        components=comps,
        eigenvalues=np.maximum(evals[idx], 0.0),
        total_variance=float(np.trace(cov)),
        n_rows=int(n),
    )


def pca_project(
    df: DataFrame, vec_col: str, model: PCAModel, out_col: str = "proj"
) -> DataFrame:
    """Project vectors onto the model's components (centered) — one
    broadcast of (mean, components), one BLAS matmul per Arrow batch."""
    spark = df.sparkSession
    b = spark.sparkContext.broadcast(
        (model.mean, model.components)
    )
    cols = df.columns

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        mean, comps = b.value
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf[vec_col].to_numpy())
            proj = (x - mean) @ comps.T
            out = pdf.drop(columns=[vec_col])
            out[out_col] = list(proj.astype("float64"))
            yield out

    out_fields = [
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.schema.fields
        if f.name != vec_col
    ]
    schema = ", ".join(out_fields + [f"{out_col} array<double>"])
    return df.select(*cols).mapInPandas(fn, schema=schema)


def random_projection(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_dims: int = 16,
    grid: int = 1_000_000,
) -> DataFrame:
    """Johnson-Lindenstrauss random projection with md5-derived ±1 signs
    (Achlioptas '01 database-friendly variant, sign matrix s_ij =
    parity of md5(i ',' j)) — the cheap, data-independent companion to
    PCA for embedding dimension reduction: distances are preserved
    within (1±ε) w.h.p., no training pass, and the projection of a new
    vector never changes (critical for incremental pipelines — PCA
    axes drift with data, JL signs don't).

    Returns ``(id, dim, proj_g)``: each output coordinate as an exact
    BIGINT grid sum (every signed element snaps pre-sum, so the result
    is fold-order independent and the oracle reproduces it bit-for-bit;
    /grid for the float value). Scale: explode to |vec|·d·k rows, one
    (id, dim) aggregate — embarrassingly parallel, no Python, the sign
    matrix is an expression, never materialized."""
    ex = emb.select(
        F.col(id_col),
        F.posexplode(F.col(vec_col)).alias("__pos", "__e"),
    ).select(
        id_col,
        (F.col("__pos") + 1).alias("__j"),  # 1-based, mirrors SQL subscripts
        F.col("__e").cast("double").alias("__v"),
    )
    pairs = ex.select(
        id_col,
        "__j",
        "__v",
        F.explode(F.sequence(F.lit(0), F.lit(out_dims - 1))).alias("dim"),
    )
    parity = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("dim").cast("string"),
                        F.lit(","),
                        F.col("__j").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 2
    )
    signed = F.when(parity == 0, F.col("__v")).otherwise(-F.col("__v"))
    g = F.floor(signed * F.lit(grid) + F.lit(0.5)).cast("long")
    return (
        pairs.select(id_col, "dim", g.alias("__g"))
        .groupBy(id_col, "dim")
        .agg(F.sum("__g").alias("proj_g"))
    )
