"""Fuzzy (edit-distance) self-join via symmetric-delete blocking.

Entity-resolution primitive: find all string pairs within Levenshtein
distance ``d`` WITHOUT the O(n²) cross join. Blocking is the
symmetric-delete scheme (SymSpell): every string expands to the set of
variants reachable by deleting ≤ d characters; two strings within edit
distance d always share at least one common deletion variant, so an
equi-join on variants yields a complete candidate set, and an exact
`levenshtein` filter removes false positives. Candidate generation is
pure JVM array HOFs (transform/sequence/flatten) — no Python.

Scale shape: cost is Σ |variants| = n·(L choose ≤d) rows through ONE
equi-join — linear in corpus size for fixed d, L. The variant join key
can skew when many near-identical strings share a variant, but that
skew IS the output (those strings really are mutual matches); AQE skew
join handles the shuffle imbalance. The verify filter runs post-join on
candidate pairs only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _variant_hash_gen(blocks: list[str], max_dist: int):
    """mapInPandas generator: per input key row, the DISTINCT polynomial
    hashes of every ≤``max_dist``-deletion variant (including the key
    itself), as one array<long> — no variant string is ever built.

    Hash of a string s = Σ_t cp[t]·B^t over uint64 (wraparound; B odd →
    multiplication is a bijection mod 2^64). Deleting position i shifts
    every later code point down one power; deleting i<j shifts (i, j)
    down one and (j, ∞) down two — so with exclusive prefix sums cum0,
    cum1, cum2 over cp[t]·B^t, cp[t]·B^(t-1), cp[t]·B^(t-2):

        h()     = cum0[L]
        h(i)    = cum0[i] + (cum1[L] - cum1[i+1])
        h(i, j) = cum0[i] + (cum1[j] - cum1[i+1]) + (cum2[L] - cum2[j+1])

    each EXACTLY the polynomial hash of the corresponding variant string,
    so equal variants collide by construction. Block columns XOR in as a
    per-row mix (same FNV-style fold over their utf-8 reprs) so the
    variant join key separates blocks. Rows group by code-point length so
    all arithmetic is dense (n, L) / (n, L, L) numpy tensors."""
    import numpy as np

    B = np.uint64(1099511628211)  # FNV-1a prime — odd, well-mixed

    def _bytes_poly(bs: bytes) -> np.uint64:
        h = np.uint64(0)
        for ch in bs:
            h = h * B + np.uint64(ch + 1)
        return h

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            names = pdf["__k"].tolist()
            mix = np.zeros(len(names), dtype=np.uint64)
            for bc_i, c in enumerate(blocks):
                vals = pdf[c].astype(str).tolist()
                salt = np.uint64(0x9E3779B97F4A7C15 + bc_i)
                mix ^= np.fromiter(
                    (_bytes_poly(v.encode()) * salt for v in vals),
                    dtype=np.uint64,
                    count=len(vals),
                )
            cps = [
                np.frombuffer(n.encode("utf-32-le"), dtype=np.uint32)
                if n is not None
                else None
                for n in names
            ]
            out: list[list[int] | None] = [None] * len(names)
            for k, c in enumerate(cps):
                if c is None:  # null key: no variants (old shape
                    out[k] = []  # exploded a null array → row dropped)
            lens = np.fromiter(
                (len(c) if c is not None else -1 for c in cps),
                dtype=np.int64,
                count=len(cps),
            )
            for L in np.unique(lens):
                if L < 0:
                    continue
                idx = np.nonzero(lens == L)[0]
                L = int(L)
                n = len(idx)
                if L == 0:
                    for k in idx:
                        out[k] = [int(mix[k].astype(np.int64))]
                    continue
                M = np.stack([cps[k] for k in idx]).astype(np.uint64)
                M += np.uint64(1)  # cp+1: NUL-proof, matches _bytes_poly
                pw = np.empty(L, dtype=np.uint64)
                pw[0] = np.uint64(1)
                for t in range(1, L):
                    pw[t] = pw[t - 1] * B
                # C0[t]=cp·B^t; C1[t]=cp·B^(t-1) (t≥1); C2[t]=cp·B^(t-2)
                C0 = M * pw
                C1 = np.zeros_like(C0)
                C1[:, 1:] = M[:, 1:] * pw[:-1]
                C2 = np.zeros_like(C0)
                if L >= 2:
                    C2[:, 2:] = M[:, 2:] * pw[:-2]
                cum0 = np.zeros((n, L + 1), dtype=np.uint64)
                np.cumsum(C0, axis=1, out=cum0[:, 1:])
                cum1 = np.zeros((n, L + 1), dtype=np.uint64)
                np.cumsum(C1, axis=1, out=cum1[:, 1:])
                cum2 = np.zeros((n, L + 1), dtype=np.uint64)
                np.cumsum(C2, axis=1, out=cum2[:, 1:])
                hs = [cum0[:, L:]]  # d0: the key itself
                # d1: delete i, all i
                hs.append(
                    cum0[:, :L] + (cum1[:, L:] - cum1[:, 1:])
                )
                if max_dist == 2 and L >= 2:
                    # d2: delete i<j — (n, L, L) upper triangle
                    H2 = (
                        cum0[:, :L, None]
                        + (cum1[:, None, :L] - cum1[:, 1:, None])
                        + (cum2[:, L, None, None] - cum2[:, None, 1:])
                    )
                    iu = np.triu_indices(L, k=1)
                    hs.append(H2[:, iu[0], iu[1]])
                allh = np.concatenate(hs, axis=1)
                allh ^= mix[idx][:, None]
                allh = np.sort(allh, axis=1).view(np.int64)
                keep = np.ones(allh.shape, dtype=bool)
                keep[:, 1:] = allh[:, 1:] != allh[:, :-1]
                for row_i, k in enumerate(idx):
                    out[k] = allh[row_i][keep[row_i]].tolist()
            res = pdf.copy()
            res["__hs"] = out
            yield res

    return gen


def _delete_one(s: Column) -> Column:
    """Array of every string obtained by deleting exactly one char of s."""
    return F.transform(
        F.sequence(F.lit(1), F.length(s)),
        lambda i: F.concat(
            s.substr(F.lit(1), i - 1),
            s.substr(i + 1, F.length(s)),
        ),
    )


def deletion_variants(s: Column, max_dist: int = 1) -> Column:
    """All distinct strings reachable from ``s`` by ≤ ``max_dist``
    deletions (including ``s`` itself)."""
    if max_dist not in (1, 2):
        raise ValueError("max_dist must be 1 or 2")
    v1 = _delete_one(s)
    out = F.array_union(F.array(s), v1)
    if max_dist == 2:
        v2 = F.array_distinct(
            F.flatten(F.transform(v1, lambda t: _delete_one(t)))
        )
        out = F.array_union(out, v2)
    return out


def fuzzy_pairs(
    df: DataFrame,
    key_col: str,
    max_dist: int = 1,
    block_cols: list[str] | None = None,
) -> DataFrame:
    """All unordered pairs of DISTINCT ``key_col`` values with
    ``levenshtein ≤ max_dist`` — complete (symmetric-delete blocking is
    exhaustive for deletions+insertions+substitutions up to d) and exact
    (verified with the true edit distance). Returns
    (key_a, key_b, edit_distance) with key_a < key_b.

    ``block_cols``: when the caller's match predicate ALSO requires
    equality on other columns (entity resolution: same nation, same
    segment), folding them into the variant join key keeps candidate
    completeness for that predicate while dividing the candidate set by
    the block count — essential on dense similarity spaces (serial-id
    name corpora put every name within distance 2 of hundreds of
    others; without blocks the variant join is output²-heavy). With
    blocks the output is (key_a, key_b, *block_cols, edit_distance),
    distinct per block."""
    if max_dist not in (1, 2):
        raise ValueError("max_dist must be 1 or 2")
    blocks = list(block_cols or [])
    keys = df.select(F.col(key_col).alias("__k"), *blocks).distinct()
    # Variant-hash construction (r13, guide §4.2 — replaces the r12 JVM
    # HOF shape): higher-order array functions are CodegenFallback, so
    # building C(L,2)+L+1 variant STRINGS per key (each an O(L) concat)
    # and xxhash64-ing each was interpreted O(L³)-bytes-per-key work —
    # the measured majority of the whole candidate generation (~4-5 s of
    # the entity gate at sf0.1). One vectorized numpy pass now computes
    # every deletion variant's hash WITHOUT materializing any variant
    # string: with cp[t] the key's code points and prefix sums over
    # cp[t]·B^t, cp[t]·B^(t-1), cp[t]·B^(t-2) (uint64 wraparound, B odd),
    # the hash of the variant deleting positions i<j is three O(1)
    # segment sums — exactly the polynomial hash of the variant string,
    # so equal variant strings STILL collide by construction and the
    # candidate set is unchanged (any extra hash collision only adds a
    # false candidate the exact levenshtein verify removes; same
    # argument as the r9 xxhash64 switch). Block columns fold in as a
    # per-row XOR mix so the shuffle key still separates blocks. Output
    # crosses Arrow once as one array<bigint> row per key (bounded by
    # the key count, not the variant count) and explodes JVM-side.
    variants = keys.mapInPandas(
        _variant_hash_gen(blocks, max_dist),
        schema=T.StructType(
            keys.schema.fields
            + [T.StructField("__hs", T.ArrayType(T.LongType()))]
        ),
    ).select("__k", *blocks, F.explode("__hs").alias("__h"))
    # materialize the variant table ONCE: the self-join otherwise
    # recomputes the (O(L^d)-per-key string) variant construction for
    # BOTH sides — measured ~2× the whole candidate-generation cost at
    # d=2. Same index-materialization pattern as write_minhash_tables;
    # at corpus scale persist this to parquet instead.
    variants = variants.localCheckpoint(eager=True)
    a = variants.alias("a")
    b = variants.alias("b")
    # verify BEFORE the dedup shuffle: levenshtein is a cheap map-side
    # expression, and filtering false candidates first means the distinct
    # shuffles only true pairs (each appears a handful of times — once
    # per shared variant) instead of the full candidate blowup. The
    # 3-arg bounded levenshtein (Spark >=3.5) caps the DP at O(d*L)
    # instead of O(L^2), returning -1 past the bound.
    cond = F.col("a.__h") == F.col("b.__h")
    for c in blocks:
        # blocks are IN the hash (so the shuffle key carries them) and
        # ALSO in the join predicate: a hash collision across blocks must
        # not pair rows from different blocks
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    # merge-join hint (r9 — caught by the @100× audit): both sides of
    # this self-join are the corpus-sized variant table, but the
    # checkpointed relation's size estimate can look broadcastable, and
    # at 100× names the planner's broadcast pick OOMs the driver (and a
    # shuffled-hash build exhausts executor memory under full task
    # concurrency). A corpus-scaled self-join must neither depend on a
    # size estimate nor on an in-memory build: sort-merge on the 8-byte
    # key spills gracefully at any scale.
    return (
        a.join(b.hint("merge"), cond)
        .filter(F.col("a.__k") < F.col("b.__k"))
        .select(
            F.col("a.__k").alias("key_a"),
            F.col("b.__k").alias("key_b"),
            *[F.col(f"a.{c}").alias(c) for c in blocks],
        )
        .withColumn(
            "edit_distance", F.levenshtein("key_a", "key_b", max_dist)
        )
        .filter(
            (F.col("edit_distance") >= 0)
            & (F.col("edit_distance") <= max_dist)
        )
        .distinct()
    )
