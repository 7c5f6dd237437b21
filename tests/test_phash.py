"""Perceptual-hash media dedup (operators/multimodal.perceptual_hash /
phash_pairs): determinism, exact-dup hamming 0, near-dup robustness,
and pigeonhole candidate completeness."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from m13_sparkstreaming_python_azure_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    perceptual_hash,
    phash_pairs,
    synthetic_media,
)


def _media_row(i, payload):
    return (i, "image", "png", payload, 64, 48, None)


def test_phash_deterministic_and_exact_dup_zero(spark):
    base = hashlib.sha256(b"img-1").digest() * 4
    df = spark.createDataFrame(
        [_media_row(1, base), _media_row(2, base)], MEDIA_SCHEMA
    )
    h = perceptual_hash(df).collect()
    hs = {r["media_id"]: r["phash"] for r in h}
    assert hs[1] == hs[2]
    pairs = phash_pairs(perceptual_hash(df)).collect()
    assert [(p["id_a"], p["id_b"], p["hamming"]) for p in pairs] == [(1, 2, 0)]
    # determinism across runs
    h2 = {r["media_id"]: r["phash"] for r in perceptual_hash(df).collect()}
    assert h2 == hs


def test_brightness_contrast_invariance_and_unrelated(spark):
    """The invariances pHash exists for: a brightness shift moves only
    the DC coefficient and a contrast scale multiplies every coefficient
    AND the median — the 63 AC sign comparisons are untouched, so both
    variants pair with the original at tiny hamming. An unrelated image
    does not pair."""
    import numpy as np

    def rich(seed):
        # spectrum-rich smooth image: every low-freq DCT coefficient has
        # substantial energy, so the median threshold is not degenerate
        # (a 2-frequency toy image leaves 60 of 64 coefficients AT the
        # median, where uint8 quantization noise decides the bits)
        rng = np.random.default_rng(seed)
        ii, jj = np.meshgrid(np.arange(32), np.arange(32), indexing="ij")
        img = np.full((32, 32), 128.0)
        for k in range(8):
            for l in range(8):
                if k == 0 and l == 0:
                    continue
                amp = rng.uniform(4, 14) * rng.choice([-1, 1])
                img += (
                    amp
                    * np.cos(np.pi * (ii + 0.5) * k / 32)
                    * np.cos(np.pi * (jj + 0.5) * l / 32)
                )
        return np.clip(img, 0, 255)

    img = rich(3)
    brighter = np.clip(img + 12, 0, 255)
    contrast = np.clip((img - 128) * 1.2 + 128, 0, 255)
    other = rich(99)
    rows = [
        _media_row(i, a.astype(np.uint8).tobytes())
        for i, a in [(1, img), (2, brighter), (3, contrast), (4, other)]
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    pairs = {
        (p["id_a"], p["id_b"]): p["hamming"]
        for p in phash_pairs(perceptual_hash(df)).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] <= 3
    assert (1, 3) in pairs and pairs[(1, 3)] <= 3
    assert not any(4 in k for k in pairs)


def test_pigeonhole_candidates_complete(spark):
    """Every pair with true hamming <= 3 must be produced by the 4x16-bit
    chunk bucketing — check against a brute-force recomputation on a
    small synthetic set."""
    media = synthetic_media(spark, n=60, seed=11)
    hashed = perceptual_hash(media)
    got = {
        (p["id_a"], p["id_b"])
        for p in phash_pairs(hashed, max_hamming=3).collect()
    }
    hs = {r["media_id"]: r["phash"] for r in hashed.collect()}
    want = {
        (a, b)
        for a in hs
        for b in hs
        if a < b and bin((hs[a] ^ hs[b]) & (2**64 - 1)).count("1") <= 3
    }
    assert got == want
