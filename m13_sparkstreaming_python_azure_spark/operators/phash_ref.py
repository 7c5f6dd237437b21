"""Independent reference recomputation of the multimodal gates — the
oracle side of ``multimodal_features`` / ``multimodal_phash_dedup``
(VERDICT r9 #3: convert the stubbed-media rows-only gates to hash gates
by replaying the pipeline in an independent implementation, the way
``jaro_winkler_pairs`` replays Jaro-Winkler through DuckDB's built-in).

DuckDB has no image codecs or DCT, so the oracle SQL for these gates is
a ``VALUES`` table generated HERE at ``oracle_sql()`` time — a live
reference recomputation per driver run, not a pinned snapshot. The
driver then hash-compares Spark's decode→feature/pHash pipeline against
this module's scalar recomputation.

Independence contract:
- arithmetic is ARBITRARY-PRECISION python ints + ``math.cos`` scalar
  loops — no numpy, no shared kernel with operators/multimodal (whose
  engine path is int64 numpy matmuls). The two implementations agree
  bit-for-bit because the pipeline is integer-exact BY DESIGN
  (quantized cosine basis, integer luma, exact integer median), not
  because they share code.
- PNG rows recompute from the ORIGINAL pre-encode pixel pattern — the
  reference never touches the PNG decoder, so the gate proves the whole
  encode→decode roundtrip + feature/pHash math end-to-end.
- JPEG rows are lossy: original pixels ≠ decoded pixels, so the
  reference obtains pixels through the in-repo decoder (the one
  codec-shared step, documented here; the JPEG codec itself is pinned
  by 17 independent unit tests in tests/test_jpeg.py) and recomputes
  everything downstream independently.
- the synthetic pixel/payload GENERATOR is shared fixture code — it
  defines the inputs, not the computation under test.
"""

from __future__ import annotations

import hashlib
import math

N = 32
BASIS_SCALE = 1 << 14


def _basis8() -> list[list[int]]:
    return [
        [
            int(math.floor(math.cos(math.pi * (x + 0.5) * u / N)
                           * BASIS_SCALE + 0.5))
            for x in range(N)
        ]
        for u in range(8)
    ]


_B8 = _basis8()


def _pixels_for(i: int, seed: int = 7):
    """Reference pixels for image id i: original pattern for PNG rows
    (fully decoder-independent), in-repo decode for lossy JPEG rows."""
    from m13_sparkstreaming_python_azure_spark.operators import jpeg as _jpeg
    from m13_sparkstreaming_python_azure_spark.operators.multimodal import (
        synthetic_media_payload,
        synthetic_pixels,
    )

    if i % 2 == 0:  # PNG — lossless: reference = pre-encode pixels
        return synthetic_pixels(i, seed)
    payload, _fmt, _w, _h = synthetic_media_payload(i, seed)
    return _jpeg.decode_jpeg(payload)


def _resize_indices(src: int, dst: int) -> list[int]:
    # pixel-center mapping — same arithmetic as png.resize_nearest
    # ((i + 0.5) * src / dst, truncated, clamped); scalar re-derivation
    return [min(int((i + 0.5) * src / dst), src - 1) for i in range(dst)]


def _luma32(pixels) -> list[list[int]]:
    """32×32 integer luma (299R + 587G + 114B) via scalar loops."""
    h, w = len(pixels), len(pixels[0])
    ys = _resize_indices(h, N)
    xs = _resize_indices(w, N)
    out = []
    for y in ys:
        row = []
        for x in xs:
            p = pixels[y][x]
            row.append(299 * int(p[0]) + 587 * int(p[1]) + 114 * int(p[2]))
        out.append(row)
    return out


def ref_phash(pixels) -> int:
    """64-bit integer-DCT pHash, arbitrary-precision scalar math."""
    lum = _luma32(pixels)
    # M[u][x] = sum_y B8[u][y] * lum[y][x]; D[u][v] = sum_x M[u][x]*B8[v][x]
    m = [
        [sum(_B8[u][y] * lum[y][x] for y in range(N)) for x in range(N)]
        for u in range(8)
    ]
    block = [
        sum(m[u][x] * _B8[v][x] for x in range(N))
        for u in range(8)
        for v in range(8)
    ]
    med = sorted(block[1:])[31]
    h = 0
    for b, v in enumerate(block):
        if v > med:
            h |= 1 << b
    return h - (1 << 64) if h >= (1 << 63) else h


def ref_features(pixels) -> list[float]:
    """16 block-mean luma features — exact integer sums over constant
    denominators, scalar loops."""
    lum = _luma32(pixels)
    feats = []
    for by in range(4):
        for bx in range(4):
            s = sum(
                lum[y][x]
                for y in range(by * 8, by * 8 + 8)
                for x in range(bx * 8, bx * 8 + 8)
            )
            feats.append(s / (64 * 1000 * 255))
    return feats


def ref_fake_features(payload: bytes, dim: int = 16) -> list[float]:
    """Stub-featurizer twin for the no-codec rows (sha256 byte scaling —
    trivial formula, re-derived)."""
    digest = hashlib.sha256(payload or b"").digest()
    return [digest[i % 32] / 255.0 for i in range(dim)]


def ref_features_rows(n: int = 300, seed: int = 7) -> list[tuple]:
    """Expected (media_id, kind, payload_bytes, payload_sha256,
    f0_micros) rows for q_multimodal_features over
    synthetic_media_real(n, seed). f0 travels as the EXACT 1e-6-grid
    integer; both sides divide by the double literal 1e6 at the output
    boundary, so the hashes compare identically-derived doubles."""
    import numpy as np

    from m13_sparkstreaming_python_azure_spark.operators.multimodal import (
        synthetic_media_payload,
    )

    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        if kind == "image":
            payload = synthetic_media_payload(i, seed)[0]
            f0 = ref_features(_pixels_for(i, seed))[0]
        else:
            payload = hashlib.sha256(f"{seed}:{i}".encode()).digest() * (
                1 + i % 5
            )
            f0 = ref_fake_features(payload)[0]
        rows.append(
            (
                i,
                kind,
                len(payload),
                hashlib.sha256(payload).hexdigest(),
                int(math.floor(float(np.float32(f0)) * 1e6 + 0.5)),
            )
        )
    return rows


def ref_phash_pair_rows(
    n_images: int = 200, seed: int = 7, max_hamming: int = 3
) -> list[tuple]:
    """Expected (id_a, id_b, hamming) rows for q_multimodal_phash_dedup:
    brute-force all-pairs over the reference pHashes — which ALSO
    re-proves the engine's pigeonhole candidate generation is complete
    (the banded join must find exactly the brute-force pair set)."""
    from m13_sparkstreaming_python_azure_spark.operators.multimodal import (
        synthetic_speckled_pixels,
    )

    hashes: dict[int, int] = {}
    for j in range(n_images):
        i = 3 * j  # image ids in synthetic_media_real are multiples of 3
        hashes[i] = ref_phash(_pixels_for(i, seed))
    # exact re-uploads: first 20 images again under id+10000
    for j in range(20):
        i = 3 * j
        hashes[i + 10_000] = hashes[i]
    # speckled near-dup variants (hamming 0-4: some pair, some excluded)
    for j in range(20, 30):
        i = 3 * j
        hashes[i + 20_000] = ref_phash(synthetic_speckled_pixels(i, seed))
    ids = sorted(hashes)
    out = []
    for a_pos, a in enumerate(ids):
        ha = hashes[a]
        for b in ids[a_pos + 1 :]:
            d = bin((ha ^ hashes[b]) & ((1 << 64) - 1)).count("1")
            if d <= max_hamming:
                out.append((a, b, d))
    return out
