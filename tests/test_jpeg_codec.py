"""operators/jpeg — pure-stdlib baseline JPEG codec (VERDICT r7 #6) and
its wiring into the real-pixel multimodal path: round-trips within
quantization error, decode_image dispatches on the FFD8 signature, and
perceptual_hash is invariant to re-encoding a real JPEG (PNG↔JPEG of the
same pixels hash equal)."""

from __future__ import annotations

import numpy as np
import pytest

from m13_sparkstreaming_python_azure_spark.operators import jpeg
from m13_sparkstreaming_python_azure_spark.operators.multimodal import (
    decode_image,
)
from m13_sparkstreaming_python_azure_spark.operators.png import encode_png


def _gradient(w: int, h: int, channels: int = 3) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    if channels == 1:
        return (xx * 255 // max(w - 1, 1)).astype(np.uint8)
    return np.stack(
        [
            xx * 255 // max(w - 1, 1),
            yy * 255 // max(h - 1, 1),
            (xx + yy) * 255 // max(w + h - 2, 1),
        ],
        axis=-1,
    ).astype(np.uint8)


def test_rgb_roundtrip_within_quantization_error():
    px = _gradient(56, 40)
    dec = jpeg.decode_jpeg(jpeg.encode_jpeg(px, quality=90))
    assert dec.shape == px.shape and dec.dtype == np.uint8
    assert np.abs(dec.astype(int) - px.astype(int)).max() <= 8


def test_grayscale_roundtrip():
    px = _gradient(33, 25, channels=1)
    dec = jpeg.decode_jpeg(jpeg.encode_jpeg(px, quality=85))
    assert dec.shape == px.shape
    assert np.abs(dec.astype(int) - px.astype(int)).max() <= 6


def test_flat_blocks_exact_at_high_quality():
    px = np.zeros((32, 32, 3), np.uint8)
    px[8:24, 8:24] = 255
    dec = jpeg.decode_jpeg(jpeg.encode_jpeg(px, quality=95))
    assert np.array_equal(dec, px)  # block-aligned edges survive exactly


def test_non_multiple_of_8_dimensions():
    rng = np.random.default_rng(0)
    px = rng.integers(0, 256, (17, 23, 3), dtype=np.uint8)
    dec = jpeg.decode_jpeg(jpeg.encode_jpeg(px, quality=100))
    assert dec.shape == px.shape
    assert np.abs(dec.astype(int) - px.astype(int)).mean() < 4


def test_signature_and_malformed_payloads():
    px = _gradient(16, 16)
    enc = jpeg.encode_jpeg(px)
    assert jpeg.is_jpeg(enc) and not jpeg.is_jpeg(b"\x89PNG")
    with pytest.raises(ValueError):
        jpeg.decode_jpeg(b"not a jpeg")
    with pytest.raises(ValueError):
        jpeg.decode_jpeg(enc[:20])  # truncated mid-header
    # corrupt a marker byte inside the table region
    bad = bytearray(enc)
    bad[3] = 0x00  # APP0 marker second byte -> invalid marker stream
    with pytest.raises(ValueError):
        jpeg.decode_jpeg(bytes(bad))


def test_decode_image_dispatches_on_jpeg_signature():
    px = _gradient(24, 18)
    got = decode_image(jpeg.encode_jpeg(px, quality=95), "jpeg")
    assert got.shape == (18, 24, 3)
    assert np.abs(got.astype(int) - px.astype(int)).max() <= 8
    # grayscale JPEG expands to 3 channels for the uniform pipeline
    gray = decode_image(jpeg.encode_jpeg(_gradient(24, 18, 1), 95), "jpg")
    assert gray.shape == (18, 24, 3)


def _structured(w: int = 64, h: int = 48) -> np.ndarray:
    """Fixture with well-separated low-frequency DCT energy — a plain
    linear gradient is pathological for pHash (its low-freq coefficients
    cluster at the median, so ANY lossy perturbation flips bits)."""
    yy, xx = np.mgrid[0:h, 0:w]
    f = (
        90 * np.cos(np.pi * xx / 32)
        + 60 * np.cos(np.pi * yy / 16)
        + 40 * np.cos(np.pi * (xx + 2 * yy) / 24)
        + 128
    )
    return np.clip(
        np.stack([f, 255 - f, f * 0.7 + 30], axis=-1), 0, 255
    ).astype(np.uint8)


def _hamming(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_phash_invariant_across_png_and_jpeg_encodings(spark):
    """VERDICT r7 #6 'done' criterion: perceptual_hash re-encode
    invariance demonstrated on a real JPEG fixture — the SAME pixels
    shipped as PNG and as high-quality JPEG land the SAME pHash bits;
    a q75 re-encode stays within a small Hamming radius (lossy pixels,
    same perceptual content); a different image lands far away."""
    from m13_sparkstreaming_python_azure_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        perceptual_hash,
    )

    base = _structured()
    rows = [
        (0, "image", "png", bytearray(encode_png(base)), 48, 64, None),
        (1, "image", "jpeg", bytearray(jpeg.encode_jpeg(base, 95)), 48, 64, None),
        (2, "image", "jpeg", bytearray(jpeg.encode_jpeg(base, 75)), 48, 64, None),
        (
            3,
            "image",
            "jpeg",
            bytearray(jpeg.encode_jpeg(255 - base, 95)),
            48,
            64,
            None,
        ),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {
        r["media_id"]: r["phash"] for r in perceptual_hash(media).collect()
    }
    assert got[0] == got[1], (
        "pHash must depend on PIXELS: PNG and q95 JPEG of the same image "
        "must hash identically"
    )
    assert _hamming(got[0], got[2]) <= 4  # q75: near-dup radius
    assert _hamming(got[0], got[3]) >= 20  # inverted image: far


def test_resize_handles_jpeg_payloads(spark):
    from m13_sparkstreaming_python_azure_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        resize_images,
    )
    from m13_sparkstreaming_python_azure_spark.operators.png import (
        decode_png,
    )

    base = _gradient(40, 30)
    media = spark.createDataFrame(
        [(0, "image", "jpeg", bytearray(jpeg.encode_jpeg(base, 95)), 30, 40, None)],
        MEDIA_SCHEMA,
    )
    (row,) = resize_images(media, target_width=16, target_height=12).collect()
    px = decode_png(bytes(row["resized_payload"]))
    assert px.shape == (12, 16, 3)


def test_420_subsampled_roundtrip():
    base = _structured()
    enc444 = jpeg.encode_jpeg(base, 90, subsampling="4:4:4")
    enc420 = jpeg.encode_jpeg(base, 90, subsampling="4:2:0")
    assert len(enc420) < len(enc444)  # chroma at quarter resolution
    dec = jpeg.decode_jpeg(enc420)
    assert dec.shape == base.shape
    err = abs(dec.astype(int) - base.astype(int))
    assert err.mean() < 8 and err.max() < 40  # box-avg + nearest upsample


def test_420_odd_dimensions():
    base = _structured()[:45, :61]
    dec = jpeg.decode_jpeg(jpeg.encode_jpeg(base, 90, subsampling="4:2:0"))
    assert dec.shape == base.shape


def test_420_phash_within_near_dup_radius(spark):
    from m13_sparkstreaming_python_azure_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        perceptual_hash,
    )

    base = _structured()
    rows = [
        (0, "image", "png", bytearray(encode_png(base)), 48, 64, None),
        (
            1,
            "image",
            "jpeg",
            bytearray(jpeg.encode_jpeg(base, 90, subsampling="4:2:0")),
            48,
            64,
            None,
        ),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r["media_id"]: r["phash"] for r in perceptual_hash(media).collect()}
    assert _hamming(got[0], got[1]) <= 6  # luma untouched by 4:2:0


def test_subsampling_validation():
    import numpy as np

    with pytest.raises(ValueError, match="subsampling"):
        jpeg.encode_jpeg(np.zeros((8, 8, 3), np.uint8), subsampling="4:1:1")


# --------------------------------------------------------------------------
# Progressive (SOF2) — r9, VERDICT r8 #2
# --------------------------------------------------------------------------


def test_progressive_decodes_pixel_identical_to_baseline():
    """The progressive scan script carries the SAME quantized
    coefficients as the baseline scan, so both encodes of one image must
    decode to bit-identical pixels — across gray/RGB, odd dimensions,
    and 4:2:0 subsampling."""
    rng = np.random.default_rng(7)
    cases = [
        ((16, 16), "4:4:4"),
        ((24, 31, 3), "4:4:4"),
        ((33, 47, 3), "4:2:0"),
        ((1, 1), "4:4:4"),
        ((7, 3, 3), "4:2:0"),
        ((64, 64, 3), "4:2:0"),
    ]
    for shape, sub in cases:
        px = rng.integers(0, 256, shape, dtype=np.uint8)
        b = jpeg.decode_jpeg(jpeg.encode_jpeg(px, 85, subsampling=sub))
        p = jpeg.decode_jpeg(
            jpeg.encode_jpeg(px, 85, subsampling=sub, progressive=True)
        )
        assert np.array_equal(b, p), (shape, sub)


def test_progressive_sof2_marker_and_multi_scan():
    px = _gradient(40, 24)
    data = jpeg.encode_jpeg(px, 90, progressive=True)
    assert b"\xff\xc2" in data and b"\xff\xc0" not in data
    assert data.count(b"\xff\xda") == 14  # 2 DC + (2 bands x 3 comps) x 2
    dec = jpeg.decode_jpeg(data)
    assert np.abs(dec.astype(int) - px.astype(int)).max() <= 8


def test_progressive_sparse_spikes_exercise_eob_and_zrl():
    """Near-black image with isolated bright pixels: AC bands are zero
    for most blocks (long EOB runs spanning blocks) and sparse within
    the spiked blocks (ZRL + correction-bit paths in refinement)."""
    px = np.zeros((64, 64), np.uint8)
    for i, (y, x) in enumerate([(3, 3), (20, 45), (50, 9), (61, 62)]):
        px[y, x] = 200 + 10 * i
    b = jpeg.decode_jpeg(jpeg.encode_jpeg(px, 90))
    p = jpeg.decode_jpeg(jpeg.encode_jpeg(px, 90, progressive=True))
    assert np.array_equal(b, p)


def test_progressive_through_decode_image_and_phash(spark):
    """VERDICT r8 #2 'done' criterion: decode_image handles a
    progressive fixture, and pHash is invariant across baseline vs
    progressive re-encodes of the same pixels (identical coefficients →
    identical pixels → identical hash)."""
    from m13_sparkstreaming_python_azure_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        perceptual_hash,
    )

    base = _structured()
    rows = [
        (0, "image", "jpeg", bytearray(jpeg.encode_jpeg(base, 90)), 48, 64, None),
        (
            1,
            "image",
            "jpeg",
            bytearray(jpeg.encode_jpeg(base, 90, progressive=True)),
            48,
            64,
            None,
        ),
        (
            2,
            "image",
            "jpeg",
            bytearray(
                jpeg.encode_jpeg(
                    base, 85, subsampling="4:2:0", progressive=True
                )
            ),
            48,
            64,
            None,
        ),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r["media_id"]: r["phash"] for r in perceptual_hash(media).collect()}
    assert got[0] == got[1]  # same coefficients -> identical pixels/hash
    assert _hamming(got[0], got[2]) <= 6  # lossier re-encode: near-dup radius


def test_baseline_rejects_crossed_scan_order():
    """A baseline SOS listing components out of frame order would cross
    component data in the MCU loop — must be rejected, not garbled."""
    px = _gradient(16, 16)
    data = bytearray(jpeg.encode_jpeg(px, 90))
    i = data.find(b"\xff\xda")
    # SOS layout: FFDA len ns (id, tdta)*ns ... — swap comps 1 and 2
    ns = data[i + 4]
    assert ns == 3
    c1 = bytes(data[i + 5 : i + 7])
    c2 = bytes(data[i + 7 : i + 9])
    data[i + 5 : i + 7] = c2
    data[i + 7 : i + 9] = c1
    with pytest.raises(ValueError, match="scan order"):
        jpeg.decode_jpeg(bytes(data))
