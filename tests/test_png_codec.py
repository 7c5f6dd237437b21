"""Pure-stdlib PNG codec (operators/png) + the real-media multimodal path
it unlocks (VERDICT r6 #6): resize_images produces real resampled PNG
payloads for decodable images, perceptual_hash runs over real pixels and
is invariant to re-encoding."""
from __future__ import annotations

import numpy as np
import pytest

from m13_sparkstreaming_python_azure_spark.operators.png import (
    decode_png,
    encode_png,
    is_png,
    resize_nearest,
    to_luma,
)


def _gradient(h, w, ch=3):
    y = np.arange(h, dtype=np.uint16)[:, None]
    x = np.arange(w, dtype=np.uint16)[None, :]
    if ch == 1:
        return ((y * 3 + x * 5) % 256).astype(np.uint8)
    return np.stack(
        [((y * (i + 2) + x * (i + 3)) % 256) for i in range(ch)], axis=2
    ).astype(np.uint8)


@pytest.mark.parametrize("ch", [1, 2, 3, 4])
@pytest.mark.parametrize("filt", [0, 1, 2, 3, 4])
def test_roundtrip_all_filters_and_color_types(ch, filt):
    px = _gradient(23, 17, ch)
    data = encode_png(px, filter_type=filt)
    assert is_png(data)
    got = decode_png(data)
    want = px if px.ndim == 3 else px[:, :, None]
    assert got.shape == want.shape
    assert np.array_equal(got, want), f"filter {filt} ch {ch} mismatch"


def test_roundtrip_random_pixels():
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(64, 41, 3), dtype=np.uint8)
    for filt in range(5):
        assert np.array_equal(decode_png(encode_png(px, filt)), px)


def test_decode_rejects_garbage_and_corruption():
    with pytest.raises(ValueError):
        decode_png(b"not a png at all")
    good = bytearray(encode_png(_gradient(8, 8)))
    good[40] ^= 0xFF  # flip a byte inside IDAT → CRC must catch it
    with pytest.raises(ValueError):
        decode_png(bytes(good))


def test_resize_nearest_geometry_and_identity():
    px = _gradient(30, 20, 3)
    out = resize_nearest(px, 10, 15)
    assert out.shape == (15, 10, 3)
    assert np.array_equal(resize_nearest(px, 20, 30), px)  # same-size = id
    assert to_luma(px).shape == (30, 20)


def test_resize_images_real_payloads(spark):
    from m13_sparkstreaming_python_azure_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        resize_images,
    )

    rows = [
        (
            i,
            "image",
            "png",
            bytearray(encode_png(_gradient(40 + i, 30 + i, 3), filter_type=i % 5)),
            30 + i,
            40 + i,
            None,
        )
        for i in range(6)
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {
        r["media_id"]: r
        for r in resize_images(media, target_width=16, target_height=12)
        .collect()
    }
    assert len(out) == 6
    for i, r in out.items():
        px = decode_png(bytes(r["resized_payload"]))
        assert px.shape == (12, 16, 3)
        # resample must equal resizing the source directly
        want = resize_nearest(_gradient(40 + i, 30 + i, 3), 16, 12)
        assert np.array_equal(px, want)


def test_phash_real_pixels_invariant_to_reencode(spark):
    from m13_sparkstreaming_python_azure_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        perceptual_hash,
    )

    base = _gradient(64, 48, 3)
    rows = [
        # same pixels, three different filter encodings → same phash
        (0, "image", "png", bytearray(encode_png(base, 0)), 48, 64, None),
        (1, "image", "png", bytearray(encode_png(base, 2)), 48, 64, None),
        (2, "image", "png", bytearray(encode_png(base, 4)), 48, 64, None),
        # different image → different phash
        (
            3,
            "image",
            "png",
            bytearray(encode_png(255 - base, 1)),
            48,
            64,
            None,
        ),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {
        r["media_id"]: r["phash"] for r in perceptual_hash(media).collect()
    }
    assert got[0] == got[1] == got[2], (
        "pHash must depend on PIXELS, not on the compressed byte stream"
    )
    assert got[3] != got[0]
