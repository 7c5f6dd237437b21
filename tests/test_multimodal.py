"""Multimodal plumbing tests: schema, mapInPandas batch shape, determinism,
frame-sampling fan-out (decode itself is stubbed — no codecs in container)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from m13_sparkstreaming_python_azure_spark.operators import multimodal as mm


def test_extract_features_schema_and_determinism(spark):
    media = mm.synthetic_media(spark, n=60)
    feats = mm.extract_features(media)
    assert feats.schema == mm.FEATURE_SCHEMA
    rows = {r.media_id: r for r in feats.collect()}
    assert len(rows) == 60
    # deterministic across runs
    rows2 = {r.media_id: r for r in mm.extract_features(media).collect()}
    for mid in rows:
        assert rows[mid].payload_sha256 == rows2[mid].payload_sha256
        assert rows[mid].features == rows2[mid].features
        assert len(rows[mid].features) == mm.FEATURE_DIM
        assert rows[mid].payload_bytes > 0


def test_features_feed_similarity_ops(spark):
    """Extracted features are array<float> — directly usable by the ANN
    operators (the multimodal → similarity hand-off)."""
    from m13_sparkstreaming_python_azure_spark.operators import similarity as sim

    media = mm.synthetic_media(spark, n=30)
    feats = mm.extract_features(media).select(
        F.col("media_id").alias("vec_id"), F.col("features").alias("embedding")
    )
    probes = feats.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    top = sim.brute_force_topk(feats, probes, k=3)
    got = top.groupBy("query_id").count().collect()
    assert all(r["count"] == 3 for r in got)


def test_frame_sampling_fanout(spark):
    media = mm.synthetic_media(spark, n=30)
    frames = mm.sample_video_frames(media, every_ms=1000)
    vids = media.filter(F.col("kind") == "video").select(
        "media_id", "duration_ms"
    ).collect()
    expected = sum(1 + (v.duration_ms - 1) // 1000 for v in vids)
    assert frames.count() == expected
    assert frames.filter(F.col("frame_ts_ms") % 1000 != 0).count() == 0


def test_decode_media_codec_boundaries():
    # PNG decodes for real now (operators/png); corrupt bytes raise
    # ValueError, formats with no installed codec raise NotImplementedError
    with pytest.raises(ValueError):
        mm.decode_media(b"\x89PNG", "png")  # truncated signature
    with pytest.raises(NotImplementedError):
        mm.decode_media(b"\x00\x01", "mp4")
    import numpy as np

    from m13_sparkstreaming_python_azure_spark.operators.png import encode_png

    px = np.arange(4 * 3 * 3, dtype=np.uint8).reshape(4, 3, 3)
    raw = mm.decode_media(encode_png(px), "png")
    assert raw == px.tobytes()


def test_resize_images_geometry(spark):
    from m13_sparkstreaming_python_azure_spark.operators.multimodal import (
        resize_images,
        synthetic_media,
    )

    media = synthetic_media(spark, n=60)
    out = resize_images(media, target_width=224, target_height=224)
    rows = out.collect()
    assert len(rows) == media.filter("kind = 'image'").count() > 0
    for r in rows:
        assert r["target_width"] == 224 and r["target_height"] == 224
        assert abs(r["scale_x"] - 224 / r["width"]) < 1e-6
        # synthetic hash-stream payloads are not decodable images, so the
        # real-resample path leaves the payload NULL (geometry-only row)
        assert r["resized_payload"] is None


def test_segment_audio_windows(spark):
    from m13_sparkstreaming_python_azure_spark.operators.multimodal import (
        segment_audio,
        synthetic_media,
    )

    media = synthetic_media(spark, n=60)
    out = segment_audio(media, window_ms=5000, hop_ms=2500)
    rows = out.collect()
    assert len(rows) > 0
    by_id = {}
    for r in rows:
        by_id.setdefault(r["media_id"], []).append(r)
        assert 0 <= r["seg_start_ms"] < r["seg_end_ms"]
        assert r["seg_end_ms"] <= r["seg_start_ms"] + 5000
    # hop spacing and full coverage per clip
    for rid, rs in by_id.items():
        starts = sorted(x["seg_start_ms"] for x in rs)
        assert starts[0] == 0
        assert all(b - a == 2500 for a, b in zip(starts, starts[1:]))
        assert max(x["seg_end_ms"] for x in rs) == rs[0]["duration_ms"]
