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


def test_decode_media_is_stubbed():
    with pytest.raises(NotImplementedError):
        mm.decode_media(b"\x89PNG", "png")
