"""Multimodal binary-column plumbing: schemas, batch shapes, determinism.

Codecs are deterministic stubs (no image/audio libs in the sandbox); what
these tests pin is the SPARK side: struct metadata columns, mapInPandas
signatures, explode shapes, bounded output rows, and reproducibility."""

import pytest
from pyspark.sql import functions as F

from ares_spark.operators.multimodal import (
    audio_stats,
    decode_image_features,
    resize_images,
    sample_video_frames,
    synth_media,
)


@pytest.fixture(scope="module")
def media(spark):
    return synth_media(spark, n=30).cache()


def test_media_schema(media):
    kinds = {r.kind for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}
    img = media.filter(F.col("kind") == "image").first()
    assert img.meta.mime == "image/png" and img.meta.width >= 32


def test_image_features_shape_and_determinism(spark, media):
    f1 = decode_image_features(media, feature_dim=64).orderBy("media_id").collect()
    f2 = decode_image_features(media, feature_dim=64).orderBy("media_id").collect()
    assert len(f1) == 10  # every third row is an image
    for a, b in zip(f1, f2):
        assert a.media_id == b.media_id
        assert len(a.features) == 64
        assert a.features == b.features  # deterministic stub decode
        assert isinstance(a.phash, int)


def test_resize_bounded_output(spark, media):
    thumbs = resize_images(media, out_w=16, out_h=16).collect()
    assert len(thumbs) == 10
    for t in thumbs:
        assert len(bytes(t.thumb)) == 16 * 16 * 3  # bounded row size
        assert t.meta.width == 16 and t.meta.height == 16


def test_video_frame_sampling_explodes(spark, media):
    frames = sample_video_frames(media, every_ms=500)
    per_video = frames.groupBy("media_id").agg(F.count("*").alias("n")).collect()
    assert len(per_video) == 10
    assert all(r.n >= 1 for r in per_video)
    f = frames.first()
    assert len(bytes(f.frame)) <= 256 and f.ts_ms >= 0


def test_audio_stats(spark, media):
    stats = audio_stats(media).collect()
    assert len(stats) == 10
    for s in stats:
        assert s.n_samples > 0 and s.rms > 0


def test_metadata_filter_prunes_before_decode(spark, media):
    # filters on the typed meta struct never touch payload bytes
    wide = media.filter(F.col("meta.width") >= 48)
    assert wide.count() == media.filter((F.col("kind") == "image")).filter(
        F.col("meta.width") >= 48
    ).count()
