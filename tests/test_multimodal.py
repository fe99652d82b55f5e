"""Multimodal plumbing tests: binary payload columns, Arrow UDF batch
shapes, deterministic fake decode (decoder itself is stubbed — no media
libs in this container)."""

from __future__ import annotations

import pytest

from pasgal_spark.functions import multimodal as mm


def test_synthesize_media_deterministic_and_typed(spark):
    a = mm.synthesize_media(spark, 30).collect()
    b = mm.synthesize_media(spark, 30).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    kinds = {r["kind"] for r in a}
    assert kinds == {"image", "audio", "video"}
    for r in a:
        assert isinstance(r["payload"], (bytes, bytearray))
        assert len(r["payload"]) == 64
        if r["kind"] == "image":
            assert r["width"] >= 16 and r["height"] >= 16
        if r["kind"] == "audio":
            assert r["sample_rate"] == 16000


def test_fake_decode_image_shapes_and_determinism(spark):
    media = mm.synthesize_media(spark, 30)
    f1 = {r["media_id"]: r["features"] for r in mm.fake_decode_image(media).collect()}
    f2 = {r["media_id"]: r["features"] for r in mm.fake_decode_image(media).collect()}
    assert f1 == f2
    assert len(f1) == media.filter("kind = 'image'").count()
    for v in f1.values():
        assert len(v) == mm.FEATURE_DIM
        assert all(0.0 <= x < 1.0 for x in v)


def test_real_decoder_is_cleanly_stubbed(spark):
    media = mm.synthesize_media(spark, 3)
    with pytest.raises(NotImplementedError):
        mm.decode_image(media)


def test_frame_sample_stride(spark):
    media = mm.synthesize_media(spark, 30)
    frames = mm.frame_sample(media, every_n=10)
    rows = frames.collect()
    assert rows, "video rows expected"
    assert all(r["frame_idx"] % 10 == 0 for r in rows)
    assert all(len(r["frame_payload"]) == 16 for r in rows)


def test_media_stats_prunes_payload(spark):
    media = mm.synthesize_media(spark, 30)
    stats = {r["kind"]: r for r in mm.media_stats(media).collect()}
    assert stats["image"]["total_bytes"] == stats["image"]["n"] * 64
    assert stats["audio"]["avg_width"] is None
