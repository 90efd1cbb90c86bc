"""Multimodal binary-column plumbing (decode kernels stubbed)."""

import pytest

from ticdc_spark.functions.multimodal import (
    decode_image,
    extract_features,
    frame_sample,
    synth_media,
)


def test_synth_media_deterministic(spark):
    a = synth_media(spark, 64).collect()
    b = synth_media(spark, 64).collect()
    assert a == b
    kinds = {r["kind"] for r in a}
    assert kinds <= {"image", "audio", "video"}


def test_decode_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        decode_image(b"bytes")


def test_extract_features_plumbing(spark):
    media = synth_media(spark, 128)
    feats = extract_features(media, fake=True)
    rows = feats.collect()
    assert len(rows) == 128
    assert all(len(r["feat"]) == 8 for r in rows)
    assert all(r["n_bytes"] > 0 for r in rows)
    # deterministic
    assert rows == extract_features(media, fake=True).collect()


def test_frame_sample(spark):
    media = synth_media(spark, 128)
    frames = frame_sample(media, every_ms=5_000)
    n_videos = media.filter("kind = 'video'").count()
    assert frames.count() >= n_videos  # at least frame 0 per video
    assert frames.filter("frame_ms % 5000 != 0").count() == 0


def test_resize_plan_and_kernel(spark):
    from ticdc_spark.functions.multimodal import resize_images, resize_plan, synth_media

    media = synth_media(spark, n=64)
    plan = resize_plan(media, max_side=128)
    rows = plan.collect()
    assert rows, "expected image rows"
    for r in rows:
        assert max(r["new_width"], r["new_height"]) <= 128 or (
            max(r["width"], r["height"]) <= 128
        )
        # aspect preserved within integer-ceiling tolerance (relative)
        if max(r["width"], r["height"]) > 128:
            a_old = r["width"] / r["height"]
            a_new = r["new_width"] / r["new_height"]
            assert abs(a_new / a_old - 1) < 0.1
    out = resize_images(media, max_side=128, fake=True)
    got = out.collect()
    assert len(got) == len(rows)
    src_bytes = {r["media_id"]: r for r in rows}
    for r in got:
        s = src_bytes[r["media_id"]]
        # fake kernel shrinks the byte budget proportionally to the area
        if max(s["width"], s["height"]) > 128:
            assert len(r["payload"]) < 512
