"""Multimodal plumbing: schemas, Arrow batch shapes, decode round-trips,
and the documented NotImplementedError boundary for real codecs."""

from __future__ import annotations

import numpy as np
import pytest

from colbert_jl_spark.operators.multimodal import (
    _decode_fake_image,
    _decode_fake_video,
    encode_fake_image,
    extract_features,
    resize_images,
    sample_frames,
    synth_media,
)


@pytest.fixture(scope="module")
def media(spark):
    return synth_media(spark, 30).cache()


def test_media_schema(media):
    types = {f.name: f.dataType.simpleString() for f in media.schema.fields}
    assert types["payload"] == "binary"
    assert types["meta"].startswith("struct<width:int,height:int,sample_rate:int")
    assert media.count() == 30
    kinds = {r.kind for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_extract_features_all_modalities(media):
    out = extract_features(media).toPandas()
    assert len(out) == 30
    assert all(len(f) == 12 for f in out.features)  # 4 stats + 8 histogram bins
    img = out[out.kind == "image"].iloc[0]
    assert 0 <= img.features[0] <= 255  # mean pixel in range
    # deterministic: same seed → same features
    out2 = extract_features(media).toPandas().sort_values("media_id")
    assert np.allclose(
        np.stack(out.sort_values("media_id").features.to_numpy()),
        np.stack(out2.features.to_numpy()),
    )


def test_resize_images(media):
    out = resize_images(media, 8, 8).toPandas()
    assert len(out) == 10  # the image third
    for _, r in out.iterrows():
        arr = _decode_fake_image(bytes(r.payload))
        assert arr.shape == (8, 8)


def test_sample_frames(media):
    out = sample_frames(media, every=2).toPandas()
    assert (out.frame_idx % 2 == 0).all()
    one = out[out.media_id == 2]  # first video row
    vid = _decode_fake_video(
        bytes(media.where("media_id = 2").first().payload)
    )
    assert len(one) == (vid.shape[0] + 1) // 2
    # sampled frame bytes match the source frame exactly
    f0 = _decode_fake_image(bytes(one[one.frame_idx == 0].payload.iloc[0]))
    assert (f0 == vid[0]).all()


def test_real_decode_is_explicit_stub():
    with pytest.raises(NotImplementedError, match="PIL"):
        _decode_fake_image(b"\x89PNG\r\n\x1a\n....")


def test_fake_image_roundtrip():
    img = encode_fake_image(16, 9, seed=3)
    arr = _decode_fake_image(img)
    assert arr.shape == (9, 16)
    assert arr.dtype == np.uint8
