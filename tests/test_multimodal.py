import numpy as np
import pytest

from pdf_toolkit_ray.stages.multimodal import (
    decode_audio,
    decode_image,
    encode_ppm,
    resize_nearest,
    sample_video_frames,
    synthesize_media_table,
)


def test_ppm_roundtrip():
    img = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    assert np.array_equal(decode_image(encode_ppm(img)), img)


def test_resize_nearest():
    img = np.zeros((4, 4, 3), dtype=np.uint8)
    img[2:, 2:] = 255
    small = resize_nearest(img, 2, 2)
    assert small.shape == (2, 2, 3)
    assert small[0, 0, 0] == 0 and small[1, 1, 0] == 255


def test_unsupported_formats_raise():
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff\xe0 jpeg-ish")
    with pytest.raises(NotImplementedError):
        decode_audio(b"ID3 mp3-ish")
    with pytest.raises(NotImplementedError):
        sample_video_frames(b"\x00\x00\x00\x18ftypmp42")


def test_fake_video_sampling():
    import struct

    frames = [encode_ppm(np.full((2, 2, 3), i, dtype=np.uint8)) for i in range(25)]
    payload = b"FAKEVID1" + b"".join(struct.pack(">I", len(f)) + f for f in frames)
    picked = sample_video_frames(payload, every_n=10)
    assert len(picked) == 3
    assert decode_image(picked[1])[0, 0, 0] == 10


def test_media_stage_pipeline(ray_session):
    import ray.data

    from pdf_toolkit_ray.stages.multimodal import audio_features, image_features

    tbl = synthesize_media_table(32)
    ds = ray.data.from_arrow(tbl)
    imgs = image_features(ds).to_pandas()
    auds = audio_features(ray.data.from_arrow(tbl)).to_pandas()
    assert len(imgs) == 16 and len(auds) == 16
    assert (imgs["width"] >= 16).all() and (imgs["height"] >= 16).all()
    assert imgs["thumb_digest"].str.len().eq(16).all()
    assert (auds["duration_sec"] == 0.25).all()
    assert ((auds["rms"] > 0.3) & (auds["rms"] < 0.6)).all()  # sine rms ≈ 0.43
    # determinism
    imgs2 = image_features(ray.data.from_arrow(synthesize_media_table(32))).to_pandas()
    assert imgs.sort_values("media_id").reset_index(drop=True).equals(
        imgs2.sort_values("media_id").reset_index(drop=True)
    )
