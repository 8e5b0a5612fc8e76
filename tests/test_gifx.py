"""From-scratch GIF89a codec tests: LZW roundtrips (including code-width
growth to 12 bits and CLEAR-reset wraparound), interlaced decode against
a hand-built stream, transparency + disposal compositing, and the
video-frame-sampling stage over a real GIF container."""

import struct

import numpy as np
import pytest

from pdf_toolkit_ray.functions.gifx import (
    _deinterlace_order,
    _lzw_decode,
    _lzw_encode,
    _sub_blocks,
    decode_gif,
    encode_gif,
)


def test_deinterlace_order_height8():
    assert list(_deinterlace_order(8)) == [0, 4, 2, 6, 1, 3, 5, 7]


def test_lzw_roundtrip_width_growth_and_clear():
    rng = np.random.RandomState(11)
    # 20k symbols over a 256-symbol alphabet: the decoder table passes
    # every width 9..12 and the encoder's CLEAR wraparound fires
    idx = rng.randint(0, 256, size=20_000).astype(np.uint8)
    data = _lzw_encode(8, idx)
    out = _lzw_decode(8, data, len(idx))
    assert np.array_equal(out, idx)


def test_gif_roundtrip_multiframe():
    rng = np.random.RandomState(7)
    palette = rng.randint(0, 256, size=(17, 3)).astype(np.uint8)
    frames = [
        palette[rng.randint(0, 17, size=(13, 9))] for _ in range(5)
    ]
    payload = encode_gif(frames)
    got = decode_gif(payload)
    assert len(got) == 5
    for a, b in zip(got, frames):
        assert np.array_equal(a, b)


def test_gif_single_solid_color():
    frame = np.full((4, 6, 3), 200, dtype=np.uint8)
    got = decode_gif(encode_gif([frame]))
    assert len(got) == 1 and np.array_equal(got[0], frame)


def _hand_gif(idx: np.ndarray, palette: np.ndarray, iflags: int,
              gce: bytes | None = None, bg: int = 0) -> bytes:
    """Minimal single-frame GIF with explicit descriptor flags."""
    h, w = idx.shape
    n = len(palette)
    bits = max(1, int(np.ceil(np.log2(max(2, n)))))
    pal = np.zeros((1 << bits, 3), dtype=np.uint8)
    pal[:n] = palette
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), bg, 0)
    out += pal.tobytes()
    if gce is not None:
        out += b"\x21\xf9" + bytes([len(gce)]) + gce + b"\x00"
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, iflags)
    min_code = max(2, bits)
    out += bytes([min_code])
    out += _sub_blocks(_lzw_encode(min_code, idx.reshape(-1)))
    out += b"\x3b"
    return bytes(out)


def test_gif_interlaced_decode():
    rng = np.random.RandomState(3)
    palette = rng.randint(0, 256, size=(4, 3)).astype(np.uint8)
    idx = rng.randint(0, 4, size=(8, 5)).astype(np.uint8)
    # an interlaced stream stores rows in pass order; the decoder must
    # put them back to screen order
    stored = idx[_deinterlace_order(8)]
    payload = _hand_gif(stored, palette, iflags=0x40)
    got = decode_gif(payload)[0]
    assert np.array_equal(got, palette[idx])


def test_gif_transparency_composites_over_previous_frame():
    palette = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8)
    h, w = 3, 3
    f1 = np.zeros((h, w), dtype=np.uint8)  # all red
    f2 = np.full((h, w), 2, dtype=np.uint8)  # transparent index
    f2[1, 1] = 1  # one green pixel
    out = bytearray(b"GIF89a")
    bits = 2
    pal = np.zeros((4, 3), dtype=np.uint8)
    pal[:3] = palette
    out += struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
    out += pal.tobytes()
    for frame, gflags in ((f1, 0x00), (f2, 0x01)):  # frame2: transparent=idx 2
        out += b"\x21\xf9\x04" + bytes([gflags]) + b"\x00\x00" + bytes([2]) + b"\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        out += bytes([2])
        out += _sub_blocks(_lzw_encode(2, frame.reshape(-1)))
    out += b"\x3b"
    frames = decode_gif(bytes(out))
    assert len(frames) == 2
    assert np.array_equal(frames[0], palette[f1])
    want = palette[f1].copy()
    want[1, 1] = palette[1]  # only the opaque pixel changed
    assert np.array_equal(frames[1], want)


def test_sample_video_frames_on_real_gif():
    from pdf_toolkit_ray.stages.multimodal import _decode_ppm, sample_video_frames

    palette = np.array([[i, 2 * i, 3 * i] for i in range(10)], dtype=np.uint8)
    frames = [np.full((4, 4, 3), palette[i], dtype=np.uint8) for i in range(10)]
    payload = encode_gif(frames)
    sampled = sample_video_frames(payload, every_n=3)
    assert len(sampled) == 4  # frames 0, 3, 6, 9
    for ppm, i in zip(sampled, (0, 3, 6, 9)):
        assert np.array_equal(_decode_ppm(ppm), frames[i])


def test_encode_gif_rejects_wide_palettes():
    rng = np.random.RandomState(1)
    frame = rng.randint(0, 256, size=(32, 32, 3)).astype(np.uint8)
    if len(np.unique(frame.reshape(-1, 3), axis=0)) <= 256:
        pytest.skip("random frame collapsed below 256 colors")
    with pytest.raises(ValueError):
        encode_gif([frame])


def test_decode_image_first_gif_frame():
    from pdf_toolkit_ray.stages.multimodal import decode_image

    frame = np.full((5, 7, 3), 9, dtype=np.uint8)
    assert np.array_equal(decode_image(encode_gif([frame])), frame)


def test_video_frame_features_stage_matches_direct(ray_session):
    import ray

    from pdf_toolkit_ray.stages.multimodal import (
        _decode_ppm,
        sample_video_frames,
        synthesize_video_table,
        video_frame_features,
    )

    tbl = synthesize_video_table(8)
    out = (
        video_frame_features(ray.data.from_arrow(tbl), every_n=2)
        .to_pandas()
        .sort_values(["media_id", "frame_idx"])
        .reset_index(drop=True)
    )
    # direct single-process recomputation
    rows = 0
    for mid, payload in zip(
        tbl.column("media_id").to_pylist(), tbl.column("payload").to_pylist()
    ):
        for j, ppm in enumerate(sample_video_frames(payload, 2)):
            img = _decode_ppm(ppm)
            r = out[(out["media_id"] == mid) & (out["frame_idx"] == 2 * j)]
            assert len(r) == 1
            assert r.iloc[0]["width"] == img.shape[1]
            assert [
                r.iloc[0]["mean_r"], r.iloc[0]["mean_g"], r.iloc[0]["mean_b"]
            ] == [float(img[..., c].mean()) for c in range(3)]
            rows += 1
    assert rows == len(out)


def test_gif_decoder_survives_mutations():
    """Malformed inputs must fail fast (any exception) or decode — never
    hang or loop: the LZW reader is bounded by n_pixels and bit length,
    block walks by payload length."""
    rng = np.random.RandomState(99)
    palette = rng.randint(0, 256, size=(8, 3)).astype(np.uint8)
    frames = [palette[rng.randint(0, 8, size=(9, 7))] for _ in range(3)]
    base = bytearray(encode_gif(frames))
    for trial in range(200):
        buf = bytearray(base)
        for _ in range(rng.randint(1, 6)):
            buf[rng.randint(0, len(buf))] = rng.randint(0, 256)
        try:
            decode_gif(bytes(buf[: rng.randint(16, len(buf) + 1)]))
        except Exception:
            pass  # any clean failure is acceptable; hangs are not


def test_gif_truncated_stream_pads():
    frame = np.full((6, 6, 3), 33, dtype=np.uint8)
    payload = bytearray(encode_gif([frame]))
    # chop the trailer and half the data sub-blocks
    cut = payload[: len(payload) - max(4, len(payload) // 3)]
    try:
        frames = decode_gif(bytes(cut))
        for f in frames:
            assert f.shape == (6, 6, 3)
    except Exception:
        pass
