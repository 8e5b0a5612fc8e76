"""ISO BMFF (MP4) container mux/demux — functions/mp4x.py.

The container layer is fully real (box tree incl. largesize/to-EOF
sizes, sample-table expansion); codec bitstream decode is the honest
stub boundary. Golden source is the encoder twin — no external media.
"""

import struct

import numpy as np
import pytest

from pdf_toolkit_ray.functions.mp4x import (
    Mp4Track,
    encode_mp4,
    extract_samples,
    is_mp4,
    parse_mp4,
)


def _mk_samples(n=7, seed=0):
    rng = np.random.RandomState(seed)
    return [rng.bytes(int(rng.randint(5, 40))) for _ in range(n)]


def test_roundtrip_video_track():
    samples = _mk_samples(7)
    mp4 = encode_mp4(
        samples,
        timescale=600,
        sample_duration=60,
        keyframes=[0, 3, 6],
        fourcc=b"ppmf",
        width=32,
        height=24,
        chunk_size=3,  # 3+3+1 chunks: short last chunk exercises stsc runs
    )
    assert is_mp4(mp4)
    info = parse_mp4(mp4)
    assert (info.timescale, info.duration) == (600, 420)
    t = info.track("vide")
    assert (t.fourcc, t.width, t.height) == ("ppmf", 32, 24)
    assert t.n_samples == 7
    assert t.sample_dts == [0, 60, 120, 180, 240, 300, 360]
    assert t.sync_flags == [True, False, False, True, False, False, True]
    assert extract_samples(mp4, t) == samples
    # partial extraction by index
    assert extract_samples(mp4, t, [6, 0]) == [samples[6], samples[0]]


def test_roundtrip_audio_track_variable_durations_co64():
    samples = _mk_samples(5, seed=1)
    durs = [10, 20, 10, 30, 10]
    mp4 = encode_mp4(
        samples,
        timescale=1000,
        sample_duration=durs,
        handler=b"soun",
        fourcc=b"mp4a",
        sample_rate=16000,
        channels=2,
        chunk_size=2,
        force_co64=True,  # 64-bit chunk offsets path
    )
    t = parse_mp4(mp4).track("soun")
    assert (t.fourcc, t.sample_rate, t.channels) == ("mp4a", 16000, 2)
    assert t.sample_dts == [0, 10, 30, 40, 70]
    assert t.duration == 80
    assert t.sync_flags == [True] * 5  # no stss box -> all sync, per spec
    assert extract_samples(mp4, t) == samples


def test_single_sample_and_uniform_chunk():
    mp4 = encode_mp4([b"xyz"], width=4, height=4)
    t = parse_mp4(mp4).track("vide")
    assert extract_samples(mp4, t) == [b"xyz"]
    assert t.sync_flags == [True]


def test_largesize_and_to_eof_box_headers():
    """size==1 (64-bit largesize) and size==0 (to EOF) on the trailing
    moov parse identically to the 32-bit form."""
    samples = _mk_samples(4, seed=2)
    mp4 = encode_mp4(samples, chunk_size=2, width=8, height=8)
    # locate trailing moov (encoder layout: ftyp + mdat + moov)
    moov_off = mp4.rindex(b"moov") - 4
    (size,) = struct.unpack_from(">I", mp4, moov_off)
    body = mp4[moov_off + 8 : moov_off + size]

    large = mp4[:moov_off] + struct.pack(">I4sQ", 1, b"moov", 16 + len(body)) + body
    t = parse_mp4(large).track("vide")
    assert extract_samples(large, t) == samples  # mdat offsets unchanged

    to_eof = mp4[:moov_off] + struct.pack(">I4s", 0, b"moov") + body
    t = parse_mp4(to_eof).track("vide")
    assert extract_samples(to_eof, t) == samples


def test_malformed_inputs_raise_value_error():
    samples = _mk_samples(3, seed=3)
    mp4 = encode_mp4(samples, width=8, height=8)
    with pytest.raises(ValueError):
        parse_mp4(b"nope")
    with pytest.raises(ValueError):
        parse_mp4(mp4[:40])  # truncated mid-mdat
    with pytest.raises(ValueError):
        parse_mp4(mp4[: len(mp4) - 10])  # truncated mid-moov
    # bad declared box size inside moov
    bad = bytearray(mp4)
    off = mp4.rindex(b"stsz") - 4
    struct.pack_into(">I", bad, off, 0xFFFFFF)
    with pytest.raises(ValueError):
        parse_mp4(bytes(bad))
    # sample overrunning the file (truncate after moov is impossible —
    # moov is last — so point a track at a fake huge offset instead)
    t = parse_mp4(mp4).track("vide")
    t.sample_offsets[1] = len(mp4)
    with pytest.raises(ValueError):
        extract_samples(mp4, t, [1])


def test_table_count_overruns_detected():
    """Every sample-table reader validates its declared entry count
    against the box body (no reads bleeding into adjacent boxes)."""
    samples = _mk_samples(6, seed=4)
    mp4 = encode_mp4(samples, chunk_size=3, keyframes=[0, 3])
    # count field: fourcc + fullbox hdr (4) [+ uniform_size (4) for stsz]
    for table, count_at in ((b"stsz", 12), (b"stts", 8), (b"stsc", 8),
                            (b"stco", 8), (b"stss", 8)):
        bad = bytearray(mp4)
        struct.pack_into(">I", bad, mp4.rindex(table) + count_at, 1 << 20)
        with pytest.raises(ValueError):
            parse_mp4(bytes(bad))


def test_sample_video_frames_mp4_real_and_stub_paths():
    from pdf_toolkit_ray.stages.multimodal import (
        decode_image,
        encode_ppm,
        sample_video_frames,
    )

    frames = [
        encode_ppm(np.full((3, 4, 3), 10 * i, dtype=np.uint8)) for i in range(9)
    ]
    mp4 = encode_mp4(frames, fourcc=b"ppmf", width=4, height=3, chunk_size=4)
    picked = sample_video_frames(mp4, every_n=3)
    assert len(picked) == 3
    assert decode_image(picked[1])[0, 0, 0] == 30  # sample 3

    # real codec fourcc: demux works, bitstream decode is the stub
    avc = encode_mp4([b"\x00\x00\x01\x65fake-nal"], fourcc=b"avc1", width=16, height=16)
    with pytest.raises(NotImplementedError, match="avc1"):
        sample_video_frames(avc)
    t = parse_mp4(avc).track("vide")  # ...but demux still yields the NAL
    assert extract_samples(avc, t) == [b"\x00\x00\x01\x65fake-nal"]


def test_mp4_digest_pin_and_sensitivity(ray_session):
    """Driver-hashable companion: matches the constants pinned in its
    SQL twin, and flipping ONE raster byte inside one mdat sample flips
    the frame-digest column (the hash covers demuxed+decoded content)."""
    import ray.data

    from pdf_toolkit_ray.queries import multimodal_mp4_digest
    from pdf_toolkit_ray.queries import _feature_digest, _hex_digest_sum
    from pdf_toolkit_ray.stages.multimodal import (
        mp4_frame_features,
        synthesize_mp4_table,
    )
    import pyarrow as pa
    import pyarrow.compute as pc

    got = multimodal_mp4_digest("unused").to_pydict()
    assert got == {
        "n_frames": [47], "sum_frame_idx": [146], "sum_dts_ms": [20933],
        "sum_keyframe": [19], "sum_nkey": [141], "sum_duration_ms": [52798],
        "sum_wh": [1527],
        "frame_digest_sum": [1663254526996915486],
    }

    tbl = synthesize_mp4_table(12).to_pydict()
    payload = bytearray(tbl["payload"][0])
    t = parse_mp4(bytes(payload)).track("vide")
    # last raster byte of sample 0 (a sampled frame: every_n=2 picks 0)
    payload[t.sample_offsets[0] + t.sample_sizes[0] - 1] ^= 0xFF
    tbl["payload"][0] = bytes(payload)
    ds = mp4_frame_features(ray.data.from_arrow(pa.table(tbl)))
    mutated = _feature_digest(
        ds, {"frame_digest_sum": lambda b: _hex_digest_sum(b.column("frame_digest"))}
    ).to_pydict()
    assert mutated["frame_digest_sum"] != [1663254526996915486]
