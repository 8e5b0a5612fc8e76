"""MPEG-audio (MP3) framing — functions/mp3x.py.

The framing layer is fully real (header tables, frame-size arithmetic,
ID3 skip, Xing/VBR, resync); Layer-III PCM decode is the honest codec
stub. Goldens come from the builder twin — no external media.
"""

import pytest

from pdf_toolkit_ray.functions.mp3x import (
    build_mp3,
    is_mp3,
    parse_mp3,
)


def test_cbr_44100_padding_alternation():
    """128 kbps @ 44100 Hz must alternate 417/418-byte frames via the
    rate accumulator — the canonical CBR shape real encoders emit."""
    mp3 = build_mp3(30, bitrate_kbps=128, sample_rate=44100)
    info = parse_mp3(mp3)
    assert info.n_frames == 30
    assert sorted(set(f.size for f in info.frames)) == [417, 418]
    # average frame size equals the exact rational 144*br/sr
    total = sum(f.size for f in info.frames)
    assert abs(total / 30 - 144 * 128000 / 44100) < 1.0
    assert abs(info.duration_sec - 30 * 1152 / 44100) < 1e-9
    assert abs(info.avg_bitrate_kbps - 128) < 0.5
    assert not info.is_vbr and not info.truncated_final and info.junk_bytes == 0


def test_vbr_xing_and_id3_wrappers():
    rates = [64, 96, 128, 160, 192, 128, 96, 64, 128, 160, 96, 128]
    mp3 = build_mp3(
        12, bitrate_kbps=rates, sample_rate=32000, xing=True,
        id3v2_payload=bytes(64), id3v1=True, channel_mode=1,
    )
    info = parse_mp3(mp3)
    assert info.id3v2_bytes == 74 and info.has_id3v1
    assert info.n_frames == 13  # 12 music + 1 Xing frame
    assert info.xing is not None and info.xing["tag"] == "Xing"
    assert info.xing["n_frames"] == 13
    assert info.xing["n_bytes"] == sum(f.size for f in info.frames)
    assert len(info.xing["toc"]) == 100
    assert info.is_vbr
    assert {f.bitrate_kbps for f in info.frames[1:]} == set(rates)


def test_versions_layers_samples_per_frame():
    # MPEG-2 Layer III: 576-sample frames, 72*br/sr sizing
    m2 = parse_mp3(build_mp3(8, bitrate_kbps=64, sample_rate=22050, version="2"))
    f = m2.frames[0]
    assert (f.version, f.layer, f.n_samples) == ("2", 3, 576)
    assert f.size in (72 * 64000 // 22050, 72 * 64000 // 22050 + 1)
    # MPEG-2.5
    m25 = parse_mp3(build_mp3(6, bitrate_kbps=32, sample_rate=11025, version="2.5"))
    assert m25.frames[0].n_samples == 576 and m25.sample_rate == 11025
    # Layer II: 1152 samples, 144 coefficient
    l2 = parse_mp3(build_mp3(8, bitrate_kbps=192, sample_rate=48000, layer=2))
    assert l2.frames[0].n_samples == 1152 and l2.frames[0].size == 144 * 192000 // 48000
    # Layer I: 384 samples, 4-byte-slot sizing
    l1 = parse_mp3(build_mp3(8, bitrate_kbps=256, sample_rate=44100, layer=1))
    assert l1.frames[0].n_samples == 384
    assert l1.frames[0].size == (12 * 256000 // 44100) * 4


def test_resync_and_truncation():
    mp3 = build_mp3(30, bitrate_kbps=128, sample_rate=44100)
    info = parse_mp3(mp3)
    b2 = info.frames[2].offset
    # junk at a frame boundary: bounded resync, junk accounted, no frame lost
    junked = mp3[:b2] + b"\x00garbage\x00" + mp3[b2:]
    ji = parse_mp3(junked)
    assert ji.junk_bytes == 9 and ji.n_frames == 30
    # chopped tail: final partial frame flagged, earlier frames intact
    ti = parse_mp3(mp3[:-50])
    assert ti.truncated_final and ti.n_frames == 29
    # pure noise: clean error
    with pytest.raises(ValueError):
        parse_mp3(bytes(2000))


def test_sniff_and_false_sync_guard():
    assert is_mp3(build_mp3(3))
    assert is_mp3(b"ID3\x04\x00\x00\x00\x00\x00\x00")
    assert not is_mp3(b"RIFFxxxxWAVE")
    # 0xFFFB-ish bytes NOT followed by a coherent next frame are rejected
    # by the second-frame confirmation (classic false-sync guard)
    fake = b"\xff\xfb\x90\x00" + bytes(2000)
    with pytest.raises(ValueError):
        parse_mp3(fake)


def test_probe_audio_and_honest_stub():
    import io
    import wave

    import numpy as np

    from pdf_toolkit_ray.stages.multimodal import decode_audio, probe_audio

    mp3 = build_mp3(20, bitrate_kbps=128, sample_rate=44100)
    p = probe_audio(mp3)
    assert p["container"] == "mp3" and p["sample_rate"] == 44100
    assert p["n_frames"] == 20 and p["bitrate_kbps"] == 128 and not p["is_vbr"]
    # PCM decode is the stub — but the message proves framing was parsed
    with pytest.raises(NotImplementedError, match="20 frames"):
        decode_audio(mp3)

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(8000)
        wf.writeframes(np.zeros(4000, dtype=np.int16).tobytes())
    w = probe_audio(buf.getvalue())
    assert w["container"] == "wav" and w["duration_ms"] == 500
    with pytest.raises(ValueError):
        probe_audio(b"OggS\x00\x00")


def test_mp3_probe_query_matches_pinned_twin(ray_session):
    """The driver twin is a full VALUES table: every row/column of the
    probe output is pinned — any framing change must re-pin."""
    import duckdb
    import pandas as pd

    from pdf_toolkit_ray.queries import MULTIMODAL_MP3_PROBE_SQL, multimodal_mp3_probe

    got = (
        multimodal_mp3_probe("unused")
        .to_pandas()
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    want = (
        duckdb.sql(MULTIMODAL_MP3_PROBE_SQL)
        .df()
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)], check_dtype=False
    )


def test_id3v2_text_frames_roundtrip():
    """Real ID3v2 text frames (v2.4 synchsafe + v2.3 plain sizes,
    UTF-8/UTF-16/latin-1 encodings) parse back through the tag walk."""
    from pdf_toolkit_ray.functions.mp3x import (
        build_id3v2_frames,
        parse_id3v2_tags,
        parse_mp3,
    )

    tags = {"title": "Späm & Eggs", "artist": "builder twin", "album": "fixtures"}
    for version in (3, 4):
        frames = build_id3v2_frames(tags, version=version)
        mp3 = build_mp3(5, bitrate_kbps=128, sample_rate=44100,
                        id3v2_payload=frames)
        # header version byte must match the frame-size convention
        mp3 = mp3[:3] + bytes([version]) + mp3[4:]
        got = parse_id3v2_tags(mp3)
        assert got == tags, (version, got)
        info = parse_mp3(mp3)
        assert info.n_frames == 5 and info.id3v2_bytes > 0

    # UTF-16 with BOM and latin-1 bodies parse too
    body16 = b"TIT2" + bytes([0, 0, 0, 1 + len("Tëst".encode("utf-16"))]) + b"\x00\x00" \
        + b"\x01" + "Tëst".encode("utf-16")
    raw = b"ID3\x03\x00\x00" + bytes([0, 0, (len(body16) >> 7) & 0x7F, len(body16) & 0x7F]) + body16
    assert parse_id3v2_tags(raw)["title"] == "Tëst"


def test_id3v2_tags_corrupt_safe():
    from pdf_toolkit_ray.functions.mp3x import build_id3v2_frames, parse_id3v2_tags

    frames = build_id3v2_frames({"title": "x" * 50})
    mp3 = build_mp3(3, bitrate_kbps=128, sample_rate=44100, id3v2_payload=frames)
    assert parse_id3v2_tags(mp3)["title"] == "x" * 50
    # truncations and bit flips never raise — worst case fewer tags
    for cut in (5, 12, 20, 40):
        parse_id3v2_tags(mp3[:cut])
    bad = bytearray(mp3)
    for pos in (11, 14, 17, 21):
        bad[pos] ^= 0xFF
        parse_id3v2_tags(bytes(bad))
    assert parse_id3v2_tags(b"") == {} and parse_id3v2_tags(b"ID3") == {}
