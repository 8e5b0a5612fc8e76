"""FLAC codec — functions/flacx.py.

Unlike the MP3 family, the FLAC PCM decode is REAL and proven lossless:
every test asserts sample-for-sample equality through the encoder twin,
plus CRC/MD5 verification behavior and fuzz hardening. No external media.
"""

import numpy as np
import pytest

from pdf_toolkit_ray.functions.flacx import (
    BitReader,
    crc8,
    crc16,
    decode_coded_number,
    decode_flac,
    encode_coded_number,
    encode_flac,
    is_flac,
    probe_flac,
)


def _sig(n=9000, seed=3, amp=9000, noise=250):
    rng = np.random.RandomState(seed)
    t = np.arange(n)
    return (amp * np.sin(t / 33.0) + rng.randint(-noise, noise, n)).astype(np.int32)


def _roundtrip(samples, rate=44100, **kw):
    enc = encode_flac(samples, rate, **kw)
    dec, out_rate, _bps = decode_flac(enc)
    want = samples if samples.ndim == 2 else samples[:, None]
    assert out_rate == rate
    assert np.array_equal(dec, want)
    return enc


# ---------------------------------------------------------------------------
# primitives


def test_crc_vectors():
    # CRC-8 poly 0x07 and CRC-16 poly 0x8005 over "123456789" — the
    # standard check strings (CRC-8/SMBUS = 0xF4, CRC-16/BUYPASS = 0xFEE8)
    assert crc8(b"123456789") == 0xF4
    assert crc16(b"123456789") == 0xFEE8


@pytest.mark.parametrize(
    "value", [0, 1, 0x7F, 0x80, 0x7FF, 0x800, 0xFFFF, 0x10000, 0x1FFFFF,
              0x200000, 0x3FFFFFF, 0x4000000, 0x7FFFFFFF, (1 << 36) - 1]
)
def test_coded_number_roundtrip(value):
    raw = encode_coded_number(value)
    assert decode_coded_number(BitReader(raw)) == value


def test_coded_number_bad_lead_and_continuation():
    with pytest.raises(ValueError):
        decode_coded_number(BitReader(bytes([0b10111111])))  # bare continuation
    with pytest.raises(ValueError):
        decode_coded_number(BitReader(bytes([0xC2, 0x00])))  # bad continuation


# ---------------------------------------------------------------------------
# subframe / predictor / residual matrix — all bit-exact roundtrips


@pytest.mark.parametrize("mode", ["constant", "verbatim", "fixed", "lpc"])
def test_subframe_modes(mode):
    s = np.full(5000, 77, np.int32) if mode == "constant" else _sig(5000)
    _roundtrip(s, subframe_mode=mode)


@pytest.mark.parametrize("order", [1, 2, 4, 8, 12, 32])
def test_lpc_orders(order):
    _roundtrip(_sig(6000, seed=order), subframe_mode="lpc", lpc_order=order)


@pytest.mark.parametrize("po", [0, 1, 2, 3, 4])
def test_partition_orders(po):
    _roundtrip(_sig(4096 * 2), partition_order=po)


def test_escape_partitions():
    _roundtrip(_sig(8192), partition_order=2, escape_parts={0, 2})


def test_all_zero_escape_partition():
    # escape with a tiny uniform signal still roundtrips
    s = np.zeros(4096, np.int32)
    s[10] = 3
    _roundtrip(s, partition_order=1, escape_parts={0, 1}, use_wasted=False)


def test_wasted_bits():
    s = (_sig(5000) & ~np.int32(0xFF)).astype(np.int32)
    enc_w = _roundtrip(s, use_wasted=True)
    enc_nw = _roundtrip(s, use_wasted=False)
    assert len(enc_w) < len(enc_nw)  # wasted bits actually save bits


@pytest.mark.parametrize("mode", ["independent", "left_side", "right_side", "mid_side"])
def test_stereo_modes(mode):
    rng = np.random.RandomState(11)
    n = 7000
    l = (6000 * np.sin(np.arange(n) / 21.0)).astype(np.int32)
    r = (l // 3 + rng.randint(-150, 150, n)).astype(np.int32)
    _roundtrip(np.stack([l, r], axis=1), stereo_mode=mode)


def test_mid_side_odd_sum_parity():
    # l+r odd exercises the side-parity bit reconstruction exactly
    l = np.array([1, 2, -3, 100, -101, 32000], np.int32)
    r = np.array([2, 2, 4, -55, 6, -32000], np.int32)
    _roundtrip(np.stack([l, r], axis=1), rate=8000, stereo_mode="mid_side",
               block_size=192)


@pytest.mark.parametrize("bps", [8, 16, 24])
def test_bit_depths(bps):
    amp = (1 << (bps - 1)) - 2
    rng = np.random.RandomState(bps)
    s = rng.randint(-amp, amp, 3000).astype(np.int32)
    _roundtrip(s, bps=bps, subframe_mode="verbatim")


def test_multichannel_independent():
    rng = np.random.RandomState(5)
    s = rng.randint(-20000, 20000, (3000, 4)).astype(np.int32)
    _roundtrip(s, stereo_mode="independent")


@pytest.mark.parametrize("bs", [192, 576, 1000, 1024, 4096])
def test_block_sizes_incl_escape(bs):
    # 1000 is not in the code table → 16-bit end-of-header escape
    _roundtrip(_sig(bs * 2 + bs // 2, seed=bs), block_size=bs)


@pytest.mark.parametrize("rate", [8000, 11025, 44100, 96000, 192000])
def test_sample_rates_incl_escape(rate):
    # 11025 is not in the code table → 16-bit Hz escape
    _roundtrip(_sig(2000), rate=rate)


def test_multibyte_utf8_frame_numbers():
    # >127 frames forces 2-byte coded frame numbers
    s = _sig(192 * 130, noise=50)
    enc = _roundtrip(s, block_size=192)
    assert probe_flac(enc)["total_samples"] == len(s)


def test_short_last_frame():
    s = _sig(4096 + 17)
    _roundtrip(s, block_size=4096)


# ---------------------------------------------------------------------------
# verification: CRCs, MD5, STREAMINFO


def test_probe_fields():
    s = _sig(44100)
    enc = encode_flac(s, 44100, bps=16, block_size=4096)
    p = probe_flac(enc)
    assert p["container"] == "flac"
    assert p["sample_rate"] == 44100
    assert p["n_channels"] == 1
    assert p["bits_per_sample"] == 16
    assert p["total_samples"] == 44100
    assert p["duration_ms"] == 1000
    assert p["md5_present"]
    assert is_flac(enc) and not is_flac(b"RIFFxxxx")


def test_md5_absent_skips_check():
    s = _sig(3000)
    enc = encode_flac(s, 8000, write_md5=False)
    dec, _, _ = decode_flac(enc)
    assert np.array_equal(dec[:, 0], s)
    assert not probe_flac(enc)["md5_present"]


def test_bit_flip_detected_everywhere():
    """Flipping ANY payload bit must raise (CRC-8, CRC-16, MD5 or a parse
    error) — never return silently different PCM."""
    s = _sig(1500, noise=40)
    enc = bytearray(encode_flac(s, 8000, block_size=576))
    rng = np.random.RandomState(0)
    # skip the 4-byte marker; sample 60 positions across the stream
    for pos in rng.choice(np.arange(4, len(enc)), size=60, replace=False):
        for bit in (0, 5):
            bad = bytearray(enc)
            bad[pos] ^= 1 << bit
            try:
                dec, _, _ = decode_flac(bytes(bad))
            except (ValueError, NotImplementedError):
                continue
            # undetected ONLY if the flip landed in ignored metadata
            # (min/max framesize fields) — PCM must still be identical
            assert np.array_equal(dec[:, 0], s)


def test_truncation_fuzz():
    s = _sig(2000)
    enc = encode_flac(s, 8000)
    for cut in (3, 7, 20, 40, len(enc) // 2, len(enc) - 1):
        with pytest.raises(ValueError):
            decode_flac(enc[:cut])


def test_garbage_rejected():
    with pytest.raises(ValueError):
        decode_flac(b"not a flac stream at all" * 10)
    with pytest.raises(ValueError):
        probe_flac(b"fLaC")  # marker but no metadata


def test_crc16_is_checked():
    s = _sig(1000)
    enc = bytearray(encode_flac(s, 8000, write_md5=False))
    enc[-1] ^= 0xFF  # last byte of the last frame's CRC-16
    with pytest.raises(ValueError, match="CRC-16"):
        decode_flac(bytes(enc))


def test_metadata_blocks_skipped():
    # splice a PADDING block (type 1) between STREAMINFO and frames
    s = _sig(1000)
    enc = encode_flac(s, 8000)
    assert enc[4] == 0x80  # last-flag on STREAMINFO
    si_end = 4 + 4 + 34
    pad = bytes([1]) + (8).to_bytes(3, "big") + b"\x00" * 8
    spliced = enc[:4] + bytes([0x00]) + enc[5:si_end] + bytes([0x81]) + pad[1:] + enc[si_end:]
    dec, _, _ = decode_flac(spliced)
    assert np.array_equal(dec[:, 0], s)


# ---------------------------------------------------------------------------
# property-style sweep


def test_random_sweep():
    rng = np.random.RandomState(99)
    for trial in range(12):
        n = int(rng.randint(300, 6000))
        bps = int(rng.choice([8, 16, 24]))
        amp = (1 << (bps - 1)) - 1
        nch = int(rng.choice([1, 2]))
        shape = (n,) if nch == 1 else (n, 2)
        kind = trial % 3
        if kind == 0:
            s = rng.randint(-amp, amp + 1, shape).astype(np.int32)
        elif kind == 1:
            base = (amp // 2 * np.sin(np.arange(n) / 17.0)).astype(np.int32)
            s = base if nch == 1 else np.stack([base, -base // 2], axis=1)
        else:
            s = np.zeros(shape, np.int32)
        _roundtrip(
            s,
            rate=int(rng.choice([8000, 44100, 48000])),
            bps=bps,
            block_size=int(rng.choice([256, 1024, 4096])),
            subframe_mode=str(rng.choice(["auto", "fixed", "lpc", "verbatim"])),
            partition_order=int(rng.choice([0, 1, 2])),
        )


def test_vorbis_comment_roundtrip():
    s = _sig(2000)
    enc = encode_flac(
        s, 8000, tags={"title": "Test Clip", "artist": "builder twin", "lang": "en"}
    )
    p = probe_flac(enc)
    assert p["tags"]["title"] == "Test Clip"
    assert p["tags"]["artist"] == "builder twin"
    assert p["tags"]["vendor"] == "flacx-twin"
    # PCM decode unaffected by the extra metadata block
    dec, _, _ = decode_flac(enc)
    assert np.array_equal(dec[:, 0], s)
    # streams without tags report empty tags
    assert probe_flac(encode_flac(s, 8000))["tags"] == {}


def test_vorbis_comment_truncation_rejected():
    from pdf_toolkit_ray.functions.flacx import parse_vorbis_comment

    good = encode_flac(_sig(500), 8000, tags={"k": "v"})
    p = probe_flac(good)
    assert p["tags"]["k"] == "v"
    with pytest.raises(ValueError):
        parse_vorbis_comment(b"\xff\xff\xff\xff")  # vendor length overruns
    with pytest.raises(ValueError):
        parse_vorbis_comment(b"\x02\x00\x00\x00ab\x05\x00\x00\x00\x01\x00\x00\x00x")
