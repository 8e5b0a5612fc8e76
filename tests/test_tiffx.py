"""BMP + baseline TIFF — functions/tiffx.py. From-scratch, no image
libraries; goldens via the encoder twins, fuzz-hardened."""

import struct

import numpy as np
import pytest

from pdf_toolkit_ray.functions.tiffx import (
    decode_bmp,
    decode_tiff,
    encode_bmp,
    encode_tiff,
    is_bmp,
    is_tiff,
)


def _img(h=23, w=17, seed=4):
    return np.random.RandomState(seed).randint(0, 256, (h, w, 3), np.uint8)


def test_bmp_roundtrip_24bit():
    img = _img()
    enc = encode_bmp(img)
    assert is_bmp(enc)
    assert np.array_equal(decode_bmp(enc), img)


def test_bmp_row_padding_widths():
    for w in (1, 2, 3, 4, 5):  # every padding residue
        img = _img(5, w, seed=w)
        assert np.array_equal(decode_bmp(encode_bmp(img)), img)


def test_bmp_top_down_and_palette():
    # hand-build: top-down (negative height) 8-bit paletted BMP
    h, w = 4, 6
    rng = np.random.RandomState(9)
    idx = rng.randint(0, 16, (h, w), np.uint8)
    pal = rng.randint(0, 256, (16, 3), np.uint8)
    row_bytes = (w + 3) & ~3
    rows = np.zeros((h, row_bytes), np.uint8)
    rows[:, :w] = idx
    data = rows.tobytes()
    off = 14 + 40 + 16 * 4
    hdr = struct.pack("<2sIHHI", b"BM", off + len(data), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, -h, 1, 8, 0, len(data), 0, 0, 16, 0)
    pal_bytes = b"".join(bytes([b, g, r, 0]) for r, g, b in pal)
    enc = hdr + info + pal_bytes + data
    got = decode_bmp(enc)
    assert np.array_equal(got, pal[idx])


@pytest.mark.parametrize("bo", ["II", "MM"])
@pytest.mark.parametrize("rps", [None, 1, 5])
def test_tiff_roundtrip(bo, rps):
    img = _img(seed=11)
    enc = encode_tiff(img, byte_order=bo, rows_per_strip=rps)
    assert is_tiff(enc)
    assert np.array_equal(decode_tiff(enc), img)


def test_tiff_grayscale_replicates():
    g = np.random.RandomState(2).randint(0, 256, (9, 31), np.uint8)
    got = decode_tiff(encode_tiff(g, byte_order="MM", rows_per_strip=4))
    assert np.array_equal(got, np.repeat(g[:, :, None], 3, axis=2))


def test_decode_image_dispatch(ray_session):
    from pdf_toolkit_ray.stages.multimodal import decode_image

    img = _img(seed=21)
    assert np.array_equal(decode_image(encode_bmp(img)), img)
    assert np.array_equal(decode_image(encode_tiff(img)), img)


def test_bmp_fuzz_truncation_and_compression():
    img = _img(8, 8)
    enc = encode_bmp(img)
    for cut in (1, 10, 40, 60, len(enc) - 1):
        with pytest.raises((ValueError, NotImplementedError)):
            decode_bmp(enc[:cut])
    bad = bytearray(enc)
    struct.pack_into("<I", bad, 30, 1)  # RLE8 flag
    with pytest.raises(NotImplementedError):
        decode_bmp(bytes(bad))


def test_tiff_fuzz():
    img = _img(8, 8)
    enc = encode_tiff(img)
    for cut in (3, 9, 30, len(enc) // 2):
        with pytest.raises((ValueError, NotImplementedError)):
            decode_tiff(enc[:cut])
    # strip offset pointing past EOF must be rejected, not read OOB
    bad = bytearray(enc)
    pos = bad.find(struct.pack("<I", len(enc) - 8 * 8 * 3))
    assert pos > 0
    struct.pack_into("<I", bad, pos, len(enc) + 1000)
    with pytest.raises(ValueError):
        decode_tiff(bytes(bad))
    # LZW compression → honest NotImplementedError
    bad2 = bytearray(enc)
    # compression tag value sits in an inline SHORT field; find tag 259
    ifd = struct.unpack_from("<I", bad2, 4)[0]
    n = struct.unpack_from("<H", bad2, ifd)[0]
    for i in range(n):
        base = ifd + 2 + i * 12
        if struct.unpack_from("<H", bad2, base)[0] == 259:
            struct.pack_into("<H", bad2, base + 8, 5)  # LZW
    with pytest.raises(NotImplementedError):
        decode_tiff(bytes(bad2))


def test_pgm_p5_grayscale_decodes():
    from pdf_toolkit_ray.stages.multimodal import decode_image

    g = np.random.RandomState(6).randint(0, 256, (7, 11), np.uint8)
    payload = b"P5\n11 7\n255\n" + g.tobytes()
    got = decode_image(payload)
    assert np.array_equal(got, np.repeat(g[:, :, None], 3, axis=2))
    with pytest.raises(ValueError):
        decode_image(payload[:-5])  # truncated pixel data
