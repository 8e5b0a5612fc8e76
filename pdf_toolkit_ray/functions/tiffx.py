"""From-scratch BMP and baseline-TIFF codecs — pure byte work, no image
libraries. Scanned-document corpora carry both heavily (TIFF is the
classic scan container; BMP the classic DIB export), so the image decode
path covers them for real alongside PPM/PNG/JPEG/GIF.

BMP (Windows DIB, ``BM``): BITMAPFILEHEADER + BITMAPINFOHEADER,
uncompressed BI_RGB only — 24-bit BGR and 8-bit paletted, bottom-up and
top-down row order, 4-byte row padding. Encoder twin writes 24-bit
bottom-up.

TIFF (``II*\\0`` / ``MM\\0*``): baseline, Compression=1 (none), strips.
Both byte orders, 8-bit RGB and 8-bit grayscale, multi-strip, inline and
offset tag values, RowsPerStrip defaulting. Encoder twin writes a
minimal single-IFD file in either byte order with a chosen strip size.
Everything else (LZW/JPEG-in-TIFF, tiles, planar config 2) raises a
clean ``NotImplementedError`` — honest codec boundaries, like the other
modules.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# BMP


def is_bmp(payload: bytes) -> bool:
    return payload[:2] == b"BM"


def decode_bmp(payload: bytes) -> np.ndarray:
    """BMP bytes → (H, W, 3) uint8 RGB."""
    if not is_bmp(payload):
        raise ValueError("bmp: missing BM magic")
    if len(payload) < 54:
        raise ValueError("bmp: truncated header")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise NotImplementedError("bmp: pre-BITMAPINFOHEADER DIBs unsupported")
    w, h = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if planes != 1:
        raise ValueError("bmp: planes != 1")
    if compression != 0:
        raise NotImplementedError(f"bmp: compression {compression} unsupported")
    if bpp not in (8, 24):
        raise NotImplementedError(f"bmp: {bpp}-bit unsupported")
    if w <= 0 or h == 0:
        raise ValueError("bmp: bad dimensions")
    top_down = h < 0
    h = abs(h)
    if w * h > 64_000_000:
        raise ValueError("bmp: implausible dimensions")

    palette = None
    if bpp == 8:
        n_colors = struct.unpack_from("<I", payload, 46)[0] or 256
        pal_off = 14 + hdr_size
        pal = np.frombuffer(payload, np.uint8, count=n_colors * 4, offset=pal_off)
        palette = pal.reshape(-1, 4)[:, [2, 1, 0]]  # BGRA → RGB

    row_bytes = (w * bpp // 8 + 3) & ~3
    need = data_off + row_bytes * h
    if len(payload) < need:
        raise ValueError("bmp: truncated pixel data")
    rows = np.frombuffer(
        payload, np.uint8, count=row_bytes * h, offset=data_off
    ).reshape(h, row_bytes)
    if not top_down:
        rows = rows[::-1]
    if bpp == 24:
        px = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR → RGB
        return np.ascontiguousarray(px)
    idx = rows[:, :w]
    if palette is None or idx.max(initial=0) >= len(palette):
        raise ValueError("bmp: palette index out of range")
    return np.ascontiguousarray(palette[idx])


def encode_bmp(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB → 24-bit bottom-up BI_RGB BMP."""
    h, w, _ = img.shape
    row_bytes = (w * 3 + 3) & ~3
    pix = np.zeros((h, row_bytes), np.uint8)
    pix[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # RGB → BGR, bottom-up
    data = pix.tobytes()
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + len(data), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    return header + info + data


# ---------------------------------------------------------------------------
# TIFF (baseline, uncompressed)

_TAG_WIDTH = 256
_TAG_LENGTH = 257
_TAG_BPS = 258
_TAG_COMPRESSION = 259
_TAG_PHOTO = 262
_TAG_STRIP_OFFSETS = 273
_TAG_SPP = 277
_TAG_ROWS_PER_STRIP = 278
_TAG_STRIP_COUNTS = 279
_TAG_PLANAR = 284

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}


def is_tiff(payload: bytes) -> bool:
    return payload[:4] in (b"II*\x00", b"MM\x00*")


def _read_ifd(payload: bytes, endian: str) -> dict[int, list[int]]:
    ifd_off = struct.unpack_from(endian + "I", payload, 4)[0]
    if ifd_off + 2 > len(payload):
        raise ValueError("tiff: truncated IFD offset")
    n = struct.unpack_from(endian + "H", payload, ifd_off)[0]
    tags: dict[int, list[int]] = {}
    for i in range(n):
        base = ifd_off + 2 + i * 12
        if base + 12 > len(payload):
            raise ValueError("tiff: truncated IFD entry")
        tag, typ, count = struct.unpack_from(endian + "HHI", payload, base)
        if typ not in _TYPE_SIZE:
            continue  # unknown type: skip per spec
        size = _TYPE_SIZE[typ] * count
        if size <= 4:
            voff = base + 8
        else:
            voff = struct.unpack_from(endian + "I", payload, base + 8)[0]
        if voff + size > len(payload):
            raise ValueError("tiff: tag value overruns file")
        if typ == 3:
            vals = list(struct.unpack_from(endian + f"{count}H", payload, voff))
        elif typ == 4:
            vals = list(struct.unpack_from(endian + f"{count}I", payload, voff))
        elif typ == 1:
            vals = list(payload[voff : voff + count])
        elif typ == 5:  # rational
            raw = struct.unpack_from(endian + f"{2 * count}I", payload, voff)
            vals = [raw[2 * j] // max(raw[2 * j + 1], 1) for j in range(count)]
        else:
            vals = list(payload[voff : voff + count])
        tags[tag] = vals
    return tags


def decode_tiff(payload: bytes) -> np.ndarray:
    """Baseline uncompressed TIFF → (H, W, 3) uint8 RGB (grayscale
    replicated). First IFD only."""
    if not is_tiff(payload):
        raise ValueError("tiff: bad magic")
    endian = "<" if payload[:2] == b"II" else ">"
    tags = _read_ifd(payload, endian)
    try:
        w = tags[_TAG_WIDTH][0]
        h = tags[_TAG_LENGTH][0]
        offsets = tags[_TAG_STRIP_OFFSETS]
        counts = tags[_TAG_STRIP_COUNTS]
    except KeyError as e:
        raise ValueError(f"tiff: missing required tag {e}")
    comp = tags.get(_TAG_COMPRESSION, [1])[0]
    if comp != 1:
        raise NotImplementedError(f"tiff: compression {comp} unsupported")
    spp = tags.get(_TAG_SPP, [1])[0]
    bps = tags.get(_TAG_BPS, [8])
    if any(b != 8 for b in bps) or spp not in (1, 3):
        raise NotImplementedError("tiff: only 8-bit gray/RGB supported")
    if tags.get(_TAG_PLANAR, [1])[0] != 1:
        raise NotImplementedError("tiff: planar configuration 2 unsupported")
    if w <= 0 or h <= 0 or w * h > 64_000_000:
        raise ValueError("tiff: bad dimensions")
    rps = tags.get(_TAG_ROWS_PER_STRIP, [h])[0] or h
    if len(offsets) != len(counts):
        raise ValueError("tiff: strip offsets/counts mismatch")

    buf = bytearray()
    remaining = h
    for off, cnt in zip(offsets, counts):
        if off + cnt > len(payload):
            raise ValueError("tiff: strip overruns file")
        rows = min(rps, remaining)
        need = rows * w * spp
        if cnt < need:
            raise ValueError("tiff: strip shorter than its rows")
        buf += payload[off : off + need]
        remaining -= rows
    if remaining > 0:
        raise ValueError("tiff: strips cover fewer rows than ImageLength")
    px = np.frombuffer(bytes(buf), np.uint8, count=h * w * spp).reshape(h, w, spp)
    if spp == 1:
        px = np.repeat(px, 3, axis=2)
    return np.ascontiguousarray(px)


def encode_tiff(
    img: np.ndarray, *, byte_order: str = "II", rows_per_strip: int | None = None
) -> bytes:
    """(H, W, 3) or (H, W) uint8 → minimal baseline uncompressed TIFF
    (single IFD, strip layout, either byte order)."""
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, spp = img.shape
    if spp not in (1, 3):
        raise ValueError("encode_tiff: 1 or 3 samples per pixel")
    endian = "<" if byte_order == "II" else ">"
    rps = rows_per_strip or h
    strips = []
    for y0 in range(0, h, rps):
        strips.append(img[y0 : y0 + rps].tobytes())

    entries = []  # (tag, type, count, value_or_bytes)

    def short(tag, vals):
        entries.append((tag, 3, vals))

    def long(tag, vals):
        entries.append((tag, 4, vals))

    short(_TAG_WIDTH, [w])
    short(_TAG_LENGTH, [h])
    short(_TAG_BPS, [8] * spp)
    short(_TAG_COMPRESSION, [1])
    short(_TAG_PHOTO, [2 if spp == 3 else 1])
    long(_TAG_STRIP_OFFSETS, [0] * len(strips))  # patched below
    short(_TAG_SPP, [spp])
    short(_TAG_ROWS_PER_STRIP, [rps])
    long(_TAG_STRIP_COUNTS, [len(s) for s in strips])
    entries.sort(key=lambda e: e[0])

    header = struct.pack(endian + "2sHI", b"II" if endian == "<" else b"MM", 42, 8)
    ifd_off = 8
    n = len(entries)
    ifd_size = 2 + n * 12 + 4
    extra_off = ifd_off + ifd_size  # overflow tag values land here
    extra = bytearray()

    def value_field(typ, vals):
        nonlocal extra
        fmt = "H" if typ == 3 else "I"
        size = _TYPE_SIZE[typ] * len(vals)
        raw = struct.pack(endian + f"{len(vals)}{fmt}", *vals)
        if size <= 4:
            return raw.ljust(4, b"\x00"), None
        off = extra_off + len(extra)
        extra += raw
        return struct.pack(endian + "I", off), len(extra) - len(raw)

    # first pass to size the extra area so strip data lands after it
    sizes = [
        _TYPE_SIZE[typ] * len(vals) for _, typ, vals in entries
    ]
    extra_total = sum(s for s in sizes if s > 4)
    data_off = extra_off + extra_total
    # patch strip offsets now that data_off is known
    offs, pos = [], data_off
    for s in strips:
        offs.append(pos)
        pos += len(s)
    entries = [
        (t, typ, offs if t == _TAG_STRIP_OFFSETS else vals)
        for t, typ, vals in entries
    ]

    body = struct.pack(endian + "H", n)
    for tag, typ, vals in entries:
        vf, _ = value_field(typ, vals)
        body += struct.pack(endian + "HHI", tag, typ, len(vals)) + vf
    body += struct.pack(endian + "I", 0)  # no next IFD
    return header + body + bytes(extra) + b"".join(strips)
