"""From-scratch GIF89a codec (pure stdlib + numpy): LZW decompression,
interlacing, per-frame local palettes, transparency and frame disposal —
enough to treat an animated GIF as a real video-ish container for the
frame-sampling stage (``stages/multimodal.py::sample_video_frames``).

Implements the public GIF89a specification (CompuServe, 1990) and the
standard variable-width LZW described there. The encoder emits
root-codes-only LZW (tracking the decoder's table growth so code widths
stay in sync, with CLEAR resets before the table saturates) — bigger
output than a dictionary encoder but bit-valid for any decoder, which is
all tests and the synthetic data need.

Reference parity note: the reference ships Pillow/PyMuPDF for media
decode (reference pyproject.toml:10-14); this engine's container policy
(SURVEY §2 multimodal mandate) is from-scratch decoders for public
formats, stubs only where a codec genuinely needs ffmpeg-class
dependencies.
"""

from __future__ import annotations

import struct

import numpy as np

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace_order(height: int) -> np.ndarray:
    """Row permutation: output row i of the decoded stream lands at
    screen row order[i], per GIF89a appendix E."""
    rows = []
    for start, step in _INTERLACE_PASSES:
        rows.extend(range(start, height, step))
    return np.asarray(rows, dtype=np.int64)


def _lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> np.ndarray:
    """Variable-width LZW (GIF flavor): codes grow 3..12 bits, CLEAR
    resets the table, EOI ends the stream. Returns index array."""
    if not 2 <= min_code_size <= 11:
        # spec bound (codes cap at 12 bits); a corrupt byte here would
        # otherwise size the root table as 2^255
        raise ValueError(f"invalid GIF LZW minimum code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    # bit reader over the whole sub-block-joined byte stream (LSB first)
    bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8), bitorder="little")
    pos = 0
    width = min_code_size + 1

    # table as (prefix_code, tail_byte) arrays; entries < clear are roots
    prefix = np.full(4096, -1, dtype=np.int32)
    tail = np.zeros(4096, dtype=np.uint8)
    for i in range(clear):
        tail[i] = i
    next_code = eoi + 1

    out = np.empty(n_pixels, dtype=np.uint8)
    n_out = 0
    prev = -1
    buf = np.empty(4096, dtype=np.uint8)  # expansion scratch (max string len)

    def expand(code: int) -> np.ndarray:
        n = 0
        c = code
        while c >= 0:
            buf[n] = tail[c]
            n += 1
            c = prefix[c] if c >= clear else -1
        return buf[:n][::-1]

    while n_out < n_pixels:
        if pos + width > len(bits):
            break  # truncated stream: return what we have
        code = int(bits[pos : pos + width] @ (1 << np.arange(width, dtype=np.int64)))
        pos += width
        if code == clear:
            next_code = eoi + 1
            width = min_code_size + 1
            prev = -1
            continue
        if code == eoi:
            break
        if prev < 0:
            s = expand(code)
        elif code < next_code:
            s = expand(code)
            if next_code < 4096:
                prefix[next_code] = prev
                tail[next_code] = s[0]
                next_code += 1
        elif code == next_code and next_code < 4096:
            ps = expand(prev)
            prefix[next_code] = prev
            tail[next_code] = ps[0]
            next_code += 1
            s = expand(code)
        else:
            raise ValueError("corrupt GIF LZW stream")
        take = min(len(s), n_pixels - n_out)
        out[n_out : n_out + take] = s[:take]
        n_out += take
        prev = code
        if next_code == (1 << width) and width < 12:
            width += 1
    return out[:n_out]


def _lzw_encode(min_code_size: int, indices: np.ndarray) -> bytes:
    """Root-codes-only LZW: every pixel emitted as its literal code while
    tracking the table size the DECODER builds (one entry per code after
    the first), bumping the code width in lockstep and emitting CLEAR
    before the table would saturate. Valid for any conforming decoder."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out_bits: list[int] = []
    width = min_code_size + 1

    def emit(code: int, w: int) -> None:
        for i in range(w):
            out_bits.append((code >> i) & 1)

    emit(clear, width)
    next_code = eoi + 1
    first = True
    for v in indices:
        emit(int(v), width)
        if first:
            first = False
        else:
            next_code += 1
            if next_code == (1 << width):
                if width < 12:
                    width += 1
                else:
                    emit(clear, width)
                    width = min_code_size + 1
                    next_code = eoi + 1
                    first = True
    emit(eoi, width)
    arr = np.array(out_bits, dtype=np.uint8)
    return np.packbits(arr, bitorder="little").tobytes()


def _sub_blocks(data: bytes) -> bytes:
    """Wrap raw bytes in ≤255-byte GIF sub-blocks + terminator."""
    out = bytearray()
    for off in range(0, len(data), 255):
        chunk = data[off : off + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def _read_sub_blocks(payload: bytes, off: int) -> tuple[bytes, int]:
    out = bytearray()
    while True:
        n = payload[off]
        off += 1
        if n == 0:
            return bytes(out), off
        out += payload[off : off + n]
        off += n


def decode_gif(payload: bytes) -> list[np.ndarray]:
    """Animated GIF → list of composited (H, W, 3) uint8 RGB frames.

    Handles global/local color tables, interlacing, transparency and
    disposal methods 0/1 (leave) and 2 (restore to background)."""
    if payload[:6] not in (b"GIF89a", b"GIF87a"):
        raise ValueError("not a GIF payload")
    width, height, flags, bg_idx, _ = struct.unpack_from("<HHBBB", payload, 6)
    off = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(payload, dtype=np.uint8, count=3 * n, offset=off).reshape(n, 3)
        off += 3 * n

    canvas = np.zeros((height, width, 3), dtype=np.uint8)
    if gct is not None:
        canvas[:, :] = gct[bg_idx % len(gct)]
    frames: list[np.ndarray] = []
    transparent = -1
    disposal = 0

    while off < len(payload):
        b = payload[off]
        off += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            label = payload[off]
            off += 1
            data, off = _read_sub_blocks(payload, off)
            if label == 0xF9 and len(data) >= 4:  # graphic control
                gflags = data[0]
                disposal = (gflags >> 2) & 0x07
                transparent = data[3] if (gflags & 0x01) else -1
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
        # image descriptor
        ix, iy, iw, ih, iflags = struct.unpack_from("<HHHHB", payload, off)
        off += 9
        table = gct
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            table = np.frombuffer(
                payload, dtype=np.uint8, count=3 * n, offset=off
            ).reshape(n, 3)
            off += 3 * n
        if table is None:
            raise ValueError("GIF frame without any color table")
        min_code = payload[off]
        off += 1
        data, off = _read_sub_blocks(payload, off)
        idx = _lzw_decode(min_code, data, iw * ih)
        if len(idx) < iw * ih:  # truncated: pad with background
            idx = np.concatenate([idx, np.zeros(iw * ih - len(idx), dtype=np.uint8)])
        idx = idx.reshape(ih, iw)
        if iflags & 0x40:
            idx = idx[np.argsort(_deinterlace_order(ih))]
        before = canvas.copy() if disposal == 2 else None
        region = canvas[iy : iy + ih, ix : ix + iw]
        rgb = table[np.minimum(idx, len(table) - 1)]
        if transparent >= 0:
            opaque = idx != transparent
            region[opaque] = rgb[opaque]
        else:
            region[:, :] = rgb
        frames.append(canvas.copy())
        if disposal == 2:
            canvas = before
            canvas[iy : iy + ih, ix : ix + iw] = (
                gct[bg_idx % len(gct)] if gct is not None else 0
            )
        disposal = 0
        transparent = -1
    return frames


def encode_gif(frames: list[np.ndarray], delay_cs: int = 4) -> bytes:
    """Frames (each (H, W, 3) uint8, ≤256 distinct colors across ALL
    frames) → animated GIF89a. Raises ValueError beyond 256 colors —
    quantization is out of scope for the synthetic-data path."""
    if not frames:
        raise ValueError("no frames")
    h, w = frames[0].shape[:2]
    flat = np.concatenate([f.reshape(-1, 3) for f in frames])
    palette, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError(f"{len(palette)} colors exceed GIF's 256-color palette")
    bits = max(1, int(np.ceil(np.log2(max(2, len(palette))))))
    table_n = 1 << bits
    pal_bytes = np.zeros((table_n, 3), dtype=np.uint8)
    pal_bytes[: len(palette)] = palette

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
    out += pal_bytes.tobytes()
    # netscape loop extension (loop forever) — standard for animation
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    min_code = max(2, bits)
    per_frame = h * w
    for i, frame in enumerate(frames):
        if frame.shape[:2] != (h, w):
            raise ValueError("all frames must share one size")
        out += b"\x21\xf9\x04" + bytes([0x00]) + struct.pack("<H", delay_cs) + b"\x00\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        out += bytes([min_code])
        idx = inverse[i * per_frame : (i + 1) * per_frame].astype(np.uint8)
        out += _sub_blocks(_lzw_encode(min_code, idx))
    out += b"\x3b"
    return bytes(out)
