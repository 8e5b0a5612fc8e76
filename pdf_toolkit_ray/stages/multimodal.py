"""Multimodal columns: image/audio/video as opaque ``binary`` columns with
typed metadata, processed by actor-pool ``map_batches`` stages.

The Ray-side plumbing (schema, batch sizing, actor signature, output
layout) is real and tested. Decoders:

* **PPM (P6) images** — decoded for real (pure byte parsing + numpy);
  nearest-neighbor resize implemented on the pixel array;
* **PNG images** — decoded for real from scratch (stdlib ``zlib`` +
  chunk walk + all five scanline filters; 8-bit gray/RGB/RGBA,
  non-interlaced) with a matching minimal encoder;
* **JPEG images** — decoded for real from scratch (baseline sequential:
  Huffman entropy decode, dequantize, IDCT, chroma upsample, YCbCr→RGB —
  ``functions/jpegx.py``, with a 4:4:4 encoder twin); progressive JPEG
  raises ``NotImplementedError``;
* **WAV (PCM) audio** — decoded for real (stdlib ``wave`` + numpy);
* **animated GIF "video"** — decoded for real from scratch
  (``functions/gifx.py``: variable-width LZW, interlacing, local
  palettes, transparency, disposal compositing) with an encoder twin;
  frame sampling runs on it as a true container;
* **MP4 (ISO BMFF)** — the CONTAINER demux is real and from scratch
  (``functions/mp4x.py``: box tree, stsd/stts/stss/stsc/stsz/stco/co64
  expanded to per-sample offset/size/dts/keyframe records), with an
  encoder twin for goldens; samples coded with the private ``ppmf``
  fourcc decode for real, while AVC/HEVC/AAC *bitstream* decode — the
  true codec boundary — raises ``NotImplementedError``;
* **MP3 codec payloads** — STUBBED: lossy audio decode needs
  ffmpeg-class decoders; :func:`decode_audio` raises
  ``NotImplementedError`` for them. The deterministic fake generator
  below produces PPM/PNG/JPEG/WAV so the pipelines exercise the full
  decode path end-to-end.

Large binary payloads → small ``batch_size`` (default 32) so
batch × concurrency stays within worker heaps; blocks of binaries are
never converted to pandas (Arrow binary stays zero-copy).
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave

import numpy as np
import pyarrow as pa

import ray.data

IMAGE_META_TYPE = pa.struct(
    [("width", pa.int32()), ("height", pa.int32()), ("format", pa.string())]
)
AUDIO_META_TYPE = pa.struct(
    [("sample_rate", pa.int32()), ("n_channels", pa.int32()), ("format", pa.string())]
)


# --------------------------------------------------------------------------
# decoders


def decode_image(payload: bytes) -> np.ndarray:
    """bytes → (H, W, 3) uint8. All three containers decode for real with
    no image libraries: PPM P6 (byte parsing), PNG (stdlib zlib + the five
    scanline filters), and JPEG — baseline SOF0 and progressive SOF2
    (from-scratch Huffman + spectral-selection/successive-approximation
    scans + IDCT + YCbCr pipeline in ``functions/jpegx.py``).
    Arithmetic-coded JPEG raises ``NotImplementedError``."""
    if payload[:2] in (b"P6", b"P5"):
        return _decode_ppm(payload)
    if payload.startswith(b"\x89PNG"):
        return decode_png(payload)
    if payload.startswith(b"\xff\xd8"):
        from ..functions.jpegx import decode_jpeg

        return decode_jpeg(payload)
    if payload.startswith(b"GIF8"):
        from ..functions.gifx import decode_gif

        return decode_gif(payload)[0]
    if payload.startswith(b"BM"):
        from ..functions.tiffx import decode_bmp

        return decode_bmp(payload)
    if payload[:4] in (b"II*\x00", b"MM\x00*"):
        from ..functions.tiffx import decode_tiff

        return decode_tiff(payload)
    raise NotImplementedError(f"unsupported image container: {payload[:4]!r}")


_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}  # gray, RGB, RGBA (8-bit only)


#: Adam7 pass grid: (x0, y0, dx, dy) per PNG spec §8.2
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _png_unfilter(raw: bytes, off: int, stride: int, height: int, bpp: int):
    """Unfilter ``height`` scanlines of ``stride`` bytes starting at
    ``off`` (left-neighbor distance ``bpp`` bytes). Returns the
    (height, stride) reconstructed array and the new offset."""
    if len(raw) - off < height * (stride + 1):
        raise ValueError("PNG scanline data length mismatch")
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        row_off = off + y * (stride + 1)
        ftype = raw[row_off]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=row_off + 1)
        if ftype == 0:  # None
            recon = line.copy()
        elif ftype == 2:  # Up
            recon = line + prev
        elif ftype == 1:  # Sub: prefix sum along pixels (mod 256 via uint8 wrap)
            if stride % bpp == 0:
                recon = line.copy().reshape(stride // bpp, bpp)
                np.cumsum(recon, axis=0, dtype=np.uint8, out=recon)
                recon = recon.reshape(stride)
            else:  # packed sub-byte rows: sequential
                recon = np.empty(stride, dtype=np.uint8)
                for x in range(stride):
                    a = int(recon[x - bpp]) if x >= bpp else 0
                    recon[x] = (int(line[x]) + a) & 0xFF
        else:  # Average (3) / Paeth (4): sequential left-dependence
            recon = np.empty(stride, dtype=np.uint8)
            for x in range(stride):
                a = int(recon[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                if ftype == 3:
                    recon[x] = (int(line[x]) + ((a + b) >> 1)) & 0xFF
                elif ftype == 4:
                    c = int(prev[x - bpp]) if x >= bpp else 0
                    p = a + b - c
                    pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa_ <= pb and pa_ <= pc_) else (b if pb <= pc_ else c)
                    recon[x] = (int(line[x]) + pred) & 0xFF
                else:
                    raise ValueError(f"bad PNG filter type {ftype}")
        out[y] = recon
        prev = recon
    return out, off + height * (stride + 1)


def _png_unpack_rows(rows: np.ndarray, width: int, depth: int, ch: int) -> np.ndarray:
    """(H, stride_bytes) filtered-row bytes → (H, width*ch) samples,
    expanding sub-byte depths (MSB-first packing) to one byte each."""
    if depth == 8:
        return rows[:, : width * ch]
    bits = np.unpackbits(rows, axis=1)
    n = width * ch  # sub-byte depths only occur with ch == 1 (palette/gray)
    vals = np.zeros((rows.shape[0], n), dtype=np.uint8)
    for b in range(depth):
        vals = (vals << 1) | bits[:, b : n * depth : depth][:, :n]
    return vals


def decode_png(payload: bytes) -> np.ndarray:
    """From-scratch PNG decoder (RFC 2083): chunk walk → zlib inflate →
    per-row unfilter (None/Sub/Up/Average/Paeth) → (H, W, 3) uint8.
    Supports color types 0/2/6 at depth 8 and palette (type 3) at
    depths 1/2/4/8, both sequential and Adam7-interlaced rasters."""
    import zlib

    if not payload.startswith(b"\x89PNG\r\n\x1a\n"):
        raise ValueError("not a PNG stream")
    off = 8
    width = height = None
    color_type = depth = interlace = None
    plte = None
    idat = bytearray()
    while off + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, off)
        ctype = payload[off + 4 : off + 8]
        data = payload[off + 8 : off + 8 + length]
        off += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            width, height, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if color_type == 3:
                if depth not in (1, 2, 4, 8):
                    raise NotImplementedError(f"palette PNG depth {depth} unsupported")
            elif color_type in _PNG_CHANNELS:
                if depth != 8:
                    raise NotImplementedError("only 8-bit PNG supported here")
            else:
                raise NotImplementedError(f"PNG color type {color_type} unsupported")
            if interlace not in (0, 1):
                raise ValueError(f"bad PNG interlace method {interlace}")
        elif ctype == b"PLTE":
            if length % 3:
                raise ValueError("PLTE length not a multiple of 3")
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    if color_type == 3 and plte is None:
        raise ValueError("palette PNG missing PLTE")
    ch = 1 if color_type == 3 else _PNG_CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    bpp = max(1, (depth * ch) // 8)

    def stride_for(w: int) -> int:
        return (w * depth * ch + 7) // 8

    if interlace == 0:
        stride = stride_for(width)
        rows, consumed = _png_unfilter(raw, 0, stride, height, bpp)
        if consumed != len(raw):
            raise ValueError("PNG scanline data length mismatch")
        samples = _png_unpack_rows(rows, width, depth, ch)
    else:  # Adam7
        samples = np.zeros((height, width * ch), dtype=np.uint8)
        pos = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (width - x0 + dx - 1) // dx
            ph = (height - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            rows, pos = _png_unfilter(raw, pos, stride_for(pw), ph, bpp)
            sub = _png_unpack_rows(rows, pw, depth, ch).reshape(ph, pw, ch)
            view = samples.reshape(height, width, ch)
            view[y0::dy, x0::dx] = sub
        if pos != len(raw):
            raise ValueError("PNG scanline data length mismatch")

    if color_type == 3:
        idx = samples.reshape(height, width)
        if int(idx.max(initial=0)) >= len(plte):
            raise ValueError("palette index out of range")
        return np.ascontiguousarray(plte[idx])
    img = samples.reshape(height, width, ch)
    if ch == 1:
        return np.repeat(img, 3, axis=2)
    if ch == 4:
        return np.ascontiguousarray(img[..., :3])
    return img


def encode_png(img: np.ndarray) -> bytes:
    """Minimal PNG writer (filter 0 rows, one zlib IDAT) — test twin of
    :func:`decode_png`."""
    import zlib

    h, w, _ = img.shape
    body = img.astype(np.uint8)
    raw = b"".join(b"\x00" + body[y].tobytes() for y in range(h))

    def chunk(ctype: bytes, data: bytes) -> bytes:
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import zlib

    crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
    return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)


def encode_png_interlaced(img: np.ndarray) -> bytes:
    """Adam7-interlaced RGB PNG writer (filter 0 rows per pass) — test
    twin of :func:`decode_png`'s interlaced path."""
    import zlib

    h, w, _ = img.shape
    body = img.astype(np.uint8)
    parts = []
    for x0, y0, dx, dy in _ADAM7:
        sub = body[y0::dy, x0::dx]
        if sub.shape[0] == 0 or sub.shape[1] == 0:
            continue
        parts.extend(b"\x00" + sub[y].tobytes() for y in range(sub.shape[0]))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 1)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"".join(parts)))
        + _png_chunk(b"IEND", b"")
    )


def encode_png_palette(
    idx: np.ndarray, palette: np.ndarray, depth: int = 8, interlace: bool = False
) -> bytes:
    """Palette (color type 3) PNG writer at depth 1/2/4/8, optionally
    Adam7-interlaced (filter 0 rows) — test twin of the palette path."""
    import zlib

    h, w = idx.shape
    idx = idx.astype(np.uint8)

    def pack_rows(sub: np.ndarray) -> bytes:
        ph, pw = sub.shape
        if depth == 8:
            return b"".join(b"\x00" + sub[y].tobytes() for y in range(ph))
        out = []
        for y in range(ph):
            bits = np.zeros(pw * depth, dtype=np.uint8)
            for b in range(depth):
                bits[b::depth] = (sub[y] >> (depth - 1 - b)) & 1
            pad = (-len(bits)) % 8
            if pad:
                bits = np.r_[bits, np.zeros(pad, dtype=np.uint8)]
            out.append(b"\x00" + np.packbits(bits).tobytes())
        return b"".join(out)

    if interlace:
        parts = []
        for x0, y0, dx, dy in _ADAM7:
            sub = idx[y0::dy, x0::dx]
            if sub.shape[0] and sub.shape[1]:
                parts.append(pack_rows(sub))
        raw = b"".join(parts)
    else:
        raw = pack_rows(idx)
    ihdr = struct.pack(">IIBBBBB", w, h, depth, 3, 0, 0, 1 if interlace else 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"PLTE", palette.astype(np.uint8).tobytes())
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )


def _decode_ppm(payload: bytes) -> np.ndarray:
    import re

    # header ends after exactly ONE whitespace char — pixel bytes may
    # themselves be 0x0A/0x20, so naive split() would swallow them
    match = re.match(rb"(P[56])\s+(\d+)\s+(\d+)\s+(\d+)\s", payload)
    if not match:
        raise ValueError("malformed PPM/PGM header")
    kind = match.group(1)
    width, height, maxval = (int(g) for g in match.groups()[1:])
    if maxval != 255:
        raise ValueError("only 8-bit PPM/PGM supported")
    data = payload[match.end() :]
    if kind == b"P5":  # grayscale PGM → replicate to RGB
        need = width * height
        if len(data) < need:
            raise ValueError("pgm: truncated pixel data")
        g = np.frombuffer(data[:need], dtype=np.uint8).reshape(height, width)
        return np.repeat(g[:, :, None], 3, axis=2)
    need = width * height * 3
    if len(data) < need:
        raise ValueError("ppm: truncated pixel data")
    pixels = np.frombuffer(data[:need], dtype=np.uint8)
    return pixels.reshape(height, width, 3)


def encode_ppm(img: np.ndarray) -> bytes:
    h, w, _ = img.shape
    return b"P6 %d %d 255\n" % (w, h) + img.astype(np.uint8).tobytes()


def resize_nearest(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize with pure numpy indexing (no image libs)."""
    h, w, _ = img.shape
    rows = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    cols = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return img[rows[:, None], cols[None, :], :]


def decode_audio(payload: bytes) -> tuple[np.ndarray, int]:
    """bytes → (mono samples float64 in [-1, 1], sample_rate).

    Real for WAV PCM at 8/16/24/32-bit, any channel count (channels are
    interleaved in the frame stream and mixed down to mono, so durations
    and energy stats are per-frame, not per-interleaved-sample)."""
    if payload.startswith(b"RIFF"):
        with wave.open(io.BytesIO(payload)) as wf:
            rate = wf.getframerate()
            nch = wf.getnchannels()
            raw = wf.readframes(wf.getnframes())
            width = wf.getsampwidth()
        if width == 2:
            samples = np.frombuffer(raw, dtype=np.int16).astype(np.float64) / 32768.0
        elif width == 1:
            samples = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
        elif width == 3:
            b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3).astype(np.int32)
            v = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
            v = np.where(v >= 1 << 23, v - (1 << 24), v)  # sign-extend
            samples = v.astype(np.float64) / float(1 << 23)
        elif width == 4:
            samples = np.frombuffer(raw, dtype=np.int32).astype(np.float64) / float(1 << 31)
        else:
            raise NotImplementedError(f"{width*8}-bit PCM unsupported")
        if nch > 1:
            samples = samples.reshape(-1, nch).mean(axis=1)
        return samples, rate
    from ..functions.flacx import decode_flac, is_flac

    if is_flac(payload):
        # REAL lossless decode — the from-scratch FLAC codec
        # (functions/flacx.py): CRC-8/CRC-16 verified per frame, STREAMINFO
        # MD5 re-proved over the reassembled PCM, then mixdown like WAV
        pcm, rate, bps = decode_flac(payload)
        samples = pcm.astype(np.float64) / float(1 << (bps - 1))
        if samples.shape[1] > 1:
            return samples.mean(axis=1), rate
        return samples[:, 0], rate
    from ..functions.mp3x import is_mp3, parse_mp3

    if is_mp3(payload):
        # the FRAMING layer is real (functions/mp3x.py): report what the
        # stream actually is; only the PCM bitstream decode is the stub
        info = parse_mp3(payload)
        raise NotImplementedError(
            f"MP3 framing parsed ({info.n_frames} frames, "
            f"{info.sample_rate} Hz, {info.duration_sec:.3f}s, "
            f"{'VBR' if info.is_vbr else 'CBR'}) but Layer-III PCM decode "
            "requires codec libs not present here — use probe_audio"
        )
    raise NotImplementedError(
        "non-WAV audio (ogg/flac/...) requires codec libs not present here"
    )


def probe_audio(payload: bytes) -> dict:
    """Container/framing-level metadata WITHOUT PCM decode — real for
    both WAV (header fields) and MP3 (full frame walk incl. ID3 skip,
    Xing/Info VBR header, resync accounting — functions/mp3x.py)."""
    if payload.startswith(b"RIFF"):
        with wave.open(io.BytesIO(payload)) as wf:
            return {
                "container": "wav",
                "sample_rate": wf.getframerate(),
                "n_channels": wf.getnchannels(),
                "n_frames": wf.getnframes(),
                "duration_ms": int(round(wf.getnframes() / wf.getframerate() * 1000)),
                "bitrate_kbps": int(
                    wf.getframerate() * wf.getnchannels() * wf.getsampwidth() * 8 // 1000
                ),
                "is_vbr": False,
                "id3v2_bytes": 0,
                "has_xing": False,
            }
    from ..functions.flacx import is_flac, probe_flac

    if is_flac(payload):
        p = probe_flac(payload)
        # frame count from STREAMINFO block size (exact for fixed-block
        # streams, which is all the encoder twin emits — FLAC frames have
        # no length field, so a byte-walk count would require full decode)
        bs = p["block_size"] or 1
        return {
            "container": "flac",
            "sample_rate": p["sample_rate"],
            "n_channels": p["n_channels"],
            "n_frames": -(-p["total_samples"] // bs),
            "duration_ms": p["duration_ms"],
            "bitrate_kbps": p["bitrate_kbps"],
            "is_vbr": False,
            "id3v2_bytes": 0,
            "has_xing": False,
        }
    from ..functions.mp3x import is_mp3, parse_mp3

    if is_mp3(payload):
        info = parse_mp3(payload)
        return {
            "container": "mp3",
            "sample_rate": info.sample_rate,
            "n_channels": 1 if info.frames and info.frames[0].channel_mode == 3 else 2,
            "n_frames": info.n_frames,
            "duration_ms": int(round(info.duration_sec * 1000)),
            "bitrate_kbps": int(round(info.avg_bitrate_kbps)),
            "is_vbr": info.is_vbr,
            "id3v2_bytes": info.id3v2_bytes,
            "has_xing": info.xing is not None,
        }
    raise ValueError(f"unrecognized audio container: {payload[:4]!r}")


def sample_video_frames(payload: bytes, every_n: int = 10) -> list[bytes]:
    """Video frame sampling over two REAL paths and one stub:

    * **animated GIF** — decoded for real by the from-scratch GIF89a
      codec (``functions/gifx.py``: LZW, interlace, transparency,
      disposal compositing); every ``every_n``-th composited frame is
      returned re-encoded as PPM bytes;
    * **MP4 (ISO BMFF)** — the container demux is real
      (``functions/mp4x.py``): samples are sliced from ``mdat`` by the
      expanded stsc/stsz/stco tables; ``ppmf``-coded samples (the
      encoder twin's image-frame track) return as decodable PPM/PNG
      bytes, while AVC/HEVC-coded samples demux fine but their
      *bitstream* decode raises NotImplementedError — the honest codec
      boundary;
    * the deterministic fake 'video' (length-prefixed PPM frames) keeps
      exercising the split → per-frame-decode plumbing.
    """
    if payload.startswith(b"GIF8"):
        from ..functions.gifx import decode_gif

        return [encode_ppm(f) for f in decode_gif(payload)[::every_n]]
    from ..functions.mp4x import extract_samples, is_mp4, parse_mp4

    if is_mp4(payload):
        info = parse_mp4(payload)
        track = info.track("vide")
        if track is None:
            raise ValueError("MP4 has no video track")
        if track.fourcc not in ("ppmf",):
            raise NotImplementedError(
                f"MP4 demux OK ({track.n_samples} samples, fourcc "
                f"{track.fourcc!r}) but bitstream decode of that codec "
                "requires ffmpeg-class libraries"
            )
        return extract_samples(
            payload, track, list(range(0, track.n_samples, every_n))
        )
    if not payload.startswith(b"FAKEVID1"):
        raise NotImplementedError("unrecognized video container")
    frames, off = [], 8
    while off + 4 <= len(payload):
        (ln,) = struct.unpack_from(">I", payload, off)
        off += 4
        frames.append(payload[off : off + ln])
        off += ln
    return frames[::every_n]


# --------------------------------------------------------------------------
# deterministic fake media table


def synthesize_media_table(n: int = 64, seed: int = 42) -> pa.Table:
    """Deterministic media rows: PPM images and WAV clips with typed metadata."""
    ids, kinds, payloads, img_meta, aud_meta = [], [], [], [], []
    for i in range(n):
        rng = np.random.RandomState(seed * 100_003 + i)
        ids.append(i)
        if i % 2 == 0:
            w, h = int(rng.randint(16, 64)), int(rng.randint(16, 64))
            img = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
            fmt = {0: "png", 2: "jpeg", 4: "png", 6: "ppm"}[i % 8]
            if fmt == "png":
                payloads.append(encode_png(img))
            elif fmt == "jpeg":
                from ..functions.jpegx import encode_jpeg

                payloads.append(encode_jpeg(img, quality=90))
            else:
                payloads.append(encode_ppm(img))
            kinds.append("image")
            img_meta.append({"width": w, "height": h, "format": fmt})
            aud_meta.append(None)
        else:
            rate = 8000
            t = np.arange(rate // 4) / rate
            freq = float(rng.randint(100, 2000))
            samples = (np.sin(2 * np.pi * freq * t) * 20000).astype(np.int16)
            buf = io.BytesIO()
            with wave.open(buf, "wb") as wf:
                wf.setnchannels(1)
                wf.setsampwidth(2)
                wf.setframerate(rate)
                wf.writeframes(samples.tobytes())
            payloads.append(buf.getvalue())
            kinds.append("audio")
            img_meta.append(None)
            aud_meta.append({"sample_rate": rate, "n_channels": 1, "format": "wav"})
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array(kinds),
            "payload": pa.array(payloads, pa.binary()),
            "image_meta": pa.array(img_meta, IMAGE_META_TYPE),
            "audio_meta": pa.array(aud_meta, AUDIO_META_TYPE),
        }
    )


def synthesize_video_table(n: int = 16, seed: int = 42) -> pa.Table:
    """Deterministic animated-GIF rows (real container, real codec):
    each video is 6–12 frames drawn from a ≤32-color palette."""
    from ..functions.gifx import encode_gif

    ids, payloads, metas = [], [], []
    for i in range(n):
        rng = np.random.RandomState(seed * 99_991 + i)
        w, h = int(rng.randint(8, 24)), int(rng.randint(8, 24))
        palette = rng.randint(0, 256, size=(32, 3)).astype(np.uint8)
        n_frames = int(rng.randint(6, 13))
        frames = [
            palette[rng.randint(0, 32, size=(h, w))] for _ in range(n_frames)
        ]
        ids.append(i)
        payloads.append(encode_gif(frames))
        metas.append({"width": w, "height": h, "format": "gif"})
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array(["video"] * n),
            "payload": pa.array(payloads, pa.binary()),
            "image_meta": pa.array(metas, IMAGE_META_TYPE),
        }
    )


def synthesize_mp4_table(n: int = 12, seed: int = 43) -> pa.Table:
    """Deterministic MP4 rows (real ISO BMFF container, encoder twin):
    each clip is 5–10 PPM-coded frames muxed with multi-sample chunks,
    keyframes every 3rd sample and a per-clip frame rate — so demux
    exercises stsc expansion, stss and stts for real."""
    from ..functions.mp4x import encode_mp4

    ids, payloads, metas = [], [], []
    for i in range(n):
        rng = np.random.RandomState(seed * 99_991 + i)
        w, h = int(rng.randint(8, 24)), int(rng.randint(8, 24))
        n_frames = int(rng.randint(5, 11))
        frames = [
            encode_ppm(rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8))
            for _ in range(n_frames)
        ]
        fps = int(rng.choice([5, 10, 15]))
        ids.append(i)
        payloads.append(
            encode_mp4(
                frames,
                timescale=fps * 100,
                sample_duration=100,
                keyframes=list(range(0, n_frames, 3)),
                fourcc=b"ppmf",
                width=w,
                height=h,
                chunk_size=3,
            )
        )
        metas.append({"width": w, "height": h, "format": "mp4"})
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array(["video"] * n),
            "payload": pa.array(payloads, pa.binary()),
            "image_meta": pa.array(metas, IMAGE_META_TYPE),
        }
    )


def synthesize_mp3_table(n: int = 12, seed: int = 44) -> pa.Table:
    """Deterministic MP3 rows (real framing via the builder twin):
    a mix of CBR/VBR streams across MPEG versions/layers/sample rates,
    some with Xing headers and ID3v2/ID3v1 wrappers — so the probe
    stage exercises every framing path."""
    from ..functions.mp3x import build_mp3

    rows = []
    for i in range(n):
        rng = np.random.RandomState(seed * 99_991 + i)
        n_frames = int(rng.randint(10, 40))
        kind = i % 4
        if kind == 0:  # plain MPEG-1 L3 CBR
            kbps = int(rng.choice([96, 128, 160, 192]))
            payload = build_mp3(
                n_frames, bitrate_kbps=kbps, sample_rate=44100, seed=i
            )
        elif kind == 1:  # VBR with Xing + ID3 wrappers
            choices = [64, 96, 128, 160, 192]
            rates = [int(rng.choice(choices)) for _ in range(n_frames)]
            payload = build_mp3(
                n_frames,
                bitrate_kbps=rates,
                sample_rate=32000,
                xing=True,
                id3v2_payload=bytes(int(rng.randint(16, 128))),
                id3v1=True,
                channel_mode=1,
                seed=i,
            )
        elif kind == 2:  # MPEG-2 (576-sample frames), low rate
            payload = build_mp3(
                n_frames,
                bitrate_kbps=int(rng.choice([24, 48, 64])),
                sample_rate=22050,
                version="2",
                seed=i,
            )
        else:  # Layer II stereo
            payload = build_mp3(
                n_frames,
                bitrate_kbps=int(rng.choice([128, 192, 256])),
                sample_rate=48000,
                layer=2,
                channel_mode=0,
                seed=i,
            )
        rows.append((i, payload))
    return pa.table(
        {
            "media_id": pa.array([r[0] for r in rows], pa.int64()),
            "kind": pa.array(["audio"] * n),
            "payload": pa.array([r[1] for r in rows], pa.binary()),
        }
    )


def synthesize_flac_table(n: int = 12, seed: int = 45) -> pa.Table:
    """Deterministic FLAC rows (real lossless codec via the encoder twin):
    a mix of mono/stereo, 8/16/24-bit, all four stereo decorrelation
    modes, fixed and LPC predictors, Rice partition orders, header-escape
    block sizes (1000) and sample rates (11025), so the probe AND the
    bit-exact PCM decode exercise every decoder path."""
    from ..functions.flacx import encode_flac

    rows = []
    for i in range(n):
        rng = np.random.RandomState(seed * 99_991 + i)
        n_samp = int(rng.randint(3000, 9000))
        t = np.arange(n_samp)
        kind = i % 4
        if kind == 0:  # mono 16-bit sine+noise, fixed predictors
            sig = (
                9000 * np.sin(t / float(rng.randint(20, 60)))
                + rng.randint(-300, 300, n_samp)
            ).astype(np.int32)
            payload = encode_flac(sig, 44100, bps=16, block_size=4096)
        elif kind == 1:  # stereo, rotating decorrelation mode, LPC
            l = (7000 * np.sin(t / float(rng.randint(15, 40)))).astype(np.int32)
            r = (l // 2 + rng.randint(-200, 200, n_samp)).astype(np.int32)
            mode = ("mid_side", "left_side", "right_side")[(i // 4) % 3]
            payload = encode_flac(
                np.stack([l, r], axis=1), 48000, bps=16,
                block_size=1024, stereo_mode=mode,
                subframe_mode="lpc", lpc_order=6, partition_order=2,
            )
        elif kind == 2:  # 8-bit mono, escape blocksize + escape samplerate
            sig = (60 * np.sin(t / 10.0) + rng.randint(-8, 8, n_samp)).astype(
                np.int32
            )
            payload = encode_flac(
                sig, 11025, bps=8, block_size=1000, partition_order=0
            )
        else:  # 24-bit mono with wasted bits (low bits zero)
            sig = (
                (400_000 * np.sin(t / 35.0)).astype(np.int64) & ~np.int64(0x3F)
            ).astype(np.int32)
            payload = encode_flac(sig, 96000, bps=24, block_size=2048)
        rows.append((i, payload))
    return pa.table(
        {
            "media_id": pa.array([r[0] for r in rows], pa.int64()),
            "kind": pa.array(["audio"] * n),
            "payload": pa.array([r[1] for r in rows], pa.binary()),
        }
    )


def synthesize_tiff_bmp_table(n: int = 12, seed: int = 46) -> pa.Table:
    """Deterministic scanned-doc-style rows: BMP (24-bit) and baseline
    TIFF (both byte orders, multi-strip, RGB + grayscale) via the encoder
    twins in functions/tiffx.py."""
    from ..functions.tiffx import encode_bmp, encode_tiff

    rows = []
    for i in range(n):
        rng = np.random.RandomState(seed * 99_991 + i)
        w, h = int(rng.randint(12, 48)), int(rng.randint(12, 48))
        kind = i % 4
        if kind == 0:
            payload = encode_bmp(rng.randint(0, 256, (h, w, 3), np.uint8))
        elif kind == 1:
            payload = encode_tiff(
                rng.randint(0, 256, (h, w, 3), np.uint8),
                byte_order="II", rows_per_strip=int(rng.randint(3, 9)),
            )
        elif kind == 2:
            payload = encode_tiff(
                rng.randint(0, 256, (h, w, 3), np.uint8), byte_order="MM"
            )
        else:  # grayscale scan
            payload = encode_tiff(
                rng.randint(0, 256, (h, w), np.uint8),
                byte_order="II", rows_per_strip=int(rng.randint(4, 12)),
            )
        rows.append((i, payload))
    return pa.table(
        {
            "media_id": pa.array([r[0] for r in rows], pa.int64()),
            "kind": pa.array(["image"] * n),
            "payload": pa.array([r[1] for r in rows], pa.binary()),
        }
    )


def synthesize_png_conformance_table(n: int = 12, seed: int = 47) -> pa.Table:
    """Deterministic PNG-conformance rows: Adam7-interlaced RGB and
    palette (depths 1/2/4/8, sequential and interlaced) via the encoder
    twins — pins the decoder's interlace scatter and bit-unpack paths."""
    rows = []
    for i in range(n):
        rng = np.random.RandomState(seed * 99_991 + i)
        w, h = int(rng.randint(9, 40)), int(rng.randint(9, 40))
        kind = i % 3
        if kind == 0:
            payload = encode_png_interlaced(rng.randint(0, 256, (h, w, 3), np.uint8))
        else:
            depth = (1, 2, 4, 8)[i % 4]
            ncol = 2 ** depth
            pal = rng.randint(0, 256, (ncol, 3)).astype(np.uint8)
            idx = rng.randint(0, ncol, (h, w)).astype(np.uint8)
            payload = encode_png_palette(idx, pal, depth, interlace=(kind == 2))
        rows.append((i, payload))
    return pa.table(
        {
            "media_id": pa.array([r[0] for r in rows], pa.int64()),
            "kind": pa.array(["image"] * n),
            "payload": pa.array([r[1] for r in rows], pa.binary()),
        }
    )


# --------------------------------------------------------------------------
# actor-pool stages


class ImageFeatures:
    """Actor stage: decode → per-channel means + thumbnail digest."""

    def __init__(self, thumb: int = 8):
        self.thumb = thumb

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, widths, heights, means, digests = [], [], [], [], []
        for mid, kind, payload in zip(
            batch.column("media_id").to_pylist(),
            batch.column("kind").to_pylist(),
            batch.column("payload").to_pylist(),
        ):
            if kind != "image":
                continue
            img = decode_image(payload)
            small = resize_nearest(img, self.thumb, self.thumb)
            ids.append(mid)
            heights.append(img.shape[0])
            widths.append(img.shape[1])
            means.append([float(img[..., c].mean()) for c in range(3)])
            digests.append(hashlib.blake2b(small.tobytes(), digest_size=8).hexdigest())
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "width": pa.array(widths, pa.int32()),
                "height": pa.array(heights, pa.int32()),
                # three scalar columns, not a list: per-row VALUES SQL
                # twins pin every row, and scalar doubles hash cleanly
                "mean_r": pa.array([m[0] for m in means], pa.float64()),
                "mean_g": pa.array([m[1] for m in means], pa.float64()),
                "mean_b": pa.array([m[2] for m in means], pa.float64()),
                "thumb_digest": pa.array(digests),
            }
        )


class AudioFeatures:
    """Actor stage: decode → duration / rms / peak."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, durs, rms, peak = [], [], [], []
        for mid, kind, payload in zip(
            batch.column("media_id").to_pylist(),
            batch.column("kind").to_pylist(),
            batch.column("payload").to_pylist(),
        ):
            if kind != "audio":
                continue
            samples, rate = decode_audio(payload)
            ids.append(mid)
            durs.append(round(len(samples) / rate, 6))
            rms.append(round(float(np.sqrt(np.mean(samples**2))), 6))
            peak.append(round(float(np.abs(samples).max()), 6))
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "duration_sec": pa.array(durs, pa.float64()),
                "rms": pa.array(rms, pa.float64()),
                "peak": pa.array(peak, pa.float64()),
            }
        )


class AudioSpectral:
    """Actor stage: decode → spectral features (real DSP, vectorized):

    * ``zcr`` — zero-crossing rate (fraction of adjacent sample pairs
      with a sign change);
    * ``centroid_hz`` — spectral centroid over the rFFT magnitude
      spectrum (the "center of mass" frequency);
    * ``rolloff_hz`` — 85th-percentile spectral rolloff (the frequency
      below which 85% of spectral energy sits).

    For a pure sine at f the centroid and rolloff are ≈ f and zcr ≈
    2f/rate — pinned analytically in tests. Works for every REAL audio
    path (WAV PCM, FLAC via the from-scratch codec)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, zcrs, cents, rolls = [], [], [], []
        for mid, kind, payload in zip(
            batch.column("media_id").to_pylist(),
            batch.column("kind").to_pylist(),
            batch.column("payload").to_pylist(),
        ):
            if kind != "audio":
                continue
            samples, rate = decode_audio(payload)
            ids.append(mid)
            if len(samples) < 2 or not np.any(samples):
                zcrs.append(0.0)
                cents.append(0.0)
                rolls.append(0.0)
                continue
            sgn = np.signbit(samples)
            zcr = float(np.mean(sgn[1:] != sgn[:-1]))
            mag = np.abs(np.fft.rfft(samples))
            freqs = np.fft.rfftfreq(len(samples), d=1.0 / rate)
            tot = float(mag.sum())
            centroid = float((freqs * mag).sum() / tot) if tot > 0 else 0.0
            energy = mag * mag
            cum = np.cumsum(energy)
            roll_idx = int(np.searchsorted(cum, 0.85 * cum[-1]))
            roll = float(freqs[min(roll_idx, len(freqs) - 1)])
            zcrs.append(round(zcr, 6))
            cents.append(round(centroid, 3))
            rolls.append(round(roll, 3))
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "zcr": pa.array(zcrs, pa.float64()),
                "centroid_hz": pa.array(cents, pa.float64()),
                "rolloff_hz": pa.array(rolls, pa.float64()),
            }
        )


def audio_spectral(ds: ray.data.Dataset, concurrency=(1, 4)) -> ray.data.Dataset:
    return ds.map_batches(
        AudioSpectral,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=32,
        concurrency=concurrency,
    )


def image_features(ds: ray.data.Dataset, concurrency=(1, 4)) -> ray.data.Dataset:
    return ds.map_batches(
        ImageFeatures,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=32,  # binary payloads: keep batch × concurrency in heap
        concurrency=concurrency,
    )


def audio_features(ds: ray.data.Dataset, concurrency=(1, 4)) -> ray.data.Dataset:
    return ds.map_batches(
        AudioFeatures,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=32,
        concurrency=concurrency,
    )


class VideoFrameFeatures:
    """Actor stage: container decode → frame sampling → per-frame
    features. 1→N fan-out (one row per SAMPLED frame), the canonical
    video-curation shape; the GIF decode path is real (functions/gifx)."""

    def __init__(self, every_n: int = 2):
        self.every_n = every_n

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, fidx, widths, heights, means, digests = [], [], [], [], [], []
        for mid, payload in zip(
            batch.column("media_id").to_pylist(),
            batch.column("payload").to_pylist(),
        ):
            for j, ppm in enumerate(sample_video_frames(payload, self.every_n)):
                img = _decode_ppm(ppm)
                ids.append(mid)
                fidx.append(j * self.every_n)
                heights.append(img.shape[0])
                widths.append(img.shape[1])
                means.append([float(img[..., c].mean()) for c in range(3)])
                digests.append(
                    hashlib.blake2b(img.tobytes(), digest_size=8).hexdigest()
                )
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_idx": pa.array(fidx, pa.int64()),
                "width": pa.array(widths, pa.int32()),
                "height": pa.array(heights, pa.int32()),
                "mean_r": pa.array([m[0] for m in means], pa.float64()),
                "mean_g": pa.array([m[1] for m in means], pa.float64()),
                "mean_b": pa.array([m[2] for m in means], pa.float64()),
                "frame_digest": pa.array(digests),
            }
        )


def video_frame_features(
    ds: ray.data.Dataset, every_n: int = 2, concurrency=(1, 4)
) -> ray.data.Dataset:
    return ds.map_batches(
        VideoFrameFeatures,
        fn_constructor_kwargs={"every_n": every_n},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=8,  # whole videos per row: smaller batches than images
        concurrency=concurrency,
    )


class Mp4FrameFeatures:
    """Actor stage: real ISO BMFF demux (``functions/mp4x.py``) →
    keyframe-aware frame sampling → per-frame features PLUS per-clip
    container metadata (duration, keyframe count, fourcc) so the digest
    twin pins the sample-table expansion, not just pixel decode."""

    def __init__(self, every_n: int = 2):
        self.every_n = every_n

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.mp4x import extract_samples, parse_mp4

        cols: dict[str, list] = {k: [] for k in (
            "media_id", "frame_idx", "is_keyframe", "dts_ms", "width",
            "height", "n_keyframes", "duration_ms", "frame_digest",
        )}
        for mid, payload in zip(
            batch.column("media_id").to_pylist(),
            batch.column("payload").to_pylist(),
        ):
            info = parse_mp4(payload)
            track = info.track("vide")
            picks = list(range(0, track.n_samples, self.every_n))
            n_key = sum(track.sync_flags)
            dur_ms = int(round(track.duration_sec * 1000))
            for j, frame in zip(picks, extract_samples(payload, track, picks)):
                img = _decode_ppm(frame)
                cols["media_id"].append(mid)
                cols["frame_idx"].append(j)
                cols["is_keyframe"].append(bool(track.sync_flags[j]))
                cols["dts_ms"].append(
                    int(round(track.sample_dts[j] * 1000 / track.timescale))
                )
                cols["width"].append(img.shape[1])
                cols["height"].append(img.shape[0])
                cols["n_keyframes"].append(n_key)
                cols["duration_ms"].append(dur_ms)
                cols["frame_digest"].append(
                    hashlib.blake2b(img.tobytes(), digest_size=8).hexdigest()
                )
        return pa.table(
            {
                "media_id": pa.array(cols["media_id"], pa.int64()),
                "frame_idx": pa.array(cols["frame_idx"], pa.int64()),
                "is_keyframe": pa.array(cols["is_keyframe"], pa.bool_()),
                "dts_ms": pa.array(cols["dts_ms"], pa.int64()),
                "width": pa.array(cols["width"], pa.int32()),
                "height": pa.array(cols["height"], pa.int32()),
                "n_keyframes": pa.array(cols["n_keyframes"], pa.int32()),
                "duration_ms": pa.array(cols["duration_ms"], pa.int64()),
                "frame_digest": pa.array(cols["frame_digest"]),
            }
        )


def mp4_frame_features(
    ds: ray.data.Dataset, every_n: int = 2, concurrency=(1, 4)
) -> ray.data.Dataset:
    return ds.map_batches(
        Mp4FrameFeatures,
        fn_constructor_kwargs={"every_n": every_n},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=8,
        concurrency=concurrency,
    )


class AudioProbe:
    """Actor stage: framing-level audio metadata (no PCM decode) — the
    real MP3/WAV container walk in :func:`probe_audio`."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        probes = [
            probe_audio(p) for p in batch.column("payload").to_pylist()
        ]
        out = {"media_id": batch.column("media_id")}
        for name, typ in (
            ("container", pa.string()),
            ("sample_rate", pa.int32()),
            ("n_channels", pa.int32()),
            ("n_frames", pa.int32()),
            ("duration_ms", pa.int64()),
            ("bitrate_kbps", pa.int32()),
            ("is_vbr", pa.bool_()),
            ("id3v2_bytes", pa.int32()),
            ("has_xing", pa.bool_()),
        ):
            out[name] = pa.array([p[name] for p in probes], typ)
        return pa.table(out)


def audio_probe(ds: ray.data.Dataset, concurrency=(1, 4)) -> ray.data.Dataset:
    return ds.map_batches(
        AudioProbe,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=32,
        concurrency=concurrency,
    )
