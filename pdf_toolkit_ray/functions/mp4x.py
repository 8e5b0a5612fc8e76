"""From-scratch ISO BMFF (MP4 / ISO 14496-12) container mux + demux —
pure ``struct`` byte parsing, no media libraries.

Scope: the CONTAINER layer is fully real — box-tree walk (32-bit,
64-bit ``largesize`` and to-EOF sizes), ``moov`` movie header, per-track
``tkhd``/``mdhd``/``hdlr``, and the complete sample-table machinery
(``stsd`` sample descriptions, ``stts`` decode timestamps, ``stss``
sync samples, ``stsc`` sample→chunk runs, ``stsz`` sizes,
``stco``/``co64`` chunk offsets) expanded into per-sample
(offset, size, dts, keyframe) records so frame-sampling can seek
straight into ``mdat``. What is NOT implemented is the codec payload:
AVC/HEVC/AAC bitstream decode genuinely needs ffmpeg-class libraries
absent from this container, so pixel/PCM decode of those fourccs stays
an explicit ``NotImplementedError`` in ``stages/multimodal.py`` — the
demux of their samples still works and is tested.

The encoder twin (``encode_mp4``) writes a minimal but spec-valid
single-track file (ftyp + mdat + moov) and exists so tests and the
synthetic fixtures can create goldens without external media: the
fixture track carries PPM/PNG-coded frames under a private ``ppmf``
fourcc, which the frame-sampling stage decodes for real.

Reference parity note: the reference ships PyMuPDF/Pillow for media
(reference pyproject.toml:10-14); this engine's policy (SURVEY §2
multimodal mandate) is from-scratch public-format containers, honest
stubs only at true codec boundaries.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

_U32_MAX = 0xFFFFFFFF


# --------------------------------------------------------------------------
# box writers


def _box(fourcc: bytes, payload: bytes) -> bytes:
    total = 8 + len(payload)
    if total > _U32_MAX:
        return struct.pack(">I4sQ", 1, fourcc, 16 + len(payload)) + payload
    return struct.pack(">I4s", total, fourcc) + payload


def _full(fourcc: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(fourcc, struct.pack(">B3s", version, flags.to_bytes(3, "big")) + payload)


_MATRIX = struct.pack(">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)


def _rle_durations(durations: list[int]) -> list[tuple[int, int]]:
    runs: list[tuple[int, int]] = []
    for d in durations:
        if runs and runs[-1][1] == d:
            runs[-1] = (runs[-1][0] + 1, d)
        else:
            runs.append((1, d))
    return runs


def encode_mp4(
    samples: list[bytes],
    *,
    timescale: int = 1000,
    sample_duration: int | list[int] = 100,
    keyframes: list[int] | None = None,
    fourcc: bytes = b"ppmf",
    handler: bytes = b"vide",
    width: int = 0,
    height: int = 0,
    sample_rate: int = 8000,
    channels: int = 1,
    chunk_size: int = 3,
    force_co64: bool = False,
) -> bytes:
    """Mux ``samples`` into a single-track MP4.

    ``keyframes``: 0-based sample indices that are sync samples; ``None``
    means every sample is a keyframe (no ``stss`` box, per spec).
    ``chunk_size`` groups samples into multi-sample chunks so the
    ``stsc`` expansion logic is exercised for real.
    """
    if not samples:
        raise ValueError("encode_mp4 requires at least one sample")
    durations = (
        [sample_duration] * len(samples)
        if isinstance(sample_duration, int)
        else list(sample_duration)
    )
    if len(durations) != len(samples):
        raise ValueError("sample_duration list length != n samples")
    duration = sum(durations)

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isommp41")
    mdat_payload = b"".join(samples)
    mdat = _box(b"mdat", mdat_payload)

    # chunk offsets: mdat payload starts after ftyp + mdat header (8 bytes)
    base = len(ftyp) + 8
    chunk_offsets: list[int] = []
    chunk_counts: list[int] = []
    off = base
    for c0 in range(0, len(samples), chunk_size):
        chunk = samples[c0 : c0 + chunk_size]
        chunk_offsets.append(off)
        chunk_counts.append(len(chunk))
        off += sum(len(s) for s in chunk)

    # ---- stbl children
    if handler == b"vide":
        entry = (
            struct.pack(">6xH", 1)
            + bytes(16)
            + struct.pack(">HH", width, height)
            + struct.pack(">II", 0x00480000, 0x00480000)
            + bytes(4)
            + struct.pack(">H", 1)
            + bytes(32)
            + struct.pack(">Hh", 24, -1)
        )
    else:  # soun
        entry = (
            struct.pack(">6xH", 1)
            + bytes(8)
            + struct.pack(">HH", channels, 16)
            + bytes(4)
            + struct.pack(">I", sample_rate << 16)
        )
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + _box(fourcc, entry))

    runs = _rle_durations(durations)
    stts = _full(
        b"stts",
        0,
        0,
        struct.pack(">I", len(runs))
        + b"".join(struct.pack(">II", n, d) for n, d in runs),
    )

    # sample→chunk runs (first_chunk is 1-based)
    stsc_runs: list[tuple[int, int]] = []
    for ci, cnt in enumerate(chunk_counts, start=1):
        if not stsc_runs or stsc_runs[-1][1] != cnt:
            stsc_runs.append((ci, cnt))
    stsc = _full(
        b"stsc",
        0,
        0,
        struct.pack(">I", len(stsc_runs))
        + b"".join(struct.pack(">III", fc, spc, 1) for fc, spc in stsc_runs),
    )

    stsz = _full(
        b"stsz",
        0,
        0,
        struct.pack(">II", 0, len(samples))
        + b"".join(struct.pack(">I", len(s)) for s in samples),
    )

    use_co64 = force_co64 or any(o > _U32_MAX for o in chunk_offsets)
    if use_co64:
        stco = _full(
            b"co64",
            0,
            0,
            struct.pack(">I", len(chunk_offsets))
            + b"".join(struct.pack(">Q", o) for o in chunk_offsets),
        )
    else:
        stco = _full(
            b"stco",
            0,
            0,
            struct.pack(">I", len(chunk_offsets))
            + b"".join(struct.pack(">I", o) for o in chunk_offsets),
        )

    stbl_children = stsd + stts
    if keyframes is not None:
        stbl_children += _full(
            b"stss",
            0,
            0,
            struct.pack(">I", len(keyframes))
            + b"".join(struct.pack(">I", k + 1) for k in sorted(keyframes)),
        )
    stbl_children += stsc + stsz + stco
    stbl = _box(b"stbl", stbl_children)

    if handler == b"vide":
        mhd = _full(b"vmhd", 0, 1, struct.pack(">H3H", 0, 0, 0, 0))
    else:
        mhd = _full(b"smhd", 0, 0, struct.pack(">hH", 0, 0))
    dinf = _box(
        b"dinf",
        _full(b"dref", 0, 0, struct.pack(">I", 1) + _full(b"url ", 0, 1, b"")),
    )
    minf = _box(b"minf", mhd + dinf + stbl)

    mdhd = _full(
        b"mdhd", 0, 0, struct.pack(">IIIIHH", 0, 0, timescale, duration, 0x55C4, 0)
    )
    hdlr = _full(b"hdlr", 0, 0, bytes(4) + handler + bytes(12) + b"pdftk\x00")
    mdia = _box(b"mdia", mdhd + hdlr + minf)

    tkhd = _full(
        b"tkhd",
        0,
        7,
        struct.pack(">IIII", 0, 0, 1, 0)
        + struct.pack(">I", duration)
        + bytes(8)
        + struct.pack(">hhhh", 0, 0, 0x0100 if handler == b"soun" else 0, 0)
        + _MATRIX
        + struct.pack(">II", width << 16, height << 16),
    )
    trak = _box(b"trak", tkhd + mdia)

    mvhd = _full(
        b"mvhd",
        0,
        0,
        struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">IH", 0x00010000, 0x0100)
        + bytes(10)
        + _MATRIX
        + bytes(24)
        + struct.pack(">I", 2),
    )
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


# --------------------------------------------------------------------------
# demux


@dataclass
class Mp4Track:
    track_id: int = 0
    handler: str = ""
    fourcc: str = ""
    width: int = 0
    height: int = 0
    timescale: int = 0
    duration: int = 0
    sample_rate: int = 0
    channels: int = 0
    sample_offsets: list[int] = field(default_factory=list)
    sample_sizes: list[int] = field(default_factory=list)
    sample_dts: list[int] = field(default_factory=list)
    sync_flags: list[bool] = field(default_factory=list)

    @property
    def n_samples(self) -> int:
        return len(self.sample_sizes)

    @property
    def duration_sec(self) -> float:
        return self.duration / self.timescale if self.timescale else 0.0


@dataclass
class Mp4Info:
    timescale: int = 0
    duration: int = 0
    tracks: list[Mp4Track] = field(default_factory=list)

    @property
    def duration_sec(self) -> float:
        return self.duration / self.timescale if self.timescale else 0.0

    def track(self, handler: str) -> Mp4Track | None:
        for t in self.tracks:
            if t.handler == handler:
                return t
        return None


def is_mp4(payload: bytes) -> bool:
    return len(payload) >= 12 and payload[4:8] == b"ftyp"


def _iter_boxes(buf: memoryview, start: int, end: int):
    """Yield (fourcc, body_start, body_end) for each box in [start, end)."""
    off = start
    while off < end:
        if off + 8 > end:
            raise ValueError(f"truncated box header at {off}")
        size, fourcc = struct.unpack_from(">I4s", buf, off)
        body = off + 8
        if size == 1:
            if off + 16 > end:
                raise ValueError("truncated largesize header")
            (size,) = struct.unpack_from(">Q", buf, off + 8)
            body = off + 16
            if size < 16:
                raise ValueError(f"invalid largesize {size}")
            box_end = off + size
        elif size == 0:  # to end of enclosing scope
            box_end = end
        else:
            if size < 8:
                raise ValueError(f"invalid box size {size} at {off}")
            box_end = off + size
        if box_end > end:
            raise ValueError(f"box {fourcc!r} overruns container ({box_end} > {end})")
        yield fourcc, body, box_end
        off = box_end


def _find(buf: memoryview, start: int, end: int, fourcc: bytes):
    for fc, b, e in _iter_boxes(buf, start, end):
        if fc == fourcc:
            return b, e
    return None


def _full_header(buf: memoryview, body: int) -> tuple[int, int]:
    version = buf[body]
    return version, body + 4


def _need(p: int, nbytes: int, box_end: int, fourcc: bytes) -> None:
    if p + nbytes > box_end:
        raise ValueError(
            f"{fourcc.decode('latin-1')} declares more entries than its "
            f"box body holds ({p + nbytes} > {box_end})"
        )


def _parse_stbl(buf: memoryview, start: int, end: int, track: Mp4Track) -> None:
    stts_runs: list[tuple[int, int]] = []
    stsc_runs: list[tuple[int, int, int]] = []
    sizes: list[int] = []
    chunk_offsets: list[int] = []
    sync: set[int] | None = None

    for fc, b, e in _iter_boxes(buf, start, end):
        if fc == b"stsd":
            _, p = _full_header(buf, b)
            (count,) = struct.unpack_from(">I", buf, p)
            p += 4
            if count >= 1:
                esize, efourcc = struct.unpack_from(">I4s", buf, p)
                track.fourcc = efourcc.decode("latin-1")
                ebody = p + 8 + 8  # reserved(6)+dref_index(2)
                if track.handler == "vide" and ebody + 28 <= e:
                    track.width, track.height = struct.unpack_from(
                        ">HH", buf, ebody + 16
                    )
                elif track.handler == "soun" and ebody + 20 <= e:
                    track.channels, _ss = struct.unpack_from(">HH", buf, ebody + 8)
                    (sr_fixed,) = struct.unpack_from(">I", buf, ebody + 16)
                    track.sample_rate = sr_fixed >> 16
        elif fc == b"stts":
            _, p = _full_header(buf, b)
            (count,) = struct.unpack_from(">I", buf, p)
            p += 4
            _need(p, count * 8, e, fc)
            for _ in range(count):
                n, d = struct.unpack_from(">II", buf, p)
                stts_runs.append((n, d))
                p += 8
        elif fc == b"stsc":
            _, p = _full_header(buf, b)
            (count,) = struct.unpack_from(">I", buf, p)
            p += 4
            _need(p, count * 12, e, fc)
            for _ in range(count):
                fch, spc, sdi = struct.unpack_from(">III", buf, p)
                stsc_runs.append((fch, spc, sdi))
                p += 12
        elif fc == b"stsz":
            _, p = _full_header(buf, b)
            uniform, count = struct.unpack_from(">II", buf, p)
            p += 8
            if uniform:
                sizes = [uniform] * count
            else:
                _need(p, count * 4, e, fc)
                sizes = list(struct.unpack_from(f">{count}I", buf, p))
        elif fc in (b"stco", b"co64"):
            _, p = _full_header(buf, b)
            (count,) = struct.unpack_from(">I", buf, p)
            p += 4
            fmt = ">I" if fc == b"stco" else ">Q"
            w = 4 if fc == b"stco" else 8
            _need(p, count * w, e, fc)
            chunk_offsets = [
                struct.unpack_from(fmt, buf, p + i * w)[0] for i in range(count)
            ]
        elif fc == b"stss":
            _, p = _full_header(buf, b)
            (count,) = struct.unpack_from(">I", buf, p)
            p += 4
            _need(p, count * 4, e, fc)
            sync = {
                struct.unpack_from(">I", buf, p + i * 4)[0] - 1 for i in range(count)
            }

    n = len(sizes)
    # expand stsc runs → samples per chunk
    offsets: list[int] = []
    if chunk_offsets and stsc_runs:
        si = 0
        n_chunks = len(chunk_offsets)
        for ri, (fch, spc, _sdi) in enumerate(stsc_runs):
            last = (
                stsc_runs[ri + 1][0] - 1 if ri + 1 < len(stsc_runs) else n_chunks
            )
            for ci in range(fch, last + 1):
                pos = chunk_offsets[ci - 1]
                for _ in range(spc):
                    if si >= n:
                        break
                    offsets.append(pos)
                    pos += sizes[si]
                    si += 1
        if si != n:
            raise ValueError(
                f"stsc/stsz mismatch: expanded {si} sample offsets for {n} sizes"
            )
    track.sample_offsets = offsets
    track.sample_sizes = sizes
    dts, t = [], 0
    for cnt, delta in stts_runs:
        for _ in range(cnt):
            dts.append(t)
            t += delta
    track.sample_dts = dts[:n]
    track.sync_flags = [True] * n if sync is None else [i in sync for i in range(n)]


def parse_mp4(payload: bytes) -> Mp4Info:
    """Parse the box tree and expand every track's sample tables into
    per-sample (offset, size, dts, keyframe) records."""
    if not is_mp4(payload):
        raise ValueError("not an ISO BMFF file (no ftyp)")
    buf = memoryview(payload)
    info = Mp4Info()
    moov = _find(buf, 0, len(buf), b"moov")
    if moov is None:
        raise ValueError("no moov box")
    ms, me = moov
    for fc, b, e in _iter_boxes(buf, ms, me):
        if fc == b"mvhd":
            version, p = _full_header(buf, b)
            if version == 1:
                _, _, info.timescale = struct.unpack_from(">QQI", buf, p)
                (info.duration,) = struct.unpack_from(">Q", buf, p + 20)
            else:
                _, _, info.timescale, info.duration = struct.unpack_from(
                    ">IIII", buf, p
                )
        elif fc == b"trak":
            track = Mp4Track()
            for tfc, tb, te in _iter_boxes(buf, b, e):
                if tfc == b"tkhd":
                    version, p = _full_header(buf, tb)
                    if version == 1:
                        (track.track_id,) = struct.unpack_from(">I", buf, p + 16)
                        geo = p + 16 + 4 + 4 + 8 + 8 + 8 + 36
                    else:
                        (track.track_id,) = struct.unpack_from(">I", buf, p + 8)
                        geo = p + 8 + 4 + 4 + 4 + 8 + 8 + 36
                    w_fixed, h_fixed = struct.unpack_from(">II", buf, geo)
                    track.width = track.width or (w_fixed >> 16)
                    track.height = track.height or (h_fixed >> 16)
                elif tfc == b"mdia":
                    for mfc, mb, me2 in _iter_boxes(buf, tb, te):
                        if mfc == b"mdhd":
                            version, p = _full_header(buf, mb)
                            if version == 1:
                                _, _, track.timescale = struct.unpack_from(
                                    ">QQI", buf, p
                                )
                                (track.duration,) = struct.unpack_from(">Q", buf, p + 20)
                            else:
                                _, _, track.timescale, track.duration = (
                                    struct.unpack_from(">IIII", buf, p)
                                )
                        elif mfc == b"hdlr":
                            _, p = _full_header(buf, mb)
                            track.handler = bytes(buf[p + 4 : p + 8]).decode("latin-1")
                        elif mfc == b"minf":
                            stbl = _find(buf, mb, me2, b"stbl")
                            if stbl is not None:
                                _parse_stbl(buf, stbl[0], stbl[1], track)
            info.tracks.append(track)
    return info


def extract_samples(
    payload: bytes, track: Mp4Track, indices: list[int] | None = None
) -> list[bytes]:
    """Slice sample payloads straight out of ``mdat`` by table offsets."""
    idx = range(track.n_samples) if indices is None else indices
    out = []
    for i in idx:
        off, size = track.sample_offsets[i], track.sample_sizes[i]
        if off + size > len(payload):
            raise ValueError(
                f"sample {i} at [{off}, {off + size}) overruns file of {len(payload)}"
            )
        out.append(payload[off : off + size])
    return out
