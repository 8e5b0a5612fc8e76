"""From-scratch MPEG audio (MP3-family, ISO 11172-3 / 13818-3) FRAME
parser + builder twin — pure byte/bit work, no audio libraries.

Scope mirrors the MP4 module (``mp4x.py``): the CONTAINER/FRAMING layer
is fully real — ID3v2/ID3v1 tag skip, sync-word scan with
second-frame confirmation, the complete header field decode
(version/layer/bitrate/samplerate tables, padding, channel mode, CRC
flag), per-layer frame-length arithmetic, mid-stream resync, Xing/Info
VBR header parse (frame count, byte count, TOC, quality) — expanded
into per-frame (offset, size, bitrate, samples) records, exact stream
duration and CBR/VBR classification. What is NOT implemented is the
codec payload: Layer III Huffman/IMDCT/polyphase synthesis to PCM
genuinely needs a full psychoacoustic codec, so PCM decode of MP3
stays an explicit ``NotImplementedError`` in ``stages/multimodal.py``
— framing/probe of real MP3 byte streams works and is tested. CRC-16
words are located and skipped, not validated.

The builder twin (``build_mp3``) emits spec-valid frame sequences
(correct headers, natural CBR padding via the standard rate
accumulator, optional Xing first frame, ID3v2/ID3v1 wrappers,
deterministic filler payloads) so tests and fixtures have goldens
without external media.

Reference parity note: the reference ships Pillow/PyMuPDF-class media
deps (reference pyproject.toml:10-14); this engine's policy (SURVEY §2
multimodal mandate) is from-scratch public-format framing, honest
stubs only at true codec boundaries.
"""

from __future__ import annotations

import hashlib
import struct
from dataclasses import dataclass, field

# header version field (2 bits) → version key
_VERSIONS = {0b11: "1", 0b10: "2", 0b00: "2.5"}  # 0b01 reserved
# header layer field (2 bits) → layer number
_LAYERS = {0b11: 1, 0b10: 2, 0b01: 3}  # 0b00 reserved

# bitrate kbps by (version_group, layer): index 1..14; 0 = free, 15 = bad
_BITRATES = {
    ("1", 1): (32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
    ("1", 2): (32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
    ("1", 3): (32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320),
    ("2", 1): (32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
    ("2", 2): (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
    ("2", 3): (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
}
_SAMPLE_RATES = {
    "1": (44100, 48000, 32000),
    "2": (22050, 24000, 16000),
    "2.5": (11025, 12000, 8000),
}


def _version_group(version: str) -> str:
    return "1" if version == "1" else "2"  # 2.5 shares MPEG-2 tables


def _samples_per_frame(version: str, layer: int) -> int:
    if layer == 1:
        return 384
    if layer == 2:
        return 1152
    return 1152 if version == "1" else 576


def _frame_size(version: str, layer: int, bitrate_kbps: int, sr: int, pad: int) -> int:
    br = bitrate_kbps * 1000
    if layer == 1:
        return (12 * br // sr + pad) * 4
    coef = 144 if (layer == 2 or version == "1") else 72
    return coef * br // sr + pad


def _side_info_size(version: str, mono: bool) -> int:
    """Layer III side-info bytes (between header/CRC and main data)."""
    if version == "1":
        return 17 if mono else 32
    return 9 if mono else 17


@dataclass
class Mp3Frame:
    offset: int
    size: int
    version: str
    layer: int
    bitrate_kbps: int
    sample_rate: int
    n_samples: int
    channel_mode: int  # 0 stereo, 1 joint, 2 dual, 3 mono
    padded: bool
    has_crc: bool


@dataclass
class Mp3Info:
    frames: list[Mp3Frame] = field(default_factory=list)
    id3v2_bytes: int = 0
    has_id3v1: bool = False
    xing: dict | None = None
    junk_bytes: int = 0  # skipped during mid-stream resync
    truncated_final: bool = False

    @property
    def n_frames(self) -> int:
        return len(self.frames)

    @property
    def sample_rate(self) -> int:
        return self.frames[0].sample_rate if self.frames else 0

    @property
    def n_samples(self) -> int:
        return sum(f.n_samples for f in self.frames)

    @property
    def duration_sec(self) -> float:
        return self.n_samples / self.sample_rate if self.frames else 0.0

    @property
    def avg_bitrate_kbps(self) -> float:
        dur = self.duration_sec
        if not dur:
            return 0.0
        payload = sum(f.size for f in self.frames)
        return payload * 8 / dur / 1000

    @property
    def is_vbr(self) -> bool:
        if self.xing is not None and self.xing.get("tag") == "Xing":
            return True
        return len({f.bitrate_kbps for f in self.frames}) > 1


def _parse_header(word: int) -> dict | None:
    """32-bit big-endian header word → field dict, or None if invalid."""
    if word >> 21 != 0x7FF:
        return None
    version = _VERSIONS.get((word >> 19) & 0b11)
    layer = _LAYERS.get((word >> 17) & 0b11)
    if version is None or layer is None:
        return None
    br_idx = (word >> 12) & 0xF
    sr_idx = (word >> 10) & 0b11
    if br_idx in (0, 15) or sr_idx == 3:  # free-format unsupported, bad idx
        return None
    bitrate = _BITRATES[(_version_group(version), layer)][br_idx - 1]
    sr = _SAMPLE_RATES[version][sr_idx]
    return {
        "version": version,
        "layer": layer,
        "bitrate_kbps": bitrate,
        "sample_rate": sr,
        "padded": bool((word >> 9) & 1),
        "has_crc": not bool((word >> 16) & 1),  # protection bit 0 = CRC present
        "channel_mode": (word >> 6) & 0b11,
    }


def _header_at(payload: bytes, off: int) -> dict | None:
    if off + 4 > len(payload):
        return None
    return _parse_header(struct.unpack_from(">I", payload, off)[0])


def _id3v2_size(payload: bytes) -> int:
    """Bytes to skip for a leading ID3v2 tag (0 if absent)."""
    if len(payload) < 10 or payload[:3] != b"ID3":
        return 0
    flags = payload[5]
    size = 0
    for b in payload[6:10]:
        if b & 0x80:
            return 0  # not syncsafe → not a valid tag
        size = (size << 7) | b
    return 10 + size + (10 if flags & 0x10 else 0)


_ID3_TEXT_FRAMES = {"TIT2": "title", "TPE1": "artist", "TALB": "album",
                    "TYER": "year", "TDRC": "year", "TCON": "genre"}
_ID3_FRAME_BY_TAG = {v: k for k, v in _ID3_TEXT_FRAMES.items() if k != "TDRC"}


def build_id3v2_frames(tags: dict[str, str], version: int = 4) -> bytes:
    """REAL ID3v2.3/2.4 text frames (not an opaque blob): frame id +
    size (synchsafe in v4, plain in v3) + flags + encoding byte 0x03
    (UTF-8) + text. Pass through ``build_mp3(id3v2_payload=...)``."""
    if version not in (3, 4):
        raise ValueError("id3 version 3 or 4")
    out = bytearray()
    for key, value in tags.items():
        fid = _ID3_FRAME_BY_TAG.get(key, key.upper() if len(key) == 4 else None)
        if fid is None:
            raise ValueError(f"id3: no frame mapping for tag {key!r}")
        body = b"\x03" + value.encode("utf-8")
        if version == 4:
            sz = len(body)
            size = bytes([(sz >> 21) & 0x7F, (sz >> 14) & 0x7F,
                          (sz >> 7) & 0x7F, sz & 0x7F])
        else:
            size = struct.pack(">I", len(body))
        out += fid.encode("ascii") + size + b"\x00\x00" + body
    return bytes(out)


def parse_id3v2_tags(payload: bytes) -> dict[str, str]:
    """Parse leading ID3v2.3/2.4 text frames → friendly tag dict
    (unknown T-frames keyed by their lowercase frame id). Non-text
    frames are skipped by size; a corrupt frame ends the walk (the tag
    area past it is padding by spec)."""
    if len(payload) < 10 or payload[:3] != b"ID3":
        return {}
    version = payload[3]
    total = _id3v2_size(payload)
    if total == 0:
        return {}
    pos = 10
    if payload[5] & 0x40 and pos + 4 <= len(payload):  # extended header
        ext = 0
        for b in payload[pos : pos + 4]:
            ext = (ext << 7) | (b & 0x7F)
        pos += max(ext, 4) if version == 4 else 4 + struct.unpack_from(">I", payload, pos)[0]
    end = min(total, len(payload))
    tags: dict[str, str] = {}
    while pos + 10 <= end:
        fid = payload[pos : pos + 4]
        if fid == b"\x00\x00\x00\x00":
            break  # padding
        if not all(65 <= c <= 90 or 48 <= c <= 57 for c in fid):
            break
        if version == 4:
            sz = 0
            for b in payload[pos + 4 : pos + 8]:
                if b & 0x80:
                    return tags  # corrupt size
                sz = (sz << 7) | b
        else:
            sz = struct.unpack_from(">I", payload, pos + 4)[0]
        body = payload[pos + 10 : pos + 10 + sz]
        if len(body) < sz:
            break
        if fid[:1] == b"T" and sz >= 1:
            enc = body[0]
            raw = body[1:]
            try:
                if enc == 0:
                    text = raw.decode("latin-1")
                elif enc == 1:
                    text = raw.decode("utf-16")
                elif enc == 2:
                    text = raw.decode("utf-16-be")
                elif enc == 3:
                    text = raw.decode("utf-8")
                else:
                    text = ""
            except UnicodeDecodeError:
                text = ""
            text = text.rstrip("\x00")
            if text:
                key = _ID3_TEXT_FRAMES.get(fid.decode("ascii"), fid.decode("ascii").lower())
                tags[key] = text
        pos += 10 + sz
    return tags


def _parse_xing(payload: bytes, frame: Mp3Frame) -> dict | None:
    """Xing/Info VBR header in the first Layer-III frame (after side info)."""
    if frame.layer != 3:
        return None
    off = (
        frame.offset
        + 4
        + (2 if frame.has_crc else 0)
        + _side_info_size(frame.version, frame.channel_mode == 3)
    )
    tag = payload[off : off + 4]
    if tag not in (b"Xing", b"Info"):
        return None
    (flags,) = struct.unpack_from(">I", payload, off + 4)
    p = off + 8
    out: dict = {"tag": tag.decode("ascii"), "flags": flags}
    if flags & 1:
        (out["n_frames"],) = struct.unpack_from(">I", payload, p)
        p += 4
    if flags & 2:
        (out["n_bytes"],) = struct.unpack_from(">I", payload, p)
        p += 4
    if flags & 4:
        out["toc"] = bytes(payload[p : p + 100])
        p += 100
    if flags & 8:
        (out["quality"],) = struct.unpack_from(">I", payload, p)
    return out


def is_mp3(payload: bytes) -> bool:
    """Cheap sniff: leading ID3v2 tag, or a confirmed frame sync."""
    if payload[:3] == b"ID3":
        return True
    return len(payload) >= 4 and _header_at(payload, 0) is not None


def parse_mp3(payload: bytes, max_junk: int = 1 << 16) -> Mp3Info:
    """Walk the frame chain. The first sync must be confirmed by a
    second header at the predicted next-frame offset (the classic
    false-sync guard); mid-stream garbage triggers a bounded forward
    resync with the junk accounted in ``junk_bytes``."""
    info = Mp3Info()
    info.id3v2_bytes = _id3v2_size(payload)
    end = len(payload)
    if end >= 128 and payload[end - 128 : end - 125] == b"TAG":
        info.has_id3v1 = True
        end -= 128

    # find first confirmed frame
    off = info.id3v2_bytes
    start = None
    scanned = 0
    while off + 4 <= end and scanned <= max_junk:
        h = _header_at(payload, off)
        if h is not None:
            size = _frame_size(
                h["version"], h["layer"], h["bitrate_kbps"], h["sample_rate"],
                int(h["padded"]),
            )
            nxt = off + size
            if nxt >= end or _header_at(payload, nxt) is not None:
                start = off
                break
        off += 1
        scanned += 1
    if start is None:
        raise ValueError("no MPEG audio frame sync found")
    info.junk_bytes += start - info.id3v2_bytes

    off = start
    while off + 4 <= end:
        h = _header_at(payload, off)
        if h is None:
            # mid-stream resync: scan forward (bounded) for a header that
            # a second header confirms at its predicted end — same
            # false-sync guard as the initial scan
            nxt, scanned, found = off, 0, False
            while nxt + 4 <= end and scanned <= max_junk:
                cand = _header_at(payload, nxt)
                if cand is not None:
                    csize = _frame_size(
                        cand["version"], cand["layer"], cand["bitrate_kbps"],
                        cand["sample_rate"], int(cand["padded"]),
                    )
                    if nxt + csize >= end or _header_at(payload, nxt + csize):
                        found = True
                        break
                nxt += 1
                scanned += 1
            if not found:
                info.truncated_final = info.truncated_final or nxt < end
                break
            info.junk_bytes += nxt - off
            off = nxt
            continue
        size = _frame_size(
            h["version"], h["layer"], h["bitrate_kbps"], h["sample_rate"],
            int(h["padded"]),
        )
        if off + size > end:
            info.truncated_final = True
            break
        info.frames.append(
            Mp3Frame(
                offset=off,
                size=size,
                version=h["version"],
                layer=h["layer"],
                bitrate_kbps=h["bitrate_kbps"],
                sample_rate=h["sample_rate"],
                n_samples=_samples_per_frame(h["version"], h["layer"]),
                channel_mode=h["channel_mode"],
                padded=h["padded"],
                has_crc=h["has_crc"],
            )
        )
        off += size
    if info.frames:
        info.xing = _parse_xing(payload, info.frames[0])
    return info


# --------------------------------------------------------------------------
# builder twin


_VERSION_BITS = {"1": 0b11, "2": 0b10, "2.5": 0b00}
_LAYER_BITS = {1: 0b11, 2: 0b10, 3: 0b01}


def _make_header(
    version: str, layer: int, bitrate_kbps: int, sr: int, pad: int, mode: int
) -> int:
    br_idx = _BITRATES[(_version_group(version), layer)].index(bitrate_kbps) + 1
    sr_idx = _SAMPLE_RATES[version].index(sr)
    return (
        (0x7FF << 21)
        | (_VERSION_BITS[version] << 19)
        | (_LAYER_BITS[layer] << 17)
        | (1 << 16)  # protection bit 1 = no CRC
        | (br_idx << 12)
        | (sr_idx << 10)
        | (pad << 9)
        | (mode << 6)
    )


def build_mp3(
    n_frames: int = 20,
    *,
    bitrate_kbps: int | list[int] = 128,
    sample_rate: int = 44100,
    version: str = "1",
    layer: int = 3,
    channel_mode: int = 3,
    xing: bool = False,
    id3v2_payload: bytes | None = None,
    id3v1: bool = False,
    seed: int = 0,
) -> bytes:
    """Emit a spec-valid frame chain. CBR padding follows the standard
    rate accumulator (so e.g. 128 kbps @ 44100 Hz alternates 417/418-byte
    frames exactly like real encoders); a bitrate LIST makes a VBR
    stream. ``xing`` prepends a Xing frame carrying frame/byte counts
    and a linear TOC."""
    rates = (
        [bitrate_kbps] * n_frames if isinstance(bitrate_kbps, int) else list(bitrate_kbps)
    )
    if len(rates) != n_frames:
        raise ValueError("bitrate list length != n_frames")
    coef = (
        12 if layer == 1 else (144 if (layer == 2 or version == "1") else 72)
    )
    frames: list[bytes] = []
    acc = 0.0
    for i, kbps in enumerate(rates):
        exact = coef * kbps * 1000 / sample_rate
        acc += exact - int(exact)
        pad = 0
        if acc >= 1.0 and layer != 1:  # layer I pads in 4-byte slots; skip
            pad, acc = 1, acc - 1.0
        size = _frame_size(version, layer, kbps, sample_rate, pad)
        hdr = struct.pack(">I", _make_header(version, layer, kbps, sample_rate, pad, channel_mode))
        filler = hashlib.blake2b(
            f"{seed}:{i}".encode(), digest_size=32
        ).digest()
        body = (filler * (size // 32 + 1))[: size - 4]
        frames.append(hdr + body)

    if xing:
        kbps0 = rates[0]
        xsize = _frame_size(version, layer, kbps0, sample_rate, 0)
        side = _side_info_size(version, channel_mode == 3)
        total_bytes = xsize + sum(len(f) for f in frames)
        toc = bytes(min(255, i * 256 // 100) for i in range(100))
        xbody = bytearray(xsize - 4)
        tagpos = side  # after side info (zeros stand in for side info)
        payload = (
            b"Xing"
            + struct.pack(">I", 0x7)
            + struct.pack(">II", n_frames + 1, total_bytes)
            + toc
        )
        xbody[tagpos : tagpos + len(payload)] = payload
        xhdr = struct.pack(
            ">I", _make_header(version, layer, kbps0, sample_rate, 0, channel_mode)
        )
        frames.insert(0, xhdr + bytes(xbody))

    out = b"".join(frames)
    if id3v2_payload is not None:
        sz = len(id3v2_payload)
        syncsafe = bytes(
            [(sz >> 21) & 0x7F, (sz >> 14) & 0x7F, (sz >> 7) & 0x7F, sz & 0x7F]
        )
        out = b"ID3\x04\x00\x00" + syncsafe + id3v2_payload + out
    if id3v1:
        out += b"TAG" + bytes(125)
    return out
