"""From-scratch FLAC (Free Lossless Audio Codec) decoder + encoder twin
— pure bit/byte work, no audio libraries.

Unlike the MP3 family (``mp3x.py``), FLAC has NO opaque psychoacoustic
tables: every stage is arithmetic derivable from the public format spec
(https://xiph.org/flac/format.html), so the PCM decode here is REAL and
bit-exact, closing the "lossy codec stub" gap for lossless audio:

* stream layer — ``fLaC`` marker, metadata blocks (STREAMINFO parsed,
  others skipped), frame sequence;
* frame layer — 14-bit sync, blocking strategy, coded block-size /
  sample-rate / channel-assignment / sample-size fields with all the
  "get N bits from end of header" escapes, extended-UTF-8 frame number
  (up to 36 bits), CRC-8 (poly 0x07) header check, CRC-16 (poly 0x8005)
  whole-frame check;
* subframe layer — CONSTANT, VERBATIM, FIXED orders 0-4 (residual =
  order-th finite difference, reconstructed by iterated cumulative sum,
  vectorized), LPC orders 1-32 (quantized integer predictor with shift,
  exact integer loop), wasted-bits unary field;
* residual layer — Rice / Rice2 partitioned coding incl. the escape
  (raw ``n``-bit) partitions, zigzag mapping;
* stereo layer — left/side, right/side, mid/side decorrelation with the
  side channel's +1 bit, reconstructed exactly;
* verification — CRC-8, CRC-16 and the STREAMINFO MD5 of the decoded
  PCM (little-endian interleaved) are all checked, so a decoded stream
  is *proven* lossless, not assumed.

The encoder twin (``encode_flac``) emits spec-valid streams through the
same feature matrix (all four stereo modes, constant/verbatim/fixed/LPC
subframes with a real Levinson-Durbin coefficient fit, Rice partition
orders, wasted bits, short last frames, multi-byte UTF-8 frame numbers)
so tests and fixtures have goldens without external media, and the
decoder's roundtrip equality is checked sample-for-sample.

Reference parity note: the reference ships media decode via bundled
libraries (reference pyproject.toml:10-14); this engine's policy
(SURVEY §2 multimodal mandate) is from-scratch public-format codecs
with honest stubs only where a spec genuinely embeds non-derivable
tables — FLAC embeds none, so there is no stub here.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

import numpy as np

# ---------------------------------------------------------------------------
# CRCs (bitwise definitions from the format spec; table-driven for speed)


def _make_crc8_table(poly: int = 0x07) -> list[int]:
    tbl = []
    for b in range(256):
        r = b
        for _ in range(8):
            r = ((r << 1) ^ poly) & 0xFF if r & 0x80 else (r << 1) & 0xFF
        tbl.append(r)
    return tbl


def _make_crc16_table(poly: int = 0x8005) -> list[int]:
    tbl = []
    for b in range(256):
        r = b << 8
        for _ in range(8):
            r = ((r << 1) ^ poly) & 0xFFFF if r & 0x8000 else (r << 1) & 0xFFFF
        tbl.append(r)
    return tbl


_CRC8_TABLE = _make_crc8_table()
_CRC16_TABLE = _make_crc16_table()


def crc8(data: bytes) -> int:
    r = 0
    for b in data:
        r = _CRC8_TABLE[r ^ b]
    return r


def crc16(data: bytes) -> int:
    r = 0
    for b in data:
        r = (_CRC16_TABLE[((r >> 8) ^ b) & 0xFF] ^ (r << 8)) & 0xFFFF
    return r


# ---------------------------------------------------------------------------
# bit I/O (MSB-first, as the whole format is defined)


class BitWriter:
    def __init__(self) -> None:
        self._buf = bytearray()
        self._acc = 0
        self._nacc = 0

    def write(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        value &= (1 << nbits) - 1
        self._acc = (self._acc << nbits) | value
        self._nacc += nbits
        while self._nacc >= 8:
            self._nacc -= 8
            self._buf.append((self._acc >> self._nacc) & 0xFF)
        self._acc &= (1 << self._nacc) - 1

    def write_signed(self, value: int, nbits: int) -> None:
        self.write(value & ((1 << nbits) - 1), nbits)

    def write_unary(self, q: int) -> None:
        # q zero bits then a terminating 1 (Rice quotient / wasted-bits)
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self._nacc:
            self.write(0, 8 - self._nacc)

    def getvalue(self) -> bytes:
        assert self._nacc == 0, "unaligned"
        return bytes(self._buf)


class BitReader:
    """MSB-first reader over a bytes window with position tracking (byte
    positions are needed for the CRC spans)."""

    def __init__(self, data: bytes, byte_pos: int = 0) -> None:
        self._data = data
        self._pos = byte_pos  # next byte to load
        self._acc = 0
        self._nacc = 0

    @property
    def byte_pos(self) -> int:
        """Position of the next unconsumed byte (only valid when aligned)."""
        return self._pos - (self._nacc // 8)

    def _fill(self, need: int) -> None:
        while self._nacc < need:
            if self._pos >= len(self._data):
                raise ValueError("flac: truncated stream")
            self._acc = (self._acc << 8) | self._data[self._pos]
            self._pos += 1
            self._nacc += 8

    def read(self, nbits: int) -> int:
        if nbits == 0:
            return 0
        self._fill(nbits)
        self._nacc -= nbits
        v = (self._acc >> self._nacc) & ((1 << nbits) - 1)
        self._acc &= (1 << self._nacc) - 1
        return v

    def read_signed(self, nbits: int) -> int:
        v = self.read(nbits)
        if v >= 1 << (nbits - 1):
            v -= 1 << nbits
        return v

    def read_unary(self) -> int:
        q = 0
        while True:
            # scan the accumulator for the terminating 1 in word chunks
            if self._nacc == 0:
                self._fill(1)
            if self._acc == 0:
                q += self._nacc
                self._nacc = 0
                continue
            top = self._acc.bit_length()
            zeros = self._nacc - top
            q += zeros
            self._nacc = top - 1
            self._acc &= (1 << self._nacc) - 1
            return q

    def align(self) -> None:
        self._nacc -= self._nacc % 8

    def at_eof(self) -> bool:
        return self._nacc == 0 and self._pos >= len(self._data)


# ---------------------------------------------------------------------------
# extended UTF-8 coded numbers (frame/sample number, up to 36 bits)

_UTF8_RANGES = (
    (7, 0x00, 1),
    (11, 0xC0, 2),
    (16, 0xE0, 3),
    (21, 0xF0, 4),
    (26, 0xF8, 5),
    (31, 0xFC, 6),
    (36, 0xFE, 7),
)


def encode_coded_number(value: int) -> bytes:
    if value < 0 or value >= 1 << 36:
        raise ValueError("coded number out of range")
    for bits, lead, nbytes in _UTF8_RANGES:
        if value < 1 << bits:
            if nbytes == 1:
                return bytes([value])
            out = bytearray(nbytes)
            for i in range(nbytes - 1, 0, -1):
                out[i] = 0x80 | (value & 0x3F)
                value >>= 6
            out[0] = lead | value
            return bytes(out)
    raise AssertionError


def decode_coded_number(br: BitReader) -> int:
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    # count leading ones: that IS the byte count (extended UTF-8)
    ones = 0
    while ones < 8 and (b0 << ones) & 0x80:
        ones += 1
    if ones < 2 or ones > 7:
        raise ValueError("flac: invalid coded-number lead byte")
    nbytes = ones
    value = b0 & (0x7F >> ones) if ones < 7 else 0
    for _ in range(nbytes - 1):
        c = br.read(8)
        if (c & 0xC0) != 0x80:
            raise ValueError("flac: invalid coded-number continuation byte")
        value = (value << 6) | (c & 0x3F)
    return value


# ---------------------------------------------------------------------------
# tables from the frame-header spec

_BLOCKSIZE_CODES = {
    192: 1, 576: 2, 1152: 3, 2304: 4, 4608: 5,
    256: 8, 512: 9, 1024: 10, 2048: 11, 4096: 12,
    8192: 13, 16384: 14, 32768: 15,
}
_SAMPLE_RATE_CODES = {
    88200: 1, 176400: 2, 192000: 3, 8000: 4, 16000: 5, 22050: 6,
    24000: 7, 32000: 8, 44100: 9, 48000: 10, 96000: 11,
}
_SAMPLE_RATE_BY_CODE = {v: k for k, v in _SAMPLE_RATE_CODES.items()}
_BPS_CODES = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}
_BPS_BY_CODE = {v: k for k, v in _BPS_CODES.items()}

# fixed predictor coefficients: residual[i] = order-th difference of a
_FIXED_COEFFS = {
    0: (),
    1: (1,),
    2: (2, -1),
    3: (3, -3, 1),
    4: (4, -6, 4, -1),
}


@dataclass
class StreamInfo:
    min_blocksize: int
    max_blocksize: int
    min_framesize: int
    max_framesize: int
    sample_rate: int
    channels: int
    bits_per_sample: int
    total_samples: int
    md5: bytes


# ---------------------------------------------------------------------------
# decoder


def _parse_streaminfo(data: bytes) -> StreamInfo:
    if len(data) != 34:
        raise ValueError("flac: STREAMINFO must be 34 bytes")
    br = BitReader(data)
    return StreamInfo(
        min_blocksize=br.read(16),
        max_blocksize=br.read(16),
        min_framesize=br.read(24),
        max_framesize=br.read(24),
        sample_rate=br.read(20),
        channels=br.read(3) + 1,
        bits_per_sample=br.read(5) + 1,
        total_samples=br.read(36),
        md5=data[18:34],
    )


def parse_metadata(payload: bytes) -> tuple[StreamInfo, int]:
    """Parse the metadata section; return (streaminfo, offset of first
    frame byte)."""
    if payload[:4] != b"fLaC":
        raise ValueError("flac: missing fLaC marker")
    pos = 4
    info: StreamInfo | None = None
    while True:
        if pos + 4 > len(payload):
            raise ValueError("flac: truncated metadata header")
        hdr = payload[pos]
        last = bool(hdr & 0x80)
        btype = hdr & 0x7F
        length = int.from_bytes(payload[pos + 1 : pos + 4], "big")
        pos += 4
        if pos + length > len(payload):
            raise ValueError("flac: truncated metadata block")
        if btype == 0:
            info = _parse_streaminfo(payload[pos : pos + length])
        elif btype == 127:
            raise ValueError("flac: invalid metadata block type 127")
        pos += length
        if last:
            break
    if info is None:
        raise ValueError("flac: no STREAMINFO block")
    return info, pos


def _decode_residual(br: BitReader, blocksize: int, order: int) -> np.ndarray:
    method = br.read(2)
    if method > 1:
        raise ValueError(f"flac: reserved residual coding method {method}")
    param_bits = 4 + method
    escape = (1 << param_bits) - 1
    part_order = br.read(4)
    n_parts = 1 << part_order
    if blocksize % n_parts:
        raise ValueError("flac: blocksize not divisible by partition count")
    part_len = blocksize >> part_order
    out = np.empty(blocksize - order, dtype=np.int64)
    idx = 0
    for p in range(n_parts):
        n = part_len - (order if p == 0 else 0)
        if n < 0:
            raise ValueError("flac: partition shorter than predictor order")
        param = br.read(param_bits)
        if param == escape:
            nbits = br.read(5)
            if nbits == 0:
                out[idx : idx + n] = 0
            else:
                for i in range(n):
                    out[idx + i] = br.read_signed(nbits)
        else:
            k = param
            for i in range(n):
                q = br.read_unary()
                u = (q << k) | br.read(k)
                out[idx + i] = (u >> 1) ^ -(u & 1)
        idx += n
    return out


def _reconstruct_fixed(order: int, warmup: np.ndarray, resid: np.ndarray) -> np.ndarray:
    """residual = order-th finite difference → iterated cumulative sum
    (vectorized; no per-sample Python loop)."""
    if order == 0:
        return resid.copy()
    # successively integrate: start from the order-th differences and the
    # warmup's own difference pyramid
    diffs = [warmup.astype(np.int64)]
    for _ in range(order):
        diffs.append(np.diff(diffs[-1]))
    out = resid
    for lvl in range(order - 1, -1, -1):
        seed = diffs[lvl][-1] if len(diffs[lvl]) else 0
        out = seed + np.cumsum(out, dtype=np.int64)
    return np.concatenate([warmup.astype(np.int64), out])


def _decode_subframe(br: BitReader, blocksize: int, bps: int) -> np.ndarray:
    if br.read(1):
        raise ValueError("flac: subframe padding bit set")
    stype = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.read_unary() + 1
    eff_bps = bps - wasted
    if eff_bps <= 0:
        raise ValueError("flac: wasted bits exceed sample size")
    if stype == 0:  # CONSTANT
        v = br.read_signed(eff_bps)
        out = np.full(blocksize, v, dtype=np.int64)
    elif stype == 1:  # VERBATIM
        out = np.empty(blocksize, dtype=np.int64)
        for i in range(blocksize):
            out[i] = br.read_signed(eff_bps)
    elif 8 <= stype <= 12:  # FIXED order 0-4
        order = stype - 8
        if order > blocksize:
            raise ValueError("flac: fixed order exceeds blocksize")
        warmup = np.array([br.read_signed(eff_bps) for _ in range(order)], np.int64)
        resid = _decode_residual(br, blocksize, order)
        out = _reconstruct_fixed(order, warmup, resid)
    elif stype >= 32:  # LPC order 1-32
        order = stype - 31
        if order > blocksize:
            raise ValueError("flac: lpc order exceeds blocksize")
        warmup = [br.read_signed(eff_bps) for _ in range(order)]
        prec = br.read(4)
        if prec == 0b1111:
            raise ValueError("flac: invalid qlp precision")
        prec += 1
        shift = br.read_signed(5)
        if shift < 0:
            raise ValueError("flac: negative qlp shift")
        coefs = [br.read_signed(prec) for _ in range(order)]
        resid = _decode_residual(br, blocksize, order)
        out = np.empty(blocksize, dtype=np.int64)
        out[:order] = warmup
        # exact integer recurrence (spec-mandated arithmetic shift)
        o = out.tolist()
        r = resid.tolist()
        for i in range(order, blocksize):
            acc = 0
            for j in range(order):
                acc += coefs[j] * o[i - 1 - j]
            o[i] = (acc >> shift) + r[i - order]
        out = np.array(o, dtype=np.int64)
    else:
        raise ValueError(f"flac: reserved subframe type {stype}")
    if wasted:
        out = out << wasted
    return out


def _decode_frame(
    payload: bytes, pos: int, info: StreamInfo
) -> tuple[np.ndarray, int, int, int]:
    """Decode one frame starting at byte ``pos``.

    Returns (samples[channels, blocksize] int64, next_pos, frame_number,
    variable_blocking)."""
    start = pos
    br = BitReader(payload, pos)
    sync = br.read(14)
    if sync != 0b11111111111110:
        raise ValueError("flac: lost frame sync")
    if br.read(1):
        raise ValueError("flac: frame reserved bit set")
    variable = br.read(1)
    bs_code = br.read(4)
    sr_code = br.read(4)
    ch_code = br.read(4)
    bps_code = br.read(3)
    if br.read(1):
        raise ValueError("flac: frame header reserved bit set")
    frame_no = decode_coded_number(br)

    if bs_code == 0:
        raise ValueError("flac: reserved blocksize code")
    elif bs_code == 1:
        blocksize = 192
    elif 2 <= bs_code <= 5:
        blocksize = 576 << (bs_code - 2)
    elif bs_code == 6:
        blocksize = br.read(8) + 1
    elif bs_code == 7:
        blocksize = br.read(16) + 1
    else:
        blocksize = 256 << (bs_code - 8)

    if sr_code == 0:
        rate = info.sample_rate
    elif sr_code in _SAMPLE_RATE_BY_CODE:
        rate = _SAMPLE_RATE_BY_CODE[sr_code]
    elif sr_code == 12:
        rate = br.read(8) * 1000
    elif sr_code == 13:
        rate = br.read(16)
    elif sr_code == 14:
        rate = br.read(16) * 10
    else:
        raise ValueError("flac: invalid sample-rate code")

    if bps_code == 0:
        bps = info.bits_per_sample
    elif bps_code in _BPS_BY_CODE:
        bps = _BPS_BY_CODE[bps_code]
    else:
        raise ValueError("flac: reserved sample-size code")

    # CRC-8 covers the header bytes read so far
    hdr_end = br.byte_pos
    expect8 = br.read(8)
    if crc8(payload[start:hdr_end]) != expect8:
        raise ValueError("flac: frame header CRC-8 mismatch")

    if ch_code <= 7:
        nch = ch_code + 1
        side = None
    elif ch_code == 8:
        nch, side = 2, "left"
    elif ch_code == 9:
        nch, side = 2, "right"
    elif ch_code == 10:
        nch, side = 2, "mid"
    else:
        raise ValueError(f"flac: reserved channel assignment {ch_code}")

    chans = []
    for c in range(nch):
        ch_bps = bps
        if side == "left" and c == 1:
            ch_bps += 1
        elif side == "right" and c == 0:
            ch_bps += 1
        elif side == "mid" and c == 1:
            ch_bps += 1
        chans.append(_decode_subframe(br, blocksize, ch_bps))
    br.align()
    body_end = br.byte_pos
    expect16 = br.read(16)
    if crc16(payload[start:body_end]) != expect16:
        raise ValueError("flac: frame CRC-16 mismatch")

    if side == "left":
        left, s = chans
        chans = [left, left - s]
    elif side == "right":
        s, right = chans
        chans = [s + right, right]
    elif side == "mid":
        mid, s = chans
        m = (mid << 1) | (s & 1)
        chans = [(m + s) >> 1, (m - s) >> 1]

    del rate  # sample-rate escapes are parsed/validated; decode uses STREAMINFO
    return np.stack(chans), body_end + 2, frame_no, bool(variable)


def decode_flac(
    payload: bytes, *, verify_md5: bool = True
) -> tuple[np.ndarray, int, int]:
    """Full FLAC stream → (samples int32 [n, channels], sample_rate, bps).

    Bit-exact lossless decode with CRC-8/CRC-16 verification per frame
    and (when the encoder recorded one) the STREAMINFO MD5 check over
    the reassembled PCM."""
    info, pos = parse_metadata(payload)
    frames: list[np.ndarray] = []
    n_frames = 0
    n_samples = 0
    while pos < len(payload):
        samples, pos, frame_no, variable = _decode_frame(payload, pos, info)
        expected = n_samples if variable else n_frames
        if frame_no != expected:
            raise ValueError(f"flac: frame number {frame_no} (expected {expected})")
        n_frames += 1
        n_samples += samples.shape[1]
        frames.append(samples)
    if not frames:
        raise ValueError("flac: no frames")
    pcm = np.concatenate(frames, axis=1).T  # [n, channels]
    if info.total_samples and len(pcm) != info.total_samples:
        raise ValueError(
            f"flac: sample count {len(pcm)} != STREAMINFO {info.total_samples}"
        )
    lo, hi = -(1 << (info.bits_per_sample - 1)), (1 << (info.bits_per_sample - 1)) - 1
    if pcm.min() < lo or pcm.max() > hi:
        raise ValueError("flac: decoded sample out of range for bit depth")
    if verify_md5 and info.md5 != b"\x00" * 16:
        if _pcm_md5(pcm, info.bits_per_sample) != info.md5:
            raise ValueError("flac: MD5 mismatch — stream corrupt")
    return pcm.astype(np.int32), info.sample_rate, info.bits_per_sample


def parse_vorbis_comment(data: bytes) -> dict[str, str]:
    """VORBIS_COMMENT metadata block (block type 4): little-endian
    length-prefixed vendor string + comment list of ``KEY=value`` pairs
    (keys case-insensitive per the Vorbis spec — normalized to lower)."""
    pos = 0
    if pos + 4 > len(data):
        raise ValueError("flac: truncated vorbis comment")
    vlen = int.from_bytes(data[pos : pos + 4], "little")
    pos += 4
    if pos + vlen > len(data):
        raise ValueError("flac: truncated vorbis vendor string")
    out = {"vendor": data[pos : pos + vlen].decode("utf-8", "replace")}
    pos += vlen
    if pos + 4 > len(data):
        raise ValueError("flac: truncated vorbis comment count")
    n = int.from_bytes(data[pos : pos + 4], "little")
    pos += 4
    for _ in range(n):
        if pos + 4 > len(data):
            raise ValueError("flac: truncated vorbis comment entry")
        clen = int.from_bytes(data[pos : pos + 4], "little")
        pos += 4
        if pos + clen > len(data):
            raise ValueError("flac: truncated vorbis comment entry body")
        entry = data[pos : pos + clen].decode("utf-8", "replace")
        pos += clen
        k, _, v = entry.partition("=")
        if k:
            out[k.lower()] = v
    return out


def build_vorbis_comment(tags: dict[str, str], vendor: str = "flacx-twin") -> bytes:
    body = bytearray()
    vb = vendor.encode()
    body += len(vb).to_bytes(4, "little") + vb
    items = [(k, v) for k, v in tags.items() if k != "vendor"]
    body += len(items).to_bytes(4, "little")
    for k, v in items:
        e = f"{k}={v}".encode()
        body += len(e).to_bytes(4, "little") + e
    return bytes(body)


def probe_flac(payload: bytes) -> dict:
    """STREAMINFO-level metadata without PCM decode (frames in a FLAC
    stream carry no length field, so skipping without decode is not
    possible — the cheap probe is the STREAMINFO contract). Tag blocks
    (VORBIS_COMMENT) are parsed into ``tags``; other metadata blocks are
    skipped by type."""
    info, first_frame = parse_metadata(payload)
    # second metadata walk for tags (parse_metadata validated structure)
    tags: dict[str, str] = {}
    pos = 4
    while True:
        hdr = payload[pos]
        length = int.from_bytes(payload[pos + 1 : pos + 4], "big")
        if (hdr & 0x7F) == 4:
            tags = parse_vorbis_comment(payload[pos + 4 : pos + 4 + length])
        pos += 4 + length
        if hdr & 0x80:
            break
    dur = info.total_samples / info.sample_rate if info.sample_rate else 0.0
    audio_bytes = len(payload) - first_frame
    return {
        "container": "flac",
        "sample_rate": info.sample_rate,
        "n_channels": info.channels,
        "bits_per_sample": info.bits_per_sample,
        "total_samples": info.total_samples,
        "duration_ms": int(round(dur * 1000)),
        "bitrate_kbps": int(round(audio_bytes * 8 / dur / 1000)) if dur else 0,
        "block_size": info.max_blocksize,
        "md5_present": info.md5 != b"\x00" * 16,
        "tags": tags,
    }


def _pcm_md5(pcm: np.ndarray, bps: int) -> bytes:
    """MD5 of the unencoded PCM as the spec defines it: channels
    interleaved, little-endian, signed, smallest whole byte width."""
    width = (bps + 7) // 8
    flat = pcm.astype(np.int64).reshape(-1)
    if width == 1:
        raw = flat.astype(np.int8).tobytes()
    elif width == 2:
        raw = flat.astype("<i2").tobytes()
    elif width == 3:
        as32 = flat.astype("<i4").view(np.uint8).reshape(-1, 4)
        raw = as32[:, :3].tobytes()
    else:
        raw = flat.astype("<i4").tobytes()
    return hashlib.md5(raw).digest()


# ---------------------------------------------------------------------------
# encoder twin


def _zigzag(v: np.ndarray) -> np.ndarray:
    return np.where(v >= 0, v << 1, ((-v) << 1) - 1)


def _rice_cost(resid: np.ndarray, k: int) -> int:
    u = _zigzag(resid.astype(np.int64))
    return int(np.sum(u >> k)) + len(u) * (k + 1)


def _best_rice_param(resid: np.ndarray, max_k: int = 14) -> int:
    if len(resid) == 0:
        return 0
    u = _zigzag(resid.astype(np.int64))
    mean = max(float(np.mean(u)), 0.0)
    k = max(0, min(max_k, int(np.log2(mean + 1)) if mean >= 1 else 0))
    # local search around the estimate
    best_k, best_c = k, _rice_cost(resid, k)
    for kk in (k - 1, k + 1, k + 2):
        if 0 <= kk <= max_k:
            c = _rice_cost(resid, kk)
            if c < best_c:
                best_k, best_c = kk, c
    return best_k


def _write_rice(bw: BitWriter, resid: np.ndarray, k: int) -> None:
    for v in resid.tolist():
        u = (v << 1) if v >= 0 else ((-v) << 1) - 1
        bw.write_unary(u >> k)
        bw.write(u & ((1 << k) - 1), k)


def _write_residual(
    bw: BitWriter,
    resid: np.ndarray,
    blocksize: int,
    order: int,
    partition_order: int,
    *,
    escape_parts: set[int] | None = None,
) -> None:
    n_parts = 1 << partition_order
    if blocksize % n_parts or (blocksize >> partition_order) <= order and n_parts > 1:
        raise ValueError("invalid partition order for blocksize/order")
    bw.write(0, 2)  # Rice method (4-bit params)
    bw.write(partition_order, 4)
    part_len = blocksize >> partition_order
    idx = 0
    for p in range(n_parts):
        n = part_len - (order if p == 0 else 0)
        part = resid[idx : idx + n]
        idx += n
        if escape_parts and p in escape_parts:
            m = int(np.abs(part).max()) if len(part) else 0
            nbits = min(31, max(2, m).bit_length() + 1)
            bw.write(0b1111, 4)
            bw.write(nbits, 5)
            for v in part.tolist():
                bw.write(v & ((1 << nbits) - 1), nbits)
        else:
            k = _best_rice_param(part)
            if k >= 0b1111:
                k = 0b1110
            bw.write(k, 4)
            _write_rice(bw, part, k)


def _fixed_residual(samples: np.ndarray, order: int) -> np.ndarray:
    return np.diff(samples.astype(np.int64), n=order) if order else samples.astype(np.int64)


def _lpc_fit(samples: np.ndarray, order: int, precision: int = 12) -> tuple[list[int], int]:
    """Levinson-Durbin on the autocorrelation, quantized to integer
    coefficients with a shift — any quantization is VALID (lossless comes
    from coding the exact residual), quality only affects size."""
    x = samples.astype(np.float64)
    if len(x) <= order or not np.any(x):
        return [0] * order, 0
    ac = np.array([np.dot(x[: len(x) - l], x[l:]) for l in range(order + 1)])
    if ac[0] == 0:
        return [0] * order, 0
    err = ac[0]
    a = np.zeros(order)
    for i in range(order):
        k = (ac[i + 1] - np.dot(a[:i], ac[i:0:-1])) / err if err > 0 else 0.0
        a[:i], a[i] = a[:i] - k * a[i - 1 :: -1] if i else a[:i], k
        err *= 1 - k * k
        if err <= 0:
            break
    cmax = np.abs(a).max()
    if cmax == 0:
        return [0] * order, 0
    shift = min(15, max(0, precision - 1 - int(np.floor(np.log2(cmax))) - 1))
    q = np.clip(
        np.round(a * (1 << shift)),
        -(1 << (precision - 1)),
        (1 << (precision - 1)) - 1,
    ).astype(np.int64)
    return q.tolist(), shift


def _lpc_residual(samples: np.ndarray, coefs: list[int], shift: int) -> np.ndarray:
    order = len(coefs)
    s = samples.astype(object)  # exact ints
    n = len(s)
    resid = np.empty(n - order, dtype=np.int64)
    for i in range(order, n):
        acc = 0
        for j in range(order):
            acc += coefs[j] * int(s[i - 1 - j])
        resid[i - order] = int(s[i]) - (acc >> shift)
    return resid


def _write_subframe(
    bw: BitWriter,
    samples: np.ndarray,
    bps: int,
    *,
    mode: str = "auto",
    lpc_order: int = 8,
    partition_order: int = 0,
    use_wasted: bool = True,
    escape_parts: set[int] | None = None,
) -> None:
    samples = samples.astype(np.int64)
    blocksize = len(samples)

    wasted = 0
    if use_wasted and np.any(samples):
        # min trailing zeros across the subframe == trailing zeros of the OR
        acc = int(np.bitwise_or.reduce(samples[samples != 0]))
        wasted = min((acc & -acc).bit_length() - 1, bps - 1)
    enc = samples >> wasted if wasted else samples
    eff_bps = bps - wasted

    if mode == "auto":
        if np.all(enc == enc[0]):
            mode = "constant"
        else:
            mode = "fixed"

    bw.write(0, 1)
    if mode == "constant":
        bw.write(0, 6)
        _write_wasted(bw, wasted)
        bw.write_signed(int(enc[0]), eff_bps)
        return
    if mode == "verbatim":
        bw.write(1, 6)
        _write_wasted(bw, wasted)
        for v in enc.tolist():
            bw.write(v & ((1 << eff_bps) - 1), eff_bps)
        return
    if mode == "fixed":
        best_order, best_cost = 0, None
        for order in range(min(4, blocksize - 1) + 1):
            r = _fixed_residual(enc, order)
            if len(r) == 0:
                continue
            if np.abs(r).max(initial=0) >= 1 << 40:
                continue
            cost = int(np.sum(np.abs(r)))
            if best_cost is None or cost < best_cost:
                best_order, best_cost = order, cost
        order = best_order
        bw.write(8 + order, 6)
        _write_wasted(bw, wasted)
        for v in enc[:order].tolist():
            bw.write(v & ((1 << eff_bps) - 1), eff_bps)
        _write_residual(
            bw, _fixed_residual(enc, order), blocksize, order,
            partition_order, escape_parts=escape_parts,
        )
        return
    if mode == "lpc":
        order = max(1, min(lpc_order, 32, blocksize - 1))
        coefs, shift = _lpc_fit(enc, order)
        prec = 12
        bw.write(32 + order - 1, 6)
        _write_wasted(bw, wasted)
        for v in enc[:order].tolist():
            bw.write(v & ((1 << eff_bps) - 1), eff_bps)
        bw.write(prec - 1, 4)
        bw.write_signed(shift, 5)
        for c in coefs:
            bw.write_signed(c, prec)
        _write_residual(
            bw, _lpc_residual(enc, coefs, shift), blocksize, order,
            partition_order, escape_parts=escape_parts,
        )
        return
    raise ValueError(f"unknown subframe mode {mode}")


def _write_wasted(bw: BitWriter, wasted: int) -> None:
    if wasted:
        bw.write(1, 1)
        bw.write_unary(wasted - 1)
    else:
        bw.write(0, 1)


def encode_flac(
    samples: np.ndarray,
    sample_rate: int,
    *,
    bps: int = 16,
    block_size: int = 4096,
    stereo_mode: str = "auto",
    subframe_mode: str = "auto",
    lpc_order: int = 8,
    partition_order: int = 0,
    use_wasted: bool = True,
    escape_parts: set[int] | None = None,
    write_md5: bool = True,
    tags: dict[str, str] | None = None,
) -> bytes:
    """Spec-valid FLAC stream for int PCM ``samples`` ([n] mono or
    [n, channels]); lossless by construction (decoder roundtrip is the
    equality test, and the STREAMINFO MD5 re-proves it on decode)."""
    samples = np.asarray(samples)
    if samples.ndim == 1:
        samples = samples[:, None]
    n, nch = samples.shape
    if not 1 <= nch <= 8:
        raise ValueError("1-8 channels")
    lo, hi = -(1 << (bps - 1)), (1 << (bps - 1)) - 1
    if samples.min() < lo or samples.max() > hi:
        raise ValueError("samples out of range for bps")

    # STREAMINFO
    si = BitWriter()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(nch - 1, 3)
    si.write(bps - 1, 5)
    si.write(n, 36)
    md5 = _pcm_md5(samples, bps) if write_md5 else b"\x00" * 16
    streaminfo = si.getvalue() + md5

    out = bytearray(b"fLaC")
    si_last = 0x00 if tags else 0x80
    out += bytes([si_last]) + len(streaminfo).to_bytes(3, "big") + streaminfo
    if tags:
        vc = build_vorbis_comment(tags)
        out += bytes([0x80 | 4]) + len(vc).to_bytes(3, "big") + vc

    frame_no = 0
    for off in range(0, n, block_size):
        chunk = samples[off : off + block_size]
        out += _encode_frame(
            chunk, frame_no, sample_rate, bps, block_size,
            stereo_mode=stereo_mode, subframe_mode=subframe_mode,
            lpc_order=lpc_order, partition_order=partition_order,
            use_wasted=use_wasted, escape_parts=escape_parts,
        )
        frame_no += 1
    return bytes(out)


def _encode_frame(
    chunk: np.ndarray,
    frame_no: int,
    sample_rate: int,
    bps: int,
    nominal_block: int,
    *,
    stereo_mode: str,
    subframe_mode: str,
    lpc_order: int,
    partition_order: int,
    use_wasted: bool,
    escape_parts: set[int] | None,
) -> bytes:
    blocksize, nch = chunk.shape
    po = partition_order if blocksize % (1 << partition_order) == 0 else 0

    bw = BitWriter()
    bw.write(0b11111111111110, 14)
    bw.write(0, 1)
    bw.write(0, 1)  # fixed blocking strategy

    bs_code = _BLOCKSIZE_CODES.get(blocksize)
    bs_tail: tuple[int, int] | None = None
    if bs_code is None:
        if blocksize <= 256:
            bs_code, bs_tail = 6, (blocksize - 1, 8)
        else:
            bs_code, bs_tail = 7, (blocksize - 1, 16)
    bw.write(bs_code, 4)

    sr_code = _SAMPLE_RATE_CODES.get(sample_rate)
    sr_tail: tuple[int, int] | None = None
    if sr_code is None:
        if sample_rate % 1000 == 0 and sample_rate // 1000 < 256:
            sr_code, sr_tail = 12, (sample_rate // 1000, 8)
        elif sample_rate < 65536:
            sr_code, sr_tail = 13, (sample_rate, 16)
        elif sample_rate % 10 == 0 and sample_rate // 10 < 65536:
            sr_code, sr_tail = 14, (sample_rate // 10, 16)
        else:
            raise ValueError("sample rate not encodable in frame header")
    bw.write(sr_code, 4)

    mode = stereo_mode
    if nch != 2 and mode not in ("auto", "independent"):
        raise ValueError("stereo modes need 2 channels")
    if mode == "auto":
        mode = "mid_side" if nch == 2 else "independent"
    ch_code = {
        "independent": nch - 1, "left_side": 8, "right_side": 9, "mid_side": 10,
    }[mode]
    bw.write(ch_code, 4)

    bw.write(_BPS_CODES[bps], 3)
    bw.write(0, 1)
    for b in encode_coded_number(frame_no):
        bw.write(b, 8)
    if bs_tail:
        bw.write(*bs_tail)
    if sr_tail:
        bw.write(*sr_tail)
    header_bytes = _bw_snapshot(bw)
    bw.write(crc8(header_bytes), 8)

    # subframes
    if mode == "independent":
        subs = [(chunk[:, c].astype(np.int64), bps) for c in range(nch)]
    else:
        l = chunk[:, 0].astype(np.int64)
        r = chunk[:, 1].astype(np.int64)
        side = l - r
        if mode == "left_side":
            subs = [(l, bps), (side, bps + 1)]
        elif mode == "right_side":
            subs = [(side, bps + 1), (r, bps)]
        else:  # mid_side
            mid = (l + r) >> 1
            subs = [(mid, bps), (side, bps + 1)]
    for s, sb in subs:
        _write_subframe(
            bw, s, sb, mode=subframe_mode, lpc_order=lpc_order,
            partition_order=po, use_wasted=use_wasted,
            escape_parts=escape_parts,
        )
    bw.align()
    body = _bw_snapshot(bw)
    bw.write(crc16(body), 16)
    return bw.getvalue()


def _bw_snapshot(bw: BitWriter) -> bytes:
    assert bw._nacc == 0, "snapshot requires byte alignment"
    return bytes(bw._buf)


def is_flac(payload: bytes) -> bool:
    return payload[:4] == b"fLaC"
