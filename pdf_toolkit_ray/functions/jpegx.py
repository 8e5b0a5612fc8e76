"""From-scratch JPEG codec (pure stdlib + numpy).

Decoder: baseline sequential DCT (SOF0) and progressive DCT (SOF2),
8-bit, grayscale or YCbCr with sampling factors up to 2x2 (4:4:4 /
4:2:2 / 4:2:0), restart markers, standard zigzag/dequantize/IDCT
pipeline (ITU T.81). Progressive scans implement full Annex G:
spectral selection plus successive approximation (DC first/refine, AC
first/refine with EOB runs). Arithmetic coding is out of scope and
raises ``NotImplementedError``.

Encoders: minimal baseline writer plus a progressive (SOF2) writer,
both used as the decoder's test twins — 4:4:4 (no subsampling), the
T.81 Annex K example quantization tables scaled by a quality factor,
and the Annex K standard Huffman tables. They share one quantized-
coefficient front half, so baseline and progressive encodings of the
same image must decode pixel-identically.

Everything here is textbook public-domain JPEG structure; no external
codec libraries are involved (the container has no Pillow/libjpeg).
"""

from __future__ import annotations

import struct

import numpy as np

# --- zigzag order (T.81 Figure A.6) ---
ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)

# --- T.81 Annex K.1 example quantization tables ---
QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)
QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

# --- T.81 Annex K.3 standard Huffman tables: (bits[1..16], values) ---
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


# --- DCT basis (orthonormal type-II), used by both encoder and decoder ---
def _dct_matrix() -> np.ndarray:
    k = np.arange(8)
    c = np.sqrt(2.0 / 8.0) * np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16.0)
    c[0, :] = np.sqrt(1.0 / 8.0)
    return c


_DCT = _dct_matrix()


def _idct2(block: np.ndarray) -> np.ndarray:
    return _DCT.T @ block @ _DCT


def _fdct2(block: np.ndarray) -> np.ndarray:
    return _DCT @ block @ _DCT.T


# --------------------------------------------------------------------------
# Huffman machinery


def _build_decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(code_length, code) -> value, canonical ordering (T.81 Annex C)."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    idx = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[idx]
            idx += 1
            code += 1
        code <<= 1
    return table


def _build_encode_table(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """value -> (code, code_length)."""
    enc: dict[int, tuple[int, int]] = {}
    code = 0
    idx = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            enc[vals[idx]] = (code, length)
            idx += 1
            code += 1
        code <<= 1
    return enc


class _BitReader:
    """Entropy-segment bit reader with 0xFF00 unstuffing and RST handling."""

    def __init__(self, data: bytes, start: int):
        self.data = data
        self.pos = start
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        while self.n <= 24:
            if self.pos >= len(self.data):
                self.acc = (self.acc << 8) | 0  # pad past EOI; decoder stops via MCU count
                self.n += 8
                continue
            byte = self.data[self.pos]
            if byte == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:
                    # restart marker consumed by sync_restart(), not here
                    self.acc = (self.acc << 8) | 0
                    self.n += 8
                    continue
                else:  # EOI or next segment: pad
                    self.acc = (self.acc << 8) | 0
                    self.n += 8
                    continue
            else:
                self.pos += 1
            self.acc = ((self.acc << 8) | byte) & 0xFFFFFFFFFF
            self.n += 8

    def read_bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def read_bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.read_bit()
        return v

    def sync_restart(self) -> None:
        """Align to byte boundary and consume one RSTn marker."""
        self.acc = 0
        self.n = 0
        while self.pos + 1 < len(self.data):
            if self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1

    def decode_huff(self, table: dict[tuple[int, int], int]) -> int:
        if table is None:  # scan referenced a DHT id that was never defined
            raise ValueError("scan references an undefined Huffman table")
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            if (length, code) in table:
                return table[(length, code)]
        raise ValueError("invalid Huffman code in JPEG stream")


def _extend(v: int, t: int) -> int:
    """DIFF/coefficient sign extension (T.81 F.2.2.1)."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


# --------------------------------------------------------------------------
# decoder


def decode_jpeg(payload: bytes) -> np.ndarray:
    """JPEG bytes (baseline SOF0 or progressive SOF2) → (H, W, 3) uint8 RGB."""
    if not payload.startswith(b"\xff\xd8"):
        raise ValueError("not a JPEG stream")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    coef_store: dict | None = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            pos += 1
            continue
        marker = payload[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (seg_len,) = struct.unpack_from(">H", payload, pos + 2)
        seg = payload[pos + 4 : pos + 2 + seg_len]
        if marker == 0xDB:  # DQT
            off = 0
            while off < len(seg):
                pq, tq = seg[off] >> 4, seg[off] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables unsupported")
                tbl = np.frombuffer(seg, dtype=np.uint8, count=64, offset=off + 1)
                qt[tq] = tbl.astype(np.int32)
                off += 65
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(seg):
                tc, th = seg[off] >> 4, seg[off] & 0xF
                bits = list(seg[off + 1 : off + 17])
                nvals = sum(bits)
                vals = list(seg[off + 17 : off + 17 + nvals])
                table = _build_decode_table(bits, vals)
                (huff_dc if tc == 0 else huff_ac)[th] = table
                off += 17 + nvals
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            precision, h, w, nc = seg[0], *struct.unpack_from(">HH", seg, 1), seg[5]
            if precision != 8:
                raise NotImplementedError("only 8-bit precision")
            comps = []
            for i in range(nc):
                cid, sampling, tq = seg[6 + 3 * i], seg[7 + 3 * i], seg[8 + 3 * i]
                comps.append({"id": cid, "h": sampling >> 4, "v": sampling & 0xF, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps, "progressive": marker == 0xC2}
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise NotImplementedError(
                "only baseline (SOF0) and progressive (SOF2) JPEG supported"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xD9:  # EOI
            break
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan_comps = []
            for i in range(ns):
                cs, tables = seg[1 + 2 * i], seg[2 + 2 * i]
                matches = [c for c in frame["comps"] if c["id"] == cs]
                if not matches:
                    raise ValueError(f"SOS references unknown component id {cs}")
                comp = matches[0]
                scan_comps.append(
                    {
                        **comp,
                        "dc": huff_dc.get(tables >> 4),
                        "ac": huff_ac.get(tables & 0xF),
                    }
                )
            data_start = pos + 2 + seg_len
            if not frame["progressive"]:
                return _decode_scan(
                    payload, data_start, frame, scan_comps, qt, restart_interval
                )
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            if coef_store is None:
                coef_store = _alloc_coef_store(frame)
            end = _decode_progressive_scan(
                payload,
                data_start,
                frame,
                scan_comps,
                coef_store,
                ss,
                se,
                ahal >> 4,
                ahal & 0xF,
                restart_interval,
            )
            pos = end
            continue
        pos += 2 + seg_len
    if frame is not None and frame.get("progressive") and coef_store is not None:
        return _finish_progressive(frame, coef_store, qt)
    raise ValueError("no SOS segment found")


def _decode_scan(payload, start, frame, comps, qt, restart_interval) -> np.ndarray:
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (w + mcu_w - 1) // mcu_w
    mcus_y = (h + mcu_h - 1) // mcu_h
    planes = {
        c["id"]: np.zeros((mcus_y * c["v"] * 8, mcus_x * c["h"] * 8), dtype=np.float64)
        for c in comps
    }
    reader = _BitReader(payload, start)
    pred = {c["id"]: 0 for c in comps}
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.sync_restart()
                pred = {c["id"]: 0 for c in comps}
            for c in comps:
                q = qt[c["tq"]].astype(np.float64)
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.float64)
                        t = reader.decode_huff(c["dc"])
                        diff = _extend(reader.read_bits(t), t)
                        pred[c["id"]] += diff
                        zz[0] = pred[c["id"]]
                        k = 1
                        while k < 64:
                            rs = reader.decode_huff(c["ac"])
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC run past end of block")
                            zz[k] = _extend(reader.read_bits(s), s)
                            k += 1
                        # zz and the DQT table are both in zigzag order;
                        # dequantize there, then scatter to natural order
                        deq = zz * q
                        nat = np.zeros(64, dtype=np.float64)
                        nat[ZIGZAG] = deq
                        pix = _idct2(nat.reshape(8, 8)) + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[c["id"]][y0 : y0 + 8, x0 : x0 + 8] = pix
            mcu_count += 1
    return _planes_to_rgb(comps, planes, h, w, hmax, vmax)


def _planes_to_rgb(comps, planes, h, w, hmax, vmax) -> np.ndarray:
    """Upsample component planes to full resolution and color-convert."""
    full = []
    for c in comps:
        p = planes[c["id"]]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        g = np.clip(full[0], 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=2), 0, 255).astype(np.uint8)


# --------------------------------------------------------------------------
# progressive (SOF2) decoding — T.81 Annex G: every scan deposits into a
# per-component coefficient buffer (zigzag index space); dequantize + IDCT
# happen once at EOI.


def _alloc_coef_store(frame) -> dict:
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    mcus_x = (frame["w"] + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (frame["h"] + 8 * vmax - 1) // (8 * vmax)
    store = {}
    for c in frame["comps"]:
        store[c["id"]] = np.zeros((mcus_y * c["v"], mcus_x * c["h"], 64), dtype=np.int64)
    store["_mcus"] = (mcus_y, mcus_x)
    store["_max"] = (hmax, vmax)
    return store


def _find_scan_end(payload: bytes, start: int) -> int:
    """Index of the first marker after a scan's entropy data (skips byte
    stuffing 0xFF00 and restart markers)."""
    pos = start
    n = len(payload)
    while pos + 1 < n:
        if payload[pos] == 0xFF:
            nxt = payload[pos + 1]
            if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
                pos += 2
                continue
            return pos
        pos += 1
    return n


def _comp_block_grid(frame, c, store) -> tuple[int, int]:
    """Non-interleaved scans cover the component's OWN sampled block grid
    (T.81 A.2.2), which can be smaller than the padded MCU grid."""
    hmax, vmax = store["_max"]
    cw = -(-frame["w"] * c["h"] // hmax)  # ceil(w * h_i / hmax)
    ch = -(-frame["h"] * c["v"] // vmax)
    return (-(-ch // 8), -(-cw // 8))


def _decode_progressive_scan(
    payload, start, frame, comps, store, ss, se, ah, al, restart_interval
) -> int:
    reader = _BitReader(payload, start)
    if ss == 0:  # DC scan (interleaved over MCUs when ns > 1)
        if se != 0:
            raise ValueError("DC progressive scan must have Se=0")
        _decode_dc_scan(reader, frame, comps, store, ah, al, restart_interval)
    else:  # AC scan: always single-component, non-interleaved
        if len(comps) != 1:
            raise ValueError("progressive AC scan must be single-component")
        _decode_ac_scan(reader, frame, comps[0], store, ss, se, ah, al, restart_interval)
    return _find_scan_end(payload, start)


def _decode_dc_scan(reader, frame, comps, store, ah, al, restart_interval) -> None:
    mcus_y, mcus_x = store["_mcus"]
    pred = {c["id"]: 0 for c in comps}
    if len(comps) == 1:
        c = comps[0]
        rows, cols = _comp_block_grid(frame, c, store)
        units = [(c, by, bx) for by in range(rows) for bx in range(cols)]
        groups = [[u] for u in units]  # one block per restart unit
    else:
        groups = []
        for my in range(mcus_y):
            for mx in range(mcus_x):
                g = []
                for c in comps:
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            g.append((c, my * c["v"] + by, mx * c["h"] + bx))
                groups.append(g)
    count = 0
    for g in groups:
        if restart_interval and count and count % restart_interval == 0:
            reader.sync_restart()
            pred = {c["id"]: 0 for c in comps}
        for c, by, bx in g:
            coef = store[c["id"]]
            if ah == 0:  # first scan: Huffman diff of (DC >> Al)
                t = reader.decode_huff(c["dc"])
                diff = _extend(reader.read_bits(t), t)
                pred[c["id"]] += diff
                coef[by, bx, 0] = pred[c["id"]] << al
            else:  # refinement: one raw bit appends precision (G.1.2.1)
                if reader.read_bit():
                    coef[by, bx, 0] |= 1 << al
        count += 1


def _decode_ac_scan(reader, frame, c, store, ss, se, ah, al, restart_interval) -> None:
    coef = store[c["id"]]
    rows, cols = _comp_block_grid(frame, c, store)
    eobrun = 0
    count = 0
    for by in range(rows):
        for bx in range(cols):
            if restart_interval and count and count % restart_interval == 0:
                reader.sync_restart()
                eobrun = 0
            if ah == 0:
                eobrun = _ac_first_block(reader, c["ac"], coef[by, bx], ss, se, al, eobrun)
            else:
                eobrun = _ac_refine_block(reader, c["ac"], coef[by, bx], ss, se, al, eobrun)
            count += 1


def _ac_first_block(reader, ac_table, blk, ss, se, al, eobrun) -> int:
    """T.81 G.1.2.2: spectral band [ss..se], magnitudes shifted by Al."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = reader.decode_huff(ac_table)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:  # ZRL: skip 16 zeros
                k += 16
                continue
            return (1 << r) + reader.read_bits(r) - 1  # EOBn: this block done
        k += r
        if k > se:
            raise ValueError("AC run past end of band")
        blk[k] = _extend(reader.read_bits(s), s) << al
        k += 1
    return 0


def _ac_refine_block(reader, ac_table, blk, ss, se, al, eobrun) -> int:
    """T.81 G.1.2.3: correction bits for already-nonzero coefficients,
    sign-coded newly-significant ones, EOB absorbs the band remainder."""
    p1 = 1 << al
    m1 = -1 << al

    def correct(k: int) -> None:
        if reader.read_bit():
            if (blk[k] & p1) == 0:
                blk[k] += p1 if blk[k] >= 0 else m1

    k = ss
    if eobrun == 0:
        while k <= se:
            rs = reader.decode_huff(ac_table)
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r < 15:
                    eobrun = (1 << r) + reader.read_bits(r)  # this block included
                    break
                # ZRL: advance past 16 ZERO-HISTORY positions, refining
                # nonzero ones on the way
            elif s == 1:
                newval = p1 if reader.read_bit() else m1
            else:
                raise ValueError("AC refinement magnitude must be 1")
            while k <= se:
                if blk[k] != 0:
                    correct(k)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if s == 1 and k <= se:
                blk[k] = newval
            k += 1
    if eobrun > 0:
        while k <= se:  # EOB: refine the remaining nonzero history
            if blk[k] != 0:
                correct(k)
            k += 1
        return eobrun - 1
    return 0


def _finish_progressive(frame, store, qt) -> np.ndarray:
    h, w = frame["h"], frame["w"]
    hmax, vmax = store["_max"]
    planes = {}
    for c in frame["comps"]:
        coef = store[c["id"]]
        rows, cols, _ = coef.shape
        q = qt[c["tq"]].astype(np.float64)
        plane = np.zeros((rows * 8, cols * 8), dtype=np.float64)
        # vectorized finish: dequantize all blocks at once (zigzag space),
        # scatter to natural order, batched IDCT
        deq = coef.reshape(-1, 64).astype(np.float64) * q[None, :]
        nat = np.zeros_like(deq)
        nat[:, ZIGZAG] = deq
        blocks = nat.reshape(-1, 8, 8)
        pix = np.einsum("ij,njk,kl->nil", _DCT.T, blocks, _DCT) + 128.0
        pix = pix.reshape(rows, cols, 8, 8).transpose(0, 2, 1, 3).reshape(rows * 8, cols * 8)
        plane[:, :] = pix
        planes[c["id"]] = plane
    return _planes_to_rgb(frame["comps"], planes, h, w, hmax, vmax)


# --------------------------------------------------------------------------
# encoder (test twin: 4:4:4, quality-scaled Annex K tables)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc = 0
                self.n = 0

    def flush(self) -> None:
        if self.n:
            self.acc = (self.acc << (8 - self.n)) | ((1 << (8 - self.n)) - 1)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.n = 0


def _quality_scale(q: np.ndarray, quality: int) -> np.ndarray:
    quality = max(1, min(100, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    t = np.clip((q * scale + 50) // 100, 1, 255)
    return t.astype(np.int32)


def _mag_cat(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _quantized_coefficients(
    img: np.ndarray, quality: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray, int, int]:
    """Shared encoder front half: color-convert, pad, FDCT, quantize.
    Returns (quant[(bh, bw, 3, 64)] zigzag-ordered int64, q_l, q_c, bh, bw)
    so the baseline and progressive writers emit the SAME coefficients —
    their decodes must therefore be pixel-identical."""
    h, w, _ = img.shape
    rgb = img.astype(np.float64)
    y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
    cb = -0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] + 0.5 * rgb[..., 2] + 128.0
    cr = 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] - 0.081312 * rgb[..., 2] + 128.0
    # quality-scaled tables in NATURAL order, then permuted to zigzag: the
    # coefficient stream is zigzag-ordered, so index k must divide by
    # q[ZIGZAG[k]], and DQT bytes are zigzag-ordered per T.81 B.2.4.1 —
    # this way the effective matrix really is the Annex K table, not a
    # permutation of it
    q_l = _quality_scale(QT_LUMA, quality)[ZIGZAG]
    q_c = _quality_scale(QT_CHROMA, quality)[ZIGZAG]
    bh, bwid = (h + 7) // 8, (w + 7) // 8
    quant = np.zeros((bh, bwid, 3, 64), dtype=np.int64)
    for ci, plane in enumerate((y, cb, cr)):
        p = np.empty((bh * 8, bwid * 8), dtype=np.float64)
        p[:h, :w] = plane
        p[h:, :w] = plane[h - 1 : h, :]
        p[:, w:] = p[:, w - 1 : w]
        q = q_l if ci == 0 else q_c
        for by in range(bh):
            for bx in range(bwid):
                block = p[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
                zz = _fdct2(block).reshape(-1)[ZIGZAG]
                quant[by, bx, ci] = np.round(zz / q.astype(np.float64)).astype(np.int64)
    return quant, q_l, q_c, bh, bwid


#: per-component (h, v) sampling factors by mode
_SUBSAMPLING = {
    "444": [(1, 1), (1, 1), (1, 1)],
    "422": [(2, 1), (1, 1), (1, 1)],
    "420": [(2, 2), (1, 1), (1, 1)],
}


def _quantized_comp_blocks(img: np.ndarray, quality: int, mode: str):
    """Generic (subsampling-aware) encoder front half. Returns
    (comps, q_l, q_c, mcus_y, mcus_x) where each comp dict holds the
    MCU-padded quantized block array ``arr[(v·mcus_y, h·mcus_x, 64)]``
    (zigzag order), its sampling factors and its OWN block grid
    (rows, cols) — the grid progressive AC scans cover (T.81 A.2.2),
    which is smaller than the padded array for subsampled frames."""
    factors = _SUBSAMPLING[mode]
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    h, w, _ = img.shape
    rgb = img.astype(np.float64)
    planes = [
        0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2],
        -0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] + 0.5 * rgb[..., 2] + 128.0,
        0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] - 0.081312 * rgb[..., 2] + 128.0,
    ]
    q_l = _quality_scale(QT_LUMA, quality)[ZIGZAG]
    q_c = _quality_scale(QT_CHROMA, quality)[ZIGZAG]
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    # edge-replicate to the MCU-aligned full-resolution grid once
    fh, fw = mcus_y * vmax * 8, mcus_x * hmax * 8
    comps = []
    for ci, (plane, (fx, fv)) in enumerate(zip(planes, factors)):
        p = np.empty((fh, fw), dtype=np.float64)
        p[:h, :w] = plane
        p[h:, :w] = plane[h - 1 : h, :]
        p[:, w:] = p[:, w - 1 : w]
        ry, rx = vmax // fv, hmax // fx
        if ry > 1 or rx > 1:  # box-mean downsample (the 4:2:0 chroma path)
            p = p.reshape(fh // ry, ry, fw // rx, rx).mean(axis=(1, 3))
        rows_pad, cols_pad = mcus_y * fv, mcus_x * fx
        q = (q_l if ci == 0 else q_c).astype(np.float64)
        arr = np.zeros((rows_pad, cols_pad, 64), dtype=np.int64)
        for by in range(rows_pad):
            for bx in range(cols_pad):
                block = p[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
                zz = _fdct2(block).reshape(-1)[ZIGZAG]
                arr[by, bx] = np.round(zz / q).astype(np.int64)
        comp_h = -(-h * fv // vmax)  # ceil(h * v_i / vmax)
        comp_w = -(-w * fx // hmax)
        comps.append(
            {
                "arr": arr,
                "h": fx,
                "v": fv,
                "rows": -(-comp_h // 8),
                "cols": -(-comp_w // 8),
            }
        )
    return comps, q_l, q_c, mcus_y, mcus_x


def _encode_baseline_entropy(comps, enc_dc, enc_ac, mcus_y: int, mcus_x: int) -> bytes:
    """Interleaved baseline scan over the MCU grid (general sampling)."""
    bw = _BitWriter()
    pred = [0, 0, 0]
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci, c in enumerate(comps):
                t_idx = 0 if ci == 0 else 1
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        quant = c["arr"][my * c["v"] + by, mx * c["h"] + bx]
                        diff = int(quant[0]) - pred[ci]
                        pred[ci] = int(quant[0])
                        t = _mag_cat(diff)
                        code, ln = enc_dc[t_idx][t]
                        bw.write(code, ln)
                        if t:
                            bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
                        run = 0
                        for k in range(1, 64):
                            v = int(quant[k])
                            if v == 0:
                                run += 1
                                continue
                            while run > 15:
                                code, ln = enc_ac[t_idx][0xF0]
                                bw.write(code, ln)
                                run -= 16
                            s = _mag_cat(v)
                            code, ln = enc_ac[t_idx][(run << 4) | s]
                            bw.write(code, ln)
                            bw.write(v if v >= 0 else v + (1 << s) - 1, s)
                            run = 0
                        if run:
                            code, ln = enc_ac[t_idx][0x00]
                            bw.write(code, ln)
    bw.flush()
    return bytes(bw.out)


def encode_jpeg(img: np.ndarray, quality: int = 90, subsampling: str = "444") -> bytes:
    """(H, W, 3) uint8 RGB → baseline JFIF bytes (4:4:4 or 4:2:0)."""
    if subsampling != "444":
        return _encode_jpeg_general(img, quality, subsampling)
    h, w, _ = img.shape
    quant_all, q_l, q_c, bh, bwid = _quantized_coefficients(img, quality)
    enc_dc = [_build_encode_table(DC_LUMA_BITS, DC_LUMA_VALS),
              _build_encode_table(DC_CHROMA_BITS, DC_CHROMA_VALS)]
    enc_ac = [_build_encode_table(AC_LUMA_BITS, AC_LUMA_VALS),
              _build_encode_table(AC_CHROMA_BITS, AC_CHROMA_VALS)]

    bw = _BitWriter()
    pred = [0, 0, 0]
    for by in range(bh):
        for bx in range(bwid):
            for ci in range(3):
                t_idx = 0 if ci == 0 else 1
                quant = quant_all[by, bx, ci]
                diff = int(quant[0]) - pred[ci]
                pred[ci] = int(quant[0])
                t = _mag_cat(diff)
                code, ln = enc_dc[t_idx][t]
                bw.write(code, ln)
                if t:
                    bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
                run = 0
                for k in range(1, 64):
                    v = int(quant[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = enc_ac[t_idx][0xF0]
                        bw.write(code, ln)
                        run -= 16
                    s = _mag_cat(v)
                    code, ln = enc_ac[t_idx][(run << 4) | s]
                    bw.write(code, ln)
                    bw.write(v if v >= 0 else v + (1 << s) - 1, s)
                    run = 0
                if run:
                    code, ln = enc_ac[t_idx][0x00]
                    bw.write(code, ln)
    bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    def dqt(tq: int, tbl: np.ndarray) -> bytes:
        return seg(0xDB, bytes([tq]) + bytes(int(v) for v in tbl))

    def dht(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
        return seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))

    sof = seg(0xC0, struct.pack(">BHHB", 8, h, w, 3)
              + bytes([1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1]))
    sos = seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    jfif = seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    return (
        b"\xff\xd8" + jfif + dqt(0, q_l) + dqt(1, q_c)
        + dht(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
        + dht(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
        + dht(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
        + dht(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)
        + sof + sos + bytes(bw.out) + b"\xff\xd9"
    )


# --------------------------------------------------------------------------
# progressive encoder (test twin for the SOF2 decoder): same quantized
# coefficients as encode_jpeg, emitted as a DC-first + DC-refine +
# per-component spectral-selection AC-first + AC-refine scan script, so
# decode(encode_jpeg_progressive(x)) must equal decode(encode_jpeg(x))
# pixel-for-pixel — every Annex G scan type is exercised.


def _seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body


def _jfif_header(h: int, w: int, comps, q_l, q_c, sof_marker: int) -> bytes:
    """SOI..SOF prefix shared by the general (subsampling-aware) writers."""

    def dqt(tq: int, tbl: np.ndarray) -> bytes:
        return _seg(0xDB, bytes([tq]) + bytes(int(v) for v in tbl))

    def dht(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
        return _seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))

    sof_comps = b"".join(
        bytes([cid, (c["h"] << 4) | c["v"], 0 if ci == 0 else 1])
        for ci, (cid, c) in enumerate(zip((1, 2, 3), comps))
    )
    return (
        b"\xff\xd8"
        + _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
        + dqt(0, q_l) + dqt(1, q_c)
        + dht(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
        + dht(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
        + dht(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
        + dht(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)
        + _seg(sof_marker, struct.pack(">BHHB", 8, h, w, 3) + sof_comps)
    )


def _encode_jpeg_general(img: np.ndarray, quality: int, subsampling: str) -> bytes:
    """Baseline writer for subsampled modes (4:2:0): interleaved MCUs of
    v×h blocks per component — the twin for the decoder's sampling-factor
    upsampling path."""
    h, w, _ = img.shape
    comps, q_l, q_c, mcus_y, mcus_x = _quantized_comp_blocks(img, quality, subsampling)
    enc_dc = [_build_encode_table(DC_LUMA_BITS, DC_LUMA_VALS),
              _build_encode_table(DC_CHROMA_BITS, DC_CHROMA_VALS)]
    enc_ac = [_build_encode_table(AC_LUMA_BITS, AC_LUMA_VALS),
              _build_encode_table(AC_CHROMA_BITS, AC_CHROMA_VALS)]
    entropy = _encode_baseline_entropy(comps, enc_dc, enc_ac, mcus_y, mcus_x)
    sos = _seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    return _jfif_header(h, w, comps, q_l, q_c, 0xC0) + sos + entropy + b"\xff\xd9"


def _sos_header(comps: list[tuple[int, int]], ss: int, se: int, ah: int, al: int) -> bytes:
    body = bytes([len(comps)])
    for cid, tables in comps:
        body += bytes([cid, tables])
    return _seg(0xDA, body + bytes([ss, se, (ah << 4) | al]))


def _mcu_block_iter(comps, mcus_y: int, mcus_x: int):
    """(ci, comp, block_row, block_col) in interleaved MCU order."""
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci, c in enumerate(comps):
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        yield ci, c, my * c["v"] + by, mx * c["h"] + bx


def _encode_dc_first(comps, mcus_y, mcus_x, enc_dc, al: int) -> bytes:
    w = _BitWriter()
    pred = [0, 0, 0]
    for ci, c, by, bx in _mcu_block_iter(comps, mcus_y, mcus_x):
        t_idx = 0 if ci == 0 else 1
        v = int(c["arr"][by, bx, 0]) >> al  # arithmetic shift (G.1.2.1)
        diff = v - pred[ci]
        pred[ci] = v
        t = _mag_cat(diff)
        code, ln = enc_dc[t_idx][t]
        w.write(code, ln)
        if t:
            w.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    w.flush()
    return bytes(w.out)


def _encode_dc_refine(comps, mcus_y, mcus_x, al: int) -> bytes:
    w = _BitWriter()
    for _ci, c, by, bx in _mcu_block_iter(comps, mcus_y, mcus_x):
        w.write((int(c["arr"][by, bx, 0]) >> al) & 1, 1)
    w.flush()
    return bytes(w.out)


def _encode_ac_first(arr, rows, cols, enc_ac, ss: int, se: int, al: int) -> bytes:
    """Per-block explicit EOB (no cross-block EOBRUN — correct, just less
    compact; the decoder handles both). ``rows``/``cols`` is the
    component's OWN block grid — progressive AC scans never cover the
    MCU padding blocks (T.81 A.2.2)."""
    w = _BitWriter()
    for by in range(rows):
        for bx in range(cols):
            blk = arr[by, bx]
            run = 0
            for k in range(ss, se + 1):
                v = int(blk[k])
                v = (abs(v) >> al) * (1 if v >= 0 else -1)  # point transform
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = enc_ac[0xF0]
                    w.write(code, ln)
                    run -= 16
                s = _mag_cat(v)
                code, ln = enc_ac[(run << 4) | s]
                w.write(code, ln)
                w.write(v if v >= 0 else v + (1 << s) - 1, s)
                run = 0
            if run:
                code, ln = enc_ac[0x00]  # EOB0: just this block
                w.write(code, ln)
    w.flush()
    return bytes(w.out)


def _encode_ac_refine(arr, rows, cols, enc_ac, ss: int, se: int, al: int) -> bytes:
    """Mirror of the G.1.2.3 decoder: correction bits buffer after each
    newly-significant coefficient / ZRL / EOB emission."""
    w = _BitWriter()
    for by in range(rows):
        for bx in range(cols):
            blk = arr[by, bx]
            br: list[int] = []

            def flush_br() -> None:
                for b in br:
                    w.write(b, 1)
                br.clear()

            run = 0
            for k in range(ss, se + 1):
                v = int(blk[k])
                a = abs(v) >> al
                if a == 0:
                    run += 1
                    continue
                if a > 1:  # already significant at this precision
                    br.append(a & 1)
                    continue
                # newly significant (|v| >> al == 1)
                while run > 15:
                    code, ln = enc_ac[0xF0]
                    w.write(code, ln)
                    flush_br()
                    run -= 16
                code, ln = enc_ac[(run << 4) | 1]
                w.write(code, ln)
                w.write(1 if v > 0 else 0, 1)
                flush_br()
                run = 0
            if run or br:
                code, ln = enc_ac[0x00]  # EOB0 absorbs the band remainder
                w.write(code, ln)
                flush_br()
    w.flush()
    return bytes(w.out)


def encode_jpeg_progressive(
    img: np.ndarray, quality: int = 90, subsampling: str = "444"
) -> bytes:
    """(H, W, 3) uint8 RGB → progressive (SOF2) JFIF bytes (4:4:4 or 4:2:0).

    Scan script (exercises all four Annex G scan types):
      1. DC first, interleaved, Al=1     4-9. AC first Ss 1-5 / 6-63, Al=1
      2. DC refine, Al=0                 (per component)
      3+. AC refine Ss 1-5 / 6-63, Al=0 (per component)

    AC scans cover each component's OWN block grid (never the MCU
    padding), DC scans the full interleaved MCU grid — the same split
    the decoder's `_comp_block_grid` implements."""
    h, w, _ = img.shape
    comps, q_l, q_c, mcus_y, mcus_x = _quantized_comp_blocks(img, quality, subsampling)
    enc_dc = [_build_encode_table(DC_LUMA_BITS, DC_LUMA_VALS),
              _build_encode_table(DC_CHROMA_BITS, DC_CHROMA_VALS)]
    enc_ac = [_build_encode_table(AC_LUMA_BITS, AC_LUMA_VALS),
              _build_encode_table(AC_CHROMA_BITS, AC_CHROMA_VALS)]

    out = bytearray(_jfif_header(h, w, comps, q_l, q_c, 0xC2))
    # 1. DC first (interleaved, successive approximation Al=1)
    out += _sos_header([(1, 0x00), (2, 0x10), (3, 0x10)], 0, 0, 0, 1)
    out += _encode_dc_first(comps, mcus_y, mcus_x, enc_dc, al=1)
    # 2. DC refine to full precision
    out += _sos_header([(1, 0x00), (2, 0x00), (3, 0x00)], 0, 0, 1, 0)
    out += _encode_dc_refine(comps, mcus_y, mcus_x, al=0)
    # 3. AC scans per component: two spectral bands, first then refine
    for ci, cid in enumerate((1, 2, 3)):
        t = 0 if ci == 0 else 1
        c = comps[ci]
        for ss, se in ((1, 5), (6, 63)):
            out += _sos_header([(cid, t << 4 | t)], ss, se, 0, 1)
            out += _encode_ac_first(c["arr"], c["rows"], c["cols"], enc_ac[t], ss, se, al=1)
    for ci, cid in enumerate((1, 2, 3)):
        t = 0 if ci == 0 else 1
        c = comps[ci]
        for ss, se in ((1, 5), (6, 63)):
            out += _sos_header([(cid, t << 4 | t)], ss, se, 1, 0)
            out += _encode_ac_refine(c["arr"], c["rows"], c["cols"], enc_ac[t], ss, se, al=0)
    out += b"\xff\xd9"
    return bytes(out)
