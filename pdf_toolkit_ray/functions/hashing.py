"""Content hashing / sketching primitives for dedup at scale.

All deterministic, dependency-free, vectorized with numpy where the
kernel allows. Sketches (MinHash, SimHash) are designed to be computed
per batch inside ``map_batches`` and grouped/merged by a small shuffle
— never pairwise on the driver.
"""

from __future__ import annotations

import hashlib

import numpy as np

_MERSENNE = (1 << 61) - 1
_MAX_HASH = (1 << 32) - 1


def md5_hex(texts: list[str]) -> list[str]:
    """Row-wise md5 hex digests (matches DuckDB ``md5(text)`` exactly)."""
    return [hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts]


def _token_hashes(text: str, n: int = 3) -> np.ndarray:
    """Hashes of word n-gram shingles (uint64)."""
    words = text.split()
    if len(words) < n:
        shingles = [" ".join(words)] if words else [""]
    else:
        shingles = [" ".join(words[i : i + n]) for i in range(len(words) - n + 1)]
    out = np.empty(len(shingles), dtype=np.uint64)
    for i, s in enumerate(shingles):
        out[i] = int.from_bytes(
            hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(), "big"
        )
    return out


def minhash_signature(
    text: str, num_perm: int = 64, shingle_n: int = 3, seed: int = 1
) -> np.ndarray:
    """MinHash signature (uint32[num_perm]) over word-shingle hashes.

    Universal hashing h_i(x) = (a_i * x + b_i) mod p, folded to 32 bits —
    the standard broadcastable formulation (Broder '97).
    """
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    hashes = _token_hashes(text, shingle_n).astype(np.uint64)
    if len(hashes) == 0:
        return np.zeros(num_perm, dtype=np.uint32)
    # (num_perm, n_shingles) without materializing python loops
    vals = (a[:, None] * (hashes[None, :] % _MERSENNE)) % _MERSENNE
    vals = (vals + b[:, None]) % _MERSENNE
    return (vals.min(axis=1) & _MAX_HASH).astype(np.uint32)


class MinHasher:
    """Warmed MinHash state (permutation coefficients computed once) —
    use as actor-held state in map_batches stages."""

    def __init__(self, num_perm: int = 64, shingle_n: int = 3, bands: int = 16, seed: int = 1):
        assert num_perm % bands == 0
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.shingle_n = shingle_n
        self.bands = bands
        self.rows_per_band = num_perm // bands

    def signature(self, text: str) -> np.ndarray:
        hashes = _token_hashes(text, self.shingle_n).astype(np.uint64)
        if len(hashes) == 0:
            return np.zeros(self.num_perm, dtype=np.uint32)
        vals = (self.a[:, None] * (hashes[None, :] % _MERSENNE)) % _MERSENNE
        vals = (vals + self.b[:, None]) % _MERSENNE
        return (vals.min(axis=1) & _MAX_HASH).astype(np.uint32)

    def band_keys(self, sig: np.ndarray) -> list[str]:
        """One stable bucket key per band: '<band>:<hash-of-band-slice>'."""
        keys = []
        for band in range(self.bands):
            chunk = sig[band * self.rows_per_band : (band + 1) * self.rows_per_band]
            digest = hashlib.blake2b(chunk.tobytes(), digest_size=8).hexdigest()
            keys.append(f"{band}:{digest}")
        return keys


def simhash64(text: str) -> int:
    """64-bit SimHash over word features (Charikar '02)."""
    acc = np.zeros(64, dtype=np.int64)
    for word in text.split():
        h = int.from_bytes(
            hashlib.blake2b(word.encode("utf-8"), digest_size=8).digest(), "big"
        )
        bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        acc += np.where(bits.astype(bool), 1, -1)
    out = np.uint64(0)
    for i in range(64):
        if acc[i] > 0:
            out |= np.uint64(1) << np.uint64(i)
    return int(out)


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def rolling_fingerprint(text: str, window: int = 8, keep_mod: int = 16) -> list[int]:
    """Winnowing-style document fingerprint: Rabin-Karp rolling hashes of
    character windows, keeping hashes ≡ 0 (mod keep_mod) (Schleimer '03)."""
    data = text.encode("utf-8")
    if len(data) < window:
        return [int.from_bytes(hashlib.blake2b(data, digest_size=8).digest(), "big") & 0x7FFFFFFFFFFFFFFF] if data else []
    base, mod = 257, (1 << 61) - 1
    power = pow(base, window - 1, mod)
    h = 0
    for byte in data[:window]:
        h = (h * base + byte) % mod
    picks = []
    if h % keep_mod == 0:
        picks.append(h)
    for i in range(window, len(data)):
        h = ((h - data[i - window] * power) * base + data[i]) % mod
        if h % keep_mod == 0:
            picks.append(h)
    return picks


def jaccard_ngrams(a: str, b: str, n: int = 3) -> float:
    """Exact word n-gram Jaccard similarity (the LSH verify step)."""
    sa = set(map(tuple, _ngrams(a, n)))
    sb = set(map(tuple, _ngrams(b, n)))
    if not sa and not sb:
        return 1.0
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


def _ngrams(text: str, n: int) -> list[list[str]]:
    words = text.split()
    if len(words) < n:
        return [words] if words else []
    return [words[i : i + n] for i in range(len(words) - n + 1)]


class HyperLogLog:
    """Minimal HLL sketch (Flajolet et al. '07): mergeable by register max,
    the pattern for distributed approximate distinct counts — one sketch
    per batch inside map_batches, a tiny merge stage after."""

    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add_hashes(self, hashes: np.ndarray) -> None:
        h = hashes.astype(np.uint64)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (h << np.uint64(self.p)) | np.uint64(1 << (self.p - 1))
        # rank = leading zeros of remaining bits + 1
        ranks = np.zeros(len(h), dtype=np.uint8)
        mask = np.uint64(1) << np.uint64(63)
        rest_work = rest.copy()
        rank = 1
        remaining = np.ones(len(h), dtype=bool)
        while remaining.any() and rank <= 64 - self.p + 1:
            is_set = (rest_work & mask) != 0
            newly = remaining & is_set
            ranks[newly] = rank
            remaining &= ~is_set
            rest_work = rest_work << np.uint64(1)
            rank += 1
        ranks[remaining] = 64 - self.p + 1
        np.maximum.at(self.registers, idx, ranks)

    def add_strings(self, values) -> None:
        hashes = np.fromiter(
            (int.from_bytes(hashlib.blake2b(str(v).encode(), digest_size=8).digest(), "big")
             for v in values),
            dtype=np.uint64, count=len(values),
        )
        self.add_hashes(hashes)

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def to_bytes(self) -> bytes:
        return self.registers.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes, p: int = 12) -> "HyperLogLog":
        hll = cls(p)
        hll.registers = np.frombuffer(data, dtype=np.uint8).copy()
        return hll

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        est = alpha * m * m / np.sum(2.0 ** -self.registers.astype(np.float64))
        zeros = int((self.registers == 0).sum())
        if est <= 2.5 * m and zeros:
            est = m * np.log(m / zeros)  # linear counting for small cardinalities
        return float(est)
