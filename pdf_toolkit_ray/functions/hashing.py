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


_MASK32 = np.uint64(0xFFFFFFFF)
_MASK29 = np.uint64((1 << 29) - 1)
_MASK61 = np.uint64((1 << 61) - 1)
_U8 = np.uint64(8)


def _mulmod61(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Exact (a*b) mod (2^61-1) in vectorized uint64 arithmetic.

    Standard Mersenne folding with 32-bit operand splitting: with
    p = 2^61-1 we have 2^61 ≡ 1 and 2^64 ≡ 8 (mod p), so the four
    32×32-bit partial products reduce without ever needing a 128-bit
    intermediate. Operands must already be < 2^61.
    """
    ah, al = a >> np.uint64(32), a & _MASK32
    bh, bl = b >> np.uint64(32), b & _MASK32
    # high·high contributes 2^64 ≡ 8
    t1 = ah * bh * _U8  # < 2^58·8 = 2^61
    # cross terms contribute 2^32; reduce the < 2^62 sum first, then use
    # m·2^32 = (m>>29)·2^61 + (m&mask29)·2^32 ≡ (m>>29) + (m&mask29)<<32
    mid = ah * bl + al * bh
    mid = (mid & _MASK61) + (mid >> np.uint64(61))
    t2 = (mid >> np.uint64(29)) + ((mid & _MASK29) << np.uint64(32))
    # low·low < 2^64: fold the top 3 bits (2^61 ≡ 1)
    t3 = al * bl
    s = t1 + t2 + (t3 & _MASK61) + (t3 >> np.uint64(61))  # < 4·2^61 < 2^63
    s = (s & _MASK61) + (s >> np.uint64(61))
    return np.where(s >= _MASK61, s - _MASK61, s)


def _mod61(x: np.ndarray) -> np.ndarray:
    """x mod (2^61-1) for uint64 input (two folds suffice)."""
    s = (x & _MASK61) + (x >> np.uint64(61))
    return np.where(s >= _MASK61, s - _MASK61, s)


_SM_C1 = np.uint64(0xBF58476D1CE4E5B9)
_SM_C2 = np.uint64(0x94D049BB133111EB)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """SplitMix64 finalizer (Steele/Lea/Flood '14) — vectorized uint64 mix."""
    z = x + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * _SM_C1
    z = (z ^ (z >> np.uint64(27))) * _SM_C2
    return z ^ (z >> np.uint64(31))


_SHINGLE_C = (np.uint64(0x9E3779B97F4A7C15), np.uint64(0xC2B2AE3D27D4EB4F),
              np.uint64(0x165667B19E3779F9))


_WORD_CACHE_CAP = 1_000_000  # ~100 MB worst case per worker, then reset


class _WordHashCache(dict):
    """word -> uint64 blake2b hash, computed once per distinct word.
    Bounded: a high-vocabulary corpus (random tokens) streaming through a
    long-lived worker must not accrete unbounded state."""

    def __missing__(self, word: str) -> int:
        if len(self) >= _WORD_CACHE_CAP:
            self.clear()
        h = int.from_bytes(hashlib.blake2b(word.encode("utf-8"), digest_size=8).digest(), "big")
        self[word] = h
        return h


def _shingle_hashes_batch(
    texts: list[str], n: int, cache: _WordHashCache
) -> tuple[np.ndarray, np.ndarray]:
    """All word-n-gram shingle hashes for a batch of texts.

    Returns (flat uint64 shingle hashes, int64 doc start offsets of length
    len(texts)+1). Word hashing is cached per distinct word; shingle
    combination is vectorized (position-weighted word hashes + SplitMix64
    finalizer), so per-doc cost is the tokenizer plus O(words) numpy work.
    """
    per_doc: list[np.ndarray] = []
    for text in texts:
        words = (text or "").split()
        wh = np.fromiter((cache[w] for w in words), dtype=np.uint64, count=len(words))
        if len(words) < n:
            # degenerate doc: a single shingle over all words (empty ->
            # constant); exact Python ints avoid numpy scalar-overflow
            # warnings, wrapping mod 2^64 like the vectorized branch
            acc = 0
            for i, h in enumerate(wh):
                acc = (acc + int(h) * int(_SHINGLE_C[i % n])) & 0xFFFFFFFFFFFFFFFF
            per_doc.append(_splitmix64(np.array([acc], dtype=np.uint64)))
        else:
            with np.errstate(over="ignore"):
                acc = wh[: len(wh) - n + 1] * _SHINGLE_C[0]
                for j in range(1, n):
                    acc = acc + wh[j : len(wh) - n + 1 + j] * _SHINGLE_C[j]
                per_doc.append(_splitmix64(acc))
    offsets = np.zeros(len(texts) + 1, dtype=np.int64)
    np.cumsum([len(d) for d in per_doc], out=offsets[1:])
    flat = np.concatenate(per_doc) if per_doc else np.empty(0, dtype=np.uint64)
    return flat, offsets


def _shingle_consts(n: int) -> np.ndarray:
    """n odd position-weight multipliers (SplitMix64 of the position,
    forced odd so every weight is invertible mod 2^64)."""
    return _splitmix64(np.arange(1, n + 1, dtype=np.uint64)) | np.uint64(1)


def shingle_hashes_pos(words: list[str], n: int, cache: _WordHashCache) -> np.ndarray:
    """Positional word-n-gram hashes: out[i] hashes words[i:i+n] (empty
    when len(words) < n, unlike ``_shingle_hashes_batch`` which emits a
    degenerate whole-doc shingle). Position i aligns with token i, which
    span-level ops (duplicated-span removal) rely on."""
    if len(words) < n:
        return np.empty(0, dtype=np.uint64)
    wh = np.fromiter((cache[w] for w in words), dtype=np.uint64, count=len(words))
    cs = _shingle_consts(n)
    with np.errstate(over="ignore"):
        acc = wh[: len(wh) - n + 1] * cs[0]
        for j in range(1, n):
            acc = acc + wh[j : len(wh) - n + 1 + j] * cs[j]
    return _splitmix64(acc)


class MinHasher:
    """Warmed MinHash state (permutation coefficients computed once) —
    use as actor-held state in map_batches stages.

    Row hashes are h_i(x) = (a_i·x + b_i) mod p with p = 2^61-1 computed
    EXACTLY (``_mulmod61``), i.e. the classic 2-universal family (Carter &
    Wegman '79; MinHash per Broder '97), folded to 32 bits.
    """

    def __init__(self, num_perm: int = 64, shingle_n: int = 3, bands: int = 16, seed: int = 1):
        assert num_perm % bands == 0
        rng = np.random.RandomState(seed)
        self.a = _mod61(rng.randint(1, _MERSENNE, size=num_perm, dtype=np.uint64))
        np.maximum(self.a, np.uint64(1), out=self.a)
        self.b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.shingle_n = shingle_n
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self._cache = _WordHashCache()

    def signatures(self, texts: list[str]) -> np.ndarray:
        """(len(texts), num_perm) uint32 signature matrix, fully vectorized."""
        flat, offsets = _shingle_hashes_batch(texts, self.shingle_n, self._cache)
        out = np.empty((len(texts), self.num_perm), dtype=np.uint32)
        if len(flat) == 0:
            return out
        x = _mod61(flat)
        starts = offsets[:-1]
        with np.errstate(over="ignore"):
            for i in range(self.num_perm):
                v = _mulmod61(np.broadcast_to(self.a[i], x.shape), x) + self.b[i]
                v = _mod61(v)
                out[:, i] = (np.minimum.reduceat(v, starts) & _MASK32).astype(np.uint32)
        return out

    def signature(self, text: str) -> np.ndarray:
        return self.signatures([text])[0]

    def band_key_matrix(self, sigs: np.ndarray) -> np.ndarray:
        """(n, bands) int64 bucket keys: SplitMix64 chain over each band's
        signature slice, salted by band index (integer keys shuffle far
        cheaper than strings)."""
        n = sigs.shape[0]
        keys = np.empty((n, self.bands), dtype=np.int64)
        with np.errstate(over="ignore"):
            for band in range(self.bands):
                chunk = sigs[:, band * self.rows_per_band : (band + 1) * self.rows_per_band]
                acc = np.full(n, np.uint64(band + 1), dtype=np.uint64)
                for col in range(chunk.shape[1]):
                    acc = _splitmix64(acc ^ chunk[:, col].astype(np.uint64))
                keys[:, band] = acc.view(np.int64)
        return keys

    def band_keys(self, sig: np.ndarray) -> list[int]:
        return list(self.band_key_matrix(sig.reshape(1, -1))[0])


def minhash_signature(
    text: str, num_perm: int = 64, shingle_n: int = 3, seed: int = 1
) -> np.ndarray:
    """MinHash signature (uint32[num_perm]) of one text — convenience
    wrapper over the vectorized ``MinHasher.signatures``."""
    return MinHasher(num_perm=num_perm, shingle_n=shingle_n, bands=num_perm, seed=seed).signature(text)


class _Md5WordCache(dict):
    """word -> top 64 bits of md5 (matches DuckDB ``md5`` hex arithmetic);
    bounded like :class:`_WordHashCache`."""

    def __missing__(self, word: str) -> int:
        if len(self) >= _WORD_CACHE_CAP:
            self.clear()
        h = int(hashlib.md5(word.encode("utf-8")).hexdigest()[:16], 16)
        self[word] = h
        return h


_SIM_CACHE = _Md5WordCache()
_BIT_SHIFTS = np.arange(64, dtype=np.uint64)


_SIMHASH_WORD_BUDGET = 200_000  # contribution matrix ≤ ~50 MB per slice


def _simhash_slice(per_doc: list[np.ndarray]) -> np.ndarray:
    """Signatures for a slice of non-empty docs (word-hash arrays)."""
    flat = np.concatenate(per_doc)
    contrib = (
        ((flat[:, None] >> _BIT_SHIFTS[None, :]) & np.uint64(1))
        .astype(np.int32) * 2 - 1
    )  # (slice_words, 64) of ±1
    lens = np.fromiter((len(d) for d in per_doc), dtype=np.int64, count=len(per_doc))
    starts = np.zeros(len(per_doc), dtype=np.int64)
    if len(per_doc) > 1:
        np.cumsum(lens[:-1], out=starts[1:])
    sums = np.add.reduceat(contrib, starts, axis=0)
    bits = (sums > 0).astype(np.uint64)
    with np.errstate(over="ignore"):
        return (bits << _BIT_SHIFTS[None, :]).sum(axis=1, dtype=np.uint64)


def simhash64_batch(texts: list[str]) -> np.ndarray:
    """SimHash (Charikar '02) for a whole batch, vectorized: cached md5
    word hashes → ±1 bit-contribution matrix → per-doc per-bit sums via
    ``add.reduceat`` → sign bits packed to int64 (two's complement of the
    uint64 signature). Empty docs hash to 0. Processed in word-budgeted
    slices so the transient contribution matrix stays bounded regardless
    of block size."""
    per_doc: list[np.ndarray] = []
    doc_idx: list[int] = []
    for i, text in enumerate(texts):
        words = (text or "").split()
        if words:
            per_doc.append(
                np.fromiter((_SIM_CACHE[w] for w in words), dtype=np.uint64, count=len(words))
            )
            doc_idx.append(i)
    out = np.zeros(len(texts), dtype=np.int64)
    if not per_doc:
        return out
    sig_parts: list[np.ndarray] = []
    slice_docs: list[np.ndarray] = []
    budget = 0
    for arr in per_doc:
        if slice_docs and budget + len(arr) > _SIMHASH_WORD_BUDGET:
            sig_parts.append(_simhash_slice(slice_docs))
            slice_docs, budget = [], 0
        slice_docs.append(arr)
        budget += len(arr)
    sig_parts.append(_simhash_slice(slice_docs))
    out[np.array(doc_idx, dtype=np.int64)] = np.concatenate(sig_parts).view(np.int64)
    return out


def simhash64(text: str) -> int:
    """64-bit SimHash of one text (uint64 value as a Python int).

    Word hash = top 64 bits of md5 — chosen over blake2b so the whole
    signature has an exact DuckDB twin (``md5`` + hex-digit bit
    arithmetic; see ``SIMHASH_SQL`` in queries.py)."""
    return int(np.int64(simhash64_batch([text])[0]).astype(np.uint64))


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


_FP_BASE = 257


def char_fingerprints(
    text: str, window: int = 8, keep_mod: int = 16
) -> np.ndarray:
    """Winnowing-style fingerprints over CHARACTER windows (Schleimer '03
    shape), exactly SQL-replicable: h_i = Σ_j cp(c_{i+j})·257^(W-1-j) mod
    (2^61-1), keeping h ≡ 0 (mod keep_mod). Vectorized with the exact
    Mersenne modmul; code points via utf-32 decode (no byte ambiguity)."""
    cps = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
    n = len(cps) - window + 1
    if n <= 0:
        return np.empty(0, dtype=np.uint64)
    weights = [pow(_FP_BASE, window - 1 - j, _MERSENNE) for j in range(window)]
    acc = np.zeros(n, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j, w in enumerate(weights):
            term = _mulmod61(np.broadcast_to(np.uint64(w), (n,)), cps[j : j + n])
            acc = _mod61(acc + term)
    return acc[acc % np.uint64(keep_mod) == 0]


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
