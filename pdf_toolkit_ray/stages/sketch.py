"""Mergeable sketches for scale paths the exact operators can't reach.

* :class:`KLL` — a simplified KLL quantile sketch (Karnin–Lang–Liberty,
  PODS 2016): per-level compactors with randomized odd/even discard,
  exact bottom level, mergeable by concatenating levels. The exact
  distributed quantiles in ``queries.token_quantiles_documents`` move a
  value-histogram bounded by DISTINCT-value count — right for integer
  token counts, unbounded for continuous doubles. The sketch caps state
  at O(k log(n/k)) per block regardless of cardinality.
* :func:`bloom_build` / :func:`bloom_might_contain` — a fixed-size
  double-hashed Bloom filter over int64 join keys, built distributed
  (one partial bitmap per batch, OR-merged) and broadcast to pre-filter
  the probe side of a join BEFORE its shuffle. False positives only
  let extra rows into an exact join; no row that should match is ever
  dropped, so results stay exact while shuffle bytes drop by the probe
  side's miss rate.

Determinism: KLL compaction uses a counter-seeded ``np.random.Generator``
per sketch, so a fixed insertion order reproduces bit-identically; the
registry exposes sketches as rows-only ops with error-bound pytests, per
the repo's correctness policy for approximate operators.
"""

from __future__ import annotations

import numpy as np


class KLL:
    """Simplified KLL: level i holds items with implicit weight 2^i.
    ``k`` bounds each compactor; total state is O(k · levels)."""

    def __init__(self, k: int = 200, seed: int = 0):
        self.k = int(k)
        self.levels: list[np.ndarray] = [np.empty(0, dtype=np.float64)]
        self._rng = np.random.default_rng(seed)
        self.n = 0

    def update(self, values: np.ndarray) -> "KLL":
        values = np.asarray(values, dtype=np.float64)
        self.n += len(values)
        self.levels[0] = np.concatenate([self.levels[0], values])
        self._compress()
        return self

    def merge(self, other: "KLL") -> "KLL":
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
        for i, lv in enumerate(other.levels):
            self.levels[i] = np.concatenate([self.levels[i], lv])
        self.n += other.n
        self._compress()
        return self

    def _capacity(self, level: int, n_levels: int) -> int:
        # geometric decay toward higher levels, floor of 8
        c = int(np.ceil(self.k * (2.0 / 3.0) ** (n_levels - 1 - level)))
        return max(8, c)

    def _compress(self) -> None:
        i = 0
        while i < len(self.levels):
            lv = self.levels[i]
            if len(lv) <= self._capacity(i, len(self.levels)):
                i += 1
                continue
            lv = np.sort(lv, kind="stable")
            keep_odd = bool(self._rng.integers(0, 2))
            promoted = lv[1::2] if keep_odd else lv[0::2]
            if i + 1 == len(self.levels):
                self.levels.append(np.empty(0, dtype=np.float64))
            self.levels[i] = np.empty(0, dtype=np.float64)
            self.levels[i + 1] = np.concatenate([self.levels[i + 1], promoted])
            i += 1

    def quantiles(self, qs: list[float]) -> np.ndarray:
        """Weighted-rank quantile estimates over all levels."""
        vals = np.concatenate(self.levels)
        wts = np.concatenate(
            [np.full(len(lv), 1 << i, dtype=np.int64) for i, lv in enumerate(self.levels)]
        )
        order = np.argsort(vals, kind="stable")
        vals, wts = vals[order], wts[order]
        cum = np.cumsum(wts)
        total = cum[-1]
        out = np.empty(len(qs), dtype=np.float64)
        for j, q in enumerate(qs):
            rank = q * total
            out[j] = vals[np.searchsorted(cum, rank, side="left").clip(0, len(vals) - 1)]
        return out

    # -- serialization for the shuffle (one row per sketch) ----------------
    def to_row(self) -> dict:
        return {
            "n": self.n,
            "k": self.k,
            "lens": [len(lv) for lv in self.levels],
            "data": np.concatenate(self.levels),
        }

    @classmethod
    def from_row(cls, row: dict, seed: int = 1) -> "KLL":
        sk = cls(k=int(row["k"]), seed=seed)
        sk.n = int(row["n"])
        data = np.asarray(row["data"], dtype=np.float64)
        lens = list(row["lens"])
        sk.levels = []
        off = 0
        for ln in lens:
            sk.levels.append(data[off : off + int(ln)])
            off += int(ln)
        return sk


# --------------------------------------------------------------------------
# Bloom filter over int64 keys


_B1 = np.uint64(0x9E3779B97F4A7C15)
_B2 = np.uint64(0xC2B2AE3D27D4EB4F)


def _mix(keys: np.ndarray, mult: np.uint64) -> np.ndarray:
    x = keys.astype(np.uint64) * mult
    x ^= x >> np.uint64(33)
    x *= _B2
    x ^= x >> np.uint64(29)
    return x


def bloom_build(keys: np.ndarray, m_bits: int, n_hashes: int = 4) -> np.ndarray:
    """Bitmap (uint8 array of m_bits/8 bytes) with double hashing
    h_i = h1 + i·h2. Deterministic; OR partial bitmaps to merge."""
    bits = np.zeros(m_bits // 8, dtype=np.uint8)
    if len(keys) == 0:
        return bits
    h1 = _mix(np.asarray(keys, dtype=np.int64), _B1)
    h2 = _mix(np.asarray(keys, dtype=np.int64), _B2) | np.uint64(1)
    for i in range(n_hashes):
        idx = (h1 + np.uint64(i) * h2) % np.uint64(m_bits)
        np.bitwise_or.at(bits, (idx >> np.uint64(3)).astype(np.int64),
                         (np.uint8(1) << (idx & np.uint64(7)).astype(np.uint8)))
    return bits


def bloom_might_contain(bits: np.ndarray, keys: np.ndarray, n_hashes: int = 4) -> np.ndarray:
    """Vectorized membership test: False ⇒ definitely absent."""
    m_bits = len(bits) * 8
    if len(keys) == 0:
        return np.zeros(0, dtype=bool)
    h1 = _mix(np.asarray(keys, dtype=np.int64), _B1)
    h2 = _mix(np.asarray(keys, dtype=np.int64), _B2) | np.uint64(1)
    out = np.ones(len(keys), dtype=bool)
    for i in range(n_hashes):
        idx = (h1 + np.uint64(i) * h2) % np.uint64(m_bits)
        got = bits[(idx >> np.uint64(3)).astype(np.int64)] >> (idx & np.uint64(7)).astype(np.uint8)
        out &= (got & 1).astype(bool)
    return out
