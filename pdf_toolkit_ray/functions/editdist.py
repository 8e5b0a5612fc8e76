"""Exact Levenshtein (unit-cost edit) distance, vectorized across a
BATCH of string pairs — the verify kernel for edit-distance near-dup
detection (``stages.dedup.fuzzy_lev_pairs``).

The classic DP has a prefix dependency along the inner axis (the
insertion chain ``dp[j] = min(..., dp[j-1] + 1)``), which normally
forces a scalar double loop.  Substituting ``g[j] = dp[j] - j`` turns
that chain into a running minimum — ``g[j] = min(base[j] - j, g[j-1])``
— which is ``np.minimum.accumulate``.  The result: one Python-level
loop over the LONGEST left string only (≤ key length, e.g. 64), with
every step vectorized across ALL pairs and the full right-string axis.
Behavioral contract: identical to DuckDB ``levenshtein(a, b)`` for any
unicode strings — BOTH operate at UTF-8 BYTE granularity (DuckDB counts
a substituted 2-byte codepoint as 2 edits; verified by a test against
a pure-python reference DP and DuckDB itself)."""

from __future__ import annotations

import numpy as np

__all__ = ["levenshtein_batch", "levenshtein_ref"]


def levenshtein_ref(a_s: str, b_s: str) -> int:
    """Pure-python reference DP over UTF-8 bytes (tests / tiny inputs)."""
    a, b = a_s.encode("utf-8"), b_s.encode("utf-8")
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _encode(strings: list[str], pad: int) -> tuple[np.ndarray, np.ndarray]:
    """(P, Lmax) int16 UTF-8 byte matrix padded with ``pad`` + lengths."""
    raw = [s.encode("utf-8") for s in strings]
    lens = np.fromiter((len(r) for r in raw), dtype=np.int64, count=len(raw))
    width = int(lens.max()) if len(lens) else 0
    mat = np.full((len(strings), max(width, 1)), pad, dtype=np.int16)
    for i, r in enumerate(raw):
        if r:
            mat[i, : len(r)] = np.frombuffer(r, dtype=np.uint8)
    return mat, lens


def levenshtein_batch(left: list[str], right: list[str]) -> np.ndarray:
    """Exact edit distances for P pairs, returned as int64[P].

    Pads both sides with two DISTINCT out-of-range sentinels so padded
    positions always cost 1; correctness comes from reading each pair's
    answer at its own true (len_a, len_b) corner, captured the moment the
    row index passes len_a — rows computed past a pair's corner never
    feed back into its recorded answer."""
    assert len(left) == len(right)
    n_pairs = len(left)
    out = np.zeros(n_pairs, dtype=np.int64)
    if n_pairs == 0:
        return out
    a_mat, a_len = _encode([s or "" for s in left], pad=-1)
    b_mat, b_len = _encode([s or "" for s in right], pad=-2)
    max_a = int(a_len.max())
    width = b_mat.shape[1]
    # dp row 0: distance from empty prefix of a = j insertions
    dp = np.broadcast_to(np.arange(width + 1, dtype=np.int64), (n_pairs, width + 1)).copy()
    done = a_len == 0
    out[done] = b_len[done]
    j_idx = np.arange(width + 1, dtype=np.int64)
    for i in range(1, max_a + 1):
        cost = (a_mat[:, i - 1 : i] != b_mat).astype(np.int64)  # (P, width)
        base = np.empty_like(dp)
        base[:, 0] = i
        np.minimum(dp[:, 1:] + 1, dp[:, :-1] + cost, out=base[:, 1:])
        # insertion chain: dp_new[j] = min(base[j], dp_new[j-1] + 1)
        dp = np.minimum.accumulate(base - j_idx, axis=1) + j_idx
        hit = a_len == i
        if hit.any():
            out[hit] = dp[hit, b_len[hit]]
    return out
