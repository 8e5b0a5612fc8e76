"""Pure per-conversation kernels for the training-example assembly ops
(`sft_spans` / `context_window` / `conv_chunk_budget` in queries.py).

Each kernel takes the already-ordered arrays of ONE conversation and is
deliberately free of Arrow/Ray so the hypothesis suite can hammer it
against step-by-step python references (tests/test_conv_assembly.py)."""

from __future__ import annotations

import numpy as np


def greedy_chunk_ids(tk: np.ndarray, budget: int) -> np.ndarray:
    """Greedy budget chunking of one conversation: walk turns in order,
    open a new chunk whenever adding the next turn would push the running
    token count over ``budget``; an oversize single turn gets a chunk of
    its own. Loops once per CHUNK (searchsorted over the cumulative
    sums), never per turn."""
    n = len(tk)
    chunk = np.empty(n, np.int64)
    if n == 0:
        return chunk
    cum = np.cumsum(tk)
    pos, cid, base = 0, 0, 0
    while pos < n:
        hi = int(np.searchsorted(cum[pos:], base + budget, side="right")) + pos
        end = max(hi, pos + 1)  # oversize turn advances by one on its own
        chunk[pos:end] = cid
        cid += 1
        base = int(cum[end - 1])
        pos = end
    return chunk


def suffix_keep(tk: np.ndarray, budget: int) -> tuple[np.ndarray, np.ndarray]:
    """Context-window rule over one conversation ordered NEWEST FIRST:
    returns (keep mask, running suffix token sums). A turn survives while
    the suffix sum fits the budget; the newest turn always survives."""
    n = len(tk)
    suffix = np.cumsum(tk)
    keep = suffix <= budget
    if n:
        keep[0] = True
    return keep, suffix


def sft_offsets(rl: np.ndarray, tl: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Loss-mask span starts for one conversation rendered as
    ``role: text\\n`` lines, in the given turn order: returns
    (start offsets of each turn's text, total rendered chars as a
    scalar-broadcast array). ``end = start + tl``."""
    contrib = rl + tl + 3
    cum = np.cumsum(contrib)
    before = np.r_[0, cum[:-1]] if len(contrib) else cum
    start = before + rl + 2
    total = np.full(len(contrib), cum[-1] if len(contrib) else 0, np.int64)
    return start, total
