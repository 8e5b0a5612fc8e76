"""Partition / salt key functions — shared by oracle and engine so the
salting-dependent semantics (chunk-local ``prev_role``) cannot diverge
(SURVEY.md §7.5.3: salt boundaries align to contiguous turn ranges).

``part_id = crc32(conv_id) % n_parts`` is the stable cross-process
partitioner (the analog of "one folder per book"); heavy conversations
(> ``salt_threshold`` turns) additionally split into contiguous salt
chunks of ``salt_width`` turns, which is both the skew valve and the
memory valve for monster groups (reference analog: fixed-size
``_chunk_ranges``, ``src/pdf-toolkit/split.py:28-42``).
"""

from __future__ import annotations

import zlib

import numpy as np

from ..config import ExtractConfig


def part_of(conv_id: str, n_parts: int) -> int:
    return zlib.crc32(conv_id.encode("utf-8")) % n_parts


def part_ids_np(conv_ids: np.ndarray, n_parts: int) -> np.ndarray:
    """Vectorized-ish partition ids: one crc32 per *unique* conv in the batch."""
    uniques, inverse = np.unique(conv_ids.astype(object), return_inverse=True)
    upart = np.fromiter(
        (part_of(str(u), n_parts) for u in uniques), dtype=np.int32, count=len(uniques)
    )
    return upart[inverse]


def salts_np(
    conv_ids: np.ndarray, turn_idx: np.ndarray, heavy: dict[str, int], cfg: ExtractConfig
) -> np.ndarray:
    """salt = turn_idx // salt_width for heavy conversations, else 0."""
    out = np.zeros(len(conv_ids), dtype=np.int32)
    if heavy:
        heavy_mask = np.fromiter(
            (c in heavy for c in conv_ids), dtype=bool, count=len(conv_ids)
        )
        out[heavy_mask] = (turn_idx[heavy_mask] // cfg.salt_width).astype(np.int32)
    return out
