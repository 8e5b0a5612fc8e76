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




def conv_keys_arrays(
    conv_col, turn_idx: np.ndarray, heavy: dict[str, int], cfg: ExtractConfig
) -> tuple[np.ndarray, np.ndarray]:
    """(part_ids, salts) for a whole batch, via Arrow dictionary encoding.

    ``dictionary_encode`` hashes the string column in C++ (no O(n log n)
    object sort like np.unique), then crc32 / heavy-membership run once
    per *unique* conversation and broadcast back through the indices —
    ~10x faster than the per-row path on shuffled blocks where uniques
    ≈ rows.
    """
    import pyarrow as pa

    if isinstance(conv_col, pa.ChunkedArray):
        conv_col = conv_col.combine_chunks()
    dict_arr = conv_col.dictionary_encode()
    indices = dict_arr.indices.to_numpy(zero_copy_only=False)
    uniques = dict_arr.dictionary.to_pylist()
    upart = np.fromiter(
        (part_of(u, cfg.n_parts) for u in uniques), dtype=np.int32, count=len(uniques)
    )
    part = upart[indices]
    if heavy:
        uheavy = np.fromiter((u in heavy for u in uniques), dtype=bool, count=len(uniques))
        salts = np.where(
            uheavy[indices], (turn_idx // cfg.salt_width).astype(np.int32), np.int32(0)
        )
    else:
        salts = np.zeros(len(indices), dtype=np.int32)
    return part, salts
