"""Single-process oracle: reference-semantics extraction over one Arrow
table, no Ray. Applies the *same* ``extract_batch`` / key functions the
distributed pipeline uses (SURVEY.md §7.5.1 — single source of truth),
so the per-turn golden-equality test verifies Ray's distribution,
ordering, dedup and co-transform placement, while textual semantics are
verified by unit tests with hand-written goldens.

Semantics (in order — mirrors the pipeline exactly):
1. exact dedup, keep-first per ``(conv_id, turn_idx)`` in input order
   (reference analog: `seen`-set dup rejection, utils.py:120,153-156),
2. stable ordering by ``(conv_id, turn_idx)`` (reference analog: sorted
   filename processing order, page_images.py:25-28),
3. per-turn extraction (sniff → html/pdf/plain),
4. cross-turn co-transform within each (conv, salt) chunk:
   ``prev_role`` lag + ``conv_n_turns`` / ``is_final_turn`` (reference
   analog of the only cross-record op, _apply_split_symmetry_strategy,
   page_images.py:467-543 — must see the whole group, SURVEY.md §2.11).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .config import ExtractConfig
from .functions.extract import extract_batch
from .functions.keys import conv_keys_arrays


def heavy_convs(tbl: pa.Table, cfg: ExtractConfig) -> dict[str, int]:
    """{conv_id: n_turns} for conversations exceeding the salt threshold."""
    df = pd.DataFrame(
        {
            "conv_id": tbl.column("conv_id").to_pandas(),
            "turn_idx": tbl.column("turn_idx").to_pandas(),
        }
    )
    n_turns = df.groupby("conv_id", sort=False)["turn_idx"].max() + 1
    return {str(k): int(v) for k, v in n_turns.items() if v > cfg.salt_threshold}


def finalize_columns(
    tbl: pa.Table, heavy: dict[str, int], cfg: ExtractConfig
) -> pa.Table:
    """Append part/salt keys + cross-turn columns to a (conv,turn)-sorted table.

    Requires rows sorted by (conv_id, turn_idx) with exact duplicates
    already removed. Shared by the oracle and the engine's per-group
    finalize stage.
    """
    conv = np.asarray(tbl.column("conv_id").to_numpy(zero_copy_only=False), dtype=object)
    turn = tbl.column("turn_idx").to_numpy(zero_copy_only=False).astype(np.int64)
    role = np.asarray(tbl.column("role").to_numpy(zero_copy_only=False), dtype=object)
    n = len(conv)

    part, salt = conv_keys_arrays(tbl.column("conv_id"), turn, heavy, cfg)

    if n == 0:
        out = tbl.append_column("conv_n_turns", pa.array([], type=pa.int32()))
        out = out.append_column("is_final_turn", pa.array([], type=pa.bool_()))
        out = out.append_column("prev_role", pa.array([], type=pa.string()))
        out = out.append_column("part_id", pa.array([], type=pa.int32()))
        return out.append_column("salt", pa.array([], type=pa.int32()))

    conv_start = np.ones(n, dtype=bool)
    if n > 1:
        conv_start[1:] = conv[1:] != conv[:-1]
    # conversation run lengths -> n_turns for non-heavy convs
    starts = np.flatnonzero(conv_start)
    run_len = np.diff(np.append(starts, n))
    n_turns = np.repeat(run_len, run_len).astype(np.int64)
    if heavy:
        hv = np.fromiter((heavy.get(c, 0) for c in conv), dtype=np.int64, count=n)
        n_turns = np.where(hv > 0, hv, n_turns)
    is_final = turn == (n_turns - 1)

    chunk_start = conv_start.copy()
    if n > 1:
        chunk_start[1:] |= salt[1:] != salt[:-1]
    prev_role = np.empty(n, dtype=object)
    prev_role[0] = ""
    if n > 1:
        prev_role[1:] = role[:-1]
    prev_role[chunk_start] = ""

    out = tbl.append_column("conv_n_turns", pa.array(n_turns, type=pa.int32()))
    out = out.append_column("is_final_turn", pa.array(is_final))
    out = out.append_column("prev_role", pa.array(prev_role, type=pa.string()))
    out = out.append_column("part_id", pa.array(part, type=pa.int32()))
    out = out.append_column("salt", pa.array(salt, type=pa.int32()))
    return out


def dedup_sort(tbl: pa.Table) -> pa.Table:
    """Keep-first exact dedup on (conv_id, turn_idx), then stable sort."""
    keys = pd.DataFrame(
        {
            "conv_id": tbl.column("conv_id").to_pandas(),
            "turn_idx": tbl.column("turn_idx").to_pandas(),
        }
    )
    keep = ~keys.duplicated(subset=["conv_id", "turn_idx"], keep="first")
    tbl = tbl.filter(pa.array(keep.to_numpy()))
    return tbl.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])


def extract_table(tbl: pa.Table, cfg: ExtractConfig | None = None) -> pa.Table:
    """The full oracle: dedup → order → extract → cross-turn columns."""
    cfg = cfg or ExtractConfig()
    tbl = dedup_sort(tbl)
    tbl = extract_batch(tbl, cfg)
    return finalize_columns(tbl, heavy_convs(tbl, cfg), cfg)
