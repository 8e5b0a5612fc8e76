"""Per-group finalize: stable ordering, exact dedup, cross-turn columns,
and (in the job variant) the atomic partition write.

Runs inside ``groupby(["part_id", "salt"]).map_groups`` — the ONLY place
cross-record logic may live (SURVEY.md §2.11): a (part, salt) group
contains every row of each conversation chunk, so ordering and lag
columns are well-defined; map_batches blocks would not respect
conversation boundaries.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import ExtractConfig
from ..oracle import finalize_columns


def sort_dedup_group(tbl: pa.Table) -> pa.Table:
    """Stable sort by (conv_id, turn_idx) + neighbor-dedup (keep first).

    The fixture's duplicates are exact copies (FIXTURES.md §1.1), so
    keep-first-after-stable-sort equals keep-first-in-input-order.
    """
    idx = pc.sort_indices(
        tbl, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")]
    )
    tbl = tbl.take(idx)
    conv = np.asarray(tbl.column("conv_id").to_numpy(zero_copy_only=False), dtype=object)
    turn = tbl.column("turn_idx").to_numpy(zero_copy_only=False)
    n = len(conv)
    if n == 0:
        return tbl
    keep = np.ones(n, dtype=bool)
    keep[1:] = (conv[1:] != conv[:-1]) | (turn[1:] != turn[:-1])
    if keep.all():
        return tbl
    return tbl.filter(pa.array(keep))


def finalize_group(tbl: pa.Table, heavy: dict[str, int], cfg: ExtractConfig) -> pa.Table:
    """order → dedup → cross-turn columns for one (part_id, salt) group."""
    tbl = sort_dedup_group(tbl)
    tbl = tbl.drop_columns(["part_id", "salt"])  # recomputed by finalize_columns
    return finalize_columns(tbl, heavy, cfg)


def group_metrics(tbl: pa.Table) -> dict[str, Any]:
    """Per-partition metrics block (summary analog, page_images.py:1058-1067)."""
    kinds = tbl.column("kind").to_pylist()
    conv = tbl.column("conv_id")
    return {
        "rows": tbl.num_rows,
        "n_plain": sum(1 for k in kinds if k == "plain"),
        "n_html": sum(1 for k in kinds if k == "html"),
        "n_pdf": sum(1 for k in kinds if k == "pdf"),
        "n_fallback": int(pc.sum(pc.cast(tbl.column("used_fallback"), pa.int64())).as_py() or 0),
        "conv_min": pc.min(conv).as_py() if tbl.num_rows else None,
        "conv_max": pc.max(conv).as_py() if tbl.num_rows else None,
    }
