"""Decimal rounding that is bit-identical to DuckDB's ``round(x, nd)``.

DuckDB rounds doubles as ``sign(x) * floor(|x| * 10^nd + 0.5) / 10^nd``
(half away from zero, computed in double arithmetic). pyarrow's
``pc.round`` and Python's ``round`` are half-to-even *and* take a
different computational path, which diverges on exact half-boundaries
(e.g. 13/32 = 0.40625 → 0.4062 vs DuckDB's 0.4063) and occasionally by
one ULP elsewhere (1008/20046 mismatches measured on sf0.01 revenue
values). Every float column the driver hashes goes through this helper
on the Ray side so the DuckDB oracle comparison is exact.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def round_away(x, ndigits: int = 4):
    """Vectorized numpy round-half-away-from-zero matching DuckDB."""
    x = np.asarray(x, dtype=np.float64)
    s = 10.0 ** ndigits
    return np.sign(x) * np.floor(np.abs(x) * s + 0.5) / s


def round_away_scalar(x: float, ndigits: int = 4) -> float:
    return float(round_away(np.float64(x), ndigits))


def round_away_arrow(arr: pa.Array | pa.ChunkedArray, ndigits: int = 4) -> pa.Array:
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    vals = arr.to_numpy(zero_copy_only=False)
    return pa.array(round_away(vals, ndigits), type=pa.float64())
