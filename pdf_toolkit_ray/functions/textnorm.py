"""Text normalization — the "pixel-level cleanup" analog of the reference's
image rotate/crop raster ops (``src/pdf-toolkit/rotate.py:273-281``).

Whitespace semantics are pinned to ASCII whitespace only, because the
vectorized Arrow path (RE2 ``\\s`` = ASCII) and the Python path
(``re`` ``\\s`` = Unicode) would otherwise diverge — both implementations
here use the same explicit character class, and a unit test asserts they
agree on a grid of adversarial strings.
"""

from __future__ import annotations

import re
import unicodedata

import pyarrow as pa
import pyarrow.compute as pc

# ASCII whitespace only — identical meaning under Python `re` and RE2.
WS_CHARS = " \t\r\n\f\v"
_WS_CLASS = r"[ \t\r\n\f\v]+"
_WS_RE = re.compile(_WS_CLASS)


def norm_inline(s: str) -> str:
    """NFC + collapse ASCII-whitespace runs to single spaces + strip ends.

    Used for plain payloads and for text inside one HTML node / PDF block.
    NFC is the identity on ASCII, so the (dominant) ASCII case skips the
    normalize call — bit-identical output, measurably less per-node CPU.

    Fast path: for ASCII text, ``" ".join(s.split())`` is the same
    transform in C — EXCEPT that ``str.split()`` also treats the four
    ASCII separator controls \\x1c-\\x1f as whitespace while the pinned
    ASCII-ws class does not, so those (vanishingly rare) strings take the
    regex path. Four C-level ``in`` scans cost far less than one regex
    pass (measured ~40%% off norm time on the extraction fixture).
    """
    if not s.isascii():
        s = unicodedata.normalize("NFC", s)
        return _WS_RE.sub(" ", s).strip(WS_CHARS)
    if "\x1c" in s or "\x1d" in s or "\x1e" in s or "\x1f" in s:
        return _WS_RE.sub(" ", s).strip(WS_CHARS)
    return " ".join(s.split())


def norm_inline_arrow(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized twin of :func:`norm_inline`.

    ASCII rows (the hot path) run entirely through Arrow kernels — NFC is
    the identity on ASCII. Non-ASCII rows fall back to the Python
    implementation per row, because pyarrow 16.1's ``utf8_normalize``
    emits decomposed output for *every* form (observed: NFC of "café"
    returns e + U+0301), which would diverge from ``unicodedata``.
    """
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    out = pc.replace_substring_regex(arr, pattern=_WS_CLASS, replacement=" ")
    out = pc.utf8_trim(out, characters=WS_CHARS)
    non_ascii = pc.invert(pc.string_is_ascii(arr))
    if pc.any(non_ascii).as_py():
        import numpy as np

        vals = np.asarray(out.to_numpy(zero_copy_only=False), dtype=object)
        mask = non_ascii.to_numpy(zero_copy_only=False)
        originals = arr.to_pylist()
        for i in np.flatnonzero(mask):
            vals[i] = norm_inline(originals[i])
        return pa.array(vals, type=arr.type)
    return out
