"""Payload-kind sniffing — the branch predicate of the pipeline.

Analog of ``detect_spread`` (``src/pdf-toolkit/page_images.py:118-123``):
a cheap per-record test that selects the processing branch in "auto"
mode. Here the test classifies a turn's ``text`` as ``pdf`` (mini-PDF
serialization), ``html``, or ``plain`` by prefix probes.

Branching happens via masks *within* each Arrow batch (no dataset-level
split), so the streaming executor sees one uniform stage.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .textnorm import WS_CHARS

KIND_PLAIN = "plain"
KIND_HTML = "html"
KIND_PDF = "pdf"

PDF_MAGIC = "%MINIPDF"


def sniff_kind(text: str) -> str:
    """Scalar sniffer (used by per-payload code paths and unit tests)."""
    head = text.lstrip(WS_CHARS)[:32]
    if head.startswith(PDF_MAGIC):
        return KIND_PDF
    low = head.lower()
    if low.startswith("<html") or low.startswith("<!doctype"):
        return KIND_HTML
    return KIND_PLAIN


def sniff_kind_arrow(text: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized sniffer: returns a string array of kinds, Arrow kernels only."""
    head = pc.utf8_ltrim(text, characters=WS_CHARS)
    head = pc.utf8_slice_codeunits(head, 0, 32)
    is_pdf = pc.starts_with(head, pattern=PDF_MAGIC)
    low = pc.utf8_lower(head)
    is_html = pc.or_(
        pc.starts_with(low, pattern="<html"),
        pc.starts_with(low, pattern="<!doctype"),
    )
    n = len(text)
    out = np.full(n, KIND_PLAIN, dtype=object)
    pdf_mask = is_pdf.combine_chunks().to_numpy(zero_copy_only=False) if isinstance(
        is_pdf, pa.ChunkedArray
    ) else is_pdf.to_numpy(zero_copy_only=False)
    html_mask = is_html.combine_chunks().to_numpy(zero_copy_only=False) if isinstance(
        is_html, pa.ChunkedArray
    ) else is_html.to_numpy(zero_copy_only=False)
    out[np.asarray(html_mask, dtype=bool)] = KIND_HTML
    out[np.asarray(pdf_mask, dtype=bool)] = KIND_PDF
    return pa.array(out, type=pa.string())
