"""Shared extraction-result value type (analog of the reference's
(bbox, used_fallback, note) triple, ``src/pdf-toolkit/page_images.py:339``)."""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass
class Span:
    start: int
    end: int
    kind: str
    score: float

    def as_dict(self) -> dict:
        return {
            "start": self.start,
            "end": self.end,
            "kind": self.kind,
            "score": float(self.score),
        }


@dataclasses.dataclass
class ExtractResult:
    extracted_text: str
    spans: list[Span]
    notes: list[str]
    used_fallback: bool
