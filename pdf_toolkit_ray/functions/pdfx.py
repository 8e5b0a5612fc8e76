"""Mini-PDF layout parsing: tokenizer, rotation normalization,
spread split, reading-order sort.

The payload grammar (our own, from FIXTURES.md §1.2 — parsed by our own
tokenizer, no external PDF libs):

    %MINIPDF 1.0
    obj page <num> w=<int> h=<int> rotate=<0|90|180|270>
    block x=<int> y=<int> | <text...>
    ...
    endobj

``w``/``h`` are the *emitted* (scanned, possibly rotated) page
dimensions; block coordinates are in that emitted space. Extraction:

1. un-rotate block coordinates back to true page space — the analog of
   the reference's rotation normalization ``(rotation + degrees) % 360``
   (``src/pdf-toolkit/rotate.py:109-126``),
2. detect spreads by aspect ratio ``width/height >= split_ratio``
   (``src/pdf-toolkit/page_images.py:118-123``),
3. locate the gutter as the largest block-free gap in the center search
   window, with fallback-to-center when outside (0.2·W, 0.8·W)
   (``src/pdf-toolkit/page_images.py:126-172``),
4. split blocks at the gutter ± trim (``page_images.py:175-202``),
   optionally harmonizing the half x-extents with a symmetry strategy
   (``page_images.py:467-543``),
5. sort each page/half top-to-bottom then left-to-right and join block
   texts with newlines.

Pure functions only — shared verbatim by the oracle and the Ray stage.
"""

from __future__ import annotations

import dataclasses

from ..config import ExtractConfig
from .result import ExtractResult, Span
from .textnorm import norm_inline

MAGIC = "%MINIPDF"
VALID_ROTATIONS = (0, 90, 180, 270)


class MiniPdfError(ValueError):
    """Raised on malformed mini-PDF payloads (caught → whole-text fallback)."""


@dataclasses.dataclass
class Block:
    x: int
    y: int
    text: str


@dataclasses.dataclass
class Page:
    num: int
    width: int      # emitted-space width
    height: int     # emitted-space height
    rotate: int
    blocks: list[Block]

    @property
    def true_size(self) -> tuple[int, int]:
        if self.rotate in (90, 270):
            return self.height, self.width
        return self.width, self.height


def normalize_rotation(current: int, degrees: int) -> int:
    """(current + degrees) % 360 — mirrors src/pdf-toolkit/rotate.py:111-113."""
    if degrees % 90 != 0:
        raise MiniPdfError("rotation must be a multiple of 90 degrees")
    return (current + degrees) % 360


def unrotate_point(x: int, y: int, w_emitted: int, h_emitted: int, rotate: int) -> tuple[int, int]:
    """Map an emitted-space point back to true page space (inverse rotation)."""
    if rotate == 0:
        return x, y
    if rotate == 90:   # page was rotated 90° cw; inverse = 270° cw in emitted space
        return y, w_emitted - 1 - x
    if rotate == 180:
        return w_emitted - 1 - x, h_emitted - 1 - y
    if rotate == 270:
        return h_emitted - 1 - y, x
    raise MiniPdfError(f"unsupported rotation {rotate}")


def parse_minipdf(text: str) -> list[Page]:
    """Tokenize a mini-PDF payload into pages. Strict, fail-fast parsing."""
    lines = text.strip().split("\n")
    if not lines or not lines[0].strip().startswith(MAGIC):
        raise MiniPdfError("missing %MINIPDF magic")
    pages: list[Page] = []
    current: Page | None = None
    for raw in lines[1:]:
        line = raw.strip()
        if not line:
            continue
        if line.startswith("obj page"):
            if current is not None:
                raise MiniPdfError("nested obj")
            fields = line.split()
            if len(fields) < 3:
                raise MiniPdfError(f"bad obj header: {line!r}")
            try:
                num = int(fields[2])
            except ValueError as exc:
                raise MiniPdfError(f"bad page number: {line!r}") from exc
            kv = {}
            for field in fields[3:]:
                if "=" not in field:
                    raise MiniPdfError(f"bad obj attribute: {field!r}")
                key, _, value = field.partition("=")
                try:
                    kv[key] = int(value)
                except ValueError as exc:
                    raise MiniPdfError(f"bad obj attribute: {field!r}") from exc
            width = kv.get("w", 600)
            height = kv.get("h", 800)
            rotate = kv.get("rotate", 0)
            if width <= 0 or height <= 0:
                raise MiniPdfError("page dims must be positive")
            if rotate not in VALID_ROTATIONS:
                raise MiniPdfError(f"rotate must be one of {VALID_ROTATIONS}")
            current = Page(num=num, width=width, height=height, rotate=rotate, blocks=[])
        elif line.startswith("block"):
            if current is None:
                raise MiniPdfError("block outside obj")
            head, sep, payload = line.partition("|")
            if not sep:
                raise MiniPdfError(f"block missing '|': {line!r}")
            kv = {}
            for field in head.split()[1:]:
                if "=" not in field:
                    raise MiniPdfError(f"bad block attribute: {field!r}")
                key, _, value = field.partition("=")
                try:
                    kv[key] = int(value)
                except ValueError as exc:
                    raise MiniPdfError(f"bad block attribute: {field!r}") from exc
            if "x" not in kv or "y" not in kv:
                raise MiniPdfError(f"block missing x/y: {line!r}")
            current.blocks.append(Block(x=kv["x"], y=kv["y"], text=payload.strip()))
        elif line == "endobj":
            if current is None:
                raise MiniPdfError("endobj outside obj")
            pages.append(current)
            current = None
        else:
            raise MiniPdfError(f"unrecognized line: {line!r}")
    if current is not None:
        raise MiniPdfError("unterminated obj")
    if not pages:
        raise MiniPdfError("no pages")
    return pages


def detect_spread(width: int, height: int, split_ratio: float) -> bool:
    """Aspect-ratio spread test — mirrors src/pdf-toolkit/page_images.py:118-123."""
    if height <= 0:
        return False
    return (width / height) >= split_ratio


def detect_gutter_x(
    blocks: list[Block], width: int, gutter_search_frac: float
) -> tuple[int, bool]:
    """Find the gutter as the widest block-free vertical gap near center.

    The "darkest column" scan of the reference (``page_images.py:126-172``)
    becomes: among gaps between consecutive distinct block x-positions,
    pick the widest whose midpoint falls in the center search window;
    fall back to the page center when the best midpoint is outside
    (0.2·W, 0.8·W) — mirroring ``page_images.py:161-167``.
    """
    center_x = width // 2
    half_window = max(1, int((gutter_search_frac * width) / 2))
    start_x = max(0, center_x - half_window)
    end_x = min(width - 1, center_x + half_window)

    xs = sorted({b.x for b in blocks})
    best_x = center_x
    best_gap = -1
    for left, right in zip(xs, xs[1:]):
        mid = (left + right) // 2
        gap = right - left
        if start_x <= mid <= end_x and gap > best_gap:
            best_gap = gap
            best_x = mid

    fallback_to_center = False
    min_x = int(0.2 * width)
    max_x = int(0.8 * width)
    if best_gap < 0 or not (min_x < best_x < max_x):
        best_x = center_x
        fallback_to_center = True

    if width >= 2:
        best_x = max(1, min(width - 1, best_x))
    else:
        best_x = 0
    return best_x, fallback_to_center


def split_spread_blocks(
    blocks: list[Block], gutter_x: int, width: int, gutter_trim_px: int = 0
) -> tuple[list[Block], list[Block]]:
    """Partition blocks into left/right pages at the gutter ± trim.

    Blocks inside the trim band are dropped, like pixels cropped away by
    ``split_spread_image`` (``page_images.py:175-202``).
    """
    if width < 2:
        raise MiniPdfError("Page is too narrow to split into two pages.")
    safe_gutter_x = max(1, min(width - 1, gutter_x))
    trim = max(0, gutter_trim_px)
    left = [b for b in blocks if b.x < safe_gutter_x - trim]
    right = [b for b in blocks if b.x >= safe_gutter_x + trim]
    return left, right


def _extent(blocks: list[Block]) -> tuple[int, int]:
    xs = [b.x for b in blocks]
    return (min(xs), max(xs) + 1) if xs else (0, 1)


def apply_split_symmetry(
    left_ext: tuple[int, int],
    right_ext: tuple[int, int],
    gutter_x: int,
    page_width: int,
    strategy: str,
) -> tuple[tuple[int, int], tuple[int, int], str | None]:
    """Harmonize the (left, right) half x-extents jointly.

    1-D analog of ``_apply_split_symmetry_strategy``
    (``page_images.py:467-543``): ``match_max_width`` widens the narrower
    half toward the gutter; ``mirror_from_gutter`` equalizes the
    gutter-to-content gaps to the larger gap; invalid bounds fall back to
    independent with a note.
    """
    if strategy == "independent":
        return left_ext, right_ext, None
    original = (left_ext, right_ext)
    left_l, left_r = left_ext
    right_l, right_r = right_ext

    if strategy == "match_max_width":
        max_width = max(left_r - left_l, right_r - right_l)
        if left_r - left_l < max_width:
            left_r = min(gutter_x, left_l + max_width)
        if right_r - right_l < max_width:
            right_l = max(gutter_x, right_r - max_width)
    elif strategy == "mirror_from_gutter":
        left_gap = max(0, gutter_x - left_r)
        right_gap = max(0, right_l - gutter_x)
        target_gap = max(left_gap, right_gap)
        left_r = min(gutter_x, max(left_l + 1, gutter_x - target_gap))
        right_l = max(gutter_x, min(right_r - 1, gutter_x + target_gap))
    else:
        return original[0], original[1], "Unknown symmetry strategy; used independent."

    left_l = max(0, left_l)
    right_r = min(page_width, right_r)
    if left_r <= left_l or right_r <= right_l:
        if strategy == "mirror_from_gutter":
            return (
                original[0],
                original[1],
                "Mirror symmetry could not be satisfied safely; used independent.",
            )
        return (
            original[0],
            original[1],
            f"Invalid symmetry bounds for strategy={strategy}; used independent.",
        )
    return (left_l, left_r), (right_l, right_r), None


def _reading_order(blocks: list[Block]) -> list[Block]:
    """Top-to-bottom, then left-to-right — stable."""
    return sorted(blocks, key=lambda b: (b.y, b.x))


def extract_pdf(text: str, cfg: ExtractConfig) -> ExtractResult:
    """Extract text from a mini-PDF payload in reading order."""
    try:
        pages = parse_minipdf(text)
    except MiniPdfError as exc:
        fallback_text = norm_inline(text)
        span = [Span(0, len(fallback_text), "raw", 0.0)] if fallback_text else []
        return ExtractResult(
            fallback_text,
            span,
            [f"Unparseable PDF payload ({exc}); used raw text."],
            True,
        )

    notes: list[str] = []
    ordered: list[tuple[str, str, float]] = []  # (text, span_kind, score)
    for page in sorted(pages, key=lambda p: p.num):
        true_w, true_h = page.true_size
        true_blocks = []
        for block in page.blocks:
            tx, ty = unrotate_point(block.x, block.y, page.width, page.height, page.rotate)
            true_blocks.append(Block(x=tx, y=ty, text=block.text))
        if detect_spread(true_w, true_h, cfg.split_ratio):
            gutter_x, fell_back = detect_gutter_x(
                true_blocks, true_w, cfg.gutter_search_frac
            )
            if fell_back:
                notes.append(
                    f"Gutter not found in center window on page {page.num}; used page center."
                )
            left, right = split_spread_blocks(
                true_blocks, gutter_x, true_w, cfg.gutter_trim_px
            )
            _, _, sym_note = apply_split_symmetry(
                _extent(left), _extent(right), gutter_x, true_w, cfg.symmetry_strategy
            )
            if sym_note:
                notes.append(sym_note)
            for block in _reading_order(left):
                ordered.append((norm_inline(block.text), "block_l", 1.0))
            for block in _reading_order(right):
                ordered.append((norm_inline(block.text), "block_r", 1.0))
        else:
            for block in _reading_order(true_blocks):
                ordered.append((norm_inline(block.text), "block", 1.0))

    parts: list[str] = []
    spans: list[Span] = []
    offset = 0
    for block_text, span_kind, score in ordered:
        if not block_text:
            continue
        start = 0 if not parts else offset + 1
        spans.append(Span(start, start + len(block_text), span_kind, score))
        parts.append(block_text)
        offset = start + len(block_text)
    return ExtractResult("\n".join(parts), spans, notes, False)
