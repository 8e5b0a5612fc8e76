"""HTML main-content extraction via text-density DOM scoring.

From-scratch Arc90/jusText-style extractor over a lightweight DOM built
with stdlib ``html.parser`` (no bs4/lxml in this environment). The
control flow deliberately mirrors the reference's crop pipeline:

* per-node density score        ↔ grayscale threshold mask
  (``src/pdf-toolkit/page_images.py:345-347``)
* contiguous dense node region  ↔ ``mask.getbbox()``
* ``min_area_frac`` fallback    ↔ "Detected page area too small"
  (``page_images.py:352-355``)
* ``pad_nodes`` / ``edge_inset_nodes`` ↔ ``pad_px`` / ``edge_inset_px``
  (``page_images.py:357-373``)
* boilerplate-run clamp with hysteresis ↔ ``detect_outer_black_bar_px``
  (``page_images.py:205-261``) + ``_resolve_outer_clamp_px``
  (``page_images.py:264-317``)

All four fallback notes keep the reference's phrasing shape so parity is
auditable. Pure functions only — shared verbatim by the oracle and the
Ray actor stage.
"""

from __future__ import annotations

import dataclasses
import html as _htmlmod
import re
from html.parser import HTMLParser

from ..config import ExtractConfig
from .result import ExtractResult, Span
from .textnorm import norm_inline

# Block-level elements: each becomes (at most) one scored node.
BLOCK_TAGS = frozenset(
    {
        "html", "body", "main", "div", "p", "article", "section", "nav",
        "footer", "header", "aside", "ul", "ol", "li", "table", "tr", "td",
        "th", "form", "blockquote", "pre", "h1", "h2", "h3", "h4", "h5", "h6",
        "figure", "figcaption", "dl", "dt", "dd",
    }
)
# Subtrees with no visible text at all.
IGNORE_TAGS = frozenset({"head", "style", "script", "title", "noscript", "template"})
# per-tag close patterns precompiled once: the scanner previously compiled
# one regex PER ignored-subtree occurrence (hot-path allocation)
_IGNORE_CLOSE_RE = {
    name: re.compile(rf"</{name}\s*>", re.I) for name in IGNORE_TAGS
}
# Tags that are boilerplate by construction (jusText-style prior).
BP_TAGS = frozenset({"nav", "footer", "header", "aside", "form"})
# Arc90-style negative class/id patterns.
NEG_PAT = re.compile(
    r"nav|footer|header|aside|\bads?\b|banner|menu|comment|copyright|sidebar|promo",
    re.IGNORECASE,
)
VOID_TAGS = frozenset({"br", "hr", "img", "meta", "link", "input", "source", "wbr"})


@dataclasses.dataclass
class HtmlNode:
    """One leaf-ish block element: its own (direct) text and inline markup stats."""

    order: int
    tag: str
    text: str = ""            # normalized direct text
    chars: int = 0            # len(text)
    link_chars: int = 0       # normalized chars inside <a> descendants
    tag_count: int = 1        # own tag + inline tags directly under it
    flagged: bool = False     # boilerplate prior (own tag/class/id or inherited)


class _Collector(HTMLParser):
    """Builds the flat node list in document order.

    Text is attributed to the innermost open block element; inline tags
    increment that block's ``tag_count``; text under an ``<a>`` also
    accumulates into ``link_chars``.
    """

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._order = 0
        self._ignore_depth = 0
        self._a_depth = 0
        # each stack entry: [tag, flagged, text_parts, link_parts, tag_count, order]
        self._stack: list[list] = []
        self.nodes: list[HtmlNode] = []
        self._push("#root", False)

    def _push(self, tag: str, flagged: bool) -> None:
        self._stack.append([tag, flagged, [], [], 1, self._order])
        self._order += 1

    def _pop_emit(self) -> None:
        tag, flagged, text_parts, link_parts, tag_count, order = self._stack.pop()
        text = norm_inline("".join(text_parts))
        if not text:
            return
        self.nodes.append(
            HtmlNode(
                order=order,
                tag=tag,
                text=text,
                chars=len(text),
                link_chars=len(norm_inline("".join(link_parts))),
                tag_count=tag_count,
                flagged=flagged,
            )
        )

    @staticmethod
    def _is_negative(tag: str, attrs: list[tuple[str, str | None]]) -> bool:
        if tag in BP_TAGS:
            return True
        for name, value in attrs:
            if name in ("class", "id") and value and NEG_PAT.search(value):
                return True
        return False

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in IGNORE_TAGS:
            self._ignore_depth += 1
            return
        if self._ignore_depth:
            return
        if tag in VOID_TAGS:
            if self._stack:
                self._stack[-1][2].append(" ")
                self._stack[-1][4] += 1
            return
        if tag in BLOCK_TAGS:
            inherited = self._stack[-1][1] if self._stack else False
            self._push(tag, inherited or self._is_negative(tag, attrs))
        else:
            # inline element
            if tag == "a":
                self._a_depth += 1
            if self._stack:
                self._stack[-1][4] += 1

    def handle_startendtag(self, tag: str, attrs) -> None:
        self.handle_starttag(tag, attrs)
        if tag not in BLOCK_TAGS and tag not in IGNORE_TAGS and tag not in VOID_TAGS:
            self.handle_endtag(tag)

    def handle_endtag(self, tag: str) -> None:
        if tag in IGNORE_TAGS:
            self._ignore_depth = max(0, self._ignore_depth - 1)
            return
        if self._ignore_depth:
            return
        if tag == "a":
            self._a_depth = max(0, self._a_depth - 1)
            return
        if tag in BLOCK_TAGS:
            # pop until the matching open block (tolerates unbalanced markup)
            open_tags = [entry[0] for entry in self._stack]
            if tag in open_tags[1:]:  # never pop the synthetic root
                while len(self._stack) > 1 and self._stack[-1][0] != tag:
                    self._pop_emit()
                if len(self._stack) > 1:
                    self._pop_emit()

    def handle_data(self, data: str) -> None:
        if self._ignore_depth or not self._stack:
            return
        self._stack[-1][2].append(data)
        if self._a_depth:
            self._stack[-1][3].append(data)

    def finish(self) -> list[HtmlNode]:
        while len(self._stack) > 1:
            self._pop_emit()
        if self._stack:
            self._pop_emit()
        return sorted(self.nodes, key=lambda n: n.order)


def parse_html_stdlib(text: str) -> list[HtmlNode]:
    """stdlib html.parser path (reference implementation; kept for
    cross-checking the fast scanner in tests)."""
    collector = _Collector()
    collector.feed(text)
    collector.close()
    return collector.finish()


# attrs may not contain a bare '<': a stray '<' inside a tag means the tag
# never closed and we re-scan from the next char (html.parser recovers from
# such soup with C-level quirks we intentionally do not emulate bug-for-bug)
_TAG_RE = re.compile(
    r"<(/?)([a-zA-Z][a-zA-Z0-9-]*)((?:[^<>'\"]|'[^']*'|\"[^\"]*\")*?)(/?)>", re.S
)
# ~90% of real-world tags carry no attributes (measured on the extraction
# fixture): match the trivial shape first — a strict special case of
# _TAG_RE (attr group empty), so the fallback sees identical semantics
_SIMPLE_TAG_RE = re.compile(r"<(/?)([a-zA-Z][a-zA-Z0-9-]*)(/?)>")
_CLASS_ID_RE = re.compile(
    r"(?:class|id)\s*=\s*(?:\"([^\"]*)\"|'([^']*)'|([^\s>]+))", re.I
)


class _FastBuilder:
    """Shared node-building state for the fast scanner — replicates the
    _Collector transitions exactly (text→innermost block, inline tag
    counts, <a> link text, boilerplate flag inheritance)."""

    __slots__ = ("_order", "_a_depth", "_stack", "nodes")

    def __init__(self) -> None:
        self._order = 0
        self._a_depth = 0
        self._stack: list[list] = []
        self.nodes: list[HtmlNode] = []
        self.push("#root", False)

    def push(self, tag: str, flagged: bool) -> None:
        self._stack.append([tag, flagged, [], [], 1, self._order])
        self._order += 1

    def pop_emit(self) -> None:
        tag, flagged, text_parts, link_parts, tag_count, order = self._stack.pop()
        if not text_parts:
            return
        raw = text_parts[0] if len(text_parts) == 1 else "".join(text_parts)
        text = norm_inline(raw)
        if not text:
            return
        self.nodes.append(
            HtmlNode(
                order=order,
                tag=tag,
                text=text,
                chars=len(text),
                # most nodes have no links — skip the no-op normalize
                link_chars=len(norm_inline("".join(link_parts))) if link_parts else 0,
                tag_count=tag_count,
                flagged=flagged,
            )
        )

    def text(self, data: str) -> None:
        if "&" in data:
            data = _htmlmod.unescape(data)
        self._stack[-1][2].append(data)
        if self._a_depth:
            self._stack[-1][3].append(data)

    def finish(self) -> list[HtmlNode]:
        while self._stack:
            self.pop_emit()
        return sorted(self.nodes, key=lambda n: n.order)


def parse_html_fast(doc: str) -> list[HtmlNode]:
    """Fast scanner producing the same node list as :func:`parse_html_stdlib`
    (~5x faster; html.parser's regex state machine dominates extraction CPU).
    Tests cross-check equality on every fixture payload plus hostile cases.
    """
    b = _FastBuilder()
    pos, n = 0, len(doc)
    while pos < n:
        lt = doc.find("<", pos)
        if lt == -1:
            b.text(doc[pos:])
            break
        if lt > pos:
            b.text(doc[pos:lt])
        nxt = doc[lt + 1 : lt + 2]
        if nxt == "!" or nxt == "?":
            if doc.startswith("<!--", lt):
                end = doc.find("-->", lt + 4)
                pos = n if end == -1 else end + 3
            else:
                end = doc.find(">", lt)
                pos = n if end == -1 else end + 1
            continue
        m = _SIMPLE_TAG_RE.match(doc, lt)
        if m is not None:
            closing, name, self_close = m.groups()
            attr_str = ""
        else:
            m = _TAG_RE.match(doc, lt)
            if m is None:
                b.text("<")
                pos = lt + 1
                continue
            closing, name, attr_str, self_close = m.groups()
        name = name.lower()
        pos = m.end()

        if not closing and name in IGNORE_TAGS:
            # skip the whole invisible subtree; script/style content may
            # contain '<' that is not markup, so jump to the literal close
            close = _IGNORE_CLOSE_RE[name].search(doc, pos)
            pos = n if close is None else close.end()
            continue
        if name in VOID_TAGS:
            if not closing:  # a stray </br> is ignored, like html.parser
                b._stack[-1][2].append(" ")
                b._stack[-1][4] += 1
            continue
        if closing:
            if name in IGNORE_TAGS:
                continue
            if name == "a":
                b._a_depth = max(0, b._a_depth - 1)
                continue
            if name in BLOCK_TAGS:
                open_tags = [entry[0] for entry in b._stack]
                if name in open_tags[1:]:
                    while len(b._stack) > 1 and b._stack[-1][0] != name:
                        b.pop_emit()
                    if len(b._stack) > 1:
                        b.pop_emit()
            continue
        # opening tag
        if name in BLOCK_TAGS:
            flagged = b._stack[-1][1] or name in BP_TAGS
            if not flagged and attr_str:
                for groups in _CLASS_ID_RE.findall(attr_str):
                    value = next((g for g in groups if g), "")
                    if value and NEG_PAT.search(value):
                        flagged = True
                        break
            b.push(name, flagged)
        else:
            if name == "a" and not self_close:
                b._a_depth += 1
            b._stack[-1][4] += 1
    return b.finish()


def parse_html(text: str) -> list[HtmlNode]:
    """Parse HTML into the flat, document-ordered block-node list."""
    return parse_html_fast(text)


def score_node(node: HtmlNode, cfg: ExtractConfig) -> float:
    """Text-density score in [0, 1] — the brightness analog of the crop mask."""
    if node.chars <= 0:
        return 0.0
    density = node.chars / (node.chars + cfg.tag_cost * max(1, node.tag_count))
    link_density = min(1.0, node.link_chars / node.chars)
    score = density * (1.0 - link_density)
    if node.flagged:
        score *= cfg.bp_penalty
    return score


def detect_boilerplate_run(
    scores: list[float],
    *,
    side: str,
    search_frac: float,
    enter_cutoff: float,
    release_frac: float,
    min_run: int,
) -> int:
    """Length of the boilerplate "bar" at one end of the node sequence.

    Line-for-line analog of ``detect_outer_black_bar_px``
    (``src/pdf-toolkit/page_images.py:205-261``): darkness ↔
    boilerplate-ness (1 - score); hysteresis enters a bar at
    ``enter_cutoff`` and releases only after ``min_run`` consecutive
    nodes at or below ``release_frac``. Returns 0 when no stable bar.
    """
    if side not in ("left", "right"):
        raise ValueError("side must be 'left' or 'right'")
    n = len(scores)
    if n <= 0:
        return 0
    search_width = max(1, min(n, int(n * search_frac)))
    saw_bar = False
    consecutive_release = 0
    for idx in range(search_width):
        pos = idx if side == "left" else (n - 1 - idx)
        darkness = 1.0 - scores[pos]
        if darkness >= enter_cutoff:
            saw_bar = True
            consecutive_release = 0
            continue
        if saw_bar and darkness <= release_frac:
            consecutive_release += 1
            if consecutive_release >= min_run:
                return max(0, idx - consecutive_release + 1)
        elif saw_bar:
            consecutive_release = 0
    if saw_bar:
        return search_width
    return 0


def resolve_outer_clamp(
    scores: list[float], *, side: str, cfg: ExtractConfig
) -> tuple[int, int]:
    """(detected, applied) clamp node counts for one side.

    Mirrors ``_resolve_outer_clamp_px`` (``page_images.py:264-317``):
    ``off`` → (0, 0); ``fixed`` → (0, fixed_nodes); ``auto`` → detected
    run + pad, capped by ``auto_max_frac`` of the sequence, with the
    search window widened to at least the cap and clamped to [0.01, 1].
    """
    n = len(scores)
    if cfg.outer_margin_mode == "off" or n == 0:
        return 0, 0
    if cfg.outer_margin_mode == "fixed":
        return 0, max(0, min(n, cfg.outer_margin_fixed_nodes))
    effective_search = max(cfg.outer_margin_auto_search_frac, cfg.outer_margin_auto_max_frac)
    effective_search = min(1.0, max(effective_search, 0.01))
    detected = detect_boilerplate_run(
        scores,
        side=side,
        search_frac=effective_search,
        enter_cutoff=cfg.bp_enter_cutoff,
        release_frac=cfg.bp_release_frac,
        min_run=cfg.bp_min_run,
    )
    if detected <= 0:
        return 0, 0
    max_clamp = max(0, int(n * cfg.outer_margin_auto_max_frac))
    applied = min(detected + cfg.outer_margin_pad_nodes, max_clamp)
    return detected, max(0, applied)


def _fallback(nodes: list[HtmlNode], scores: list[float], note: str) -> ExtractResult:
    """Whole-document visible text — the "used full image" analog."""
    parts: list[str] = []
    spans: list[Span] = []
    offset = 0
    for node, score in zip(nodes, scores):
        if not parts:
            start = 0
        else:
            start = offset + 1  # +1 for the joining newline
        spans.append(Span(start, start + node.chars, "node", score))
        parts.append(node.text)
        offset = start + node.chars
    return ExtractResult("\n".join(parts), spans, [note], True)


#: fixed English stopword list for the jusText-style classifier — a
#: deterministic, committed vocabulary (the published algorithm ships
#: per-language lists; this is the high-frequency English core, which is
#: what the synthetic corpus exercises)
JUSTEXT_STOPWORDS = frozenset(
    """a about above after again all also an and any are as at be because
    been before being below between both but by could did do does down
    during each few for from further had has have he her here hers him
    his how i if in into is it its just me more most my no nor not of
    off on once only or other our out over own same she so some such
    than that the their them then there these they this those through
    to too under until up very was we were what when where which while
    who why will with you your""".split()
)


def _stopword_density(text: str) -> float:
    words = text.lower().split()
    if not words:
        return 0.0
    hits = sum(1 for w in words if w.strip(".,;:!?\"'()[]") in JUSTEXT_STOPWORDS)
    return hits / len(words)


def classify_nodes_justext(
    nodes: list[HtmlNode], cfg: ExtractConfig
) -> list[str]:
    """jusText-style block classification (Pomikálek 2011, §3).

    Context-free pass per block:

    * boilerplate-flagged tag (nav/footer/aside/…) or empty → ``bad``;
    * link density > ``jt_max_link_density`` → ``bad``;
    * shorter than ``jt_length_low`` chars → ``bad`` if it contains any
      link text, else ``short`` (undecided);
    * stopword density ≥ ``jt_stopwords_high`` → ``good`` when longer
      than ``jt_length_high``, else ``neargood``;
    * stopword density ≥ ``jt_stopwords_low`` → ``neargood``;
    * else → ``bad``.

    Context-sensitive pass (simplified from §3.3, documented variant):
    each ``short``/``neargood`` block resolves against the NEAREST
    context-free ``good``/``bad`` neighbor on each side (document edges
    count as ``bad``): ``neargood`` becomes ``good`` with at least one
    ``good`` neighbor; ``short`` needs a ``good`` neighbor on BOTH
    sides, or one ``good`` neighbor with only ``neargood`` blocks
    between it and the other side. Returns the final ``good``/``bad``
    label per node."""
    raw: list[str] = []
    for node in nodes:
        if node.chars <= 0 or node.flagged:
            raw.append("bad")
            continue
        link_density = min(1.0, node.link_chars / node.chars)
        if link_density > cfg.jt_max_link_density:
            raw.append("bad")
            continue
        if node.chars < cfg.jt_length_low:
            raw.append("bad" if node.link_chars > 0 else "short")
            continue
        sd = _stopword_density(node.text)
        if sd >= cfg.jt_stopwords_high:
            raw.append("good" if node.chars > cfg.jt_length_high else "neargood")
        elif sd >= cfg.jt_stopwords_low:
            raw.append("neargood")
        else:
            raw.append("bad")

    n = len(raw)
    # nearest DECIDED (good/bad) neighbor on each side; edges are bad
    prev_ctx = ["bad"] * n
    cur = "bad"
    near_since_prev = [False] * n  # only neargood between the decided prev and here
    clean = True
    for i in range(n):
        prev_ctx[i] = cur
        near_since_prev[i] = clean
        if raw[i] in ("good", "bad"):
            cur = raw[i]
            clean = True
        elif raw[i] == "short":
            clean = False
    next_ctx = ["bad"] * n
    near_to_next = [False] * n
    cur = "bad"
    clean = True
    for i in range(n - 1, -1, -1):
        next_ctx[i] = cur
        near_to_next[i] = clean
        if raw[i] in ("good", "bad"):
            cur = raw[i]
            clean = True
        elif raw[i] == "short":
            clean = False

    final: list[str] = []
    for i, label in enumerate(raw):
        if label in ("good", "bad"):
            final.append(label)
        elif label == "neargood":
            final.append(
                "good" if (prev_ctx[i] == "good" or next_ctx[i] == "good") else "bad"
            )
        else:  # short
            both_good = prev_ctx[i] == "good" and next_ctx[i] == "good"
            one_good_clean = (
                (prev_ctx[i] == "good" and near_to_next[i])
                or (next_ctx[i] == "good" and near_since_prev[i])
            )
            final.append("good" if (both_good or one_good_clean) else "bad")
    return final


def extract_html_justext(text: str, cfg: ExtractConfig) -> ExtractResult:
    """jusText-strategy main-content extraction: keep the blocks the
    classifier labels ``good``, in document order, with one span per
    kept block (span score 1.0 — classification, not density). Falls
    back to the full visible text when nothing classifies good, with
    the same note/flag contract as the density strategy."""
    nodes = parse_html(text)
    if not nodes:
        return ExtractResult(
            "", [], ["No visible text found; used full document text."], True
        )
    labels = classify_nodes_justext(nodes, cfg)
    if "good" not in labels:
        scores = [score_node(n, cfg) for n in nodes]
        return _fallback(
            nodes, scores, "No main-content paragraphs found; used full document text."
        )
    parts: list[str] = []
    spans: list[Span] = []
    offset = 0
    for node, label in zip(nodes, labels):
        if label != "good":
            continue
        start = 0 if not parts else offset + 1
        spans.append(Span(start, start + node.chars, node.tag, 1.0))
        parts.append(node.text)
        offset = start + node.chars
    return ExtractResult("\n".join(parts), spans, [], False)


def extract_html(text: str, cfg: ExtractConfig) -> ExtractResult:
    """Extract main content from an HTML payload (find_crop_bbox analog).

    Dispatches on ``cfg.html_strategy``: the default density strategy
    below mirrors the reference's crop pipeline; ``justext`` routes to
    :func:`extract_html_justext` (classification, not thresholding)."""
    if cfg.html_strategy == "justext":
        return extract_html_justext(text, cfg)
    nodes = parse_html(text)
    scores = [score_node(n, cfg) for n in nodes]
    if not nodes:
        return ExtractResult("", [], ["No visible text found; used full document text."], True)

    n = len(nodes)
    mask = [s >= cfg.density_threshold for s in scores]
    if not any(mask):
        return _fallback(nodes, scores, "No dense content region found; used full document text.")

    first = mask.index(True)
    last = n - 1 - mask[::-1].index(True)

    # min-area fallback BEFORE padding, like the reference (page_images.py:351-355)
    region_chars = sum(node.chars for node in nodes[first : last + 1])
    total_chars = sum(node.chars for node in nodes)
    if region_chars < cfg.min_area_frac * total_chars:
        return _fallback(
            nodes, scores, "Detected content region too small; used full document text."
        )

    first = max(0, first - cfg.pad_nodes)
    last = min(n - 1, last + cfg.pad_nodes)

    inset = max(0, cfg.edge_inset_nodes)
    if inset > 0:
        first = min(last, first + inset)
        last = max(first, last - inset)
    if last < first:
        return _fallback(
            nodes, scores, "Invalid content bounds after edge inset; used full document text."
        )

    detected_left, clamp_left = resolve_outer_clamp(scores, side="left", cfg=cfg)
    detected_right, clamp_right = resolve_outer_clamp(scores, side="right", cfg=cfg)
    if clamp_left > 0:
        first = max(first, clamp_left)
    if clamp_right > 0:
        last = min(last, n - 1 - clamp_right)
    if last < first:
        return _fallback(
            nodes,
            scores,
            "Invalid content bounds after boilerplate clamp; used full document text.",
        )

    parts: list[str] = []
    spans: list[Span] = []
    offset = 0
    for i in range(first, last + 1):
        node = nodes[i]
        start = 0 if not parts else offset + 1
        spans.append(Span(start, start + node.chars, node.tag, scores[i]))
        parts.append(node.text)
        offset = start + node.chars
    return ExtractResult("\n".join(parts), spans, [], False)
