"""Exact goldens for the HTML density extractor — mirrors the reference's
test style (synthetic inputs, exact assertions,
/root/reference/tests/test_page_images.py)."""

from pdf_toolkit_ray.config import ExtractConfig
from pdf_toolkit_ray.functions.htmlx import (
    detect_boilerplate_run,
    extract_html,
    parse_html,
    resolve_outer_clamp,
    score_node,
)

CFG = ExtractConfig()

HOSTILE = [
    "<div><p>one two<nav>junk</body>",
    "<script>if(a<b){x}</script><p>visible text</p>",
    "<style>a>b{}</style><article><p>content here</p></article>",
    "plain < less than & amp; text",
    "<DIV CLASS='ADS'>caps <A>x</A></DIV><p>real stuff</p>",
    "<!-- <p>commented</p> --><p>kept words</p>",
    "<p>a &lt; b &amp; c</p>",
    "<p>unterminated",
    "",
    "<br><hr><p>after voids</p>",
    "<article><p>x</p><p></p><p>y</p></article>",
    "<a href='#'>bare link outside blocks</a>",
]


def test_fast_parser_matches_stdlib():
    """The fast scanner must produce the identical node list as the
    html.parser reference on every fixture payload and hostile case."""
    from pdf_toolkit_ray.functions.htmlx import parse_html_fast, parse_html_stdlib
    from pdf_toolkit_ray.functions.sniff import sniff_kind
    from pdf_toolkit_ray.sources.fixtures import generate_transcripts_table

    docs = [
        t
        for t in generate_transcripts_table("smoke").column("text").to_pylist()
        if sniff_kind(t) == "html"
    ]
    assert len(docs) > 50
    for doc in docs + HOSTILE:
        assert parse_html_fast(doc) == parse_html_stdlib(doc), doc[:200]

DOC = (
    "<html><head><title>t</title><style>.x{}</style></head><body>"
    '<nav>home about <a href="#">login</a> <a href="#">signup</a></nav>'
    '<div class="ads">buy this <a>now</a> <a>cheap</a></div>'
    "<article><p>alpha bravo charlie delta</p><p>echo foxtrot golf</p></article>"
    "<footer>copyright somebody</footer></body></html>"
)


def test_article_extracted_boilerplate_dropped():
    res = extract_html(DOC, CFG)
    assert res.extracted_text == "alpha bravo charlie delta\necho foxtrot golf"
    assert res.used_fallback is False
    assert res.notes == []
    assert [s.kind for s in res.spans] == ["p", "p"]
    assert (res.spans[0].start, res.spans[0].end) == (0, 25)
    assert (res.spans[1].start, res.spans[1].end) == (26, 43)


def test_title_and_style_invisible():
    nodes = parse_html(DOC)
    texts = [n.text for n in nodes]
    assert "t" not in texts
    assert all(".x" not in t for t in texts)


def test_node_flags_and_scores():
    nodes = parse_html(DOC)
    by_tag = {n.tag: n for n in nodes}
    assert by_tag["nav"].flagged and by_tag["footer"].flagged and by_tag["div"].flagged
    assert not by_tag["p"].flagged
    assert score_node(by_tag["nav"], CFG) < CFG.density_threshold
    assert score_node(by_tag["p"], CFG) >= CFG.density_threshold


def test_min_area_fallback():
    doc = (
        "<html><body><nav>"
        + "lots of navigation boilerplate words repeated " * 6
        + "</nav><article><p>tiny gold</p></article><footer>"
        + "massive copyright footer text also repeated " * 6
        + "</footer></body></html>"
    )
    res = extract_html(doc, CFG)
    assert res.used_fallback is True
    assert res.notes == ["Detected content region too small; used full document text."]
    assert "tiny gold" in res.extracted_text
    assert "navigation" in res.extracted_text  # whole-doc fallback keeps everything


def test_no_dense_region_fallback():
    doc = '<html><body><nav>a <a>b</a> <a>c</a> d</nav></body></html>'
    res = extract_html(doc, CFG)
    assert res.used_fallback is True
    assert res.notes == ["No dense content region found; used full document text."]


def test_empty_doc():
    res = extract_html("<html><body></body></html>", CFG)
    assert res.extracted_text == ""
    assert res.used_fallback is True


def test_pad_nodes_includes_neighbors():
    cfg = ExtractConfig(pad_nodes=1)
    res = extract_html(DOC, cfg)
    # one boilerplate neighbor each side joins the region
    assert res.extracted_text.startswith("buy this now cheap\nalpha")
    assert res.extracted_text.endswith("golf\ncopyright somebody")


def test_edge_inset_shrinks_region():
    doc = (
        "<html><body><article>"
        "<p>first paragraph words</p><p>middle paragraph words</p><p>last paragraph words</p>"
        "</article></body></html>"
    )
    res = extract_html(doc, ExtractConfig(edge_inset_nodes=1))
    assert res.extracted_text == "middle paragraph words"


# --- boilerplate-run hysteresis, mirroring reference clamp tests
# (/root/reference/tests/test_page_images.py:208-227, 371-420 style) ---


def test_boilerplate_run_detected_then_released():
    # 3 junk nodes, then clean content: detected bar = 3
    scores = [0.1, 0.2, 0.3, 0.9, 0.95, 0.9, 0.9, 0.9, 0.9, 0.9]
    got = detect_boilerplate_run(
        scores, side="left", search_frac=1.0, enter_cutoff=0.6, release_frac=0.35, min_run=2
    )
    assert got == 3


def test_boilerplate_run_right_side():
    scores = [0.9] * 8 + [0.1, 0.1]
    got = detect_boilerplate_run(
        scores, side="right", search_frac=1.0, enter_cutoff=0.6, release_frac=0.35, min_run=2
    )
    assert got == 2


def test_boilerplate_run_none():
    scores = [0.9] * 10
    assert (
        detect_boilerplate_run(
            scores, side="left", search_frac=1.0, enter_cutoff=0.6, release_frac=0.35, min_run=2
        )
        == 0
    )


def test_boilerplate_run_fills_search_window():
    # never releases -> bar spans the whole search window (ref: page_images.py:259-260)
    scores = [0.1] * 10
    got = detect_boilerplate_run(
        scores, side="left", search_frac=0.5, enter_cutoff=0.6, release_frac=0.35, min_run=2
    )
    assert got == 5


def test_resolve_clamp_modes():
    scores = [0.1, 0.1, 0.9, 0.9, 0.9, 0.9, 0.9, 0.9, 0.9, 0.9]
    off = ExtractConfig(outer_margin_mode="off")
    assert resolve_outer_clamp(scores, side="left", cfg=off) == (0, 0)
    fixed = ExtractConfig(outer_margin_mode="fixed", outer_margin_fixed_nodes=4)
    assert resolve_outer_clamp(scores, side="left", cfg=fixed) == (0, 4)
    auto = ExtractConfig(outer_margin_mode="auto", outer_margin_pad_nodes=1,
                         outer_margin_auto_max_frac=0.5)
    # detected=2, applied=min(2+1, 10*0.5)=3
    assert resolve_outer_clamp(scores, side="left", cfg=auto) == (2, 3)
    capped = ExtractConfig(outer_margin_mode="auto", outer_margin_pad_nodes=5,
                           outer_margin_auto_max_frac=0.3)
    # applied capped at int(10*0.3)=3
    assert resolve_outer_clamp(scores, side="left", cfg=capped) == (2, 3)


def test_auto_clamp_trims_leading_boilerplate_region():
    # low-score junk inside the dense region edge via pad, then clamped away
    doc = (
        "<html><body>"
        "<nav>j1 <a>x</a> <a>y</a> j2</nav>"
        "<nav>j3 <a>x</a> <a>y</a> j4</nav>"
        "<article><p>real content words here</p><p>more real content words</p></article>"
        "</body></html>"
    )
    plain = extract_html(doc, ExtractConfig(pad_nodes=2))
    assert plain.extracted_text.startswith("j1 x y j2")
    clamped = extract_html(
        doc, ExtractConfig(pad_nodes=2, outer_margin_mode="auto")
    )
    assert clamped.extracted_text == "real content words here\nmore real content words"


class TestJustextStrategy:
    def _cfg(self, **kw):
        from pdf_toolkit_ray.config import ExtractConfig

        return ExtractConfig(html_strategy="justext", **kw)

    GOOD_PARA = (
        "<p>This is a long paragraph about the system and how it works in "
        "practice because the words here are mostly common and they should "
        "be seen as the main content of the page by any reader who is "
        "looking at it with some care and a little patience today.</p>"
    )
    NAV = '<div class="nav"><a href="/a">Home</a> <a href="/b">About</a></div>'
    GIBBERISH = (
        "<p>zxqv qwrt plmk bngh asdf jklm qwer tyui zxcv bnmq wert yuio "
        "asdg hjkl zxcb nmqw erty uiop asdh jklz xcvb nmqe rtyu iopa sdfj "
        "klzx cvbn mqwe rtyu iopsa dfgh jklzx cvbnm qwert yuiop</p>"
    )

    def test_good_vs_nav_vs_gibberish(self):
        from pdf_toolkit_ray.functions.htmlx import (
            classify_nodes_justext,
            parse_html,
        )

        cfg = self._cfg()
        nodes = parse_html(self.NAV + self.GOOD_PARA + self.GIBBERISH)
        labels = classify_nodes_justext(nodes, cfg)
        by_text = {n.text[:12]: lab for n, lab in zip(nodes, labels)}
        assert any(lab == "good" for lab in labels)
        assert by_text.get("Home About", by_text.get("Home", "bad")) == "bad"
        assert [lab for n, lab in zip(nodes, labels) if n.text.startswith("zxqv")] == [
            "bad"
        ]

    def test_short_heading_promoted_between_good(self):
        from pdf_toolkit_ray.functions.htmlx import extract_html

        cfg = self._cfg()
        doc = self.GOOD_PARA + "<h2>Results</h2>" + self.GOOD_PARA
        out = extract_html(doc, cfg)
        assert not out.used_fallback
        assert "Results" in out.extracted_text
        # heading alone (edges are bad context) stays out
        alone = extract_html(self.NAV + "<h2>Results</h2>" + self.NAV, cfg)
        assert alone.used_fallback or "Results" not in alone.extracted_text

    def test_all_bad_falls_back_full_text(self):
        from pdf_toolkit_ray.functions.htmlx import extract_html

        out = extract_html(self.NAV + self.GIBBERISH, self._cfg())
        assert out.used_fallback
        assert "Home" in out.extracted_text  # fallback = full visible text
        assert out.notes == [
            "No main-content paragraphs found; used full document text."
        ]

    def test_spans_cover_kept_blocks_exactly(self):
        from pdf_toolkit_ray.functions.htmlx import extract_html

        out = extract_html(self.GOOD_PARA + self.NAV + self.GOOD_PARA, self._cfg())
        assert not out.used_fallback
        for span in out.spans:
            assert out.extracted_text[span.start : span.end] != ""
        joined = "\n".join(out.extracted_text[s.start : s.end] for s in out.spans)
        assert joined == out.extracted_text

    def test_config_validation(self):
        import pytest as _pytest

        from pdf_toolkit_ray import UserError
        from pdf_toolkit_ray.config import ExtractConfig

        with _pytest.raises(UserError, match="html_strategy"):
            ExtractConfig(html_strategy="nope")
        with _pytest.raises(UserError, match="jt_length_low"):
            ExtractConfig(jt_length_low=0)
        with _pytest.raises(UserError, match="jt_stopwords"):
            ExtractConfig(jt_stopwords_low=0.5, jt_stopwords_high=0.4)
