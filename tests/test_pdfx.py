"""Exact goldens for the mini-PDF layout parser."""

import pytest
from hypothesis import given, settings, strategies as st

from pdf_toolkit_ray.config import ExtractConfig
from pdf_toolkit_ray.functions.pdfx import (
    Block,
    MiniPdfError,
    apply_split_symmetry,
    detect_gutter_x,
    detect_spread,
    extract_pdf,
    normalize_rotation,
    parse_minipdf,
    split_spread_blocks,
    unrotate_point,
)
from pdf_toolkit_ray.sources.fixtures import _rot_forward

CFG = ExtractConfig()


def test_normalize_rotation():
    assert normalize_rotation(270, 180) == 90
    assert normalize_rotation(90, 270) == 0
    with pytest.raises(MiniPdfError):
        normalize_rotation(0, 45)


@settings(derandomize=True)
@given(
    x=st.integers(0, 599),
    y=st.integers(0, 799),
    rotate=st.sampled_from([0, 90, 180, 270]),
)
def test_rotation_roundtrip(x, y, rotate):
    w, h = 600, 800
    ex, ey, ew, eh = _rot_forward(x, y, w, h, rotate)
    assert unrotate_point(ex, ey, ew, eh, rotate) == (x, y)


def test_parse_golden():
    doc = "%MINIPDF 1.0\nobj page 1 w=600 h=800 rotate=90\nblock x=10 y=20 | hello there\nendobj"
    pages = parse_minipdf(doc)
    assert len(pages) == 1
    p = pages[0]
    assert (p.num, p.width, p.height, p.rotate) == (1, 600, 800, 90)
    assert p.true_size == (800, 600)
    assert p.blocks == [Block(x=10, y=20, text="hello there")]


@pytest.mark.parametrize(
    "bad",
    [
        "no magic",
        "%MINIPDF 1.0\nobj page X\nendobj",
        "%MINIPDF 1.0\nblock x=1 y=1 | orphan",
        "%MINIPDF 1.0\nobj page 1\nblock x=1 | no y\nendobj",
        "%MINIPDF 1.0\nobj page 1\nblock x=1 y=2 no pipe\nendobj",
        "%MINIPDF 1.0\nobj page 1",
        "%MINIPDF 1.0\nobj page 1 rotate=45\nendobj",
        "%MINIPDF 1.0",
    ],
)
def test_parse_errors(bad):
    with pytest.raises(MiniPdfError):
        parse_minipdf(bad)


def test_malformed_payload_falls_back():
    res = extract_pdf("%MINIPDF 1.0\ngarbage line", CFG)
    assert res.used_fallback is True
    assert res.extracted_text == "%MINIPDF 1.0 garbage line"
    assert len(res.notes) == 1 and res.notes[0].startswith("Unparseable PDF payload")


def test_reading_order_and_rotation():
    # scrambled emission; rotate=180 coords; reading order = (y then x) in true space
    blocks_true = [(50, 50, "one"), (300, 50, "two"), (50, 200, "three")]
    lines = ["%MINIPDF 1.0", "obj page 1 w=600 h=800 rotate=180"]
    for x, y, t in reversed(blocks_true):
        ex, ey, _, _ = _rot_forward(x, y, 600, 800, 180)
        lines.append(f"block x={ex} y={ey} | {t}")
    lines.append("endobj")
    res = extract_pdf("\n".join(lines), CFG)
    assert res.extracted_text == "one\ntwo\nthree"
    assert res.used_fallback is False


def test_multipage_order():
    doc = (
        "%MINIPDF 1.0\n"
        "obj page 2 w=600 h=800 rotate=0\nblock x=50 y=50 | second page\nendobj\n"
        "obj page 1 w=600 h=800 rotate=0\nblock x=50 y=50 | first page\nendobj"
    )
    assert extract_pdf(doc, CFG).extracted_text == "first page\nsecond page"


def test_detect_spread():
    assert detect_spread(1200, 800, 1.25) is True
    assert detect_spread(600, 800, 1.25) is False
    assert detect_spread(100, 0, 1.25) is False


def test_detect_gutter_golden():
    blocks = [Block(400, 50, "l"), Block(100, 50, "l2"), Block(800, 50, "r")]
    gutter, fellback = detect_gutter_x(blocks, 1200, 0.35)
    assert gutter == 600 and fellback is False


def test_detect_gutter_fallback_to_center():
    # all blocks clustered on one side: no gap midpoint in the center window -> center
    blocks = [Block(10, 50, "a"), Block(60, 50, "b"), Block(120, 50, "c")]
    gutter, fellback = detect_gutter_x(blocks, 1200, 0.35)
    assert gutter == 600 and fellback is True


def test_split_spread_blocks_trim_band_dropped():
    blocks = [Block(100, 0, "L"), Block(598, 0, "mid"), Block(1100, 0, "R")]
    left, right = split_spread_blocks(blocks, 600, 1200, gutter_trim_px=10)
    assert [b.text for b in left] == ["L"]
    assert [b.text for b in right] == ["R"]


def test_spread_extraction_left_then_right():
    doc = (
        "%MINIPDF 1.0\n"
        "obj page 1 w=1200 h=800 rotate=0\n"
        "block x=750 y=40 | right first\n"
        "block x=400 y=300 | left second\n"
        "block x=380 y=40 | left first\n"
        "block x=800 y=300 | right second\n"
        "endobj"
    )
    res = extract_pdf(doc, CFG)
    assert res.extracted_text == "left first\nleft second\nright first\nright second"
    assert [s.kind for s in res.spans] == ["block_l", "block_l", "block_r", "block_r"]


# --- symmetry strategies (1-D analog of reference page_images.py:467-543;
# equality goldens in the style of tests/test_page_images.py:422-464) ---


def test_symmetry_independent():
    assert apply_split_symmetry((10, 100), (130, 200), 115, 240, "independent") == (
        (10, 100),
        (130, 200),
        None,
    )


def test_symmetry_match_max_width():
    left, right, note = apply_split_symmetry((10, 60), (130, 230), 115, 240, "match_max_width")
    assert note is None
    assert (left[1] - left[0]) == (right[1] - right[0]) == 100


def test_symmetry_mirror_from_gutter():
    left, right, note = apply_split_symmetry((10, 100), (140, 200), 115, 240, "mirror_from_gutter")
    assert note is None
    # gaps equalized to the larger gap (25)
    assert 115 - left[1] == right[0] - 115 == 25


def test_symmetry_invalid_falls_back_with_note():
    _, _, note = apply_split_symmetry((10, 100), (130, 200), 115, 240, "bogus")
    assert note == "Unknown symmetry strategy; used independent."
