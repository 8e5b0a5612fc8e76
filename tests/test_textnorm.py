import pyarrow as pa

from pdf_toolkit_ray.functions.textnorm import norm_inline, norm_inline_arrow

GRID = [
    "",
    "   ",
    "a",
    "  a  ",
    "a b",
    "a  b",
    "a\tb",
    "a\r\nb",
    "a\rb",
    "a\n\n\nb",
    "\v\f x \r\n",
    "  café étude ",
    "éclair",
    "x y",          # NBSP preserved: ASCII-only whitespace semantics
    "tab\t \r\n mix",
    "ünïcode  wörds",
    # ASCII separator controls \x1c-\x1f: str.split() treats them as
    # whitespace but the pinned ASCII-ws class does NOT — these force the
    # python fast path to fall back to the regex
    "a\x1cb",
    " a \x1d b ",
    "\x1e\x1f",
    "a \x1c  b",
]


def test_norm_inline_goldens():
    assert norm_inline("  a  b  ") == "a b"
    assert norm_inline("a\r\nb\rc\nd") == "a b c d"
    assert norm_inline("\t\n") == ""
    assert norm_inline("x y") == "x y"


def test_python_arrow_agree():
    arrow = norm_inline_arrow(pa.array(GRID)).to_pylist()
    python = [norm_inline(s) for s in GRID]
    assert arrow == python


def test_arrow_chunked_input():
    chunked = pa.chunked_array([GRID[:4], GRID[4:]])
    assert norm_inline_arrow(chunked).to_pylist() == [norm_inline(s) for s in GRID]
