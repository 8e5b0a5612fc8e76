"""Property-based fuzzing: the fast HTML scanner must agree with the
stdlib reference on arbitrary tag soup, and extraction must never crash
on arbitrary payload bytes."""

from hypothesis import given, settings, strategies as st

from pdf_toolkit_ray.config import ExtractConfig
from pdf_toolkit_ray.functions.htmlx import parse_html_fast, parse_html_stdlib

CFG = ExtractConfig()

_tag = st.sampled_from(
    ["div", "p", "article", "nav", "footer", "span", "a", "b", "ul", "li",
     "script", "style", "br", "img", "table", "h1"]
)
# parity fuzz: text atoms without bare '<'/'>' — html.parser's recovery from
# malformed START tags ('<div</div>') has C-level quirks we deliberately do
# not emulate; curated HOSTILE cases in test_htmlx.py pin the ones we do.
_word = st.text(alphabet="abcdefgh &;", min_size=0, max_size=12)
_raw = st.text(alphabet="abcdefgh &<>/\"'=", min_size=0, max_size=60)


@st.composite
def tag_soup(draw):
    parts = []
    for _ in range(draw(st.integers(0, 25))):
        kind = draw(st.integers(0, 4))
        tag = draw(_tag)
        if kind == 0:
            attrs = draw(st.sampled_from(["", ' class="ads"', " id=x", ' href="#"']))
            parts.append(f"<{tag}{attrs}>")
        elif kind == 1:
            parts.append(f"</{tag}>")
        elif kind == 2:
            parts.append(draw(_word))
        elif kind == 3:
            parts.append(f"<!-- {draw(_word)} -->")
        else:
            # self-closing: for script/style the fast scanner intentionally
            # behaves like browsers (`<script/>` opens raw-content mode until
            # a real close tag) where html.parser merely bumps a depth
            # counter any ignore-family close can pop — exclude that corner
            # from the parity claim
            if tag in ("script", "style"):
                tag = "span"
            parts.append(f"<{tag}/>")
    return "".join(parts)


@settings(max_examples=200, deadline=None, derandomize=True)
@given(tag_soup())
def test_fast_parser_agrees_on_tag_soup(doc):
    assert parse_html_fast(doc) == parse_html_stdlib(doc)


@settings(max_examples=150, deadline=None, derandomize=True)
@given(_raw)
def test_fast_parser_never_crashes_on_raw_soup(doc):
    """Full-alphabet soup (malformed tags included): both parsers must not
    crash; exact parity is only claimed for structurally-tagged input."""
    parse_html_fast(doc)
    parse_html_stdlib(doc)


@settings(max_examples=100, deadline=None, derandomize=True)
@given(st.text(max_size=400))
def test_extract_never_crashes(payload):
    from pdf_toolkit_ray.functions.extract import extract_batch
    import pyarrow as pa

    t = pa.table(
        {
            "conv_id": ["c"],
            "turn_idx": pa.array([0], pa.int32()),
            "role": ["user"],
            "text": [payload],
            "tool": [""],
            "ts": pa.array([0], pa.timestamp("us")),
        }
    )
    out = extract_batch(t, CFG)
    assert out.num_rows == 1
    assert out.column("extracted_text")[0].as_py() is not None
