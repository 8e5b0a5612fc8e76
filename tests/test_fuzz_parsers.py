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
_word = st.text(alphabet="abcdefgh &<>", min_size=0, max_size=12)


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
            parts.append(f"<{tag}/>")
    return "".join(parts)


@settings(max_examples=200, deadline=None)
@given(tag_soup())
def test_fast_parser_agrees_on_tag_soup(doc):
    assert parse_html_fast(doc) == parse_html_stdlib(doc)


@settings(max_examples=100, deadline=None)
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
