import pyarrow as pa

from pdf_toolkit_ray.functions.sniff import sniff_kind, sniff_kind_arrow

CASES = [
    ("plain words here", "plain"),
    ("  \n%MINIPDF 1.0\nobj page 1\nendobj", "pdf"),
    ("<html><body>x</body></html>", "html"),
    ("<HTML><BODY>caps</BODY></HTML>", "html"),
    ("<!DOCTYPE html><html></html>", "html"),
    ("  <html>leading ws</html>", "html"),
    ("< html not a tag", "plain"),
    ("%MINIPD truncated magic", "plain"),
    ("", "plain"),
]


def test_scalar_goldens():
    for text, want in CASES:
        assert sniff_kind(text) == want, text


def test_vectorized_matches_scalar():
    texts = [t for t, _ in CASES]
    got = sniff_kind_arrow(pa.array(texts)).to_pylist()
    assert got == [w for _, w in CASES]
