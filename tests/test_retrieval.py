"""BM25 retrieval: engineered-corpus goldens for the scoring semantics
(idf direction, tf saturation, length normalization, rounded-score
ranking, zero-score exclusion)."""

import math

import pyarrow as pa
import pyarrow.parquet as pq

from pdf_toolkit_ray import queries


def _bm25_reference(docs: dict[int, str], terms=("join", "spark", "window")):
    """Independent per-doc reference with the same fixed-order float ops."""
    split = {d: t.split(" ") for d, t in docs.items()}
    n_docs = len(docs)
    n_tokens = sum(len(w) for w in split.values())
    avgdl = float(n_tokens) / float(n_docs)
    df = {t: sum(1 for w in split.values() if t in w) for t in terms}
    out = {}
    for d, w in split.items():
        dl = float(len(w))
        tail = 1.2 * (0.25 + 0.75 * (dl / avgdl))
        s = 0.0
        for t in terms:
            idf = math.log((n_docs - float(df[t]) + 0.5) / (float(df[t]) + 0.5) + 1.0)
            tf = float(w.count(t))
            s = s + (idf * (tf * 2.2)) / (tf + tail)
        r = math.floor(abs(s) * 1e4 + 0.5) / 1e4 * (1 if s >= 0 else -1)
        if r > 0.0:
            out[d] = r
    return out


def test_bm25_engineered(ray_session, tmp_path):
    docs = {
        1: "join join join join",          # heavy tf, short doc
        2: "join spark",                    # two distinct terms, shortest
        3: "window window other words here filler filler filler",  # long doc
        4: "nothing matches at all",        # zero score -> excluded
        5: "join other other other other other other other other",  # diluted
    }
    tbl = pa.table(
        {
            "doc_id": pa.array(list(docs.keys()), pa.int64()),
            "text": pa.array(list(docs.values())),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))

    got = queries.bm25_topk_documents(str(tmp_path)).to_pandas()
    want = _bm25_reference(docs)

    assert set(got["doc_id"]) == set(want)          # doc 4 excluded
    for _, row in got.iterrows():
        assert row["score"] == want[int(row["doc_id"])]
    # ranking: rounded score desc, doc_id asc
    ranked = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))
    assert list(got["doc_id"]) == [d for d, _ in ranked]
    # semantics: tf saturates (doc1 beats doc5 but not 4x), length norm
    # favors the short two-term doc2 over the diluted doc5
    assert want[2] > want[5]
    assert want[1] > want[5]


def test_chunk_sliding_matches_reference(ray_session, tmp_path):
    """Sliding-chunker boundary math vs a plain-python reference over
    adversarial token counts (0 < n <= W, n == W, n % stride edges)."""
    import pyarrow.parquet as pq2

    docs = {}
    # token counts around every boundary: 1, W-1, W, W+1, multiples of
    # stride, stride+1, and a long one
    for i, n in enumerate([1, 47, 48, 49, 63, 64, 65, 96, 97, 112, 113, 300]):
        docs[i] = " ".join(f"t{i}_{j}" for j in range(n))
    tbl = pa.table(
        {
            "doc_id": pa.array(list(docs.keys()), pa.int64()),
            "text": pa.array(list(docs.values())),
        }
    )
    pq2.write_table(tbl, str(tmp_path / "documents.parquet"))

    got = (
        queries.chunk_sliding_documents(str(tmp_path))
        .to_pandas()
        .sort_values(["doc_id", "chunk_idx"])
        .reset_index(drop=True)
    )

    W, S = 64, 48
    expect = []
    for d, text in docs.items():
        toks = text.split(" ")
        n = len(toks)
        n_chunks = 1 if n <= W else (n - W + S - 1) // S + 1
        for k in range(n_chunks):
            s = k * S
            e = min(s + W, n)
            expect.append((d, k, s, e - s, " ".join(toks[s:e])))
    assert len(got) == len(expect)
    for row, (d, k, s, ln, txt) in zip(got.itertuples(), expect):
        assert (row.doc_id, row.chunk_idx, row.tok_start, row.tok_len, row.text) == (
            d, k, s, ln, txt
        )
    # every token of every doc appears in at least one chunk (no drops)
    for d, text in docs.items():
        toks = text.split(" ")
        covered = set()
        for row in got[got["doc_id"] == d].itertuples():
            covered.update(range(row.tok_start, row.tok_start + row.tok_len))
        assert covered == set(range(len(toks)))
