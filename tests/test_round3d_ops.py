"""Edge-case tests for the span-removal and source-overlap curation
ops: exact removal semantics (cross-doc only, overlapping spans, short
docs untouched), hand-checkable Jaccard values, and the no-text-on-the-
shuffle scale invariant for the span explode."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _docs(tmp_path, texts, sources=None):
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(texts), pa.string()),
            "source": pa.array(sources or ["s0"] * len(texts), pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")
    return str(tmp_path)


def test_dup_span_removal_semantics(ray_session, tmp_path):
    from pdf_toolkit_ray.queries import dup_span_removal_documents

    shared = "a b c d e"  # the only cross-doc 5-gram
    texts = [
        f"x1 x2 {shared} y1 y2",       # tokens 2..6 removed
        f"{shared} z1 z2 z3 z4 z5",    # tokens 0..4 removed
        "a b c d",                     # < 5 tokens: untouched
        "w1 w2 w3 w4 w5 w1 w2 w3 w4 w5",  # within-doc repeat only: untouched
    ]
    sf = _docs(tmp_path, texts)
    out = (
        dup_span_removal_documents(sf)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out.loc[0, "clean_text"] == "x1 x2 y1 y2"
    assert out.loc[0, "n_removed"] == 5 and out.loc[0, "n_tokens"] == 9
    assert out.loc[1, "clean_text"] == "z1 z2 z3 z4 z5"
    assert out.loc[2, "clean_text"] == "a b c d" and out.loc[2, "n_removed"] == 0
    # duplicated only WITHIN one doc -> not cross-doc, kept whole
    assert out.loc[3, "n_removed"] == 0
    assert abs(out.loc[0, "kept_frac"] - round(4 / 9, 4)) < 1e-12


def test_dup_span_removal_overlapping_spans(ray_session, tmp_path):
    from pdf_toolkit_ray.queries import dup_span_removal_documents

    # two docs share a 6-token run -> two overlapping dup 5-grams in each;
    # covered positions must be the distinct union (6 tokens, not 10)
    run = "a b c d e f"
    sf = _docs(tmp_path, [f"p1 {run} q1", f"r1 r2 {run}"])
    out = dup_span_removal_documents(sf).to_pandas().set_index("doc_id")
    assert out.loc[0, "n_removed"] == 6
    assert out.loc[0, "clean_text"] == "p1 q1"
    assert out.loc[1, "clean_text"] == "r1 r2"


def test_span_explode_carries_no_text(ray_session, tmp_path):
    # the scale invariant: what enters the shingle shuffle is (hash,
    # doc, pos) — document text must never be a column of the explode
    import pdf_toolkit_ray.queries as q
    import inspect

    src = inspect.getsource(q.dup_span_removal_documents)
    # the explode emits exactly these columns
    assert '"sh": pa.array' in src and '"pos": pa.array' in src
    assert '"text"' not in src.split("def bucket_dup_occurrences")[0].split("return pa.table")[1]


def test_source_overlap_handchecked(ray_session, tmp_path):
    from pdf_toolkit_ray.queries import source_overlap_documents

    # srcA docs: shingles {a b c, b c d} and {e f g}; srcB: {a b c, e f g, f g h}
    texts = ["a b c d", "e f g", "a b c", "e f g h"]
    sources = ["A", "A", "B", "B"]
    sf = _docs(tmp_path, texts, sources)
    out = source_overlap_documents(sf).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    # A: {abc, bcd, efg} (3); B: {abc, efg, fgh} (3); common {abc, efg} (2)
    assert (r.source_a, r.source_b) == ("A", "B")
    assert (r.n_a, r.n_b, r.n_common) == (3, 3, 2)
    assert abs(r.jaccard - round(2 / 4, 4)) < 1e-12


def test_shingle_hashes_pos_alignment():
    from pdf_toolkit_ray.functions.hashing import (
        _WordHashCache,
        shingle_hashes_pos,
    )

    cache = _WordHashCache()
    words = "w0 w1 w2 w3 w4 w5 w6".split()
    h = shingle_hashes_pos(words, 5, cache)
    assert len(h) == 3
    # position i hashes words[i:i+5]: shifting the window by one changes it
    assert h[0] != h[1]
    # same 5 words elsewhere hash identically (position-independent content)
    h2 = shingle_hashes_pos(["z"] + words[:5], 5, cache)
    assert h2[1] == h[0]
    assert len(shingle_hashes_pos(["a", "b"], 5, cache)) == 0


def test_pack_sequences_edges(ray_session, tmp_path):
    from pdf_toolkit_ray.queries import pack_sequences_documents

    # cap=256; doc1 has 300 tokens (> cap: its own pack); docs of 100
    # tokens pack 2-per-window; shard boundary at doc_id 1000 restarts
    texts = {
        0: "w " * 99 + "w",          # 100 tokens
        1: "w " * 299 + "w",         # 300 tokens > cap
        2: "w " * 99 + "w",
        3: "w " * 99 + "w",
        1000: "w " * 99 + "w",       # next shard: pack ids restart at 0
    }
    ids = sorted(texts)
    sf = _docs_ids(tmp_path, ids, [texts[i] for i in ids])
    out = (
        pack_sequences_documents(sf)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    # doc0 opens pack 0 (fill 100); doc1 (300 > cap) forces pack 1 alone;
    # doc2+doc3 share pack 2 (fill 100, 200)
    assert out.loc[0, ["pack_id", "pos_in_pack", "pack_fill"]].tolist() == [0, 0, 100]
    assert out.loc[1, ["pack_id", "pos_in_pack", "pack_fill"]].tolist() == [1, 0, 300]
    assert out.loc[2, ["pack_id", "pos_in_pack", "pack_fill"]].tolist() == [2, 0, 100]
    assert out.loc[3, ["pack_id", "pos_in_pack", "pack_fill"]].tolist() == [2, 1, 200]
    assert out.loc[1000, ["shard", "pack_id", "pos_in_pack"]].tolist() == [1, 0, 0]


def _docs_ids(tmp_path, ids, texts):
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(ids), pa.string()),
            "source": pa.array(["s0"] * len(ids), pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")
    return str(tmp_path)


def test_dsir_weights_handchecked(ray_session, tmp_path):
    import math

    from pdf_toolkit_ray.queries import dsir_weights_documents

    # target source 'src0' = {a a b}; corpus = {a a b, b c}
    # vocab V=3; raw totals: a=2,b=2,c=1 (T=5); tgt: a=2,b=1 (t=3)
    sf = _docs(tmp_path, ["a a b", "b c"], ["src0", "src1"])
    out = dsir_weights_documents(sf).to_pandas().set_index("doc_id")

    def lr(word):
        tgt = {"a": 2, "b": 1}.get(word, 0)
        raw = {"a": 2, "b": 2, "c": 1}[word]
        return math.log((tgt + 1) / (3 + 3)) - math.log((raw + 1) / (5 + 3))

    want0 = round(lr("a") * 2 + lr("b"), 4)
    want1 = round(lr("b") + lr("c"), 4)
    assert abs(out.loc[0, "logratio"] - want0) < 1e-9
    assert abs(out.loc[1, "logratio"] - want1) < 1e-9
    assert out.loc[0, "n_words"] == 3 and out.loc[1, "n_words"] == 2


def test_hopping_window_membership(ray_session, tmp_path):
    from pdf_toolkit_ray.queries import hopping_window_events

    # one event at t=4000s, hop=1800, size=3600: slot=3600 -> windows
    # starting 3600 and 1800 (each covers [start, start+3600))
    events = pa.table(
        {
            "event_id": pa.array([1], pa.int64()),
            "ts": pa.array(np.array([4000], "datetime64[s]").astype("datetime64[us]")),
            "user_id": pa.array([7], pa.int64()),
            "event_type": pa.array(["view"], pa.string()),
            "value": pa.array([2.5], pa.float64()),
            "props": pa.array(["{}"], pa.string()),
        }
    )
    pq.write_table(events, tmp_path / "events.parquet")
    out = hopping_window_events(str(tmp_path)).to_pandas()
    assert sorted(out.window_start_s) == [1800, 3600]
    assert (out.n_events == 1).all() and (out.total_value == 2.5).all()


def test_jsonl_roundtrip_unicode_and_schema_pin(ray_session, tmp_path):
    import ray
    from pdf_toolkit_ray.sources.jsonl import read_jsonl, write_jsonl

    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(["héllo wörld ✓", ""], pa.string()),
            "lang": pa.array(["de", None], pa.string()),
        }
    )
    out_dir = tmp_path / "jl"
    write_jsonl(ray.data.from_arrow(tbl), str(out_dir))
    back = (
        read_jsonl(str(out_dir), tbl.schema)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert back.loc[0, "text"] == "héllo wörld ✓"
    assert back.loc[1, "text"] == "" or back.loc[1, "text"] is None
    # a column absent from every JSON row still lands typed
    extra = tbl.schema.append(pa.field("missing", pa.float64()))
    back2 = read_jsonl(str(out_dir), extra).to_pandas()
    assert back2["missing"].isna().all()


def test_bpe_merges_handchecked(ray_session, tmp_path):
    from pdf_toolkit_ray.queries import bpe_merges_documents

    # corpus: "low low low lower" -> word counts {low:3, lower:1}
    # symbols: l o w </w> (x3) and l o w e r </w>
    # pair counts r0: (l,o)=4 (o,w)=4 (w,</w>)=3 (w,e)=1 (e,r)=1 (r,</w>)=1
    # tie 4/4 -> lexicographically smallest = (l,o)
    sf = _docs(tmp_path, ["low low low lower"])
    out = bpe_merges_documents(sf, k=3).to_pandas()
    assert out.loc[0, ["left", "right", "pair_count"]].tolist() == ["l", "o", 4]
    # after merge 0: lo w </w> x3, lo w e r </w>: (lo,w)=4 wins
    assert out.loc[1, ["left", "right", "pair_count"]].tolist() == ["lo", "w", 4]
    # after merge 1: low </w> x3, low e r </w>: (low,</w>)=3 wins
    assert out.loc[2, ["left", "right", "pair_count"]].tolist() == ["low", "</w>", 3]


def test_bpe_apply_merges_greedy_leftmost():
    from pdf_toolkit_ray.queries import _apply_merges

    # greedy left-to-right within one rank: "aaa" with merge (a,a)
    # collapses the FIRST pair -> ["aa", "a"]
    assert _apply_merges(["a", "a", "a"], [("a", "a")]) == ["aa", "a"]
    # rank order is applied sequentially, later merges see earlier output
    assert _apply_merges(list("abab"), [("a", "b"), ("ab", "ab")]) == ["abab"]


def test_q7_empty_result_typed(ray_session):
    from pdf_toolkit_ray.queries import q7_volume_shipping

    out = q7_volume_shipping("/root/testdata/sf0.001")
    assert out.num_rows == 0
    assert out.schema.names == ["supp_nation", "cust_nation", "l_year", "revenue"]


def test_chunk_documents_edges(ray_session, tmp_path):
    from pdf_toolkit_ray.queries import chunk_documents

    texts = ["", "x" * 150, "x" * 151, "a" * 400]
    sf = _docs(tmp_path, texts)
    out = chunk_documents(sf).to_pandas().sort_values(["doc_id", "chunk_idx"])
    by = {d: g for d, g in out.groupby("doc_id")}
    # empty doc -> exactly one empty chunk (doc_id survives)
    assert len(by[0]) == 1 and by[0].iloc[0].chunk_text == "" and by[0].iloc[0].chunk_end == 0
    # len == step -> single chunk
    assert len(by[1]) == 1 and by[1].iloc[0].chunk_end == 150
    # len == step+1 -> two chunks, second is the 1-char overlap tail
    assert len(by[2]) == 2 and by[2].iloc[1].start == 150 and by[2].iloc[1].chunk_text == "x"
    # 400 chars, size 200/step 150: chunks at 0,150,300; overlap region shared
    g = by[3]
    assert g.start.tolist() == [0, 150, 300]
    assert g.chunk_end.tolist() == [200, 350, 400]
    assert g.iloc[0].chunk_text[-50:] == g.iloc[1].chunk_text[:50]


def test_role_bigram_dedups_repeated_turns(ray_session, tmp_path):
    import ray as _ray
    from pdf_toolkit_ray import queries as q

    tbl = pa.table(
        {
            "conv_id": pa.array(["c1"] * 4 + ["c2"] * 2, pa.string()),
            "turn_idx": pa.array([0, 1, 1, 2, 0, 1], pa.int32()),
            "role": pa.array(["user", "assistant", "assistant", "user", "user", "tool"]),
            "text": pa.array(["x"] * 6),
            "tool": pa.array([""] * 6),
            "ts": pa.array(np.zeros(6, "datetime64[us]")),
        }
    )
    p = tmp_path / "t.parquet"
    pq.write_table(tbl, p)
    orig = q._transcripts_path
    q._transcripts_path = lambda sf: str(p)
    try:
        out = q.role_bigram_transcripts("ignored").to_pandas()
    finally:
        q._transcripts_path = orig
    got = {(r.prev_role, r.role): r.n for r in out.itertuples()}
    # duplicated (c1, turn 1) collapses: user->assistant->user, plus c2 user->tool
    assert got == {("user", "assistant"): 1, ("assistant", "user"): 1, ("user", "tool"): 1}


def test_dedup_near_keep_best_semantics(ray_session, tmp_path):
    from pdf_toolkit_ray.queries import dedup_near_keep_best

    # docs 0/1 near-identical (jaccard 1.0 on trigrams), doc 2 unique;
    # doc 1 longer -> kept; singleton cluster keeps itself with size 1
    base = "the quick brown fox jumps over the lazy dog again and again"
    texts = [base, base + " x", "совершенно other words entirely different content here now"]
    sf = _docs(tmp_path, texts)
    out = dedup_near_keep_best(sf).to_pandas().set_index("cluster_id").sort_index()
    assert out.loc[0, "kept_doc_id"] == 1 and out.loc[0, "cluster_size"] == 2
    assert out.loc[2, "kept_doc_id"] == 2 and out.loc[2, "cluster_size"] == 1


def test_attach_cluster_ids_keep_columns(ray_session, tmp_path):
    import ray as _ray
    from pdf_toolkit_ray.stages import dedup as dedup_mod

    ds = _ray.data.from_arrow(
        pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "n_chars": pa.array([10, 20, 30], pa.int64())})
    )
    labels = _ray.data.from_arrow(
        pa.table({"node": pa.array([2, 3], pa.int64()),
                  "label": pa.array([2, 2], pa.int64())})
    )
    out = (
        dedup_mod.attach_cluster_ids(ds, labels, "doc_id", keep_columns=["n_chars"])
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert out.cluster_id.tolist() == [1, 2, 2]
    assert out.n_chars.tolist() == [10, 20, 30]


def test_bpe_encode_handchecked(ray_session, tmp_path):
    """k=1 on {ab, ab, abc}: the top pair is (a,b); encoding applies it
    greedily, and the digest pins the exact token sequence."""
    import hashlib

    from pdf_toolkit_ray.queries import bpe_encode_documents

    sf = _docs(tmp_path, ["ab ab abc", "ab"])
    out = (
        bpe_encode_documents(sf, k=1)
        .to_pandas().set_index("doc_id").sort_index()
    )
    # "ab" -> [ab, </w>]; "abc" -> [ab, c, </w>]
    assert out.loc[0, "n_bpe_tokens"] == 7
    assert out.loc[1, "n_bpe_tokens"] == 2
    seq0 = "ab </w> ab </w> ab c </w>"
    assert out.loc[0, "token_digest"] == hashlib.md5(seq0.encode()).hexdigest()[:16]


def test_nb_classifier_handchecked(ray_session, tmp_path):
    """Even docs train (aa says x, bb says y); odd docs must classify by
    their dominant word. Ties and priors are exercised by the driver-gate
    SQL twin; this pins the basic decision rule."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_toolkit_ray.queries import nb_lang_classifier_documents

    texts = ["x x x", "y x x", "y y y", "x y y", "x q", "y q"]
    langs = ["aa", "aa", "bb", "bb", "aa", "bb"]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(6), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array(["s0"] * 6, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")
    out = (
        nb_lang_classifier_documents(str(tmp_path))
        .to_pandas().set_index("doc_id").sort_index()
    )
    assert list(out.index) == [1, 3, 5]       # odd ids only (held-out half)
    assert out.loc[1, "pred_lang"] == "aa"    # x-dominant -> aa
    assert out.loc[3, "pred_lang"] == "bb"    # y-dominant -> bb
    assert bool(out.loc[1, "correct"]) and bool(out.loc[3, "correct"])
    # doc 5 "y q": y favors bb, q unseen in train (OOV term equal) -> bb
    assert out.loc[5, "pred_lang"] == "bb"


def test_heavy_hitters_decrement_path(ray_session, tmp_path):
    """Vocab >> counter budget: the MG summaries must decrement, yet the
    exact-verify pass still returns precisely the brute-force heavy-hitter
    set (the sketch only PRUNES candidates, never the answer)."""
    import collections

    import numpy as np

    from pdf_toolkit_ray.queries import heavy_hitters_documents

    rng = np.random.RandomState(3)
    # 3 heavy words + 500 rare words, shuffled into 40 docs
    tokens = ["hot1"] * 300 + ["hot2"] * 250 + ["hot3"] * 200 + [
        f"rare{i}" for i in range(500)
    ]
    rng.shuffle(tokens)
    docs = [" ".join(tokens[i::40]) for i in range(40)]
    sf = _docs(tmp_path, docs)
    out = (
        heavy_hitters_documents(sf, counters=16, frac=8)
        .to_pandas().set_index("word")["n"].to_dict()
    )
    counts = collections.Counter(tokens)
    total = sum(counts.values())
    want = {w: c for w, c in counts.items() if c * 8 > total}
    assert out == want and set(want) == {"hot1", "hot2", "hot3"}


def test_mg_reduce_guarantee():
    """_mg_reduce under-counts any item by at most the subtracted pivot,
    and every item above total/(k+1) survives."""
    import numpy as np

    from pdf_toolkit_ray.queries import _mg_reduce

    rng = np.random.RandomState(5)
    counts = rng.randint(1, 50, size=200).astype(np.int64)
    counts[:4] += 500  # four giants
    words = [f"w{i}" for i in range(200)]
    total = int(counts.sum())
    k = 10
    kept_w, kept_c = _mg_reduce(words, counts, k)
    assert len(kept_w) <= k
    kept = dict(zip(kept_w, kept_c))
    for i in range(200):
        if counts[i] * (k + 1) > total:
            assert words[i] in kept
        if words[i] in kept:
            assert 0 < kept[words[i]] <= counts[i]


def test_weighted_sample_prefers_heavy_weights(ray_session, tmp_path):
    """ES priority sampling: with weight ratio 5000:1, the heavy docs
    must dominate the sample (deterministic md5 priorities, so this is a
    pinned outcome, not a flaky statistical assertion)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_toolkit_ray.queries import weighted_sample_documents

    n = 100
    heavy = set(range(0, n, 10))  # 10 heavy docs
    texts = ["x" * (5000 if i in heavy else 1) for i in range(n)]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * n, pa.string()),
            "source": pa.array(["s0"] * n, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")
    out = weighted_sample_documents(str(tmp_path), k=20).to_pandas()
    got_heavy = sum(1 for d in out["doc_id"] if d in heavy)
    assert len(out) == 20
    assert got_heavy == 10  # every heavy doc sampled
    # priorities are sorted descending with doc_id tiebreak
    p = out["priority_q"].to_numpy()
    assert (p[:-1] >= p[1:]).all()


def test_csv_roundtrip_hostile_content(ray_session, tmp_path):
    """Commas, quotes, embedded newlines, unicode and empty strings must
    survive the distributed CSV write→read roundtrip byte-for-byte (the
    aggregate checks chars per lang; a quoting bug changes the counts)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_toolkit_ray.queries import csv_roundtrip_documents

    texts = ['a,b', 'say "hi"', 'line1\nline2', '', 'héllo🙂', ' lead and trail ']
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en", "en", "de", "de", "fr", "fr"], pa.string()),
            "source": pa.array(["s0"] * len(texts), pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")
    out = csv_roundtrip_documents(str(tmp_path)).to_pandas().set_index("lang")
    want = {
        "en": (2, len("a,b") + len('say "hi"'), 0 + 1),
        "de": (2, len("line1\nline2") + 0, 2 + 3),
        "fr": (2, len("héllo🙂") + len(" lead and trail "), 4 + 5),
    }
    for lang, (n, chars, idsum) in want.items():
        assert out.loc[lang, "n_docs"] == n
        assert out.loc[lang, "total_chars"] == chars, lang
        assert out.loc[lang, "sum_doc_id"] == idsum


def test_heavy_hitters_layout_independent(ray_session, tmp_path):
    """The MG candidate SET may vary with block layout, but the verified
    output may not: same content in reversed row order and different
    row-group sizes must produce identical heavy hitters."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_toolkit_ray.queries import heavy_hitters_documents

    rng = np.random.RandomState(9)
    tokens = ["big1"] * 400 + ["big2"] * 350 + [f"r{i}" for i in range(300)]
    rng.shuffle(tokens)
    docs = [" ".join(tokens[i::30]) for i in range(30)]

    def write(path, order, row_group_size):
        tbl = pa.table(
            {
                "doc_id": pa.array(order, pa.int64()),
                "text": pa.array([docs[i] for i in order], pa.string()),
                "lang": pa.array(["en"] * len(order), pa.string()),
                "source": pa.array(["s0"] * len(order), pa.string()),
                "n_chars": pa.array([len(docs[i]) for i in order], pa.int64()),
            }
        )
        path.mkdir()
        pq.write_table(tbl, path / "documents.parquet", row_group_size=row_group_size)
        return str(path)

    a = write(tmp_path / "a", list(range(30)), 30)
    b = write(tmp_path / "b", list(reversed(range(30))), 4)
    out_a = (
        heavy_hitters_documents(a, counters=8, frac=4)
        .to_pandas().sort_values("word").reset_index(drop=True)
    )
    out_b = (
        heavy_hitters_documents(b, counters=8, frac=4)
        .to_pandas().sort_values("word").reset_index(drop=True)
    )
    assert out_a.equals(out_b)
    assert set(out_a["word"]) == {"big1", "big2"}


def test_conv_signals_handchecked(ray_session, tmp_path):
    """Duplicate feed rows collapse; single-turn convs report themselves
    as both first and last role; tool turns counted once per turn."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_toolkit_ray.queries import conv_signals_transcripts

    rows = [
        ("c1", 0, "user", ""), ("c1", 1, "assistant", "search"),
        ("c1", 1, "assistant", "search"),  # exact duplicate row
        ("c1", 2, "user", ""),
        ("c2", 0, "assistant", ""),        # single-turn conv
    ]
    tbl = pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array([r[2] for r in rows], pa.string()),
            "tool": pa.array([r[3] for r in rows], pa.string()),
            "text": pa.array(["x"] * len(rows), pa.string()),
            "ts": pa.array([0] * len(rows), pa.timestamp("us")),
        }
    )
    d = tmp_path / "transcripts"
    d.mkdir()
    pq.write_table(tbl, d / "part.parquet")
    # point the fixture-path resolver at our dir
    import unittest.mock as mock

    import pdf_toolkit_ray.queries as Q

    with mock.patch.object(Q, "_transcripts_path", lambda sf: str(d)):
        out = Q.conv_signals_transcripts("ignored").to_pandas().set_index("conv_id")
    assert out.loc["c1", "n_turns"] == 3
    assert out.loc["c1", "n_user"] == 2 and out.loc["c1", "n_assistant"] == 1
    assert out.loc["c1", "n_tool"] == 1  # dup row counted once
    assert out.loc["c1", "first_role"] == "user" and out.loc["c1", "last_role"] == "user"
    assert out.loc["c2", "n_turns"] == 1
    assert out.loc["c2", "first_role"] == "assistant"
    assert out.loc["c2", "last_role"] == "assistant"
