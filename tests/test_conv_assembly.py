"""Training-example assembly over transcripts (sft_spans /
context_window / conv_chunk_budget): engineered-conversation goldens —
the span contract is verified against an ACTUAL rendered string, the
window and chunk rules against hand-derived expectations."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pdf_toolkit_ray import queries


def _toks(k: int) -> str:
    """Text with exactly k whitespace tokens under the split(' ') rule."""
    return " ".join(f"w{i}" for i in range(k))


def _table(rows):
    """rows: (conv_id, turn_idx, role, text)."""
    return pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array([r[2] for r in rows], pa.string()),
            "text": pa.array([r[3] for r in rows], pa.string()),
        }
    )


def _pin(monkeypatch, tmp_path, tbl):
    p = tmp_path / "t.parquet"
    pq.write_table(tbl, p)
    monkeypatch.setattr(queries, "_transcripts_path", lambda sf: str(p))


def test_sft_spans_match_rendered_string(ray_session, tmp_path, monkeypatch):
    rows = [
        ("c1", 0, "user", "hello there"),
        ("c1", 1, "assistant", "hi! how can I help?"),
        ("c1", 2, "user", "explain unicode: żółć"),
        ("c1", 3, "assistant", "żółć is four chars here"),
        ("c2", 0, "user", "solo question"),
        ("c2", 1, "assistant", "solo answer"),
        # re-logged duplicate feed row: must not shift any offset
        ("c1", 1, "assistant", "hi! how can I help?"),
    ]
    _pin(monkeypatch, tmp_path, _table(rows))
    out = queries.sft_spans_transcripts("ignored").to_pandas()

    # independent reference: actually render each conversation
    uniq = sorted(set(rows), key=lambda r: (r[0], r[1]))
    rendered, expected = {}, {}
    for cid in ("c1", "c2"):
        s = ""
        for c, t, role, text in uniq:
            if c != cid:
                continue
            if role == "assistant":
                expected[(cid, t)] = (len(s) + len(role) + 2,
                                      len(s) + len(role) + 2 + len(text), text)
            s += f"{role}: {text}\n"
        rendered[cid] = s

    assert len(out) == len(expected)
    for _, r in out.iterrows():
        a, b, text = expected[(r.conv_id, r.turn_idx)]
        assert (r.start_off, r.end_off) == (a, b)
        # the span contract itself: offsets index the rendered string
        assert rendered[r.conv_id][a:b] == text
        assert r.conv_chars == len(rendered[r.conv_id])


def test_context_window_budget_and_newest_turn(ray_session, tmp_path, monkeypatch):
    rows = [
        # suffix sums from newest: 10, 510, 520(>512), 530 -> keep last two
        ("c1", 0, "user", _toks(10)),
        ("c1", 1, "assistant", _toks(10)),
        ("c1", 2, "user", _toks(500)),
        ("c1", 3, "assistant", _toks(10)),
        # newest turn alone exceeds the budget: still kept, older dropped
        ("c2", 0, "user", _toks(5)),
        ("c2", 1, "assistant", _toks(600)),
    ]
    _pin(monkeypatch, tmp_path, _table(rows))
    out = queries.context_window_transcripts("ignored").to_pandas()
    kept = {(r.conv_id, r.turn_idx): r.suffix_tokens for _, r in out.iterrows()}
    assert kept == {("c1", 2): 510, ("c1", 3): 10, ("c2", 1): 600}


def test_conv_chunk_budget_greedy(ray_session, tmp_path, monkeypatch):
    rows = [
        # 100+100 fits, third overflows -> [0, 0, 1]
        ("c1", 0, "user", _toks(100)),
        ("c1", 1, "assistant", _toks(100)),
        ("c1", 2, "user", _toks(100)),
        # oversize turn owns its chunk and closes it -> [0, 1, 1]
        ("c2", 0, "user", _toks(300)),
        ("c2", 1, "assistant", _toks(10)),
        ("c2", 2, "user", _toks(10)),
        # oversize in the middle -> [0, 1, 2]
        ("c3", 0, "user", _toks(10)),
        ("c3", 1, "assistant", _toks(300)),
        ("c3", 2, "user", _toks(10)),
    ]
    _pin(monkeypatch, tmp_path, _table(rows))
    out = queries.conv_chunk_budget_transcripts("ignored").to_pandas()
    got = {(r.conv_id, r.turn_idx): (r.chunk_id, r.turn_tokens)
           for _, r in out.iterrows()}
    assert got == {
        ("c1", 0): (0, 100), ("c1", 1): (0, 100), ("c1", 2): (1, 100),
        ("c2", 0): (0, 300), ("c2", 1): (1, 10), ("c2", 2): (1, 10),
        ("c3", 0): (0, 10), ("c3", 1): (1, 300), ("c3", 2): (2, 10),
    }


# ---------------------------------------------------------------------------
# kernel property suite: the pure per-conversation kernels vs step-by-step
# python references on arbitrary token/length sequences

from hypothesis import given, settings
from hypothesis import strategies as st

from pdf_toolkit_ray.functions.assembly import (
    greedy_chunk_ids,
    sft_offsets,
    suffix_keep,
)

_tok_lists = st.lists(st.integers(1, 1000), min_size=0, max_size=200)


@given(tk=_tok_lists, budget=st.integers(1, 1500))
@settings(max_examples=200, deadline=None)
def test_greedy_chunk_ids_matches_reference(tk, budget):
    import numpy as np

    got = greedy_chunk_ids(np.asarray(tk, np.int64), budget)
    run, cid, want = 0, 0, []
    for i, t in enumerate(tk):
        if i == 0:
            run = t
        elif run + t > budget:
            cid, run = cid + 1, t
        else:
            run += t
        want.append(cid)
    assert got.tolist() == want
    # chunk ids are dense and non-decreasing; no chunk except a singleton
    # oversize one exceeds the budget
    for c in range(cid + 1):
        members = [t for t, g in zip(tk, want) if g == c]
        assert sum(members) <= budget or len(members) == 1


@given(tk=_tok_lists, budget=st.integers(1, 1500))
@settings(max_examples=200, deadline=None)
def test_suffix_keep_matches_reference(tk, budget):
    import numpy as np

    keep, suffix = suffix_keep(np.asarray(tk, np.int64), budget)
    want_suffix = [sum(tk[: i + 1]) for i in range(len(tk))]
    want_keep = [s <= budget or i == 0 for i, s in enumerate(want_suffix)]
    assert suffix.tolist() == want_suffix
    assert keep.tolist() == want_keep


@given(
    pairs=st.lists(
        st.tuples(st.integers(1, 12), st.integers(0, 500)), min_size=0, max_size=100
    )
)
@settings(max_examples=200, deadline=None)
def test_sft_offsets_match_rendered_string(pairs):
    import numpy as np

    rl = np.asarray([p[0] for p in pairs], np.int64)
    tl = np.asarray([p[1] for p in pairs], np.int64)
    start, total = sft_offsets(rl, tl)
    rendered = ""
    for i, (r, t) in enumerate(pairs):
        role, text = "r" * r, "t" * t
        assert start[i] == len(rendered) + r + 2
        rendered += f"{role}: {text}\n"
        assert rendered[start[i] : start[i] + t] == text
    if pairs:
        assert (total == len(rendered)).all()
