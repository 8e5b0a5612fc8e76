"""Role-protocol audit and role-vocabulary divergence: engineered
conversations with hand-derived expectations, including re-logged
duplicate rows that must not shift any count."""

import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from pdf_toolkit_ray import queries


def _table(rows):
    """rows: (conv_id, turn_idx, role, text)."""
    base = np.datetime64("2026-01-01T00:00:00", "us")
    return pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array([r[2] for r in rows], pa.string()),
            "text": pa.array([r[3] for r in rows], pa.string()),
            "tool": pa.array(
                ["grep" if r[2] == "tool" else "" for r in rows], pa.string()
            ),
            "ts": pa.array([base + np.timedelta64(r[1], "s") for r in rows],
                           pa.timestamp("us")),
        }
    )


def _pin(monkeypatch, tmp_path, tbl):
    p = tmp_path / "t.parquet"
    pq.write_table(tbl, p)
    monkeypatch.setattr(queries, "_transcripts_path", lambda sf: str(p))


ROWS = [
    # c1: clean protocol — user / assistant / tool-after-assistant
    ("c1", 0, "user", "hello hello there"),
    ("c1", 1, "assistant", "hi there"),
    ("c1", 2, "tool", "result blob"),
    # c2: every violation — opens with tool (orphan + bad start),
    # adjacent same-role user pair, tool after user (orphan)
    ("c2", 0, "tool", "noise"),
    ("c2", 1, "user", "first"),
    ("c2", 2, "user", "second hello"),
    ("c2", 3, "tool", "noise"),
    # re-logged duplicate: identical feed row, must collapse
    ("c2", 2, "user", "second hello"),
]


def test_role_protocol_engineered(ray_session, tmp_path, monkeypatch):
    _pin(monkeypatch, tmp_path, _table(ROWS))
    got = {r["conv_id"]: r for r in queries.role_protocol_transcripts("x").to_pylist()}
    assert got["c1"] == {
        "conv_id": "c1", "n_turns": 3, "n_same_role_adjacent": 0,
        "n_orphan_tool": 0, "bad_start": 0,
    }
    assert got["c2"] == {
        "conv_id": "c2", "n_turns": 4, "n_same_role_adjacent": 1,
        "n_orphan_tool": 2, "bad_start": 1,
    }


def test_tool_latency_engineered(ray_session, tmp_path, monkeypatch):
    _pin(monkeypatch, tmp_path, _table(ROWS))
    got = queries.tool_latency_transcripts("x").to_pylist()
    # only c1 turn 2 qualifies (tool after assistant); c2's tools follow
    # nothing / a user turn. ts gap = 1 second.
    assert got == [
        {"tool": "grep", "n": 1, "sum_us": 1_000_000, "mean_us": 1_000_000.0}
    ]


def test_role_vocab_divergence_engineered(ray_session, tmp_path, monkeypatch):
    _pin(monkeypatch, tmp_path, _table(ROWS))
    out = queries.role_vocab_divergence_transcripts("x").to_pandas()
    rows = {r.word: r for r in out.itertuples()}

    # tool turns are excluded entirely
    assert "noise" not in rows and "result" not in rows and "blob" not in rows
    # counts: duplicates collapsed; "hello" 3x user ("hello hello" + c2),
    # "there" once per role
    assert (rows["hello"].n_user, rows["hello"].n_assistant) == (3, 0)
    assert (rows["there"].n_user, rows["there"].n_assistant) == (1, 1)
    assert (rows["hi"].n_user, rows["hi"].n_assistant) == (0, 1)

    # llr formula vs an independent computation
    tu = int(out["n_user"].sum())
    ta = int(out["n_assistant"].sum())
    v = len(out)
    for w in ("hello", "there", "hi"):
        cu, ca = int(rows[w].n_user), int(rows[w].n_assistant)
        expect = math.log(((cu + 1) / float(tu + v)) / ((ca + 1) / float(ta + v)))
        expect = math.floor(abs(expect) * 1e4 + 0.5) / 1e4 * (1 if expect >= 0 else -1)
        assert rows[w].llr == expect
    # direction: user-heavy word positive, assistant-only word negative
    assert rows["hello"].llr > 0 > rows["hi"].llr


def test_selfrep_adjacent_engineered(ray_session, tmp_path, monkeypatch):
    rows = [
        # c1: assistant turns 1 and 3 are identical 5-token texts (3
        # grams, all shared -> jac 1.0); turn 5 is disjoint (jac 0).
        ("c1", 0, "user", "q"),
        ("c1", 1, "assistant", "a b c d e"),
        ("c1", 2, "user", "q2"),
        ("c1", 3, "assistant", "a b c d e"),
        ("c1", 4, "user", "q3"),
        ("c1", 5, "assistant", "x y z w v"),
        # re-logged duplicate of an assistant turn: must not add a pair
        ("c1", 3, "assistant", "a b c d e"),
        # c2: single assistant turn -> no adjacent pair; short texts (<3
        # tokens) on both sides -> union 0 row suppressed
        ("c2", 0, "assistant", "only one"),
        # c3: one side has grams, other too short -> union>0, inter 0
        ("c3", 0, "assistant", "p q r s"),
        ("c3", 1, "assistant", "hm"),
    ]
    _pin(monkeypatch, tmp_path, _table(rows))
    got = {
        (r["conv_id"], r["turn_a"], r["turn_b"]):
            (r["n_inter"], r["n_union"], r["jac"])
        for r in queries.selfrep_adjacent_transcripts("ignored")
        .to_pandas().to_dict("records")
    }
    assert got == {
        ("c1", 1, 3): (3, 3, 1.0),
        ("c1", 3, 5): (0, 6, 0.0),
        ("c3", 0, 1): (0, 2, 0.0),
    }


def test_tool_retry_loops_engineered(ray_session, tmp_path, monkeypatch):
    rows = [
        # c1: grep x3 (user turn interleaved must NOT break the run),
        # then sed x1 (no island), then grep x2 again (second island)
        ("c1", 0, "tool", "t"),
        ("c1", 1, "user", "q"),
        ("c1", 2, "tool", "t"),
        ("c1", 3, "tool", "t"),
        ("c1", 4, "tool", "u"),
        ("c1", 5, "tool", "t"),
        ("c1", 6, "tool", "t"),
        # re-logged duplicate of a tool turn: must not inflate run_len
        ("c1", 2, "tool", "t"),
        # c2: single tool call -> nothing
        ("c2", 0, "tool", "t"),
    ]
    tbl = _table(rows)
    # _table assigns tool="grep" for role tool; override with per-row names
    tbl = tbl.set_column(
        tbl.schema.get_field_index("tool"),
        "tool",
        pa.array([r[3] if r[2] == "tool" else "" for r in rows], pa.string()),
    )
    _pin(monkeypatch, tmp_path, tbl)
    got = {
        (r["conv_id"], r["tool"], r["start_turn"]): (r["run_len"], r["end_turn"])
        for r in queries.tool_retry_loops_transcripts("ignored")
        .to_pandas().to_dict("records")
    }
    assert got == {
        ("c1", "t", 0): (3, 3),
        ("c1", "t", 5): (2, 6),
    }
