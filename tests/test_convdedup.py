"""Conversation-level dedup (stages/convdedup.py): engineered-duplicate
goldens, broadcast/distributed path parity, cap semantics, typed empties,
and convdup fixture structural invariants."""

import numpy as np
import pyarrow as pa
import pytest


def _transcripts(rows):
    """rows: list of (conv_id, turn_idx, role, text, tool)."""
    return pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array([r[2] for r in rows], pa.string()),
            "text": pa.array([r[3] for r in rows], pa.string()),
            "tool": pa.array([r[4] for r in rows], pa.string()),
        }
    )


def _conv(cid, texts, start=0):
    return [
        (cid, start + i, "user" if (start + i) % 2 == 0 else "assistant", t, "")
        for i, t in enumerate(texts)
    ]


@pytest.fixture(scope="module")
def duped_table():
    rows = []
    rows += _conv("c0", ["alpha bravo", "charlie delta", "echo foxtrot"])
    rows += _conv("c1", ["alpha bravo", "charlie delta", "echo foxtrot"])  # = c0
    rows += _conv("c2", ["alpha bravo", "charlie delta", "golf hotel"])  # near c0
    rows += _conv("c3", ["india juliet", "kilo lima"])  # unrelated
    # same TEXTS as c0 but different positions -> NOT an exact dup
    rows += _conv("c4", ["charlie delta", "alpha bravo", "echo foxtrot"])
    # re-logged duplicate row (must collapse in every stage)
    rows.append(("c0", 0, "user", "alpha bravo", ""))
    return _transcripts(rows)


def test_conv_dedup_exact_groups(ray_session, duped_table):
    import ray

    from pdf_toolkit_ray.stages.convdedup import conv_dedup_exact

    out = (
        conv_dedup_exact(ray.data.from_arrow(duped_table))
        .to_pandas()
        .set_index("conv_id")
        .sort_index()
    )
    assert out.loc["c0", "canonical_conv_id"] == "c0"
    assert out.loc["c1", "canonical_conv_id"] == "c0"
    assert int(out.loc["c0", "group_convs"]) == 2
    # position matters: permuted texts are a different conversation
    assert out.loc["c4", "canonical_conv_id"] == "c4"
    for solo in ("c2", "c3", "c4"):
        assert int(out.loc[solo, "group_convs"]) == 1


def test_conv_overlap_pairs_exact_jaccard(ray_session, duped_table):
    import ray

    from pdf_toolkit_ray.stages.convdedup import conv_overlap_pairs

    out = (
        conv_overlap_pairs(
            ray.data.from_arrow(duped_table), cap=8, threshold=0.5
        )
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    got = {(r.a, r.b): (r.shared, r.jaccard) for r in out.itertuples()}
    # c0 == c1 exactly. c4 permutes the texts, which also permutes the
    # ROLES (role is part of the content hash), so it shares only
    # "user|echo foxtrot" with c0/c1: J = 1/5, below threshold.
    assert got[("c0", "c1")] == (3, 1.0)
    # c2 shares 2 of its 3 (role, text) turns with each of c0/c1: J = 2/4
    assert got[("c0", "c2")] == (2, 0.5)
    assert got[("c1", "c2")] == (2, 0.5)
    assert len(got) == 3  # c3/c4 pair with nothing at threshold 0.5


def test_overlap_paths_agree_and_cap_excludes_boilerplate(ray_session):
    """Boilerplate shared by MANY convs generates no candidates on its
    own, but IS counted in the exact Jaccard of flagged pairs — and the
    broadcast and distributed attach paths agree exactly."""
    import ray

    from pdf_toolkit_ray.stages.convdedup import conv_overlap_pairs

    rows = []
    bp = "system boilerplate"
    for k in range(12):  # 12 convs share ONLY the boilerplate turn
        rows += _conv(f"s{k:02d}", [bp, f"unique text {k}", f"more {k}"])
    # one true fork pair, boilerplate included
    rows += _conv("t00", [bp, "shared one", "shared two", "tail a"])
    rows += _conv("t01", [bp, "shared one", "shared two", "tail b"])
    tbl = _transcripts(rows)

    def run(limit):
        return (
            conv_overlap_pairs(
                ray.data.from_arrow(tbl),
                cap=4,
                threshold=0.5,
                broadcast_pair_limit=limit,
            )
            .to_pandas()
            .sort_values(["a", "b"])
            .reset_index(drop=True)
        )

    broadcast = run(100_000)
    distributed = run(0)  # force the join path
    assert len(broadcast) == 1
    r = broadcast.iloc[0]
    # shared = {bp, shared one, shared two} = 3 of 4+4 -> J = 3/5
    assert (r.a, r.b, int(r.shared)) == ("t00", "t01", 3)
    assert r.jaccard == 3 / 5
    import pandas as pd

    pd.testing.assert_frame_equal(broadcast, distributed)


def test_overlap_empty_is_typed(ray_session):
    import ray

    from pdf_toolkit_ray.stages.convdedup import conv_overlap_pairs

    tbl = _transcripts(_conv("a0", ["one"]) + _conv("b0", ["two"]))
    out = conv_overlap_pairs(ray.data.from_arrow(tbl))
    schema = out.schema()
    schema = getattr(schema, "base_schema", schema)
    assert schema.names == ["a", "b", "shared", "jaccard"]
    assert out.count() == 0


def test_shared_turn_texts(ray_session):
    import ray

    from pdf_toolkit_ray.stages.convdedup import shared_turn_texts

    rows = []
    for k in range(6):
        rows += _conv(f"c{k}", ["common opener", f"solo {k}"])
    # repeated within ONE conv only -> 1 distinct conv, filtered out
    rows += _conv("c9", ["within conv", "within conv", "within conv"])
    out = shared_turn_texts(
        ray.data.from_arrow(_transcripts(rows)), min_convs=5
    ).to_pandas()
    assert list(out["text"]) == ["common opener"]
    assert list(out["n_convs"]) == [6]
    assert list(out["n_rows"]) == [6]

    nothing = shared_turn_texts(
        ray.data.from_arrow(_transcripts(_conv("c0", ["x"]))), min_convs=5
    )
    assert nothing.num_rows == 0
    assert nothing.schema.names == ["text", "n_convs", "n_rows"]


def test_convdup_fixture_structure():
    """The duplication fixture's structure is KNOWN: every 10th base conv
    has an exact fork, every 7th (mod 3) a near fork sharing ~70% of
    turns, ~30% open with one of 3 boilerplate strings."""
    import pyarrow.compute as pc

    from pdf_toolkit_ray.sources.fixtures import (
        BOILERPLATE,
        generate_convdup_table,
    )

    tbl = generate_convdup_table("smoke")
    convs = set(pc.unique(tbl.column("conv_id")).to_pylist())
    assert "conv000000f" in convs and "conv000003n" in convs

    def turns(cid):
        t = tbl.filter(pc.equal(tbl.column("conv_id"), cid))
        d = {
            (i, r): (x, o)
            for i, r, x, o in zip(
                t.column("turn_idx").to_pylist(),
                t.column("role").to_pylist(),
                t.column("text").to_pylist(),
                t.column("tool").to_pylist(),
            )
        }
        return d

    base, fork = turns("conv000000"), turns("conv000000f")
    assert base == fork  # exact fork: identical (idx, role) -> (text, tool)
    nbase, nfork = turns("conv000003"), turns("conv000003n")
    shared = sum(1 for k in nbase if nfork.get(k) == nbase[k])
    assert 0.6 <= shared / len(nbase) <= 0.8
    assert shared < len(nbase)  # it genuinely diverges
    texts = tbl.column("text").to_pylist()
    assert any(t in BOILERPLATE for t in texts)


def test_digest_is_order_sensitive_but_layout_free(ray_session):
    """Same rows in shuffled block layouts -> identical digests; swapped
    turn positions -> different digest."""
    import ray

    from pdf_toolkit_ray.stages.convdedup import conv_digests

    rows = _conv("c0", ["aa", "bb", "cc"]) + _conv("c1", ["dd", "ee"])
    tbl = _transcripts(rows)
    perm = np.random.RandomState(0).permutation(tbl.num_rows)
    shuffled = tbl.take(pa.array(perm))

    d1 = (
        conv_digests(ray.data.from_arrow(tbl))
        .to_pandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    blocks = [shuffled.slice(i, 2) for i in range(0, shuffled.num_rows, 2)]
    d2 = (
        conv_digests(ray.data.from_arrow(blocks))
        .to_pandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(d1, d2)


def test_context_repeat_golden(ray_session):
    import ray

    from pdf_toolkit_ray.stages.convdedup import context_repeat

    rows = [
        ("c0", 0, "user", "alpha bravo charlie delta", ""),
        # quotes turn 0 entirely: grams "quoting: alpha bravo" ... all but
        # the leading ones repeat
        ("c0", 1, "assistant", "quoting: alpha bravo charlie delta", ""),
        ("c0", 2, "user", "echo foxtrot golf", ""),
        ("c1", 0, "user", "alpha bravo charlie", ""),  # other conv: no bleed
        ("c1", 1, "assistant", "too short", ""),  # < 3 words -> no row
    ]
    out = (
        context_repeat(ray.data.from_arrow(_transcripts(rows)), n=3)
        .to_pandas()
        .set_index(["conv_id", "turn_idx"])
        .sort_index()
    )
    # turn (c0,1): toks = [quoting:, alpha, bravo, charlie, delta] -> 3
    # grams; "alpha bravo charlie" and "bravo charlie delta" repeat
    assert out.loc[("c0", 1), "n_grams"] == 3
    assert out.loc[("c0", 1), "n_repeat"] == 2
    assert out.loc[("c0", 1), "repeat_frac"] == 2 / 3
    # first occurrences never count as repeats
    assert out.loc[("c0", 0), "n_repeat"] == 0
    assert out.loc[("c1", 0), "n_repeat"] == 0  # c0's grams don't bleed in
    assert ("c1", 1) not in out.index  # 2-word turn has no 3-grams


def test_convdup_fixture_has_quoting_turns():
    import pyarrow.compute as pc

    from pdf_toolkit_ray.sources.fixtures import generate_convdup_table

    tbl = generate_convdup_table("smoke")
    quoted = tbl.filter(
        pc.starts_with(pc.coalesce(tbl.column("text"), ""), "quoting: ")
    )
    assert quoted.num_rows > 0
    assert set(pc.unique(quoted.column("role")).to_pylist()) == {"assistant"}


def test_shared_turn_texts_cap(ray_session):
    """max_texts valve: over the cap, only the top-N most prevalent
    boilerplate texts reach the driver (deterministic prevalence order);
    under the cap the output is identical to the uncapped run."""
    import ray

    from pdf_toolkit_ray.stages.convdedup import shared_turn_texts

    rows = []
    # boilerplate k appears in (4 + k) distinct convs -> prevalence order
    # is bp4 > bp3 > bp2 > bp1 > bp0, all >= min_convs=3
    for k in range(5):
        for c in range(4 + k):
            rows += _conv(f"b{k}c{c}", [f"boilerplate {k}", f"solo {k}-{c}"])
    ds = ray.data.from_arrow(_transcripts(rows))

    full = shared_turn_texts(ds, min_convs=3).to_pandas()
    assert sorted(full["text"]) == [f"boilerplate {k}" for k in range(5)]

    capped = shared_turn_texts(ds, min_convs=3, max_texts=2).to_pandas()
    assert sorted(capped["text"]) == ["boilerplate 3", "boilerplate 4"]
    assert sorted(capped["n_convs"]) == [7, 8]

    # cap >= flag count: byte-identical to uncapped
    same = shared_turn_texts(ds, min_convs=3, max_texts=5).to_pandas()
    assert same.sort_values("text").reset_index(drop=True).equals(
        full.sort_values("text").reset_index(drop=True)
    )
