"""Edge-case tests for the relational building blocks added in round 2
(as-of join, coalesced partial aggregation)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _ts(*secs):
    return pa.array([np.datetime64(s, "us") for s in secs], pa.timestamp("us"))


def test_asof_join_semantics(ray_session):
    import ray.data

    from pdf_toolkit_ray.relops import asof_join

    left = ray.data.from_arrow(
        pa.table(
            {
                "id": pa.array([1, 2, 3, 4], pa.int64()),
                "k": pa.array(["a", "a", "b", "c"]),
                "ts": _ts(10, 25, 5, 7),
            }
        )
    )
    right = ray.data.from_arrow(
        pa.table(
            {
                "rid": pa.array([100, 101, 102], pa.int64()),
                "k": pa.array(["a", "a", "b"]),
                "ts": _ts(9, 20, 6),
            }
        )
    )
    out = (
        asof_join(left, right, key="k", ts_col="ts",
                  right_payload={"rid": "match_id", "ts": "match_ts"})
        .to_pandas().sort_values("id").reset_index(drop=True)
    )
    # id=1 (a, t10) -> rid 100 (t9); id=2 (a, t25) -> rid 101 (t20);
    # id=3 (b, t5) -> no click at-or-before (t6 is later) -> null;
    # id=4 (c) -> no right rows for key at all -> null
    assert list(out["id"]) == [1, 2, 3, 4]
    assert list(out["match_id"].fillna(-1)) == [100, 101, -1, -1]
    assert pd.isna(out.loc[2, "match_ts"]) and pd.isna(out.loc[3, "match_ts"])
    # exact tie: left.ts == right.ts matches (>= semantics)
    left2 = ray.data.from_arrow(
        pa.table({"id": pa.array([9], pa.int64()), "k": pa.array(["a"]), "ts": _ts(20)})
    )
    out2 = asof_join(left2, right, key="k", ts_col="ts",
                     right_payload={"rid": "match_id"}).to_pandas()
    assert list(out2["match_id"]) == [101]


def test_coalesce_partials_preserves_rows(ray_session):
    import ray.data

    from pdf_toolkit_ray.relops import coalesce_partials

    ds = ray.data.range(1000).repartition(50)
    out = coalesce_partials(ds).materialize()
    assert out.count() == 1000
    assert out.num_blocks() < 50


def test_gated_joins_above_gate_match_broadcast(ray_session, monkeypatch):
    """With the broadcast gate forced to 0 bytes, the three gated queries
    take the distributed Dataset.join path and must produce the same rows
    as the (default) broadcast path at sf0.001."""
    import pandas as pd

    from pdf_toolkit_ray import queries, relops

    sf = "/root/testdata/sf0.001"
    names = [
        "join_orders_customer_top", "q3_shipping_priority",
        "q5_local_supplier_volume", "q2_min_cost_supplier",
    ]

    def run_all():
        out = {}
        for n in names:
            fn, _ = queries.REGISTRY[n]
            df = fn(sf)
            df = df.to_pandas() if not isinstance(df, pd.DataFrame) else df
            out[n] = df.sort_values(list(df.columns)).reset_index(drop=True)
        return out

    broadcast = run_all()
    monkeypatch.setattr(relops, "BROADCAST_GATE_BYTES", 0)
    joined = run_all()
    for n in names:
        pd.testing.assert_frame_equal(broadcast[n], joined[n], check_dtype=False)


def test_token_quantiles_match_duckdb_on_random_data(ray_session):
    """The histogram-merge quantile (rank = ceil(p*n)-1, integer exact)
    must equal DuckDB quantile_disc for arbitrary value multisets."""
    import duckdb
    import numpy as np

    rng = np.random.RandomState(7)
    for trial in range(3):
        vals = rng.randint(0, 50, size=rng.randint(1, 400))
        con = duckdb.connect()
        con.execute("CREATE TABLE t AS SELECT unnest(?) AS v", [vals.tolist()])
        for p, num, den in [(0.25, 1, 4), (0.5, 1, 2), (0.9, 9, 10), (0.99, 99, 100)]:
            want = con.execute(f"SELECT quantile_disc(v, {p}) FROM t").fetchone()[0]
            n = len(vals)
            u, c = np.unique(vals, return_counts=True)
            cum = c.cumsum()
            rank = -(-(num * n) // den) - 1
            got = int(u[int(np.searchsorted(cum, rank + 1))])
            assert got == want, (trial, p, got, want)


def test_window_topk_per_key(ray_session):
    import ray.data

    from pdf_toolkit_ray.relops import window_topk_per_key

    rng = np.random.default_rng(11)
    n = 5000
    df = pd.DataFrame(
        {
            "key": rng.integers(0, 200, n),
            "val": rng.random(n),
            "tie": np.arange(n, dtype=np.int64),
        }
    )
    ds = ray.data.from_pandas(df).repartition(13)  # keys straddle blocks
    got = (
        window_topk_per_key(
            ds, "key", [("val", "descending"), ("tie", "ascending")], 3
        )
        .to_pandas()
        .sort_values(["key", "rn"])
        .reset_index(drop=True)
    )
    want = (
        df.sort_values(["val", "tie"], ascending=[False, True])
        .groupby("key", sort=False)
        .head(3)
        .copy()
    )
    want["rn"] = want.groupby("key").cumcount() + 1
    want = want.sort_values(["key", "rn"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["key", "val", "tie", "rn"]], want[["key", "val", "tie", "rn"]],
        check_dtype=False,
    )


def test_kmeans_quantized_recurrence_is_layout_independent(ray_session):
    """Same input in different block layouts must give identical clusters
    (the quantized-centroid design claim)."""
    import ray.data

    from pdf_toolkit_ray.stages.ann import kmeans_assign

    rng = np.random.default_rng(5)
    n, d, k = 400, 16, 6
    m = rng.normal(size=(n, d)).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array([r for r in m.tolist()], pa.list_(pa.float32())),
        }
    )
    init = m[:k].astype(np.float64)
    outs = []
    for parts in (2, 11):
        ds = ray.data.from_arrow(tbl).repartition(parts)
        outs.append(
            kmeans_assign(ds, init, iters=4)
            .to_pandas()
            .sort_values("vec_id")
            .reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(outs[0], outs[1])
    # sanity: uses more than one cluster
    assert outs[0]["cluster"].nunique() > 1


def test_span_removal_above_gate_matches_broadcast(ray_session, monkeypatch):
    """dup_span_removal's removal lists attach via broadcast under the
    byte gate and via distributed left_outer Dataset.join above it; both
    paths must agree row-for-row."""
    import pandas as pd

    from pdf_toolkit_ray import queries, relops

    sf = "/root/testdata/sf0.001"

    def run():
        df = queries.dup_span_removal_documents(sf)
        df = df.to_pandas() if not isinstance(df, pd.DataFrame) else df
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    broadcast = run()
    monkeypatch.setattr(relops, "BROADCAST_GATE_BYTES", 0)
    joined = run()
    pd.testing.assert_frame_equal(broadcast, joined, check_dtype=False)


def test_curate_above_gate_matches_broadcast(ray_session, monkeypatch):
    """curate's near-flag attach broadcasts under the byte gate and hash-
    joins above it; both paths must agree."""
    import pandas as pd

    from pdf_toolkit_ray import queries, relops

    sf = "/root/testdata/sf0.001"

    def run():
        df = queries.curate_documents(sf)
        df = df.to_pandas() if not isinstance(df, pd.DataFrame) else df
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    broadcast = run()
    monkeypatch.setattr(relops, "BROADCAST_GATE_BYTES", 0)
    joined = run()
    pd.testing.assert_frame_equal(broadcast, joined, check_dtype=False)


def test_join_survives_leading_empty_block(ray_session):
    """Deterministic regression for the Ray 2.49 hash-shuffle schema-loss
    bug: a 0-row block arriving FIRST at a join side must not strip the
    schema broadcast (un-patched Ray fails with acero's "No match for key
    field reference"). This is THE test to run when bumping Ray past the
    pinned versions — if it passes without the monkeypatch, upstream
    fixed the bug and the patch can be retired."""
    import ray.data

    from pdf_toolkit_ray import relops

    relops.ensure_join_tuning()
    schema_t = pa.table({"k": pa.array([], pa.int64()), "v": pa.array([], pa.int64())})
    data_t = pa.table({"k": pa.array([1, 2, 3], pa.int64()), "v": pa.array([10, 20, 30], pa.int64())})
    left = ray.data.from_arrow([schema_t, data_t])  # leading empty block
    right = ray.data.from_arrow(
        pa.table({"k": pa.array([2, 3, 4], pa.int64()), "w": pa.array([5, 6, 7], pa.int64())})
    )
    got = (
        left.join(right, "inner", num_partitions=2, on=("k",))
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert list(got["k"]) == [2, 3]
    assert list(got["v"]) == [20, 30]
    assert list(got["w"]) == [5, 6]


def test_hash_shuffle_patch_guard(monkeypatch):
    """Version guard semantics: on a PINNED Ray version a missing private
    attach point raises HashShufflePatchError (never a silent no-patch);
    on an unpinned version it degrades to a loud RuntimeWarning."""
    from ray.data._internal.execution.operators import hash_shuffle

    from pdf_toolkit_ray import relops

    assert relops.ray.__version__.startswith(relops._HASH_SHUFFLE_PATCH_VERSIONS)

    # pinned version, API gone -> loud failure
    monkeypatch.setattr(relops, "_HASH_SHUFFLE_PATCHED", False)
    monkeypatch.delattr(hash_shuffle.HashShufflingOperatorBase, "_do_add_input_inner")
    with pytest.raises(relops.HashShufflePatchError, match="attach point"):
        relops._patch_hash_shuffle_empty_block_broadcast()

    # unpinned version, API gone -> warning, no raise
    monkeypatch.setattr(relops, "_HASH_SHUFFLE_PATCHED", False)
    monkeypatch.setattr(relops, "_HASH_SHUFFLE_PATCH_VERSIONS", ("9.99.",))
    with pytest.warns(RuntimeWarning, match="NOT applied"):
        relops._patch_hash_shuffle_empty_block_broadcast()
