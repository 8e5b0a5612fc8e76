"""Hypothesis property tests for the core relational operators: random
small tables in random multi-block layouts must match single-process
pandas references exactly — layout independence is the property every
distributed operator here claims (the same guarantee the SQL twins rely
on at the driver).

Examples are kept modest (each one builds Ray datasets); the generators
bias toward the nasty shapes: duplicate keys, empty sides, ties in sort
columns, single-row blocks.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pdf_toolkit_ray import relops

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


def _ds_from(tbl: pa.Table, rng: np.random.RandomState):
    """Random multi-block layout: shuffled rows, uneven slices."""
    import ray.data

    n = tbl.num_rows
    if n == 0:
        return ray.data.from_arrow(tbl)
    perm = rng.permutation(n)
    t = tbl.take(pa.array(perm))
    cuts = sorted(rng.choice(np.arange(1, n), size=min(3, n - 1), replace=False)) if n > 1 else []
    bounds = [0] + list(cuts) + [n]
    return ray.data.from_arrow(
        [t.slice(a, b - a) for a, b in zip(bounds[:-1], bounds[1:])]
    )


def _sorted_df(obj) -> pd.DataFrame:
    df = obj.to_pandas() if not isinstance(obj, pd.DataFrame) else obj
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


keys_st = st.lists(st.integers(0, 6), min_size=1, max_size=40)


@given(keys=keys_st, vals=st.lists(st.integers(-100, 100), min_size=1, max_size=40),
       seed=st.integers(0, 2**20))
@settings(**_SETTINGS)
def test_pre_agg_groupby_matches_pandas(ray_session, keys, vals, seed):
    n = min(len(keys), len(vals))
    keys, vals = keys[:n], vals[:n]
    tbl = pa.table({"k": pa.array(keys, pa.int64()), "v": pa.array(vals, pa.int64())})
    rng = np.random.RandomState(seed)
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["k"]).aggregate([("v", "sum")])
        return pa.table({"k": g.column("k"), "v": g.column("v_sum")})

    got = relops.pre_agg_groupby(
        _ds_from(tbl, rng), ["k"], partial, [Sum("v", alias_name="s")]
    ).to_pandas()
    want = (
        pd.DataFrame({"k": keys, "v": vals}).groupby("k", as_index=False)["v"]
        .sum().rename(columns={"v": "s"})
    )
    pd.testing.assert_frame_equal(
        _sorted_df(got).astype({"s": np.int64}), _sorted_df(want).astype({"s": np.int64})
    )


@given(
    lk=keys_st,
    rk=st.lists(st.integers(0, 6), min_size=0, max_size=10),
    how=st.sampled_from(["inner", "left"]),
    seed=st.integers(0, 2**20),
)
@settings(**_SETTINGS)
def test_size_gated_join_matches_pandas(ray_session, lk, rk, how, seed):
    rng = np.random.RandomState(seed)
    left = pa.table(
        {
            "k": pa.array(lk, pa.int64()),
            "lv": pa.array(rng.randint(0, 50, len(lk)), pa.int64()),
        }
    )
    rk = sorted(set(rk))  # side must be unique-keyed (it's a flag/dim table)
    side = pa.table(
        {
            "rk": pa.array(rk, pa.int64()),
            "rv": pa.array(np.arange(len(rk)), pa.int64()),
        }
    )
    got = relops.size_gated_join(
        _ds_from(left, rng),
        _ds_from(side, rng),
        on="k",
        right_on="rk",
        how=how,
        num_partitions=2,
    ).to_pandas()
    want = pd.DataFrame({"k": lk, "lv": left.column("lv").to_pylist()}).merge(
        pd.DataFrame({"k": rk, "rv": np.arange(len(rk))}),
        on="k",
        how=how,
    )
    if len(want) == 0:
        # Ray can emit schema-less empty results (handled by callers via
        # empty= / _pin_schema); the contract here is just "no rows"
        assert len(got) == 0
        return
    got = got[["k", "lv", "rv"]]
    pd.testing.assert_frame_equal(
        _sorted_df(got).astype({"k": np.float64, "lv": np.float64, "rv": np.float64}),
        _sorted_df(want).astype({"k": np.float64, "lv": np.float64, "rv": np.float64}),
    )


@given(keys=keys_st, k=st.integers(1, 4), seed=st.integers(0, 2**20))
@settings(**_SETTINGS)
def test_window_topk_per_key_matches_pandas(ray_session, keys, k, seed):
    rng = np.random.RandomState(seed)
    n = len(keys)
    tbl = pa.table(
        {
            "key": pa.array(keys, pa.int64()),
            "v": pa.array(rng.randint(0, 8, n), pa.int64()),  # deliberate ties
            "tie": pa.array(np.arange(n), pa.int64()),
        }
    )
    got = relops.window_topk_per_key(
        _ds_from(tbl, rng), "key",
        [("v", "descending"), ("tie", "ascending")], k,
    ).to_pandas()
    df = tbl.to_pandas().sort_values(
        ["key", "v", "tie"], ascending=[True, False, True]
    )
    want = df.groupby("key", sort=False).head(k).copy()
    want["rn"] = (want.groupby("key", sort=False).cumcount() + 1).astype(np.int64)
    pd.testing.assert_frame_equal(_sorted_df(got), _sorted_df(want))


@given(
    lts=st.lists(st.integers(0, 50), min_size=1, max_size=25),
    rts=st.lists(st.integers(0, 50), min_size=0, max_size=25),
    seed=st.integers(0, 2**20),
)
@settings(**_SETTINGS)
def test_asof_join_matches_pandas_merge_asof(ray_session, lts, rts, seed):
    rng = np.random.RandomState(seed)
    key_l = rng.randint(0, 3, len(lts))
    key_r = rng.randint(0, 3, len(rts))
    rts_u = []  # merge_asof needs unique (key, ts) on the right for a defined answer
    seen = set()
    for kk, tt in zip(key_r, rts):
        if (kk, tt) not in seen:
            seen.add((kk, tt))
            rts_u.append((kk, tt))
    left = pa.table(
        {
            "key": pa.array(key_l, pa.int64()),
            "ts": pa.array(lts, pa.int64()),
            "lid": pa.array(np.arange(len(lts)), pa.int64()),
        }
    )
    right = pa.table(
        {
            "key": pa.array([kk for kk, _ in rts_u], pa.int64()),
            "ts": pa.array([tt for _, tt in rts_u], pa.int64()),
            "payload": pa.array([kk * 1000 + tt for kk, tt in rts_u], pa.int64()),
        }
    )
    got = relops.asof_join(
        _ds_from(left, rng), _ds_from(right, rng), "key", "ts",
        {"payload": "payload"},
    ).to_pandas()
    ldf = left.to_pandas().sort_values("ts", kind="stable")
    rdf = right.to_pandas().sort_values("ts", kind="stable")
    want = pd.merge_asof(ldf, rdf, on="ts", by="key", direction="backward")
    pd.testing.assert_frame_equal(
        _sorted_df(got[["key", "ts", "lid", "payload"]]),
        _sorted_df(want[["key", "ts", "lid", "payload"]]),
    )


@given(vals=st.lists(st.integers(-1000, 1000), min_size=1, max_size=60),
       k=st.integers(1, 8), seed=st.integers(0, 2**20))
@settings(**_SETTINGS)
def test_topk_matches_pandas(ray_session, vals, k, seed):
    rng = np.random.RandomState(seed)
    tbl = pa.table(
        {
            "v": pa.array(vals, pa.int64()),
            "tie": pa.array(np.arange(len(vals)), pa.int64()),
        }
    )
    got = relops.topk(
        _ds_from(tbl, rng), [("v", "descending"), ("tie", "ascending")], k
    ).to_pandas()
    want = (
        tbl.to_pandas()
        .sort_values(["v", "tie"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want)


@given(
    gk=st.lists(st.integers(0, 4), min_size=1, max_size=40),
    dv=st.lists(st.integers(0, 5), min_size=1, max_size=40),
    seed=st.integers(0, 2**20),
)
@settings(**_SETTINGS)
def test_distinct_count_matches_pandas(ray_session, gk, dv, seed):
    n = min(len(gk), len(dv))
    gk, dv = gk[:n], dv[:n]
    rng = np.random.RandomState(seed)
    tbl = pa.table({"g": pa.array(gk, pa.int64()), "d": pa.array(dv, pa.int64())})
    got = relops.distinct_count(_ds_from(tbl, rng), "g", "d", "nd").to_pandas()
    want = (
        pd.DataFrame({"g": gk, "d": dv}).groupby("g", as_index=False)["d"]
        .nunique().rename(columns={"d": "nd"})
    )
    pd.testing.assert_frame_equal(
        _sorted_df(got).astype({"nd": np.int64}), _sorted_df(want).astype({"nd": np.int64})
    )


@given(
    gk=st.lists(st.integers(0, 5), min_size=1, max_size=40),
    seed=st.integers(0, 2**20),
)
@settings(**_SETTINGS)
def test_bucketed_groupby_sees_whole_groups(ray_session, gk, seed):
    """Every group must arrive at exactly one per_group call, whole —
    counts computed inside the bucket must equal global counts."""
    rng = np.random.RandomState(seed)
    tbl = pa.table({"g": pa.array(gk, pa.int64())})
    empty = pa.table({"g": pa.array([], pa.int64()), "n": pa.array([], pa.int64())})

    def per_group(group: pa.Table) -> pa.Table:
        t = group.group_by(["g"]).aggregate([("g", "count")])
        return pa.table(
            {"g": t.column("g"), "n": pa.array(t.column("g_count").to_pylist(), pa.int64())}
        )

    got = relops.bucketed_groupby(_ds_from(tbl, rng), ["g"], per_group, empty=empty).to_pandas()
    want = pd.DataFrame({"g": gk}).groupby("g", as_index=False).size().rename(columns={"size": "n"})
    pd.testing.assert_frame_equal(
        _sorted_df(got).astype({"n": np.int64}), _sorted_df(want).astype({"n": np.int64})
    )


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)), min_size=1, max_size=30
    ),
    seed=st.integers(0, 2**20),
)
@settings(**_SETTINGS)
def test_connected_components_matches_union_find(ray_session, edges, seed):
    import ray.data

    from pdf_toolkit_ray.stages.dedup import connected_components

    rng = np.random.RandomState(seed)
    tbl = pa.table(
        {
            "a": pa.array([a for a, _ in edges], pa.int64()),
            "b": pa.array([b for _, b in edges], pa.int64()),
        }
    )
    got = (
        connected_components(_ds_from(tbl, rng))
        .to_pandas().sort_values("node").reset_index(drop=True)
    )

    # straight-line union-find reference
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    nodes = sorted({x for e in edges for x in e})
    # label = min node id in the component
    comp: dict[int, list[int]] = {}
    for x in nodes:
        comp.setdefault(find(x), []).append(x)
    want_label = {}
    for members in comp.values():
        m = min(members)
        for x in members:
            want_label[x] = m
    assert got["node"].tolist() == nodes
    assert got["label"].tolist() == [want_label[x] for x in nodes]


@given(seed=st.integers(0, 2**20), n_docs=st.integers(6, 18))
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
def test_ngram_jaccard_pairs_equals_brute_force(ray_session, seed, n_docs):
    """End-to-end dedup property: LSH candidates + exact verify must equal
    the brute-force all-pairs trigram-Jaccard filter. At threshold 0.8
    with 64 perms / 32 bands the LSH miss probability per true pair is
    (1 - 0.8^2)^32 < 1e-14, so equality (not superset) is the contract;
    planted near-duplicates guarantee the pair set is non-trivial."""
    import ray.data

    from pdf_toolkit_ray.stages.dedup import ngram_jaccard_pairs

    rng = np.random.RandomState(seed)
    vocab = [f"w{i}" for i in range(30)]
    docs = []
    for i in range(n_docs):
        words = list(rng.choice(vocab, size=int(rng.randint(8, 20))))
        docs.append(" ".join(words))
        if rng.rand() < 0.5 and len(words) > 9:  # plant a near-dup
            mutated = list(words)
            mutated[-1] = str(rng.choice(vocab))
            docs.append(" ".join(mutated))
    ids = np.arange(len(docs), dtype=np.int64)
    tbl = pa.table({"doc_id": pa.array(ids), "text": pa.array(docs, pa.string())})
    got_ds = ngram_jaccard_pairs(_ds_from(tbl, rng), "doc_id", "text", threshold=0.8)
    # the dataset keeps the typed (a, b, jaccard) schema even when empty
    # (downstream select_columns relies on it); Ray's to_pandas drops
    # columns on any 0-row dataset, so read the schema before converting
    assert got_ds.schema().base_schema.names == ["a", "b", "jaccard"]
    got = got_ds.to_pandas()
    if len(got) == 0:
        got = pd.DataFrame({"a": [], "b": [], "jaccard": []})
    got_pairs = {
        (int(a), int(b), round(float(j), 4))
        for a, b, j in zip(got["a"], got["b"], got["jaccard"])
    }

    def grams(t):
        w = t.split(" ")
        if len(w) < 3:
            return {t}
        return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}

    want_pairs = set()
    gs = [grams(t) for t in docs]
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            inter = len(gs[i] & gs[j])
            union = len(gs[i] | gs[j])
            jac = inter / union if union else 0.0
            if jac >= 0.8:
                want_pairs.add((i, j, round(round(jac, 4), 4)))
    assert {(a, b) for a, b, _ in got_pairs} == {(a, b) for a, b, _ in want_pairs}
    assert got_pairs == want_pairs  # jaccard values match at the engine's 4dp contract


@given(
    keys=st.lists(st.integers(0, 8), min_size=1, max_size=50),
    small_keys=st.lists(st.integers(0, 10), min_size=0, max_size=8, unique=True),
    threshold=st.integers(1, 20),
    how=st.sampled_from(["inner", "left"]),
    seed=st.integers(0, 2**20),
)
@settings(**_SETTINGS)
def test_skew_join_matches_pandas_any_threshold(
    ray_session, keys, small_keys, threshold, how, seed
):
    """skew_join == pandas merge for ANY hot threshold: whichever keys
    land in the broadcast branch vs the partitioned branch, the union is
    the same join."""
    big = pa.table(
        {
            "k": pa.array(keys, pa.int64()),
            "v": pa.array(np.arange(len(keys)), pa.int64()),
        }
    )
    small = pa.table(
        {
            "k": pa.array(small_keys, pa.int64()),
            "w": pa.array([k * 10 for k in small_keys], pa.int64()),
        }
    )
    rng = np.random.RandomState(seed)
    out = relops.skew_join(
        _ds_from(big, rng),
        _ds_from(small, rng),
        on="k",
        how=how,
        hot_key_threshold=threshold,
        num_partitions=4,
        max_hot_keys=100,
    )
    ref = _sorted_df(big.to_pandas().merge(small.to_pandas(), on="k", how=how))
    got = out.to_pandas()
    if len(got) == 0:
        # Ray's to_pandas drops columns on EMPTY datasets; the dataset
        # itself must still be typed with the full output schema
        assert len(ref) == 0
        schema = out.schema()
        assert sorted(schema.names) == sorted(ref.columns)
    else:
        got = _sorted_df(got)
        assert got.shape == ref.shape
        pd.testing.assert_frame_equal(got, ref, check_dtype=False)


@given(
    vals=st.lists(st.integers(-20, 20), min_size=1, max_size=60),
    descending=st.booleans(),
    num_buckets=st.integers(1, 12),
    seed=st.integers(0, 2**20),
)
@settings(**_SETTINGS)
def test_global_row_number_matches_pandas(
    ray_session, vals, descending, num_buckets, seed
):
    """Range-partitioned global row_number == pandas sort rank on ANY
    multiset of values (heavy duplicates included), any block layout,
    any bucket count, both directions."""
    n = len(vals)
    tbl = pa.table(
        {
            "v": pa.array(vals, pa.int64()),
            "id": pa.array(np.arange(n), pa.int64()),
        }
    )
    rng = np.random.RandomState(seed)
    out, total = relops.global_row_number(
        _ds_from(tbl, rng), "v", ["id"],
        descending=descending, num_buckets=num_buckets, sample_size=16,
    )
    got = out.to_pandas().sort_values("id").reset_index(drop=True)
    assert total == n
    ref = (
        tbl.to_pandas()
        .sort_values(["v", "id"], ascending=[not descending, True])
        .reset_index(drop=True)
    )
    ref["row_num"] = np.arange(1, n + 1)
    ref = ref.sort_values("id").reset_index(drop=True)
    assert got["row_num"].tolist() == ref["row_num"].tolist()


@given(keys=keys_st, vals=st.lists(st.integers(-100, 100), min_size=1, max_size=40),
       nb=st.integers(1, 9), seed=st.integers(0, 2**20))
@settings(**_SETTINGS)
def test_exchange_groupby_matches_bucketed(ray_session, keys, vals, nb, seed):
    """exchange_groupby (dense-int raw-task exchange) must be result-
    identical to bucketed_groupby for any per_group closed over groups —
    same hashing, different transport."""
    n = min(len(keys), len(vals))
    keys, vals = keys[:n], vals[:n]
    tbl = pa.table({"k": pa.array(keys, pa.int64()), "v": pa.array(vals, pa.int64())})
    rng = np.random.RandomState(seed)

    def per_group(g: pa.Table) -> pa.Table:
        a = g.group_by(["k"]).aggregate([("v", "sum"), ("v", "count")])
        return pa.table(
            {
                "k": a.column("k"),
                "s": a.column("v_sum"),
                "c": a.column("v_count"),
            }
        )

    empty = pa.table(
        {"k": pa.array([], pa.int64()), "s": pa.array([], pa.int64()),
         "c": pa.array([], pa.int64())}
    )
    got = _sorted_df(
        relops.exchange_groupby(_ds_from(tbl, rng), ["k"], per_group, empty,
                                num_buckets=nb).to_pandas()
    )
    want = _sorted_df(
        relops.bucketed_groupby(_ds_from(tbl, rng), ["k"], per_group,
                                num_buckets=nb, empty=empty).to_pandas()
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@given(vals=st.lists(st.integers(-50, 50), min_size=1, max_size=60),
       seed=st.integers(0, 2**20),
       nb=st.integers(1, 9))
@settings(**_SETTINGS)
def test_select_quantiles_matches_sorted_ranks(ray_session, vals, seed, nb):
    """Exact rank selection == value at ceil(q*n) in the sorted array,
    for any layout, bucket count, and duplicate-heavy multiset."""
    tbl = pa.table({"v": pa.array(vals, pa.int64())})
    rng = np.random.RandomState(seed)
    fracs = [(1, 4), (1, 2), (3, 4), (1, 1)]
    got, ranks, total = relops.select_quantiles(
        _ds_from(tbl, rng), "v", fracs, num_buckets=nb, sample_size=16
    )
    assert total == len(vals)
    s = np.sort(np.array(vals, dtype=np.int64))
    for (num, den), r, g in zip(fracs, ranks, got):
        assert r == (num * total + den - 1) // den
        assert int(g) == int(s[r - 1])


@given(vals=st.lists(st.integers(-50, 50), min_size=1, max_size=60),
       seed=st.integers(0, 2**20),
       nb=st.integers(1, 9),
       exclusive=st.booleans())
@settings(**_SETTINGS)
def test_global_running_max_matches_cummax(ray_session, vals, seed, nb, exclusive):
    """Distributed prefix scan == pandas cummax (shifted for exclusive)
    over a unique order column, for any layout and bucket count."""
    n = len(vals)
    tbl = pa.table(
        {
            "o": pa.array(range(n), pa.int64()),
            "v": pa.array(vals, pa.int64()),
        }
    )
    rng = np.random.RandomState(seed)
    out = (
        relops.global_running_max(
            _ds_from(tbl, rng), "o", "v",
            out_col="m", exclusive=exclusive, num_buckets=nb, sample_size=16,
        )
        .to_pandas()
        .sort_values("o")
        .reset_index(drop=True)
    )
    ref = pd.Series(vals, dtype="int64").cummax()
    if exclusive:
        ref = ref.shift(1)  # first row -> NaN (null)
    got = out["m"].astype("float64")
    ref = ref.astype("float64")
    assert ((got.isna() == ref.isna()) & ((got == ref) | ref.isna())).all(), (
        out, ref,
    )


@given(vals=st.lists(st.integers(-50, 50), min_size=1, max_size=60),
       seed=st.integers(0, 2**20),
       nb=st.integers(1, 9),
       budget=st.integers(1, 8))
@settings(**_SETTINGS)
def test_select_quantiles_recursion_matches_direct(ray_session, vals, seed, nb, budget):
    """Forced-tiny-budget recursion: with max_fetch_rows far below any
    bucket size every rank-owning bucket recurses (duplicate-heavy
    multisets exercise the no-shrink depth fallback too), and the result
    must equal the direct-fetch path exactly."""
    tbl = pa.table({"v": pa.array(vals, pa.int64())})
    rng = np.random.RandomState(seed)
    fracs = [(1, 4), (1, 2), (1, 1)]
    got, ranks, total = relops.select_quantiles(
        _ds_from(tbl, rng), "v", fracs,
        num_buckets=nb, sample_size=16, max_fetch_rows=budget,
    )
    assert total == len(vals)
    s = np.sort(np.array(vals, dtype=np.int64))
    for r, g in zip(ranks, got):
        assert int(g) == int(s[r - 1])
