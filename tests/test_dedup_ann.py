"""Dedup / ANN / textstats operator tests on controlled synthetic inputs."""

import numpy as np
import pyarrow as pa
import pytest

from pdf_toolkit_ray.functions.hashing import (
    hamming64,
    jaccard_ngrams,
    minhash_signature,
    rolling_fingerprint,
    simhash64,
)
from pdf_toolkit_ray.functions.textstats import lang_id


def _docs_table():
    base = "the quick brown fox jumps over the lazy dog near the old river bank today"
    near = base.replace("today", "tonight")  # one-word change -> high jaccard
    far = "completely different content about database engines and vectorized execution"
    rows = [
        (0, base),
        (1, near),
        (2, far),
        (3, base),  # exact duplicate of 0
        (4, "tiny"),
    ]
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows]),
        }
    )


def test_minhash_estimates_jaccard():
    a = "the quick brown fox jumps over the lazy dog near the old river bank today"
    b = a.replace("today", "tonight")
    sig_a = minhash_signature(a, num_perm=128)
    sig_b = minhash_signature(b, num_perm=128)
    est = float(np.mean(sig_a == sig_b))
    true = jaccard_ngrams(a, b, 3)
    assert abs(est - true) < 0.2
    assert np.array_equal(minhash_signature(a, num_perm=128), sig_a)  # deterministic


def test_simhash_properties():
    a = "the quick brown fox jumps over the lazy dog near the river"
    b = a + " bank"
    c = "unrelated words entirely about parquet readers and shuffles"
    assert simhash64(a) == simhash64(a)
    assert hamming64(simhash64(a), simhash64(b)) < hamming64(simhash64(a), simhash64(c))


def test_rolling_fingerprint_overlap():
    a = "shared prefix of reasonable length for fingerprinting purposes " * 3
    b = a + "with a different suffix attached here"
    fa, fb = set(rolling_fingerprint(a)), set(rolling_fingerprint(b))
    assert fa and fb and len(fa & fb) / len(fa) > 0.5


def test_lang_id():
    assert lang_id("the cat and the dog sat in a house") == "en"
    assert lang_id("der hund und die katze ist nicht da") == "de"
    assert lang_id("xyzzy plugh") == "und"


def test_exact_dedup(ray_session):
    import ray.data

    from pdf_toolkit_ray.stages.dedup import exact_dedup, exact_dedup_groups

    ds = ray.data.from_arrow(_docs_table())
    groups = exact_dedup_groups(ds).to_pandas()
    assert len(groups) == 4  # 5 rows, one exact dup
    row = groups[groups["n"] == 2]
    assert row["doc_id"].iloc[0] == 0  # keep-first = min doc_id
    kept = exact_dedup(ray.data.from_arrow(_docs_table())).to_pandas()
    assert sorted(kept["doc_id"]) == [0, 1, 2, 4]


def test_minhash_lsh_clusters(ray_session):
    import ray.data

    from pdf_toolkit_ray.stages.dedup import minhash_lsh_clusters

    ds = ray.data.from_arrow(_docs_table())
    out = minhash_lsh_clusters(ds, threshold=0.5).to_pandas().set_index("doc_id")
    # 0, 1 (near-dup) and 3 (exact dup) cluster together under representative 0
    assert out.loc[0, "cluster_id"] == 0
    assert out.loc[3, "cluster_id"] == 0
    assert out.loc[1, "cluster_id"] == 0
    assert out.loc[2, "cluster_id"] == 2
    assert out.loc[4, "cluster_id"] == 4


def test_mulmod61_exact():
    from pdf_toolkit_ray.functions.hashing import _MERSENNE, _mulmod61

    rng = np.random.RandomState(11)
    a = rng.randint(0, _MERSENNE, size=500, dtype=np.uint64)
    b = rng.randint(0, _MERSENNE, size=500, dtype=np.uint64)
    got = _mulmod61(a, b)
    want = [(int(x) * int(y)) % _MERSENNE for x, y in zip(a, b)]
    assert [int(v) for v in got] == want


def test_minhash_signature_golden():
    # pins the exact-Mersenne universal-hash family: any change to word
    # hashing, shingle mixing or the modular arithmetic must be deliberate
    sig = minhash_signature("the quick brown fox jumps over the lazy dog", num_perm=8)
    assert sig.dtype == np.uint32
    assert sig.tolist() == [int(v) for v in sig]  # plain ints
    golden = minhash_signature("the quick brown fox jumps over the lazy dog", num_perm=8)
    assert np.array_equal(sig, golden)
    import json, os
    path = os.path.join(os.path.dirname(__file__), "goldens", "minhash_sig.json")
    # the golden is committed; a missing file must FAIL (a regenerate-on-
    # absence fallback could never catch a hash-family regression)
    assert os.path.exists(path), "committed golden tests/goldens/minhash_sig.json missing"
    with open(path) as fh:
        assert [int(v) for v in sig] == json.load(fh)


def test_components_labelprop_equals_local(ray_session):
    """The distributed label-propagation components must produce exactly
    the clusters of single-task union-find on the sf0.01 documents."""
    import ray.data

    from pdf_toolkit_ray.relops import scan
    from pdf_toolkit_ray.stages.dedup import connected_components, minhash_candidate_edges

    ds = scan("/root/testdata/sf0.01", "documents", columns=["doc_id", "text"])
    edges = minhash_candidate_edges(ds, "doc_id", "text", threshold=0.5).materialize()
    local = (
        connected_components(edges, method="local").to_pandas()
        .sort_values("node").reset_index(drop=True)
    )
    lp = (
        connected_components(edges, method="labelprop", num_partitions=4).to_pandas()
        .sort_values("node").reset_index(drop=True)
    )
    assert len(local) > 0
    assert local.equals(lp)


def test_labelprop_raises_on_nonconvergence(ray_session):
    """A component whose diameter exceeds max_rounds must fail loudly,
    not silently return a split component."""
    import ray.data

    from pdf_toolkit_ray.stages.dedup import connected_components

    chain = pa.table(
        {
            "a": pa.array([0, 1, 2, 3], pa.int64()),
            "b": pa.array([1, 2, 3, 4], pa.int64()),
        }
    )
    edges = ray.data.from_arrow(chain)
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, method="labelprop", num_partitions=2, max_rounds=1)
    ok = connected_components(
        edges, method="labelprop", num_partitions=2, max_rounds=8
    ).to_pandas()
    assert set(ok["label"]) == {0}


def test_attach_cluster_ids_join_path(ray_session):
    """The left-outer Dataset.join attach path (labels above the broadcast
    limit) must equal the broadcast path."""
    import ray.data

    from pdf_toolkit_ray.stages.dedup import (
        attach_cluster_ids,
        connected_components,
        minhash_candidate_edges,
    )

    ds = ray.data.from_arrow(_docs_table())
    edges = minhash_candidate_edges(ds, threshold=0.5).materialize()
    labels = connected_components(edges, method="local").materialize()
    broadcast = (
        attach_cluster_ids(ds, labels, "doc_id").to_pandas()
        .sort_values("doc_id").reset_index(drop=True)
    )
    joined = (
        attach_cluster_ids(ds, labels, "doc_id", broadcast_limit=0, num_partitions=4)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert broadcast.equals(joined)
    assert list(broadcast["cluster_id"]) == [0, 0, 2, 0, 4]


def test_ngram_pairs(ray_session):
    import ray.data

    from pdf_toolkit_ray.stages.dedup import ngram_jaccard_pairs

    ds = ray.data.from_arrow(_docs_table())
    pairs = ngram_jaccard_pairs(ds, threshold=0.5).to_pandas()
    keys = set(zip(pairs["a"], pairs["b"]))
    assert (0, 1) in keys and (0, 3) in keys and (1, 3) in keys
    exact = pairs[(pairs["a"] == 0) & (pairs["b"] == 3)]
    assert exact["jaccard"].iloc[0] == 1.0


def test_ngram_band_explode_carries_no_text():
    """The candidate band explode must shuffle (band_key, id) ONLY — a text
    payload here would cross the shuffle once per band (32x amplification)."""
    from pdf_toolkit_ray.stages.dedup import _IdOnlyStage

    stage = _IdOnlyStage("doc_id", "text", num_perm=64, bands=32)
    out = stage(_docs_table())
    assert out.schema.names == ["band_key", "doc_id"]
    assert out.num_rows == _docs_table().num_rows * 32


def test_brute_force_topk_matches_numpy(ray_session):
    import ray.data

    from pdf_toolkit_ray.stages.ann import brute_force_topk

    rng = np.random.RandomState(3)
    n, d = 200, 16
    mat = rng.normal(size=(n, d)).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": pa.array([list(map(float, row)) for row in mat],
                                  type=pa.list_(pa.float32())),
        }
    )
    ds = ray.data.from_arrow(tbl)
    qids, qm = [0, 1], mat[:2].astype(np.float64)
    got = brute_force_topk(ds, qids, qm, k=5).to_pandas()

    m64 = mat.astype(np.float64)
    m64 /= np.linalg.norm(m64, axis=1, keepdims=True)
    for qi in (0, 1):
        sims = m64 @ m64[qi]
        want = set(np.argsort(-sims)[:5])
        have = set(got[got["query_id"] == qi]["vec_id"])
        assert have == want
        assert got[got["query_id"] == qi]["sim"].max() == 1.0  # self-hit


def test_cosine_near_dup_pairs_exact_and_lsh(ray_session):
    """Block-pair exact variant equals numpy all-pairs; the LSH-bucketed
    variant recovers a large fraction with exact sims for what it finds."""
    import ray.data

    from pdf_toolkit_ray.stages.ann import cosine_near_dup_pairs, cosine_near_dup_pairs_lsh

    rng = np.random.RandomState(9)
    base = rng.normal(size=(40, 16))
    # 40 anchors + 40 jittered copies -> 40 high-cosine pairs
    jit = base + rng.normal(scale=0.05, size=base.shape)
    mat = np.vstack([base, jit])
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(80), pa.int64()),
            "embedding": pa.array([list(map(float, r)) for r in mat],
                                  type=pa.list_(pa.float32())),
        }
    )
    m32 = np.array([np.asarray(r, dtype=np.float64) for r in tbl.column("embedding").to_pylist()])
    mn = m32 / np.linalg.norm(m32, axis=1, keepdims=True)
    sims = mn @ mn.T
    iu, ju = np.triu_indices(80, k=1)
    want = {(int(a), int(b)) for a, b in zip(iu[sims[iu, ju] >= 0.98], ju[sims[iu, ju] >= 0.98])}
    assert len(want) >= 30

    ds = ray.data.from_arrow(tbl).repartition(4)
    got = cosine_near_dup_pairs(ds, threshold=0.98).to_pandas()
    assert {(int(a), int(b)) for a, b in zip(got["a"], got["b"])} == want

    lsh = cosine_near_dup_pairs_lsh(
        ray.data.from_arrow(tbl), threshold=0.98, n_tables=8, n_planes=8
    ).to_pandas()
    found = {(int(a), int(b)) for a, b in zip(lsh["a"], lsh["b"])}
    assert found <= want  # exact verify: no false positives
    assert len(found) >= 0.9 * len(want)  # high recall at high threshold


def test_cosine_near_dup_pairs_size_gate(ray_session):
    """The gated entry point auto-dispatches: forcing gate_bytes=0 routes
    through the threshold-adaptive LSH path, and on the jittered fixture
    the two paths agree pair-for-pair with identical sims (deterministic:
    fixed data seed + fixed LSH seed)."""
    import ray.data

    from pdf_toolkit_ray.stages.ann import cosine_near_dup_pairs

    rng = np.random.RandomState(9)
    base = rng.normal(size=(40, 16))
    jit = base + rng.normal(scale=0.05, size=base.shape)
    mat = np.vstack([base, jit])
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(80), pa.int64()),
            "embedding": pa.array([list(map(float, r)) for r in mat],
                                  type=pa.list_(pa.float32())),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(4)
    exact = (
        cosine_near_dup_pairs(ds, threshold=0.98)  # tiny -> exact path
        .to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    )
    forced = (
        cosine_near_dup_pairs(ds, threshold=0.98, gate_bytes=0)  # -> LSH path
        .to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    )
    assert len(exact) >= 30
    exact_pairs = {(int(a), int(b)) for a, b in zip(exact["a"], exact["b"])}
    forced_pairs = {(int(a), int(b)) for a, b in zip(forced["a"], forced["b"])}
    assert forced_pairs <= exact_pairs  # in-bucket exact verify: no false positives
    assert len(forced_pairs) >= 0.95 * len(exact_pairs)
    merged = forced.merge(exact, on=["a", "b"], suffixes=("_lsh", "_exact"))
    assert (merged["sim_lsh"] == merged["sim_exact"]).all()


def test_ivf_topk_probe_tradeoff(ray_session):
    """IVF: probing all cells equals brute force; probing few cells still
    recalls each query's own cell (the self-hit)."""
    import ray.data

    from pdf_toolkit_ray.stages.ann import brute_force_topk, ivf_topk

    rng = np.random.RandomState(12)
    n, d = 240, 16
    mat = rng.normal(size=(n, d)).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": pa.array([list(map(float, r)) for r in mat],
                                  type=pa.list_(pa.float32())),
        }
    )
    qids, qm = [3, 7], mat[[3, 7]].astype(np.float64)
    exact = brute_force_topk(ray.data.from_arrow(tbl), qids, qm, k=5).to_pandas()
    full = ivf_topk(
        ray.data.from_arrow(tbl), qids, qm, k=5, n_cells=8, n_probe=8
    ).to_pandas()

    def norm(df):
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    assert norm(exact).equals(norm(full))  # all cells probed == exact
    few = ivf_topk(
        ray.data.from_arrow(tbl), qids, qm, k=5, n_cells=8, n_probe=1
    ).to_pandas()
    assert {3, 7} <= set(few["vec_id"])  # self-hits always in the probed cell
    assert few["sim"].max() == 1.0


def test_lsh_topk_recalls_self(ray_session):
    import ray.data

    from pdf_toolkit_ray.stages.ann import lsh_bucketed_topk

    rng = np.random.RandomState(4)
    n, d = 300, 16
    mat = rng.normal(size=(n, d)).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": pa.array([list(map(float, row)) for row in mat],
                                  type=pa.list_(pa.float32())),
        }
    )
    ds = ray.data.from_arrow(tbl)
    got = lsh_bucketed_topk(ds, [5], mat[5:6].astype(np.float64), k=3).to_pandas()
    assert 5 in set(got["vec_id"])  # the query itself always shares its own bucket
    assert got["sim"].max() == 1.0


def test_ngram_pairs_join_path_matches_broadcast(ray_session):
    """Above broadcast_pair_limit the verify uses distributed text joins —
    must equal the (default) plasma-broadcast path."""
    import ray.data

    from pdf_toolkit_ray.stages.dedup import ngram_jaccard_pairs

    ds = ray.data.from_arrow(_docs_table())
    default = (
        ngram_jaccard_pairs(ds, threshold=0.5).to_pandas()
        .sort_values(["a", "b"]).reset_index(drop=True)
    )
    joined = (
        ngram_jaccard_pairs(ds, threshold=0.5, broadcast_pair_limit=0).to_pandas()
        .sort_values(["a", "b"]).reset_index(drop=True)
    )
    assert len(default) > 0
    assert default.equals(joined)


def test_semdedup_prune_semantics(ray_session):
    """SemDeDup keep rules on a constructed cluster: the
    farthest-from-centroid duplicate survives, its near-twin is removed,
    an orthogonal item is kept, and a singleton cluster reports
    max_prior_sim = -1."""
    import ray.data

    from pdf_toolkit_ray import relops
    from pdf_toolkit_ray.stages.ann import semdedup_prune

    # cluster 0: v0 and v1 nearly parallel (cos ~ 1), v2 orthogonal.
    # dist2 makes v1 the higher-priority (farther) twin. cluster 1: one item.
    tbl = pa.table(
        {
            "vec_id": pa.array([0, 1, 2, 3], pa.int64()),
            "cluster": pa.array([0, 0, 0, 1], pa.int64()),
            "dist2": pa.array([0.1, 0.9, 0.5, 0.2]),
            "embedding": pa.array(
                [[1.0, 0.0], [0.999, 0.01], [0.0, 1.0], [5.0, 5.0]],
                type=pa.list_(pa.float32()),
            ),
        }
    )
    out = (
        semdedup_prune(
            ray.data.from_arrow(tbl), eps=0.9,
            bucketed_groupby=relops.bucketed_groupby,
        )
        .to_pandas().set_index("vec_id").sort_index()
    )
    assert bool(out.loc[1, "keep"])          # farthest twin kept
    assert not bool(out.loc[0, "keep"])      # near-duplicate removed
    assert bool(out.loc[2, "keep"])          # orthogonal item kept
    assert bool(out.loc[3, "keep"])          # singleton cluster kept
    assert out.loc[3, "max_prior_sim"] == -1.0
    assert out.loc[0, "max_prior_sim"] > 0.99


def test_exact_dedup_online_matches_groupby(ray_session):
    """The shared-mutable-index dedup (sharded digest actors, keep-min)
    must equal the groupby/join dedup on any shard count — and must not
    deadlock in a small CPU session (the actors hold num_cpus=0)."""
    import ray.data

    from pdf_toolkit_ray.stages.dedup import exact_dedup, exact_dedup_online

    texts = ["aa", "bb", "aa", "cc", "bb", "aa", "dd"]
    tbl = pa.table(
        {
            "doc_id": pa.array([5, 1, 2, 9, 4, 0, 7], pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    want = (
        exact_dedup(ray.data.from_arrow(tbl)).to_pandas()
        .sort_values("doc_id").reset_index(drop=True)
    )
    for shards in (1, 5):
        got = (
            exact_dedup_online(ray.data.from_arrow(tbl), num_shards=shards)
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        assert got.equals(want), (shards, got, want)
    assert set(want["doc_id"]) == {0, 1, 7, 9}  # min id per distinct text


def test_exact_dedup_online_spills_under_budget(ray_session):
    """Forcing a tiny per-shard RAM budget makes the digest index spill
    to parquet runs — verified via spilled_runs() — and the merged result
    still equals the groupby/join dedup exactly (keep-min is
    order-independent, so spill timing cannot change the answer)."""
    import ray
    import ray.data

    from pdf_toolkit_ray.stages.dedup import (
        exact_dedup,
        exact_dedup_online,
        make_digest_index,
    )

    rng = np.random.RandomState(3)
    n = 400
    texts = [f"doc-{int(v):03d}" for v in rng.randint(0, 120, size=n)]
    ids = rng.permutation(10 * n)[:n].astype(np.int64)
    tbl = pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)})
    want = (
        exact_dedup(ray.data.from_arrow(tbl)).to_pandas()
        .sort_values("doc_id").reset_index(drop=True)
    )
    index = make_digest_index(2, max_entries_per_shard=8)
    got = (
        exact_dedup_online(ray.data.from_arrow(tbl).repartition(8), shards=index)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert sum(ray.get([s.spilled_runs.remote() for s in index])) > 0  # really spilled
    assert got.equals(want)
    for s in index:
        ray.get(s.cleanup.remote())


def test_exact_dedup_online_spill_first_wins(ray_session):
    """first_wins survives spilling: a digest flushed to disk in job A
    keeps A's id even when job B re-offers it with a smaller id after
    the flush (earliest RUN wins in the merge)."""
    import ray
    import ray.data

    from pdf_toolkit_ray.stages.dedup import exact_dedup_online, make_digest_index

    index = make_digest_index(1, max_entries_per_shard=2)
    job_a = pa.table(
        {
            "doc_id": pa.array([50, 51, 52, 53], pa.int64()),
            "text": pa.array(["aa", "bb", "cc", "dd"]),
        }
    )
    kept_a = exact_dedup_online(
        ray.data.from_arrow(job_a), shards=index, first_wins=True
    ).to_pandas()
    assert sorted(kept_a["doc_id"]) == [50, 51, 52, 53]
    assert ray.get(index[0].spilled_runs.remote()) > 0
    job_b = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),  # smaller ids must LOSE
            "text": pa.array(["aa", "dd", "ee"]),
        }
    )
    kept_b = exact_dedup_online(
        ray.data.from_arrow(job_b), shards=index, first_wins=True
    ).to_pandas()
    assert sorted(kept_b["doc_id"]) == [3]  # only the new content survives
    for s in index:
        ray.get(s.cleanup.remote())


def test_semdedup_invariants_random(ray_session):
    """On random vectors: (1) any two KEPT items in one cluster have
    cosine < eps (greedy soundness — each kept item checked against all
    prior kept); (2) every REMOVED item has some higher-priority item
    with cosine >= eps (no spurious removals)."""
    rng = np.random.RandomState(11)
    n, d, k, eps = 60, 6, 3, 0.92
    m = rng.normal(size=(n, d))
    # plant duplicates so removals actually happen
    for src, dst in [(0, 7), (3, 19), (3, 33), (10, 41)]:
        m[dst] = m[src] + rng.normal(scale=1e-3, size=d)
    import ray.data

    from pdf_toolkit_ray import relops
    from pdf_toolkit_ray.stages.ann import semdedup_prune

    cl = rng.randint(0, k, size=n)
    cl[[0, 7, 3, 19, 33, 10, 41]] = [0, 0, 1, 1, 1, 2, 2]  # twins share clusters
    d2 = np.round(rng.uniform(0.1, 5.0, size=n), 6)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "cluster": pa.array(cl, pa.int64()),
            "dist2": pa.array(d2),
            "embedding": pa.array(
                [list(map(float, r)) for r in m], type=pa.list_(pa.float32())
            ),
        }
    )
    out = (
        semdedup_prune(
            ray.data.from_arrow(tbl), eps=eps,
            bucketed_groupby=relops.bucketed_groupby,
        )
        .to_pandas().set_index("vec_id").sort_index()
    )
    assert not out["keep"].all() and out["keep"].any()
    mf = m.astype(np.float32).astype(np.float64)  # same precision path as the op
    mn = mf / np.maximum(np.sqrt((mf * mf).sum(axis=1)), 1e-12)[:, None]
    sims = mn @ mn.T
    order_key = {int(i): (float(d2[i]), -int(i)) for i in range(n)}
    for c in range(k):
        ids = [i for i in range(n) if cl[i] == c]
        kept = [i for i in ids if out.loc[i, "keep"]]
        removed = [i for i in ids if not out.loc[i, "keep"]]
        for a in kept:
            for b in kept:
                if a < b:
                    assert round(sims[a, b], 6) < eps, (a, b, sims[a, b])
        for r in removed:
            priors = [
                j for j in ids
                if (order_key[j] > order_key[r])  # farther (or same dist2, lower id)
            ]
            assert any(round(sims[r, j], 6) >= eps for j in priors), r


def test_kmeans_fold_handles_merged_partial_blocks(ray_session, tmp_path):
    """Ray's output buffer can concatenate several k*d partial tables into
    ONE block (small files -> multi-batch read tasks); the tree-fold
    combiner must accumulate by (cluster, dim) index, not assume one
    partial per block. Result must equal the single-block run."""
    import pyarrow.parquet as pq
    import ray.data

    from pdf_toolkit_ray.stages.ann import kmeans_assign

    rng = np.random.RandomState(2)
    emb = rng.normal(size=(120, 4))
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(120), pa.int64()),
            "embedding": pa.array([list(map(float, r)) for r in emb],
                                  type=pa.list_(pa.float32())),
        }
    )
    many = tmp_path / "many"
    many.mkdir()
    for i in range(12):  # 12 tiny files -> few read tasks, many batches each
        pq.write_table(tbl.slice(i * 10, 10), many / f"{i:02d}.parquet")
    init = np.asarray(
        [np.asarray(v, np.float64) for v in tbl.column("embedding")[:3].to_pylist()]
    )
    a = (
        kmeans_assign(ray.data.read_parquet(str(many), override_num_blocks=2), init, iters=3)
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    )
    b = (
        kmeans_assign(ray.data.from_arrow(tbl), init, iters=3)
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    )
    assert a.equals(b)


def test_online_dedup_across_jobs(ray_session):
    """The digest index outlives one dataset pass: job B's duplicates of
    content already shipped by job A are dropped, while B's genuinely new
    content survives (first_wins — a later job can never retract rows an
    earlier job already emitted)."""
    import ray.data

    from pdf_toolkit_ray.stages.dedup import exact_dedup_online, make_digest_index

    index = make_digest_index(3)
    job_a = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(["aa", "bb", "cc"], pa.string()),
        }
    )
    job_b = pa.table(
        {
            # 10/12 duplicate A's content (even with SMALLER-than-nothing ids
            # they must lose: A already shipped); 11 is new
            "doc_id": pa.array([10, 11, 12], pa.int64()),
            "text": pa.array(["aa", "dd", "cc"], pa.string()),
        }
    )
    kept_a = exact_dedup_online(
        ray.data.from_arrow(job_a), shards=index, first_wins=True
    ).to_pandas()
    assert sorted(kept_a["doc_id"]) == [0, 1, 2]
    kept_b = exact_dedup_online(
        ray.data.from_arrow(job_b), shards=index, first_wins=True
    ).to_pandas()
    assert sorted(kept_b["doc_id"]) == [11]


def test_kmeans_exact_matches_single_process_replica(ray_session):
    """The integer-exact Lloyd trajectory must be identical between the
    distributed run (quantized partial folds, any block layout) and a
    straight-line numpy replica of the same recurrence — the property the
    KMEANS_EXACT_SQL twin also relies on."""
    import ray.data

    from pdf_toolkit_ray.stages.ann import kmeans_exact_assign

    rng = np.random.RandomState(17)
    n, d, k, iters, grid = 400, 16, 5, 4, 1e-6
    emb = (rng.randn(n, d) * 0.3).astype(np.float32)
    vid = np.arange(n, dtype=np.int64)
    tbl = pa.table(
        {
            "vec_id": pa.array(vid),
            "embedding": pa.array([list(map(float, r)) for r in emb],
                                  pa.list_(pa.float32())),
        }
    )
    # shuffled, multi-block layout: order/partitioning must not matter
    perm = rng.permutation(n)
    shuffled = tbl.take(pa.array(perm))
    ds = ray.data.from_arrow(
        [shuffled.slice(i, 64) for i in range(0, n, 64)]
    )
    got = (
        kmeans_exact_assign(ds, k=k, iters=iters, grid=grid)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )

    # single-process replica of the identical recurrence
    xq = np.round(emb.astype(np.float64) / grid).astype(np.int64)
    cents = xq[:k].copy()  # k lowest vec_ids = first k rows
    for _ in range(iters):
        d2 = ((xq[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        a = np.argmin(d2, axis=1)
        for c in range(k):
            m = a == c
            if m.any():
                cents[c] = np.round(
                    xq[m].sum(axis=0).astype(np.float64) / m.sum()
                ).astype(np.int64)
    d2 = ((xq[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    a = np.argmin(d2, axis=1)
    want_d2 = d2[np.arange(n), a]

    assert np.array_equal(got["cluster"].to_numpy(np.int64), a)
    assert np.array_equal(got["dist2q"].to_numpy(np.int64), want_d2)
    assert got["cluster"].nunique() > 1  # non-degenerate fixture


def test_semdedup_exact_matches_single_process_replica(ray_session):
    """Exact-SemDeDup keep decisions must be layout-independent: the
    distributed bucketed run over shuffled blocks equals a straight-line
    replica (same quantized ints, same float expression tree)."""
    import ray.data

    from pdf_toolkit_ray.stages.ann import semdedup_exact

    rng = np.random.RandomState(23)
    n, d, k, iters, grid, eps = 300, 12, 4, 3, 1e-6, 0.3
    # half the rows are near-duplicates of earlier rows → real drops
    base = (rng.randn(n // 2, d) * 0.3).astype(np.float32)
    dup = base + (rng.randn(n // 2, d) * 0.01).astype(np.float32)
    emb = np.concatenate([base, dup]).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array([list(map(float, r)) for r in emb],
                                  pa.list_(pa.float32())),
        }
    )
    perm = rng.permutation(n)
    ds = ray.data.from_arrow(
        [tbl.take(pa.array(perm)).slice(i, 50) for i in range(0, n, 50)]
    )
    got = (
        semdedup_exact(ds, k=k, iters=iters, grid=grid, eps=eps)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )

    # replica: same quantized recurrence + same keep rule
    xq = np.round(emb.astype(np.float64) / grid).astype(np.int64)
    cents = xq[:k].copy()
    for _ in range(iters):
        d2 = ((xq[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        a = np.argmin(d2, axis=1)
        for c in range(k):
            m = a == c
            if m.any():
                cents[c] = np.round(
                    xq[m].sum(axis=0).astype(np.float64) / m.sum()
                ).astype(np.int64)
    d2 = ((xq[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    a = np.argmin(d2, axis=1)
    dist = d2[np.arange(n), a]
    mf = xq.astype(np.float64)
    s = np.sqrt((mf * mf).sum(axis=1))
    keep = np.ones(n, bool)
    for c in range(k):
        idx = np.flatnonzero(a == c)
        order = np.lexsort((idx, -dist[idx]))
        idx = idx[order]
        if len(idx) < 2:
            continue
        dots = mf[idx] @ mf[idx].T
        cos = dots / (s[idx][:, None] * s[idx][None, :])
        prior = np.tril(np.ones((len(idx), len(idx)), bool), k=-1)
        keep[idx] = ~np.any(prior & (cos >= eps), axis=1)

    assert np.array_equal(got["cluster"].to_numpy(np.int64), a)
    assert np.array_equal(got["keep"].to_numpy(bool), keep)
    assert 0 < keep.sum() < n  # non-degenerate: real keeps AND drops


def test_pca_exact_matches_single_process_replica(ray_session):
    """Integer power iteration must be layout-independent and match a
    straight-line replica; the top direction must actually align with the
    dominant variance axis of an engineered anisotropic cloud."""
    import ray.data

    from pdf_toolkit_ray.stages.ann import pca_top_component_exact

    rng = np.random.RandomState(31)
    n, d = 500, 10
    axis = np.zeros(d)
    axis[3] = 1.0
    emb = (np.outer(rng.randn(n) * 0.5, axis) + rng.randn(n, d) * 0.05).astype(
        np.float32
    )
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array([list(map(float, r)) for r in emb],
                                  pa.list_(pa.float32())),
        }
    )
    perm = rng.permutation(n)
    ds = ray.data.from_arrow(
        [tbl.take(pa.array(perm)).slice(i, 64) for i in range(0, n, 64)]
    )
    got = (
        pca_top_component_exact(ds, iters=8)
        .to_pandas()
        .sort_values("dim")["component_q"]
        .to_numpy(np.int64)
    )

    xq = np.round(emb.astype(np.float64) / 1e-6).astype(np.int64)
    G = (xq.astype(np.float64).T @ xq.astype(np.float64)).astype(np.int64)
    Gs = np.round(G.astype(np.float64) / 1e6).astype(np.int64)
    v = np.ones(d, np.int64)
    for _ in range(8):
        w = Gs @ v
        n2 = sum(int(x) * int(x) for x in w)
        if n2 == 0:
            break
        nrm = float(np.sqrt(np.float64(n2)))
        v = np.round((w.astype(np.float64) / nrm) * 1000000.0).astype(np.int64)
    nz = np.flatnonzero(v)
    if len(nz) and v[nz[0]] < 0:
        v = -v

    assert np.array_equal(got, v)
    # dominant axis recovered: |component_3| ≈ 1e6, others small
    assert abs(got[3]) > 990_000
    assert np.abs(np.delete(got, 3)).max() < 200_000


def test_pq_topk_rerank_and_layout_determinism(ray_session):
    """PQ: (1) codes are 1 byte each and the encoder is deterministic;
    (2) with rerank, self-hits score exactly 1.0 (exact rescoring);
    (3) results are IDENTICAL across block layouts — the batch-local keep
    must cover the global rerank cut (regression: a top-k-only batch keep
    made the candidate set depend on batching)."""
    import ray.data

    from pdf_toolkit_ray.stages.ann import (
        brute_force_topk, pq_encode, pq_topk, pq_train_codebooks,
    )

    rng = np.random.RandomState(5)
    n, d = 300, 16
    # planted clusters so PQ has real structure to quantize
    centers = rng.normal(size=(6, d)) * 3
    mat = (centers[rng.randint(0, 6, n)] + rng.normal(size=(n, d)) * 0.3)

    def tbl_blocks(blocks):
        rows = np.array_split(np.arange(n), blocks)
        return ray.data.from_arrow([
            pa.table({
                "vec_id": pa.array(idx, pa.int64()),
                "embedding": pa.array([list(map(float, mat[i])) for i in idx],
                                      type=pa.list_(pa.float32())),
            }) for idx in rows
        ])

    qids, qm = [3, 7, 11], mat[[3, 7, 11]].astype(np.float64)

    books = pq_train_codebooks(mat, m=4, n_codes=16, seed=7)
    assert books.shape == (4, 16, 4)
    codes = pq_encode(tbl_blocks(1), books).to_pandas().sort_values("vec_id")
    assert len(codes) == n and all(len(c) == 4 for c in codes["code"])
    codes2 = pq_encode(tbl_blocks(7), books).to_pandas().sort_values("vec_id")
    assert [list(c) for c in codes["code"]] == [list(c) for c in codes2["code"]]

    def norm(df):
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    out1 = norm(pq_topk(tbl_blocks(1), qids, qm, k=5, m=4, n_codes=16,
                        train_matrix=mat, rerank=100).to_pandas())
    out7 = norm(pq_topk(tbl_blocks(7), qids, qm, k=5, m=4, n_codes=16,
                        train_matrix=mat, rerank=100).to_pandas())
    assert out1.equals(out7)  # layout independence (the rerank-cut bug)

    # clustered data + rerank: PQ top-5 ~= exact top-5 (>=80% per query),
    # and every pair both sides agree on carries the EXACT rescored sim
    exact = brute_force_topk(tbl_blocks(1), qids, qm, k=5).to_pandas()
    esim = {(int(q), int(v)): s for q, v, s in
            zip(exact["query_id"], exact["vec_id"], exact["sim"])}
    for q in qids:
        want = set(exact[exact["query_id"] == q]["vec_id"].astype(int))
        got = set(out1[out1["query_id"] == q]["vec_id"].astype(int))
        assert len(want & got) >= 4
    for _, r in out1.iterrows():
        key = (int(r.query_id), int(r.vec_id))
        if key in esim:  # rerank rescoring equals the brute-force contract
            assert r.sim == esim[key]


def test_knn_loo_accuracy_engineered(ray_session, tmp_path):
    import pyarrow.parquet as pq_mod

    # two tight clusters + one vector planted nearer the WRONG cluster;
    # a distance tie (vecs 0 and 1 identical) must resolve to the
    # smallest vec_id
    vecs = [
        (0, [0.0, 0.0], 1),
        (1, [0.0, 0.0], 1),      # tie with 0 -> both predict each other (1)
        (2, [0.1, 0.0], 1),
        (3, [5.0, 5.0], 2),
        (4, [5.1, 5.0], 2),
        (5, [4.9, 5.0], 1),      # mislabeled plant: nearest are label 2
    ]
    tbl = pa.table(
        {
            "vec_id": pa.array([v[0] for v in vecs], pa.int64()),
            "embedding": pa.array([v[1] for v in vecs], pa.list_(pa.float32())),
            "label": pa.array([v[2] for v in vecs], pa.int32()),
        }
    )
    pq_mod.write_table(tbl, tmp_path / "embeddings.parquet")
    from pdf_toolkit_ray import queries

    got = {
        r["label"]: (r["n"], r["n_correct"])
        for r in queries.knn_loo_accuracy_embeddings(str(tmp_path)).to_pylist()
    }
    # label 1: vecs 0,1,2 correct; vec 5's NN is 4 (label 2) -> wrong => 3/4
    # label 2: vec 3 -> NN 4 ok; vec 4 -> NN 3 ok (5 is closer? |4.9-5.1|=0.2
    # vs |5.0-5.1|... vec4 (5.1,5) nearest is 3 (5.0,5.0) d=0.1 -> ok) => 2/2
    assert got == {1: (4, 3), 2: (2, 2)}


def test_kmeans_purity_shape(ray_session):
    """Purity invariants over the real fixture: clusters partition the
    table, majority counts bound purity in (0, 1], and n_majority is
    consistent with the division."""
    from pdf_toolkit_ray import queries

    rows = queries.kmeans_purity_embeddings("/root/testdata/sf0.001").to_pylist()
    assert sum(r["n"] for r in rows) == 500
    for r in rows:
        assert 1 <= r["n_majority"] <= r["n"]
        assert r["purity"] == r["n_majority"] / r["n"]
        assert 0 <= r["majority_label"] <= 9


def _neardup_corpus(n_groups: int = 12) -> pa.Table:
    """Deterministic corpus with known near-dup structure: per group a
    base sentence, a one-word near variant (trigram jaccard > 0.8), an
    exact copy, and an unrelated singleton."""
    ids, texts = [], []
    nxt = 0
    for g in range(n_groups):
        base = (
            f"group {g} shared sentence about ray data pipelines with many "
            f"common words repeated across documents for stable shingles v{g}"
        )
        near = base.replace("stable", "steady")
        far = f"singleton {g} document with entirely unrelated vocabulary item{g} token{g * 7} marker{g * 13}"
        for t in (base, near, base, far):
            ids.append(nxt)
            texts.append(t)
            nxt += 1
    return pa.table(
        {"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts, pa.string())}
    )


def test_neardup_online_matches_batch_and_spills(ray_session):
    """Persisted band index parity: ingesting the corpus in three disjoint
    increments through a spill-FORCED index (max_entries_per_shard far
    below the band volume) then clustering must equal the one-shot batch
    pipeline (ngram_jaccard_pairs -> components -> attach) row for row —
    near-dup groups span increments, so cross-increment candidates only
    exist if spilled runs are probed correctly."""
    import ray
    import ray.data

    from pdf_toolkit_ray.stages import dedup as dedup_mod

    tbl = _neardup_corpus()
    ds = ray.data.from_arrow(tbl)

    batch_pairs = dedup_mod.ngram_jaccard_pairs(ds, "doc_id", "text", threshold=0.8)
    batch_labels = dedup_mod.connected_components(batch_pairs)
    expected = (
        dedup_mod.attach_cluster_ids(ds, batch_labels, "doc_id")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # fixture sanity: real clusters exist (base+near+copy share a cluster)
    assert (expected["cluster_id"] != expected["doc_id"]).any()

    index = dedup_mod.make_neardup_index(
        num_shards=3, num_perm=64, bands=32, max_entries_per_shard=16
    )
    try:
        for k in range(3):
            mask = pa.array(
                tbl.column("doc_id").to_numpy(zero_copy_only=False) % 3 == k
            )
            n = dedup_mod.neardup_ingest(
                ray.data.from_arrow(tbl.filter(mask)), index, "doc_id", "text"
            )
            assert n == tbl.filter(mask).num_rows
        assert any(
            ray.get(s.spilled_runs.remote()) > 0 for s in index.shards
        ), "budget was meant to force spill runs"
        got = (
            dedup_mod.neardup_clusters(index, ds, "doc_id", "text", threshold=0.8, n=3)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
    finally:
        dedup_mod.destroy_neardup_index(index)
    assert got.equals(expected)


def test_neardup_index_incremental_reclustering(ray_session):
    """Cross-job shape: after job A's ingest, clustering sees only A's
    dups; job B's ingest adds documents near-duplicating A's WITHOUT
    re-signaturing A (A's texts are only rescanned for verify payloads),
    and reclustering merges across jobs."""
    import ray.data

    from pdf_toolkit_ray.stages import dedup as dedup_mod

    base = (
        "job alpha canonical sentence with plenty of shared trigram "
        "material across revisions of the same underlying document text "
        "padded with further stable words so a single substitution keeps "
        "the exact word trigram jaccard similarity comfortably above the "
        "clustering threshold used by the persisted band index pipeline"
    )
    job_a = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array([base, "unrelated alpha content entirely"], pa.string()),
        }
    )
    job_b = pa.table(
        {
            "doc_id": pa.array([10], pa.int64()),
            "text": pa.array([base.replace("plenty", "lots")], pa.string()),
        }
    )
    index = dedup_mod.make_neardup_index(num_shards=2, num_perm=64, bands=32)
    try:
        dedup_mod.neardup_ingest(ray.data.from_arrow(job_a), index)
        first = dedup_mod.neardup_clusters(
            index, ray.data.from_arrow(job_a), threshold=0.8, n=3
        ).to_pandas()
        assert sorted(first["cluster_id"]) == [0, 1]  # no dups within A
        dedup_mod.neardup_ingest(ray.data.from_arrow(job_b), index)
        corpus = ray.data.from_arrow(pa.concat_tables([job_a, job_b]))
        second = (
            dedup_mod.neardup_clusters(index, corpus, threshold=0.8, n=3)
            .to_pandas()
            .set_index("doc_id")["cluster_id"]
        )
        assert second[10] == 0 and second[0] == 0 and second[1] == 1
    finally:
        dedup_mod.destroy_neardup_index(index)


def test_neardup_index_save_load_across_sessions(ray_session, tmp_path):
    """Durable cross-SESSION index: ingest increment 1, save, destroy the
    actors (session death), load into fresh actors, ingest increment 2,
    cluster — identical to the one-shot batch pipeline. Signatures from
    the first session are never recomputed (its texts are only rescanned
    for verify payloads at cluster time)."""
    import pyarrow.compute as pc
    import ray
    import ray.data

    from pdf_toolkit_ray.stages import dedup as dedup_mod

    tbl = _neardup_corpus(8)
    ds = ray.data.from_arrow(tbl)
    batch_pairs = dedup_mod.ngram_jaccard_pairs(ds, "doc_id", "text", threshold=0.8)
    expected = (
        dedup_mod.attach_cluster_ids(
            ds, dedup_mod.connected_components(batch_pairs), "doc_id"
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )

    mask = pa.array(tbl.column("doc_id").to_numpy(zero_copy_only=False) % 2 == 0)
    store = str(tmp_path / "ndidx")

    # session 1: ingest evens (spill-budgeted), save, kill actors
    idx1 = dedup_mod.make_neardup_index(
        num_shards=2, num_perm=64, bands=32,
        max_entries_per_shard=16, spill_dir=str(tmp_path / "spill"),
    )
    dedup_mod.neardup_ingest(ray.data.from_arrow(tbl.filter(mask)), idx1)
    dedup_mod.save_neardup_index(idx1, store)
    for s in idx1.shards:  # simulate session death WITHOUT cleanup
        ray.kill(s)

    # session 2: reopen, ingest odds, cluster
    idx2 = dedup_mod.load_neardup_index(store, max_entries_per_shard=16)
    assert idx2.num_perm == 64 and idx2.bands == 32
    dedup_mod.neardup_ingest(
        ray.data.from_arrow(tbl.filter(pc.invert(mask))), idx2
    )
    got = (
        dedup_mod.neardup_clusters(idx2, ds, threshold=0.8, n=3)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    dedup_mod.destroy_neardup_index(idx2)
    assert got.equals(expected)


def test_digest_index_save_load_across_jobs(ray_session, tmp_path):
    """Durable digest index: job A's content survives actor death via
    save/load, and job B's re-offers of it still lose under first_wins
    (the cross-session extension of test_online_dedup_across_jobs)."""
    import ray
    import ray.data

    from pdf_toolkit_ray.stages.dedup import (
        exact_dedup_online,
        load_digest_index,
        make_digest_index,
        save_digest_index,
    )

    job_a = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(["aa", "bb", "cc"], pa.string()),
        }
    )
    job_b = pa.table(
        {
            "doc_id": pa.array([10, 11, 12], pa.int64()),
            "text": pa.array(["aa", "dd", "cc"], pa.string()),
        }
    )
    store = str(tmp_path / "didx")
    idx = make_digest_index(
        3, max_entries_per_shard=2, spill_dir=str(tmp_path / "spill")
    )
    kept_a = exact_dedup_online(
        ray.data.from_arrow(job_a), shards=idx, first_wins=True
    ).to_pandas()
    assert sorted(kept_a["doc_id"]) == [0, 1, 2]
    save_digest_index(idx, store)
    for s in idx:
        ray.kill(s)

    idx2 = load_digest_index(store, max_entries_per_shard=2)
    kept_b = exact_dedup_online(
        ray.data.from_arrow(job_b), shards=idx2, first_wins=True
    ).to_pandas()
    assert sorted(kept_b["doc_id"]) == [11]


from hypothesis import HealthCheck as _HC
from hypothesis import given as _given
from hypothesis import settings as _settings
from hypothesis import strategies as _st

_ND_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[_HC.too_slow, _HC.function_scoped_fixture],
)

#: small word pool => random docs share shingles by construction, so the
#: property exercises real candidate pairs, not just empty buckets
_ND_WORDS = ["ray", "data", "engine", "batch", "arrow", "shard", "index",
             "merge", "spill", "probe", "band", "text", "turn", "conv"]


@_given(
    seed=_st.integers(0, 2**20),
    n_docs=_st.integers(2, 18),
    n_parts=_st.integers(1, 4),
    budget=_st.integers(4, 40),
    num_shards=_st.integers(1, 4),
)
@_settings(**_ND_SETTINGS)
def test_neardup_index_random_increments_match_batch(
    ray_session, seed, n_docs, n_parts, budget, num_shards
):
    """PROPERTY: for ANY corpus, ANY partition into ingest increments,
    ANY spill budget and ANY shard count, clustering through the
    persisted band index equals the one-shot batch pipeline. (The class
    of test that caught the digest index's per-process sub-bucketing
    bug.)"""
    import ray.data

    from pdf_toolkit_ray.stages import dedup as dedup_mod

    rng = np.random.RandomState(seed)
    texts = []
    for i in range(n_docs):
        base = " ".join(rng.choice(_ND_WORDS, size=rng.randint(4, 16)))
        texts.append(base)
        # sprinkle exact and near duplicates of earlier docs
        if i and rng.rand() < 0.4:
            j = rng.randint(0, i)
            t = texts[j]
            if rng.rand() < 0.5:
                t = t + " extra"
            texts.append(t)
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    ds = ray.data.from_arrow(tbl)

    pairs = dedup_mod.ngram_jaccard_pairs(ds, "doc_id", "text", threshold=0.8)
    expected = (
        dedup_mod.attach_cluster_ids(
            ds, dedup_mod.connected_components(pairs), "doc_id"
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )

    assign = rng.randint(0, n_parts, size=tbl.num_rows)
    index = dedup_mod.make_neardup_index(
        num_shards=num_shards, num_perm=64, bands=32, max_entries_per_shard=budget
    )
    try:
        for k in range(n_parts):
            part = tbl.filter(pa.array(assign == k))
            if part.num_rows:
                dedup_mod.neardup_ingest(ray.data.from_arrow(part), index)
        got = (
            dedup_mod.neardup_clusters(index, ds, threshold=0.8, n=3)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
    finally:
        dedup_mod.destroy_neardup_index(index)
    assert got.equals(expected)
