"""Sketch tests: KLL rank-error bounds (single-stream and merged), Bloom
no-false-negatives + bounded false-positive rate, and the distributed
Bloom build/prefilter over a Ray dataset."""

import numpy as np
import pyarrow as pa

from pdf_toolkit_ray.stages.sketch import (
    KLL,
    bloom_build,
    bloom_might_contain,
)


def _rank_error(values: np.ndarray, est: np.ndarray, qs: list[float]) -> float:
    s = np.sort(values)
    worst = 0.0
    for q, e in zip(qs, est):
        true_rank = np.searchsorted(s, e, side="right") / len(s)
        worst = max(worst, abs(true_rank - q))
    return worst


QS = [0.01, 0.25, 0.5, 0.75, 0.99]


def test_kll_rank_error_single_stream():
    rng = np.random.default_rng(5)
    vals = rng.lognormal(3.0, 1.0, size=100_000)
    sk = KLL(k=200, seed=0).update(vals)
    assert _rank_error(vals, sk.quantiles(QS), QS) < 0.02


def test_kll_merge_matches_bound():
    rng = np.random.default_rng(6)
    vals = rng.normal(0, 1, size=120_000)
    parts = np.array_split(vals, 24)
    merged = None
    for i, p in enumerate(parts):
        sk = KLL(k=200, seed=i).update(p)
        # serialize/deserialize roundtrip, as the shuffle would
        sk = KLL.from_row(sk.to_row(), seed=100 + i)
        merged = sk if merged is None else merged.merge(sk)
    assert merged.n == len(vals)
    assert _rank_error(vals, merged.quantiles(QS), QS) < 0.03


def test_bloom_no_false_negatives_and_low_fpr():
    rng = np.random.default_rng(7)
    keys = rng.integers(0, 2**62, size=50_000)
    bits = bloom_build(keys, m_bits=1 << 20)
    assert bloom_might_contain(bits, keys).all()
    probe = rng.integers(2**62, 2**63 - 1, size=50_000)
    fpr = bloom_might_contain(bits, probe).mean()
    assert fpr < 0.02  # theory ~0.24% at 21 bits/key, 4 hashes


def test_bloom_from_dataset_prefilter(ray_session):
    import ray

    from pdf_toolkit_ray import relops

    build = ray.data.from_arrow(
        pa.table({"k": pa.array(np.arange(1000), pa.int64())})
    ).repartition(7)
    probe = ray.data.from_arrow(
        pa.table({"k": pa.array(np.arange(2000), pa.int64())})
    ).repartition(5)
    bits_ref = relops.bloom_from_dataset(build, "k")
    kept = relops.bloom_prefilter(probe, "k", bits_ref).to_pandas()["k"].to_numpy()
    # every build key survives; non-members almost all drop
    assert np.isin(np.arange(1000), kept).all()
    assert len(kept) < 1100


def test_pagerank_paths_agree_and_match_numpy(ray_session):
    import ray

    from pdf_toolkit_ray.stages.graph import pagerank, pagerank_numpy

    rng = np.random.default_rng(3)
    a = rng.integers(0, 40, size=300)
    b = rng.integers(40, 90, size=300)
    src = np.concatenate([a, b])
    dst = np.concatenate([b, a])
    # dedup like a caller would
    pairs = np.unique(np.stack([src, dst], axis=1), axis=0)
    edges_tbl = pa.table(
        {"src": pa.array(pairs[:, 0], pa.int64()), "dst": pa.array(pairs[:, 1], pa.int64())}
    )

    def run(gate):
        ds = ray.data.from_arrow(edges_tbl).repartition(6)
        return (
            pagerank(ds, iters=4, node_gate=gate)
            .to_pandas()
            .sort_values("node")
            .reset_index(drop=True)
        )

    broadcast_path = run(10**9)
    join_path = run(0)
    assert (broadcast_path["node"] == join_path["node"]).all()
    # identical quantized recurrence -> bit-for-bit equal
    assert (broadcast_path["rank"].to_numpy() == join_path["rank"].to_numpy()).all()

    nodes, r = pagerank_numpy(pairs[:, 0], pairs[:, 1], iters=4)
    assert (broadcast_path["node"].to_numpy() == nodes).all()
    assert (broadcast_path["rank"].to_numpy() == r).all()
    # ranks form a probability-ish distribution (sums to ~1)
    assert abs(broadcast_path["rank"].sum() - 1.0) < 1e-3


def test_price_quantiles_rank_check_bound_and_synthetic(ray_session, tmp_path):
    """The driver-hashable companion: bound check green on the real fixture
    AND on a synthetic heavy-tail column (lognormal — no repeated values,
    the regime the KLL path exists for)."""
    import pyarrow.parquet as pq

    from pdf_toolkit_ray.queries import price_quantiles_rank_check

    out = price_quantiles_rank_check("/root/testdata/sf0.001").to_pydict()
    assert out["q_bp"] == [2500, 5000, 7500, 9900]
    assert out["within_300bp"] == [1, 1, 1, 1]

    rng = np.random.default_rng(11)
    vals = np.exp(rng.normal(0, 2.5, size=60000))
    pq.write_table(
        pa.table({"l_extendedprice": pa.array(vals, pa.float64())}),
        tmp_path / "lineitem.parquet",
    )
    out = price_quantiles_rank_check(str(tmp_path)).to_pydict()
    assert out["within_300bp"] == [1, 1, 1, 1]
