import numpy as np

from pdf_toolkit_ray.functions.hashing import HyperLogLog


def test_hll_accuracy_and_merge():
    rng = np.random.RandomState(5)
    values = [f"key{int(v)}" for v in rng.randint(0, 50_000, size=120_000)]
    exact = len(set(values))

    whole = HyperLogLog()
    whole.add_strings(values)
    est = whole.estimate()
    assert abs(est - exact) / exact < 0.05  # p=12 → σ ≈ 1.6%

    # merge of shard sketches == sketch of the union
    shards = [HyperLogLog() for _ in range(8)]
    for i, shard in enumerate(shards):
        shard.add_strings(values[i::8])
    merged = shards[0]
    for other in shards[1:]:
        merged.merge(other)
    assert merged.estimate() == est

    # bytes round-trip
    again = HyperLogLog.from_bytes(merged.to_bytes())
    assert again.estimate() == est


def test_hll_small_cardinality_linear_counting():
    hll = HyperLogLog()
    hll.add_strings([f"v{i}" for i in range(100)])
    assert abs(hll.estimate() - 100) <= 3


def test_approx_distinct_query_close_to_exact(ray_session):
    from pdf_toolkit_ray.queries import approx_distinct_parts, count_distinct_parts

    sf = "/root/testdata/sf0.001"
    approx = approx_distinct_parts(sf).to_pandas().set_index("l_returnflag")
    exact = count_distinct_parts(sf).to_pandas().set_index("l_returnflag")
    for flag in exact.index:
        e, a = exact.loc[flag, "n_parts"], approx.loc[flag, "approx_n_parts"]
        assert abs(a - e) / e < 0.06, (flag, e, a)
