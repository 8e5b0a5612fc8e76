"""Engineered goldens for the round-4 session-10 ops."""

import hashlib

import pandas as pd

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from pdf_toolkit_ray import queries


def _write_docs(tmp_path, doc_ids, texts=None, name="documents"):
    n = len(doc_ids)
    texts = texts if texts is not None else [f"text {i}" for i in doc_ids]
    tbl = pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * n, pa.string()),
            "source": pa.array(["web"] * n, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, tmp_path / f"{name}.parquet")
    return str(tmp_path)


def _reference_assignment(doc_ids, n_shards=16):
    h = [
        int(hashlib.md5(f"shuf{i}".encode()).hexdigest()[:12], 16)
        for i in doc_ids
    ]
    order = sorted(range(len(doc_ids)), key=lambda j: (h[j], doc_ids[j]))
    out = {}
    for rn0, j in enumerate(order):
        out[doc_ids[j]] = (rn0 % n_shards, rn0 // n_shards)
    return out


def test_train_shard_assign_matches_reference_and_balances(ray_session, tmp_path):
    ids = list(range(101))
    sf = _write_docs(tmp_path, ids)
    out = queries.train_shard_assign_documents(sf).to_pandas()
    got = {r.doc_id: (r.shard, r.pos) for r in out.itertuples()}
    assert got == _reference_assignment(ids)

    sizes = out.groupby("shard").size()
    assert sizes.max() - sizes.min() <= 1 and len(sizes) == 16
    # pos is dense 0..size-1 within each shard
    for _, g in out.groupby("shard"):
        assert sorted(g["pos"]) == list(range(len(g)))


def test_perplexity_buckets_order_and_ties(ray_session, tmp_path):
    # 3 docs of very common words, 3 of mid-frequency, 3 of singleton
    # words -> xent strictly increases across the groups; terciles must
    # recover them exactly
    texts = (
        ["a a a a a a"] * 3
        + ["b c b c b c", "c b c b c b", "b b c c b c"]
        + ["q w e r t y", "u i o p s d", "f g h j k l"]
    )
    sf = _write_docs(tmp_path, list(range(9)), texts)
    out = queries.perplexity_buckets_documents(sf).to_pandas()
    by_doc = out.set_index("doc_id")["bucket"]
    assert list(by_doc.loc[[0, 1, 2]]) == ["head"] * 3
    assert list(by_doc.loc[[3, 4, 5]]) == ["middle"] * 3
    assert list(by_doc.loc[[6, 7, 8]]) == ["tail"] * 3


def test_perplexity_buckets_all_tied(ray_session, tmp_path):
    # identical docs -> one xent value -> both thresholds equal it ->
    # every doc deterministically lands in 'head'
    sf = _write_docs(tmp_path, list(range(7)), ["same words here"] * 7)
    out = queries.perplexity_buckets_documents(sf).to_pandas()
    assert set(out["bucket"]) == {"head"}


def test_source_cap_keeps_longest_with_ties(ray_session, tmp_path):
    # source A: 4 docs, lengths 5,9,9,2 -> cap 2 keeps the two 9s
    # (tie broken by doc_id); source B: 1 doc -> kept with rn=1
    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "text": pa.array(["x"] * 5, pa.string()),
            "lang": pa.array(["en"] * 5, pa.string()),
            "source": pa.array(["A", "A", "A", "A", "B"], pa.string()),
            "n_chars": pa.array([5, 9, 9, 2, 7], pa.int64()),
        }
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")
    out = (
        queries.source_cap_documents(str(tmp_path), cap=2)
        .to_pandas()
        .sort_values(["source", "rn"])
        .reset_index(drop=True)
    )
    assert list(zip(out["source"], out["doc_id"], out["rn"])) == [
        ("A", 2, 1), ("A", 3, 2), ("B", 5, 1),
    ]


def test_silhouette_geometry(ray_session, tmp_path):
    # k=2, iters=1: seeds are vec 0 (0,0) and vec 1 (10,0); the tight
    # far-apart pair means centroids stay put. vec 2 sits exactly halfway
    # -> a == b -> sil 0; vecs 0/1 sit ON their centroid -> a=0, b=10 ->
    # sil 1.
    tbl = pa.table(
        {
            "vec_id": pa.array([0, 1, 2], pa.int64()),
            "embedding": pa.array(
                [[0.0, 0.0], [10.0, 0.0], [5.0, 0.0]], pa.list_(pa.float32())
            ),
            "label": pa.array([0, 1, 0], pa.int32()),
        }
    )
    pq.write_table(tbl, tmp_path / "embeddings.parquet")
    out = (
        queries.silhouette_embeddings(str(tmp_path), k=2, iters=0)
        .to_pandas()
        .set_index("vec_id")
    )
    assert out.loc[0, "sil"] == 1.0 and out.loc[1, "sil"] == 1.0
    # halfway point: argmin tie -> cluster 0, a == b -> sil exactly 0
    assert out.loc[2, "cluster"] == 0 and out.loc[2, "sil"] == 0.0


def test_watermark_flags_planted_late_arrival(ray_session, tmp_path):
    # arrival order (event_id) with one event whose ts regressed 2 min
    # behind the watermark -> late at 60s tolerance; a 30s regression is
    # within tolerance -> not late
    base = np.datetime64("2026-04-01T00:00:00", "us")
    mins = [0, 5, 10, 8, 15, 14 + 35 / 60]  # event 3 is 2min late, 5 is ~35s
    ts = [base + np.timedelta64(int(m * 60_000_000), "us") for m in mins]
    tbl = pa.table(
        {
            "event_id": pa.array(range(6), pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array([1] * 6, pa.int64()),
            "event_type": pa.array(["view"] * 6, pa.string()),
            "value": pa.array([1.0] * 6, pa.float64()),
            "props": pa.array(["{}"] * 6, pa.string()),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")
    out = (
        queries.watermark_late_events(str(tmp_path))
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert list(out["is_late"]) == [False, False, False, True, False, False]
    # first row has no watermark
    assert pd.isna(out.loc[0, "wm_us"])
    # watermark at event 3 is event 2's ts (10 min)
    assert out.loc[3, "wm_us"] == (base + np.timedelta64(10, "m")).astype(
        "datetime64[us]"
    ).astype("int64")


def test_hard_negatives_forced_gate_parity(ray_session):
    """IVF-co-partitioned path with n_probe == n_cells covers every
    (query, candidate) pair, so it must equal the exact broadcast path
    bit-for-bit on the real fixture."""
    import ray.data

    from pdf_toolkit_ray import relops
    from pdf_toolkit_ray.stages.ann import hard_negatives_topk

    ds = relops.scan("/root/testdata/sf0.001", "embeddings",
                     columns=["vec_id", "embedding", "label"])
    exact = (
        hard_negatives_topk(ds, k=5)
        .to_pandas()
        .sort_values(["vec_id", "rank"])
        .reset_index(drop=True)
    )
    ivf = (
        hard_negatives_topk(ds, k=5, gate_bytes=0, n_cells=4, n_probe=4)
        .to_pandas()
        .sort_values(["vec_id", "rank"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(exact, ivf[exact.columns], check_exact=True)


def test_hard_negatives_excludes_same_label(ray_session, tmp_path):
    # 2D plants: anchor (1,0) label 0; same-label near-twin (1,0.01) must
    # NOT appear; nearest other-label is (0.9,0.1)
    tbl = pa.table(
        {
            "vec_id": pa.array([0, 1, 2, 3], pa.int64()),
            "embedding": pa.array(
                [[1.0, 0.0], [1.0, 0.01], [0.9, 0.1], [-1.0, 0.0]],
                pa.list_(pa.float32()),
            ),
            "label": pa.array([0, 0, 1, 1], pa.int32()),
        }
    )
    pq.write_table(tbl, tmp_path / "embeddings.parquet")
    out = queries.hard_negatives_embeddings(str(tmp_path), k=2).to_pandas()
    anchor = out[out["vec_id"] == 0].sort_values("rank")
    assert list(anchor["neg_id"]) == [2, 3]
    assert 1 not in set(anchor["neg_id"])


def test_text_source_roundtrips_empty_and_unicode(ray_session, tmp_path):
    texts = ["", "héllo wörld", "a  double  space", "ascii"]
    sf = _write_docs(tmp_path, [10, 11, 12, 13], texts)
    out = (
        queries.text_source_documents(sf)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(out["text"]) == texts
    assert list(out["n_chars"]) == [len(t) for t in texts]


def test_ks_doclen_hand_computed(ray_session, tmp_path):
    # en lengths {1,2,3}, de lengths {3,4}; cross-multiplied divergence
    # |ca*nb - cb*na| over x: 2, 4, 3, 0 -> max 4 at x=2; D = 4/6
    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
            "text": pa.array(["t"] * 6, pa.string()),
            "lang": pa.array(["en", "en", "en", "de", "de", "zh"], pa.string()),
            "source": pa.array(["s"] * 6, pa.string()),
            "n_chars": pa.array([1, 2, 3, 3, 4, 999], pa.int64()),
        }
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")
    out = queries.ks_doclen_documents(str(tmp_path)).to_pylist()[0]
    assert out == {
        "na": 3, "nb": 2, "d_num": 4, "at_x": 2, "ks_d": 4.0 / 6.0,
    }


def test_train_shard_assign_layout_independent(ray_session, tmp_path):
    rng = np.random.default_rng(7)
    ids = rng.permutation(257).tolist()  # shuffled write order
    d1 = tmp_path / "a"
    d1.mkdir()
    sf1 = _write_docs(d1, ids)
    # same rows, sorted order, tiny row groups -> different block layout
    d2 = tmp_path / "b"
    d2.mkdir()
    tbl = pa.table(
        {
            "doc_id": pa.array(sorted(ids), pa.int64()),
            "text": pa.array([f"text {i}" for i in sorted(ids)], pa.string()),
            "lang": pa.array(["en"] * len(ids), pa.string()),
            "source": pa.array(["web"] * len(ids), pa.string()),
            "n_chars": pa.array([1] * len(ids), pa.int64()),
        }
    )
    pq.write_table(tbl, d2 / "documents.parquet", row_group_size=16)

    a = (
        queries.train_shard_assign_documents(sf1)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        queries.train_shard_assign_documents(str(d2))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert a.equals(b)
