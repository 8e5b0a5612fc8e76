"""Deduplication stages for training-data pipelines.

Shapes (all Ray-Data-first, shuffle budget stated per op):

* exact: digest column in ``map_batches`` → one small ``groupby(digest)``
  aggregate — never ships full texts twice;
* MinHash+LSH: signature per row (actor-held permutations) → explode to
  (band_key, id, signature) → ``groupby(band_key)`` → candidate edges by
  signature-estimated Jaccard → connected components;
* SimHash: 64-bit signature + 4×16-bit band bucketing → Hamming verify;
* n-gram Jaccard: LSH candidates → exact Jaccard verify on texts.

Connected components here run union-find on the *edge list* (candidate
pairs after verification), which is orders of magnitude smaller than the
corpus; the guard ``max_edges`` makes the assumption explicit. At
10^12-row scale replace with iterative min-label propagation
(groupby-join rounds) — the edge emission stages are already
distributed and unchanged.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data
from ray.data.aggregate import Count, Min

from ..functions.hashing import MinHasher, hamming64, jaccard_ngrams, md5_hex, simhash64
from ..functions.rounding import round_away_scalar


def add_digest(ds: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    def _digest(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "digest", pa.array(md5_hex(batch.column(text_col).to_pylist()))
        )

    return ds.map_batches(_digest, batch_format="pyarrow", zero_copy_batch=True)


def exact_dedup_groups(
    ds: ray.data.Dataset, id_col: str = "doc_id", text_col: str = "text"
) -> ray.data.Dataset:
    """(digest, doc_id=min id, n=multiplicity) per distinct content."""
    return (
        add_digest(ds.select_columns([id_col, text_col]), text_col)
        .groupby("digest")
        .aggregate(Min(id_col, alias_name=id_col), Count(alias_name="n"))
    )


def exact_dedup(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Keep one representative row (min id) per distinct text.

    Scale path: a distributed semi-join on ``(digest, id)`` against the
    ``exact_dedup_groups`` output — both sides are hash-partitioned by
    Ray's ``Dataset.join``; nothing is materialized on the driver."""
    keep = exact_dedup_groups(ds, id_col, text_col).select_columns(["digest", id_col])
    keyed = add_digest(ds, text_col)
    joined = keyed.join(
        keep,
        "inner",
        num_partitions=num_partitions,
        on=("digest", id_col),
    )
    return joined.drop_columns(["digest"])


class _MinHashStage:
    """Actor-pool stage: per-row MinHash signature + LSH band keys."""

    def __init__(self, id_col: str, text_col: str, num_perm: int, bands: int):
        self.hasher = MinHasher(num_perm=num_perm, bands=bands)
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, bands_out, sigs = [], [], []
        for rid, text in zip(
            batch.column(self.id_col).to_pylist(), batch.column(self.text_col).to_pylist()
        ):
            sig = self.hasher.signature(text or "")
            for key in self.hasher.band_keys(sig):
                ids.append(rid)
                bands_out.append(key)
                sigs.append(sig.tobytes())
        return pa.table(
            {
                "band_key": pa.array(bands_out),
                self.id_col: pa.array(ids, type=batch.column(self.id_col).type),
                "sig": pa.array(sigs, type=pa.binary()),
            }
        )


def _candidate_edges(group: pa.Table, id_col: str, threshold: float) -> pa.Table:
    """Pairwise signature-estimated Jaccard within one LSH bucket."""
    ids = group.column(id_col).to_pylist()
    sigs = [np.frombuffer(s, dtype=np.uint32) for s in group.column("sig").to_pylist()]
    a_out, b_out, est = [], [], []
    seen: dict[int, int] = {}
    order = sorted(range(len(ids)), key=lambda i: ids[i])
    for ii in range(len(order)):
        i = order[ii]
        for jj in range(ii + 1, len(order)):
            j = order[jj]
            if ids[i] == ids[j]:
                continue
            sim = float(np.mean(sigs[i] == sigs[j]))
            if sim >= threshold:
                a_out.append(ids[i])
                b_out.append(ids[j])
                est.append(round_away_scalar(sim))
    return pa.table(
        {
            "a": pa.array(a_out, type=group.column(id_col).type),
            "b": pa.array(b_out, type=group.column(id_col).type),
            "est_jaccard": pa.array(est, type=pa.float64()),
        }
    )


def minhash_candidate_edges(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.8,
) -> ray.data.Dataset:
    """Distinct near-duplicate candidate pairs with estimated Jaccard ≥ threshold."""
    exploded = ds.select_columns([id_col, text_col]).map_batches(
        _MinHashStage,
        fn_constructor_args=(id_col, text_col, num_perm, bands),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 8),
    )
    edges = exploded.groupby("band_key").map_groups(
        lambda g: _candidate_edges(g, id_col, threshold), batch_format="pyarrow"
    )
    # a pair can surface from several bands -> dedup on (a, b)
    return edges.groupby(["a", "b"]).aggregate(Min("est_jaccard", alias_name="est_jaccard"))


def minhash_lsh_clusters(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.8,
    max_edges: int = 5_000_000,
) -> pa.Table:
    """(id, cluster_id) for every row; cluster_id = min id in the component."""
    edge_rows = minhash_candidate_edges(
        ds, id_col, text_col, num_perm=num_perm, bands=bands, threshold=threshold
    ).take_all()
    if len(edge_rows) > max_edges:
        raise RuntimeError(
            f"{len(edge_rows)} candidate edges exceed max_edges={max_edges}; "
            "switch to label-propagation components for this corpus"
        )
    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    def union(x, y):
        rx, ry = find(x), find(y)
        if rx != ry:
            if ry < rx:
                rx, ry = ry, rx
            parent[ry] = rx

    for row in edge_rows:
        parent.setdefault(row["a"], row["a"])
        parent.setdefault(row["b"], row["b"])
        union(row["a"], row["b"])

    ids = [r[id_col] for r in ds.select_columns([id_col]).take_all()]
    clusters = [find(i) if i in parent else i for i in ids]
    return pa.table({id_col: pa.array(ids), "cluster_id": pa.array(clusters)})


def add_simhash(ds: ray.data.Dataset, id_col: str = "doc_id", text_col: str = "text") -> ray.data.Dataset:
    """(id, simhash) — signature stored as int64 (two's-complement of uint64)."""

    def _sim(batch: pa.Table) -> pa.Table:
        sims = [
            np.uint64(simhash64(t or "")).astype(np.int64)
            for t in batch.column(text_col).to_pylist()
        ]
        return pa.table(
            {
                id_col: batch.column(id_col),
                "simhash": pa.array(np.array(sims, dtype=np.int64)),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        _sim, batch_format="pyarrow", zero_copy_batch=True
    )


def simhash_near_dup_pairs(
    ds: ray.data.Dataset, id_col: str = "doc_id", text_col: str = "text", max_hamming: int = 3
) -> ray.data.Dataset:
    """Pairs with Hamming distance ≤ max_hamming via 4×16-bit band bucketing
    (a pair within distance 3 shares at least one of 4 bands — pigeonhole)."""
    sims = add_simhash(ds, id_col, text_col)

    def _explode(batch: pa.Table) -> pa.Table:
        ids, keys, hashes = [], [], []
        for rid, sh in zip(batch.column(id_col).to_pylist(), batch.column("simhash").to_pylist()):
            u = np.uint64(sh).item() & 0xFFFFFFFFFFFFFFFF
            for band in range(4):
                chunk = (u >> (band * 16)) & 0xFFFF
                ids.append(rid)
                keys.append(f"{band}:{chunk}")
                hashes.append(sh)
        return pa.table(
            {
                "band_key": pa.array(keys),
                id_col: pa.array(ids, type=batch.column(id_col).type),
                "simhash": pa.array(hashes, type=pa.int64()),
            }
        )

    def _pairs(group: pa.Table) -> pa.Table:
        ids = group.column(id_col).to_pylist()
        hs = group.column("simhash").to_pylist()
        a_out, b_out, dist = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if ids[i] == ids[j]:
                    continue
                ua = np.uint64(hs[i]).item() & 0xFFFFFFFFFFFFFFFF
                ub = np.uint64(hs[j]).item() & 0xFFFFFFFFFFFFFFFF
                d = hamming64(ua, ub)
                if d <= max_hamming:
                    lo, hi = sorted((ids[i], ids[j]))
                    a_out.append(lo)
                    b_out.append(hi)
                    dist.append(d)
        return pa.table(
            {
                "a": pa.array(a_out, type=group.column(id_col).type),
                "b": pa.array(b_out, type=group.column(id_col).type),
                "hamming": pa.array(dist, type=pa.int64()),
            }
        )

    exploded = sims.map_batches(_explode, batch_format="pyarrow", zero_copy_batch=True)
    pairs = exploded.groupby("band_key").map_groups(_pairs, batch_format="pyarrow")
    return pairs.groupby(["a", "b"]).aggregate(Min("hamming", alias_name="hamming"))


class _NgramVerifyStage:
    """Exact n-gram Jaccard verification within an LSH bucket (texts present)."""

    def __init__(self, id_col: str, threshold: float, n: int):
        self.id_col, self.threshold, self.n = id_col, threshold, n

    def __call__(self, group: pa.Table) -> pa.Table:
        ids = group.column(self.id_col).to_pylist()
        texts = group.column("text").to_pylist()
        a_out, b_out, jac = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if ids[i] == ids[j]:
                    continue
                sim = jaccard_ngrams(texts[i] or "", texts[j] or "", self.n)
                if sim >= self.threshold:
                    lo, hi = sorted((ids[i], ids[j]))
                    a_out.append(lo)
                    b_out.append(hi)
                    jac.append(round_away_scalar(sim))
        return pa.table(
            {
                "a": pa.array(a_out, type=group.column(self.id_col).type),
                "b": pa.array(b_out, type=group.column(self.id_col).type),
                "jaccard": pa.array(jac, type=pa.float64()),
            }
        )


def ngram_jaccard_pairs(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    threshold: float = 0.5,
    n: int = 3,
    num_perm: int = 64,
    bands: int = 32,
) -> ray.data.Dataset:
    """LSH-bucketed candidate generation + exact Jaccard verify.

    More bands (32×2 rows) → high recall at moderate thresholds; the
    exact verify step removes false positives, so extra candidates cost
    compute, not correctness.
    """

    class _Stage(_MinHashStage):
        def __call__(self, batch: pa.Table) -> pa.Table:
            ids, bands_out, texts = [], [], []
            for rid, text in zip(
                batch.column(self.id_col).to_pylist(), batch.column(self.text_col).to_pylist()
            ):
                sig = self.hasher.signature(text or "")
                for key in self.hasher.band_keys(sig):
                    ids.append(rid)
                    bands_out.append(key)
                    texts.append(text)
            return pa.table(
                {
                    "band_key": pa.array(bands_out),
                    self.id_col: pa.array(ids, type=batch.column(self.id_col).type),
                    "text": pa.array(texts),
                }
            )

    exploded = ds.select_columns([id_col, text_col]).map_batches(
        _Stage,
        fn_constructor_args=(id_col, text_col, num_perm, bands),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 8),
    )
    verifier = _NgramVerifyStage(id_col, threshold, n)

    def _verify(group: pa.Table) -> pa.Table:
        return verifier(group)

    pairs = exploded.groupby("band_key").map_groups(_verify, batch_format="pyarrow")
    return pairs.groupby(["a", "b"]).aggregate(Min("jaccard", alias_name="jaccard"))
