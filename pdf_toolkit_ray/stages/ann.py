"""Similarity search over an embedding column (``list<float>``).

* ``brute_force_topk`` — the exact baseline: the (small) query matrix is
  broadcast once with ``ray.put``; every batch does one float64 matmul
  against it and emits only its batch-local top-k per query, so the
  final ``groupby(query_id)`` shuffles ≤ Q·k rows per batch, never the
  corpus.
* ``lsh_bucketed_topk`` — the scale path: L random-hyperplane hash
  tables; only rows colliding with a query bucket in some table are
  scored. Approximate by construction (rows-only check in the driver
  contract).
* ``cosine_near_dup_pairs`` — embedding near-duplicate detection: the
  normalized corpus matrix is broadcast (fits for test scales; LSH-
  prefilter at extreme scale) and each batch emits pairs ≥ threshold.

All math in float64 with rounding to 4 decimals so results are stable
against summation-order effects and comparable to DuckDB's
``list_cosine_similarity`` oracle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..functions.rounding import round_away_scalar


def _matrix(batch_col) -> np.ndarray:
    """list<float> column → (n, d) float64 matrix."""
    arr = batch_col.combine_chunks() if isinstance(batch_col, pa.ChunkedArray) else batch_col
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(arr)
    return flat.reshape(n, -1) if n else flat.reshape(0, 0)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


_QUERY_CACHE: dict = {}
_REF_CACHE: dict = {}


def _cached_ref(ref):
    """ray.get once per worker process for a broadcast ObjectRef."""
    key = ref.hex()
    if key not in _REF_CACHE:
        if len(_REF_CACHE) >= _CACHE_CAP:
            _REF_CACHE.clear()
        _REF_CACHE[key] = ray.get(ref)
    return _REF_CACHE[key]


_CACHE_CAP = 8  # a worker only ever serves a handful of live queries


def _cached_queries(queries_ref):
    """ray.get + normalize once per worker process (keyed by ref hex).
    Raw (ids, matrix) payloads are NOT cached — id()-based keys can
    collide after GC recycles an address."""
    if not isinstance(queries_ref, ray.ObjectRef):
        qids, qm = queries_ref
        return qids, _normalize(qm)
    key = queries_ref.hex()
    if key not in _QUERY_CACHE:
        if len(_QUERY_CACHE) >= _CACHE_CAP:
            _QUERY_CACHE.clear()
        qids, qm = ray.get(queries_ref)
        _QUERY_CACHE[key] = (qids, _normalize(qm))
    return _QUERY_CACHE[key]


class _TopKStage:
    """Batch-local exact top-k: one matmul per batch against the broadcast
    query matrix (ray.put once, fetched+normalized once per worker —
    usable as a stateless task fn via ``_topk_fn`` or as an actor)."""

    def __init__(self, queries_ref, k: int):
        self.query_ids, self.qn = _cached_queries(queries_ref)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _normalize(_matrix(batch.column("embedding")))
        vec_ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        if m.shape[0] == 0:
            return pa.table(
                {"query_id": pa.array([], pa.int64()), "vec_id": pa.array([], pa.int64()),
                 "sim": pa.array([], pa.float64())}
            )
        sims = m @ self.qn.T  # (batch, Q)
        k = min(self.k, sims.shape[0])
        out_q, out_v, out_s = [], [], []
        from ..functions.rounding import round_away

        rounded = round_away(sims, 3)
        for qi, qid in enumerate(self.query_ids):
            col = rounded[:, qi]
            order = np.lexsort((vec_ids, -col))[:k]  # rounded sim desc, vec_id asc
            for row in order:
                out_q.append(int(qid))
                out_v.append(int(vec_ids[row]))
                out_s.append(float(col[row]))
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )


def _final_topk(k: int):
    def _inner(group: pa.Table) -> pa.Table:
        idx = pa.compute.sort_indices(
            group, sort_keys=[("sim", "descending"), ("vec_id", "ascending")]
        )
        return group.take(idx[:k])

    return _inner


def brute_force_topk(
    ds: ray.data.Dataset, query_ids: list[int], query_matrix: np.ndarray, k: int = 10
) -> ray.data.Dataset:
    """Exact cosine top-k per query over the embedding column — stateless
    tasks (broadcast query matrix cached per worker; no actor-pool
    spin-up latency)."""
    ref = ray.put((list(query_ids), query_matrix.astype(np.float64)))

    def _topk_fn(batch: pa.Table) -> pa.Table:
        return _TopKStage(ref, k)(batch)

    candidates = ds.select_columns(["vec_id", "embedding"]).map_batches(
        _topk_fn, batch_format="pyarrow", zero_copy_batch=True
    )
    return candidates.groupby("query_id").map_groups(_final_topk(k), batch_format="pyarrow")


def _hamming_ball_flips(n_bits: int, radius: int) -> list[tuple]:
    """All index subsets of size 0..radius — the flip sets enumerating a
    Hamming ball around a bucket key."""
    from itertools import combinations

    out: list[tuple] = [()]
    for r in range(1, radius + 1):
        out.extend(combinations(range(n_bits), r))
    return out


def _bucket_keys(m: np.ndarray, planes: np.ndarray) -> list[list[str]]:
    """Per row: one bucket key per hash table; planes is (L, H, d)."""
    keys: list[list[str]] = [[] for _ in range(m.shape[0])]
    for table_idx in range(planes.shape[0]):
        bits = (m @ planes[table_idx].T) > 0  # (n, H)
        packed = np.packbits(bits, axis=1)
        for row in range(m.shape[0]):
            keys[row].append(f"{table_idx}:{packed[row].tobytes().hex()}")
    return keys


def lsh_bucketed_topk(
    ds: ray.data.Dataset,
    query_ids: list[int],
    query_matrix: np.ndarray,
    k: int = 10,
    *,
    n_tables: int = 8,
    n_planes: int = 10,
    seed: int = 7,
    multiprobe: int = 1,
) -> ray.data.Dataset:
    """Approximate cosine top-k: score only rows sharing a random-hyperplane
    bucket with the query in at least one of ``n_tables`` tables.

    ``multiprobe``: probe all buckets within this Hamming distance of each
    query's bucket too (classic multi-probe LSH — near-misses of one
    hyperplane land one bit away). Distance 1 multiplies the probed-bucket
    count by (1 + n_planes) but leaves the corpus-side work unchanged:
    rows still hash once per table; only the broadcast probe SET grows.
    On the driver fixture this lifts recall@10 from ~0.1-0.3 to ~0.4-0.7
    (tiny 500-2000-row corpora spread over 2^10 buckets are the hard
    case — buckets hold <1 row; at real corpus scales bucket occupancy,
    and with it recall at fixed probe count, is far higher)."""
    dim = query_matrix.shape[1]
    planes = np.random.RandomState(seed).normal(size=(n_tables, n_planes, dim))
    qn = _normalize(query_matrix.astype(np.float64))
    query_buckets = set()
    for qi in range(qn.shape[0]):
        for t in range(n_tables):
            bits = (qn[qi] @ planes[t].T) > 0  # (H,)
            for flips in _hamming_ball_flips(n_planes, multiprobe):
                probed = bits.copy()
                probed[list(flips)] = ~probed[list(flips)]
                packed = np.packbits(probed)
                query_buckets.add(f"{t}:{packed.tobytes().hex()}")
    ref = ray.put((list(query_ids), query_matrix.astype(np.float64)))
    planes_ref = ray.put(planes)
    buckets_ref = ray.put(frozenset(query_buckets))

    def _filter_fn(batch: pa.Table) -> pa.Table:
        m = _normalize(_matrix(batch.column("embedding")))
        if m.shape[0] == 0:
            return batch
        table_planes = _cached_ref(planes_ref)
        buckets = _cached_ref(buckets_ref)
        keys = _bucket_keys(m, table_planes)
        mask = [any(k in buckets for k in row_keys) for row_keys in keys]
        return batch.filter(pa.array(mask))

    def _topk_fn(batch: pa.Table) -> pa.Table:
        return _TopKStage(ref, k)(batch)

    filtered = ds.select_columns(["vec_id", "embedding"]).map_batches(
        _filter_fn, batch_format="pyarrow", zero_copy_batch=True
    )
    candidates = filtered.map_batches(
        _topk_fn, batch_format="pyarrow", zero_copy_batch=True
    )
    return candidates.groupby("query_id").map_groups(_final_topk(k), batch_format="pyarrow")


_PAIR_SCHEMA = pa.schema(
    [("a", pa.int64()), ("b", pa.int64()), ("sim", pa.float64())]
)

_PLANES_CACHE: dict[tuple, np.ndarray] = {}


def _planes_for(seed: int, n_tables: int, n_planes: int, dim: int) -> np.ndarray:
    """Deterministic hyperplane tables, cached per worker process."""
    key = (seed, n_tables, n_planes, dim)
    if key not in _PLANES_CACHE:
        _PLANES_CACHE[key] = np.random.RandomState(seed).normal(
            size=(n_tables, n_planes, dim)
        )
    return _PLANES_CACHE[key]


def _pair_table(ids_a, ids_b, sims) -> pa.Table:
    return pa.table(
        {
            "a": pa.array(np.asarray(ids_a, dtype=np.int64), pa.int64()),
            "b": pa.array(np.asarray(ids_b, dtype=np.int64), pa.int64()),
            "sim": pa.array(
                [round_away_scalar(float(s), 3) for s in sims], pa.float64()
            ),
        }
    )


def _cross_pairs(
    ids_l: np.ndarray, m_l: np.ndarray, ids_r: np.ndarray, m_r: np.ndarray,
    threshold: float, same_block: bool,
) -> pa.Table:
    """Pairs (a<b) with cosine ≥ threshold between two normalized blocks."""
    if m_l.shape[0] == 0 or m_r.shape[0] == 0:
        return _PAIR_SCHEMA.empty_table()
    sims = m_l @ m_r.T
    if same_block:
        mask = (sims >= threshold) & (ids_l[:, None] < ids_r[None, :])
    else:
        mask = sims >= threshold
    li, rj = np.nonzero(mask)
    if len(li) == 0:
        return _PAIR_SCHEMA.empty_table()
    a, b = ids_l[li], ids_r[rj]
    swap = a > b
    a2 = np.where(swap, b, a)
    b2 = np.where(swap, a, b)
    return _pair_table(a2, b2, sims[li, rj])


@ray.remote
def _block_pair_task(left: pa.Table, right: pa.Table, threshold: float, same: bool) -> pa.Table:
    ids_l = left.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
    ids_r = right.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
    m_l = _normalize(_matrix(left.column("embedding")))
    m_r = _normalize(_matrix(right.column("embedding")))
    return _cross_pairs(ids_l, m_l, ids_r, m_r, threshold, same)


def _train_centroids(sample: np.ndarray, n_cells: int, seed: int, iters: int = 10) -> np.ndarray:
    """Spherical k-means (Lloyd) on a normalized sample — deterministic."""
    rng = np.random.RandomState(seed)
    sn = _normalize(sample)
    cents = sn[rng.choice(len(sn), size=min(n_cells, len(sn)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(sn @ cents.T, axis=1)
        for c in range(len(cents)):
            members = sn[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
        cents = _normalize(cents)
    return cents


def ivf_topk(
    ds: ray.data.Dataset,
    query_ids: list[int],
    query_matrix: np.ndarray,
    k: int = 10,
    *,
    n_cells: int = 16,
    n_probe: int = 4,
    train_sample: int = 2048,
    seed: int = 3,
    train_matrix: np.ndarray | None = None,
) -> ray.data.Dataset:
    """IVF (inverted-file) approximate cosine top-k — the classic
    coarse-quantizer scale path (Jégou et al. '11 shape, flat lists):

    1. TRAIN: spherical k-means centroids on a deterministic corpus
       sample (sample-sized driver work, not corpus-sized);
    2. PROBE: each query keeps its ``n_probe`` nearest cells; the probed
       cell set + centroids broadcast via ``ray.put``;
    3. ASSIGN+FILTER: one map_batches assigns each row its nearest cell
       and drops rows outside the probed set — only ~n_probe/n_cells of
       the corpus is ever scored;
    4. SCORE: exact cosine on survivors (same batch-local top-k stage as
       the brute-force baseline) + per-query final top-k."""
    if train_matrix is not None:
        sample = train_matrix.astype(np.float64)
    else:
        sample_rows = ds.select_columns(["embedding"]).limit(train_sample).take_all()
        sample = np.array([np.asarray(r["embedding"], dtype=np.float64) for r in sample_rows])
    cents = _train_centroids(sample, n_cells, seed)
    qn = _normalize(query_matrix.astype(np.float64))
    probe_cells = set()
    for qi in range(qn.shape[0]):
        sims = qn[qi] @ cents.T
        for c in np.argsort(-sims)[:n_probe]:
            probe_cells.add(int(c))
    cents_ref = ray.put(cents)
    probes_ref = ray.put(frozenset(probe_cells))
    ref = ray.put((list(query_ids), query_matrix.astype(np.float64)))

    def _assign_filter(batch: pa.Table) -> pa.Table:
        m = _normalize(_matrix(batch.column("embedding")))
        if m.shape[0] == 0:
            return batch
        c = _cached_ref(cents_ref)
        probes = _cached_ref(probes_ref)
        cell = np.argmax(m @ c.T, axis=1)
        mask = np.fromiter((int(x) in probes for x in cell), dtype=bool, count=len(cell))
        return batch.filter(pa.array(mask))

    def _topk_fn(batch: pa.Table) -> pa.Table:
        return _TopKStage(ref, k)(batch)

    survivors = ds.select_columns(["vec_id", "embedding"]).map_batches(
        _assign_filter, batch_format="pyarrow", zero_copy_batch=True
    )
    candidates = survivors.map_batches(_topk_fn, batch_format="pyarrow", zero_copy_batch=True)
    return candidates.groupby("query_id").map_groups(_final_topk(k), batch_format="pyarrow")


def pq_train_codebooks(
    sample: np.ndarray, m: int = 8, n_codes: int = 16, seed: int = 7, iters: int = 10
) -> np.ndarray:
    """Product-quantization codebooks (Jégou et al. '11): plain-L2 Lloyd
    k-means per SUBSPACE over the normalized sample. Returns
    ``(m, n_codes, d/m)``. Deterministic (seeded init, argmin ties to the
    lowest code). Sample-sized driver work — never corpus-sized."""
    sn = _normalize(sample.astype(np.float64))
    n, d = sn.shape
    if d % m:
        raise ValueError(f"embedding dim {d} not divisible by m={m}")
    dsub = d // m
    rng = np.random.RandomState(seed)
    books = np.empty((m, n_codes, dsub), np.float64)
    for j in range(m):
        sub = sn[:, j * dsub : (j + 1) * dsub]
        k0 = min(n_codes, n)
        cents = sub[rng.choice(n, size=k0, replace=False)].copy()
        for _ in range(iters):
            d2 = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
            assign = np.argmin(d2, axis=1)
            for c in range(k0):
                mem = sub[assign == c]
                if len(mem):
                    cents[c] = mem.mean(axis=0)
        books[j, :k0] = cents
        if k0 < n_codes:  # degenerate tiny sample: pad with the first cell
            books[j, k0:] = cents[0]
    return books


def _pq_codes(mnorm: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, d) normalized rows → (n, m) uint8 nearest-centroid codes."""
    m, n_codes, dsub = books.shape
    n = mnorm.shape[0]
    sub = mnorm.reshape(n, m, dsub)
    # ||sub - c||² per (row, subspace, code); argmin ties → lowest code
    d2 = ((sub[:, :, None, :] - books[None, :, :, :]) ** 2).sum(-1)
    return np.argmin(d2, axis=2).astype(np.uint8)


def pq_encode(ds: ray.data.Dataset, books: np.ndarray) -> ray.data.Dataset:
    """Encode the corpus to PQ codes: ``(vec_id, code list<uint8>)`` —
    m bytes per vector instead of d floats (32× smaller at d=64/m=8
    against float32 storage). At real scale THIS is the persisted
    artifact: encode once, write parquet, and every later ANN scan reads
    codes + codebooks only, never the raw embeddings."""
    books_ref = ray.put(books)

    def _enc(batch: pa.Table) -> pa.Table:
        mnorm = _normalize(_matrix(batch.column("embedding")))
        if mnorm.shape[0] == 0:
            return pa.table(
                {"vec_id": pa.array([], pa.int64()),
                 "code": pa.array([], pa.list_(pa.uint8()))}
            )
        codes = _pq_codes(mnorm, _cached_ref(books_ref))
        return pa.table(
            {
                "vec_id": batch.column("vec_id"),
                "code": pa.FixedSizeListArray.from_arrays(
                    pa.array(codes.reshape(-1), pa.uint8()), codes.shape[1]
                ).cast(pa.list_(pa.uint8())),
            }
        )

    return ds.select_columns(["vec_id", "embedding"]).map_batches(
        _enc, batch_format="pyarrow", zero_copy_batch=True
    )


def pq_topk(
    ds: ray.data.Dataset,
    query_ids: list[int],
    query_matrix: np.ndarray,
    k: int = 10,
    *,
    m: int = 8,
    n_codes: int = 16,
    train_sample: int = 2048,
    seed: int = 7,
    train_matrix: np.ndarray | None = None,
    rerank: int = 0,
) -> ray.data.Dataset:
    """Product-quantization approximate cosine top-k — the MEMORY-bound
    ANN scale path (vs IVF's compute-bound cell pruning): every vector is
    scored, but through an m-byte code and a per-query lookup table, so
    the scan touches m bytes + m table lookups per vector instead of d
    floats and a d-wide dot product.

    1. TRAIN codebooks on a deterministic sample (driver, sample-sized);
    2. LUT: per query, ``q_sub · centroid`` for every (subspace, code) —
       Q × m × n_codes floats, broadcast once;
    3. SCAN: one map_batches encodes each row and sums LUT entries
       (asymmetric distance computation); batch-local top-k ships ≤ Q·k
       rows per batch into the final per-query top-k;
    4. optional RERANK (``rerank=R``): the GLOBAL PQ top-R candidate set
       (Q·R ids — driver-sized) broadcasts back over a second corpus
       pass that rescores candidates with the exact dot product. The
       candidate set is a deterministic global reduction, NOT a union of
       batch-local sets, so results stay independent of batching.

    Approximate by construction (quantization error) — the registry pins
    per-query RECALL vs the exact top-k instead of values. Deterministic
    across batching/parallelism: codes and ADC scores are per-row
    functions; tie-breaks are (rounded score desc, vec_id asc)."""
    if train_matrix is not None:
        sample = train_matrix.astype(np.float64)
    else:
        rows = ds.select_columns(["embedding"]).limit(train_sample).take_all()
        sample = np.array([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    books = pq_train_codebooks(sample, m=m, n_codes=n_codes, seed=seed)
    qn = _normalize(query_matrix.astype(np.float64))
    dsub = qn.shape[1] // m
    lut = np.einsum("qjd,jkd->qjk", qn.reshape(len(qn), m, dsub), books)
    books_ref = ray.put(books)
    lut_ref = ray.put((list(query_ids), lut))
    # batch-local keep must cover the GLOBAL candidate cut: with rerank,
    # a batch that kept only top-k could starve the global top-R set and
    # make results depend on batching (caught by the 4-vs-16-cpu
    # determinism check)
    keep_k = max(k, rerank)

    def _pq_scan(batch: pa.Table) -> pa.Table:
        mnorm = _normalize(_matrix(batch.column("embedding")))
        n = mnorm.shape[0]
        if n == 0:
            return pa.table(
                {"query_id": pa.array([], pa.int64()),
                 "vec_id": pa.array([], pa.int64()),
                 "sim": pa.array([], pa.float64())}
            )
        codes = _pq_codes(mnorm, _cached_ref(books_ref))
        qids, lut_w = _cached_ref(lut_ref)
        vec_ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        scores = np.zeros((n, len(qids)))
        for j in range(codes.shape[1]):  # ADC: m table lookups per row
            scores += lut_w[:, j, :][:, codes[:, j]].T
        from ..functions.rounding import round_away

        rounded = round_away(scores, 6)
        kk = min(keep_k, n)
        out_q, out_v, out_s = [], [], []
        for qi, qid in enumerate(qids):
            col = rounded[:, qi]
            order = np.lexsort((vec_ids, -col))[:kk]
            for row in order:
                out_q.append(int(qid))
                out_v.append(int(vec_ids[row]))
                out_s.append(float(col[row]))
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )

    candidates = ds.select_columns(["vec_id", "embedding"]).map_batches(
        _pq_scan, batch_format="pyarrow", zero_copy_batch=True
    )
    if not rerank:
        return candidates.groupby("query_id").map_groups(
            _final_topk(k), batch_format="pyarrow"
        )

    # ---- exact rerank of the global PQ top-R ----
    cand = candidates.groupby("query_id").map_groups(
        _final_topk(rerank), batch_format="pyarrow"
    ).to_pandas()  # ≤ Q·R rows: driver-sized by construction
    per_q = {
        int(q): np.sort(g["vec_id"].to_numpy(dtype=np.int64))
        for q, g in cand.groupby("query_id")
    }
    cand_ref = ray.put(per_q)
    all_ids = np.sort(cand["vec_id"].unique().astype(np.int64))
    all_ref = ray.put(all_ids)
    qref = ray.put((list(query_ids), query_matrix.astype(np.float64)))

    def _rescore(batch: pa.Table) -> pa.Table:
        vec_ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        keep = np.isin(vec_ids, _cached_ref(all_ref))
        sub = batch.filter(pa.array(keep))
        qids, qn = _cached_queries(qref)
        mnorm = _normalize(_matrix(sub.column("embedding")))
        vids = sub.column("vec_id").to_numpy(zero_copy_only=False)
        if mnorm.shape[0] == 0:
            return pa.table(
                {"query_id": pa.array([], pa.int64()),
                 "vec_id": pa.array([], pa.int64()),
                 "sim": pa.array([], pa.float64())}
            )
        from ..functions.rounding import round_away

        sims = round_away(mnorm @ qn.T, 3)  # same contract as brute force
        pq_sets = _cached_ref(cand_ref)
        out_q, out_v, out_s = [], [], []
        for qi, qid in enumerate(qids):
            ids_q = pq_sets.get(int(qid))
            if ids_q is None:
                continue
            mask = np.isin(vids, ids_q)
            for row in np.flatnonzero(mask):
                out_q.append(int(qid))
                out_v.append(int(vids[row]))
                out_s.append(float(sims[row, qi]))
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )

    rescored = ds.select_columns(["vec_id", "embedding"]).map_batches(
        _rescore, batch_format="pyarrow", zero_copy_batch=True
    )
    return rescored.groupby("query_id").map_groups(
        _final_topk(k), batch_format="pyarrow"
    )


def _hn_quant(m: np.ndarray, grid: float = 1e-6) -> np.ndarray:
    return np.round(m.astype(np.float64) / grid).astype(np.int64)


def _hn_score_block(
    q_ids: np.ndarray, q_lab: np.ndarray, qm: np.ndarray,
    c_ids: np.ndarray, c_lab: np.ndarray, cm: np.ndarray,
    k: int,
) -> pa.Table:
    """Exact label-masked cosine top-k of one query block against one
    candidate block. Candidates MUST be pre-sorted by id so the stable
    argsort's tie rule is 'lowest neg_id'. All doubles are single IEEE
    ops on exact int64 dots/norms — bit-reproducible anywhere."""
    dots = qm @ cm.T  # int64, exact
    nq = np.sqrt((qm * qm).sum(axis=1).astype(np.float64))
    nc = np.sqrt((cm * cm).sum(axis=1).astype(np.float64))
    denom = nq[:, None] * nc[None, :]
    with np.errstate(divide="ignore", invalid="ignore"):
        cos = dots.astype(np.float64) / denom
    bad = (
        (q_lab[:, None] == c_lab[None, :])
        | (q_ids[:, None] == c_ids[None, :])
        | (denom == 0)
    )
    cos[bad] = -np.inf
    order = np.argsort(-cos, axis=1, kind="stable")[:, :k]
    rows_id, rows_neg, rows_cos, rows_rank = [], [], [], []
    for i in range(len(q_ids)):
        sel = order[i]
        good = cos[i, sel] > -np.inf
        sel = sel[good]
        rows_id.append(np.full(len(sel), q_ids[i], np.int64))
        rows_neg.append(c_ids[sel])
        rows_cos.append(cos[i, sel])
        rows_rank.append(np.arange(1, len(sel) + 1, dtype=np.int64))
    if not rows_id:
        return _HN_EMPTY
    return pa.table(
        {
            "vec_id": pa.array(np.concatenate(rows_id), pa.int64()),
            "neg_id": pa.array(np.concatenate(rows_neg), pa.int64()),
            "cos": pa.array(np.concatenate(rows_cos), pa.float64()),
            "rank": pa.array(np.concatenate(rows_rank), pa.int64()),
        }
    )


_HN_EMPTY = pa.table(
    {
        "vec_id": pa.array([], pa.int64()),
        "neg_id": pa.array([], pa.int64()),
        "cos": pa.array([], pa.float64()),
        "rank": pa.array([], pa.int64()),
    }
)


def hard_negatives_topk(
    ds: ray.data.Dataset,
    k: int = 5,
    *,
    gate_bytes: int | None = None,
    n_cells: int = 16,
    n_probe: int = 4,
    seed: int = 3,
    train_sample: int = 2048,
) -> ray.data.Dataset:
    """Contrastive-training hard-negative mining — for EVERY vector, the
    top-k most cosine-similar vectors with a DIFFERENT label. Size-gated
    like :func:`cosine_near_dup_pairs`: at or under the gate the corpus
    broadcasts once (``ray.put``) and each batch scores against it with
    exact int64 dots (bit-identical to the SQL oracle); above it the
    IVF-co-partitioned path runs — NO corpus broadcast: every vector is
    a candidate in its own coarse cell and a query replicated to its
    ``n_probe`` nearest cells, one cell-bucketed exchange scores inside
    cells, and a per-vector bucketed merge takes the global top-k. With
    ``n_probe == n_cells`` the IVF path covers every pair and equals the
    exact path (the forced-gate parity pytest pins this)."""
    from .. import relops

    proj = ds.select_columns(["vec_id", "embedding", "label"]).materialize()
    gate = relops.BROADCAST_GATE_BYTES if gate_bytes is None else gate_bytes
    if int(proj.size_bytes() or 0) <= gate:
        return _hard_negatives_exact(proj, k)
    return _hard_negatives_ivf(
        proj, k, n_cells=n_cells, n_probe=n_probe, seed=seed,
        train_sample=train_sample,
    )


def _hard_negatives_exact(proj: ray.data.Dataset, k: int) -> ray.data.Dataset:
    rows = proj.take_all()  # under the gate by construction
    rows.sort(key=lambda r: r["vec_id"])  # stable tie rule = lowest neg_id
    c_ids = np.array([r["vec_id"] for r in rows], np.int64)
    c_lab = np.array([r["label"] for r in rows], np.int64)
    cm = _hn_quant(np.array([r["embedding"] for r in rows], np.float64))
    ref = ray.put((c_ids, c_lab, cm))

    def _score(batch: pa.Table) -> pa.Table:
        ids, lab, m = _cached_ref(ref)
        q_ids = batch.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        q_lab = batch.column("label").to_numpy(zero_copy_only=False).astype(np.int64)
        qm = _hn_quant(_matrix(batch.column("embedding")))
        return _hn_score_block(q_ids, q_lab, qm, ids, lab, m, k)

    return proj.map_batches(_score, batch_format="pyarrow", zero_copy_batch=True)


def _hard_negatives_ivf(
    proj: ray.data.Dataset,
    k: int,
    *,
    n_cells: int,
    n_probe: int,
    seed: int,
    train_sample: int,
) -> ray.data.Dataset:
    from ..relops import bucketed_groupby

    sample_rows = proj.select_columns(["embedding"]).limit(train_sample).take_all()
    sample = np.array([np.asarray(r["embedding"], np.float64) for r in sample_rows])
    cents = _train_centroids(sample, n_cells, seed)
    cents_ref = ray.put(cents)
    n_probe = min(n_probe, n_cells)

    def _fanout(batch: pa.Table) -> pa.Table:
        c = _cached_ref(cents_ref)
        m = _normalize(_matrix(batch.column("embedding")))
        if m.shape[0] == 0:
            return pa.table(
                {
                    "cell": pa.array([], pa.int32()),
                    "is_query": pa.array([], pa.bool_()),
                    "vec_id": pa.array([], pa.int64()),
                    "label": pa.array([], pa.int64()),
                    "embedding": batch.column("embedding"),
                }
            )
        sims = m @ c.T
        probes = np.argsort(-sims, axis=1, kind="stable")[:, :n_probe]
        own = probes[:, 0]
        n = m.shape[0]
        # candidate copy in own cell + query copies in each probed cell
        cell = np.concatenate([own.astype(np.int32), probes.ravel().astype(np.int32)])
        is_q = np.concatenate([np.zeros(n, bool), np.ones(n * n_probe, bool)])
        rep = np.concatenate(
            [np.arange(n), np.repeat(np.arange(n), n_probe)]
        )
        idx = pa.array(rep)
        return pa.table(
            {
                "cell": pa.array(cell),
                "is_query": pa.array(is_q),
                "vec_id": pc.cast(batch.column("vec_id"), pa.int64()).take(idx),
                "label": pc.cast(batch.column("label"), pa.int64()).take(idx),
                "embedding": batch.column("embedding").take(idx),
            }
        )

    fanned = proj.map_batches(_fanout, batch_format="pyarrow", zero_copy_batch=True)

    def _per_cell(g: pa.Table) -> pa.Table:
        # a hash bucket can hold SEVERAL cells — score each cell's
        # queries only against that same cell's candidates
        cells = g.column("cell").to_numpy(zero_copy_only=False)
        isq = g.column("is_query").to_numpy(zero_copy_only=False)
        ids = g.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        lab = g.column("label").to_numpy(zero_copy_only=False).astype(np.int64)
        m = _hn_quant(_matrix(g.column("embedding")))
        parts = []
        for cell in np.unique(cells):
            in_cell = cells == cell
            qi = np.flatnonzero(in_cell & isq)
            ci = np.flatnonzero(in_cell & ~isq)
            if len(qi) == 0 or len(ci) == 0:
                continue
            order = np.argsort(ids[ci], kind="stable")
            ci = ci[order]
            parts.append(
                _hn_score_block(ids[qi], lab[qi], m[qi], ids[ci], lab[ci], m[ci], k)
            )
        if not parts:
            return _HN_EMPTY
        return pa.concat_tables(parts)

    local = bucketed_groupby(fanned, ["cell"], _per_cell, empty=_HN_EMPTY)

    def _merge(g: pa.Table) -> pa.Table:
        df = g.to_pandas().sort_values(
            ["vec_id", "cos", "neg_id"], ascending=[True, False, True]
        )
        out = df.groupby("vec_id", sort=False).head(k).copy()
        out["rank"] = (out.groupby("vec_id", sort=False).cumcount() + 1).astype(
            np.int64
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    return bucketed_groupby(local, ["vec_id"], _merge, empty=_HN_EMPTY)


def cosine_near_dup_pairs_exact(ds: ray.data.Dataset, threshold: float = 0.99) -> ray.data.Dataset:
    """All pairs (a < b) with cosine ≥ threshold — EXACT.

    Distributed block-pair cross products: the corpus streams into B
    Arrow blocks (object store, never the driver) and each of the
    B·(B+1)/2 block pairs is one Ray task doing a single matmul. Exact
    all-pairs is inherently O(N²) compute — callers should go through the
    size-gated :func:`cosine_near_dup_pairs` so corpora above the gate
    route to the sub-quadratic LSH path automatically."""
    refs = ds.select_columns(["vec_id", "embedding"]).to_arrow_refs()
    tasks = [
        _block_pair_task.remote(refs[i], refs[j], threshold, i == j)
        for i in range(len(refs))
        for j in range(i, len(refs))
    ]
    return ray.data.from_arrow_refs(tasks)


def cosine_near_dup_pairs(
    ds: ray.data.Dataset,
    threshold: float = 0.99,
    *,
    gate_bytes: int | None = None,
    n_tables: int | None = None,
    n_planes: int | None = None,
    seed: int = 7,
) -> ray.data.Dataset:
    """Size-gated near-duplicate pair finder — THE entry point.

    Measures the (vec_id, embedding) projection's in-memory bytes (the
    same measured-block-bytes convention as ``relops.size_gated_join``)
    and dispatches: at or under the gate the exact O(N²) block-pair
    product runs (bit-identical to the SQL oracle); above it the
    random-hyperplane LSH path runs so no caller can launch a quadratic
    scan over a 100-TB corpus. The projection is materialized ONCE and
    both paths consume those same blocks — the probe costs no second
    pass. LSH parameters default to a threshold-adaptive choice: per-table
    collision prob for a boundary pair is p = 1 - acos(t)/pi; n_planes is
    sized so p^H stays meaningful and n_tables so boundary recall
    1-(1-p^H)^L >= ~0.95."""
    from .. import relops

    gate = relops.BROADCAST_GATE_BYTES if gate_bytes is None else gate_bytes
    proj = ds.select_columns(["vec_id", "embedding"]).materialize()
    total = int(proj.size_bytes() or 0)
    if total <= gate:
        return cosine_near_dup_pairs_exact(proj, threshold)
    if n_planes is None or n_tables is None:
        p = max(1e-6, 1.0 - float(np.arccos(min(1.0, max(-1.0, threshold)))) / np.pi)
        if n_planes is None:
            # keep per-table boundary collision prob p^H around ~0.15-0.5
            n_planes = max(2, min(16, int(round(np.log(0.2) / np.log(p)))))
        if n_tables is None:
            ph = p ** n_planes
            n_tables = max(4, min(64, int(np.ceil(np.log(0.05) / np.log(max(1e-9, 1.0 - ph))))))
    return cosine_near_dup_pairs_lsh(
        proj, threshold, n_tables=n_tables, n_planes=n_planes, seed=seed
    )


def cosine_near_dup_pairs_lsh(
    ds: ray.data.Dataset,
    threshold: float = 0.9,
    *,
    n_tables: int = 12,
    n_planes: int = 8,
    seed: int = 7,
) -> ray.data.Dataset:
    """Near-duplicate pairs via random-hyperplane bucketing — the
    sub-quadratic scale path (mirrors ``simhash_near_dup_pairs``'s shape):
    rows explode to one integer bucket key per hash table, a groupby
    brings each bucket together, exact cosine verifies within the bucket,
    and a final tiny groupby dedups pairs found in several tables.
    Approximate by construction: recall = 1-(1-p^H)^L for a pair with
    bit-agreement p = 1 - θ/π."""
    def _bucket(batch: pa.Table) -> pa.Table:
        m = _normalize(_matrix(batch.column("embedding")))
        n = m.shape[0]
        if n == 0:
            return pa.table(
                {
                    "bucket": pa.array([], pa.int64()),
                    "vec_id": pa.array([], pa.int64()),
                    "embedding": batch.column("embedding"),
                }
            )
        planes = _planes_for(seed, n_tables, n_planes, m.shape[1])
        keys = np.empty((n, n_tables), dtype=np.int64)
        for t in range(n_tables):
            bits = (m @ planes[t].T) > 0  # (n, H)
            packed = bits @ (1 << np.arange(n_planes, dtype=np.int64))
            keys[:, t] = (np.int64(t) << np.int64(48)) | packed
        idx = np.repeat(np.arange(n), n_tables)
        taken = batch.take(pa.array(idx))
        return pa.table(
            {
                "bucket": pa.array(keys.reshape(-1)),
                "vec_id": taken.column("vec_id"),
                "embedding": taken.column("embedding"),
            }
        )

    def _verify(group: pa.Table) -> pa.Table:
        ids = group.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        m = _normalize(_matrix(group.column("embedding")))
        return _cross_pairs(ids, m, ids, m, threshold, same_block=True)

    exploded = ds.select_columns(["vec_id", "embedding"]).map_batches(
        _bucket, batch_format="pyarrow", zero_copy_batch=True
    )
    pairs = exploded.groupby("bucket").map_groups(_verify, batch_format="pyarrow")
    from ray.data.aggregate import Min

    return pairs.groupby(["a", "b"]).aggregate(Min("sim", alias_name="sim"))


def kmeans_assign(
    ds: ray.data.Dataset,
    init_centroids: np.ndarray,
    *,
    iters: int = 5,
    quant: float = 1e-4,
    keep_embedding: bool = False,
) -> ray.data.Dataset:
    """Distributed Lloyd k-means over the embedding column.

    Every iteration is ONE streaming pass: each batch assigns its rows to
    the nearest centroid (a single matmul via the
    ``|x|^2 - 2 x.c + |c|^2`` expansion) and emits k*d PARTIAL-SUM rows
    (cluster, dim, s, n) — the shuffle moves k*d rows per block, never
    the corpus; a tiny groupby merges the partials and the driver updates
    the k x d centroid matrix (driver state is model-sized, not
    data-sized; centroids broadcast per iteration via ``ray.put``).

    Centroids are QUANTIZED to the ``quant`` grid after every update so
    distributed summation order cannot perturb the trajectory — the whole
    run is reproducible and checkable against a single-process oracle
    computing the same quantized recurrence. Empty clusters keep their
    previous centroid; ``np.argmin`` ties resolve to the lowest cluster
    index on both sides. The final pass emits (vec_id, cluster, dist2)."""

    cents = np.round(init_centroids.astype(np.float64) / quant) * quant
    k, d = cents.shape
    work = ds.select_columns(["vec_id", "embedding"])

    def _partial_for(ref):
        def _partial(batch: pa.Table) -> pa.Table:
            c = _cached_ref(ref)
            m = _matrix(batch.column("embedding"))
            d2 = (
                (m * m).sum(axis=1)[:, None]
                - 2.0 * (m @ c.T)
                + (c * c).sum(axis=1)[None, :]
            )
            a = np.argmin(d2, axis=1)
            sums = np.zeros((k, d), np.float64)
            np.add.at(sums, a, m)
            counts = np.bincount(a, minlength=k).astype(np.int64)
            return pa.table(
                {
                    "cluster": pa.array(np.repeat(np.arange(k, dtype=np.int64), d)),
                    "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), k)),
                    "s": pa.array(sums.ravel()),
                    "n": pa.array(np.repeat(counts, d)),
                }
            )

        return _partial

    # every partial is the SAME k*d rows in the same (cluster, dim)
    # construction order, so the reduce is an elementwise sum — a tree
    # fold of fixed-size tables (fan-in 16), not a sort-groupby. One
    # Ray sort-groupby per Lloyd iteration was ~0.7 s of fixed pipeline
    # overhead x iters at any data size; the fold is O(log blocks) tasks
    # moving k*d-row tables. Quantization after each update keeps the
    # trajectory independent of the fold's summation order (same
    # argument as for the previous distributed Sum).
    def _sum_partials(tables):
        # row-robust: a block may hold SEVERAL concatenated k*d partials
        # (Ray's output buffer merges small batches into one block), so
        # accumulate by (cluster, dim) index rather than assuming shape
        s = np.zeros(k * d, np.float64)
        n = np.zeros(k * d, np.int64)
        for t in tables:
            idx = (
                t.column("cluster").to_numpy(zero_copy_only=False) * d
                + t.column("dim").to_numpy(zero_copy_only=False)
            )
            np.add.at(s, idx, t.column("s").to_numpy(zero_copy_only=False))
            np.add.at(n, idx, t.column("n").to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "cluster": pa.array(np.repeat(np.arange(k, dtype=np.int64), d)),
                "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), k)),
                "s": pa.array(s),
                "n": pa.array(n),
            }
        )

    from ..relops import tree_fold

    for _ in range(iters):
        ref = ray.put(cents)
        partials = work.map_batches(
            _partial_for(ref), batch_format="pyarrow", zero_copy_batch=True
        )
        h = tree_fold(partials, _sum_partials)  # rows already (cluster, dim)-ordered
        sums = h.column("s").to_numpy(zero_copy_only=False).reshape(k, d)
        counts = h.column("n").to_numpy(zero_copy_only=False).reshape(k, d)[:, 0]
        new = np.where(counts[:, None] > 0, sums / np.maximum(counts[:, None], 1), cents)
        cents = np.round(new / quant) * quant

    final_ref = ray.put(cents)

    def _assign(batch: pa.Table) -> pa.Table:
        c = _cached_ref(final_ref)
        m = _matrix(batch.column("embedding"))
        d2 = (
            (m * m).sum(axis=1)[:, None]
            - 2.0 * (m @ c.T)
            + (c * c).sum(axis=1)[None, :]
        )
        a = np.argmin(d2, axis=1)
        dist2 = np.round(d2[np.arange(len(a)), a], 6)
        cols = {
            "vec_id": batch.column("vec_id"),
            "cluster": pa.array(a.astype(np.int64)),
            "dist2": pa.array(dist2),
        }
        if keep_embedding:
            cols["embedding"] = batch.column("embedding")
        return pa.table(cols)

    return work.map_batches(_assign, batch_format="pyarrow", zero_copy_batch=True)


def kmeans_exact_centroids(
    ds: ray.data.Dataset,
    *,
    k: int = 8,
    iters: int = 5,
    grid: float = 1e-6,
) -> np.ndarray:
    """The Lloyd iteration of :func:`kmeans_exact_assign`, exposed so
    evals (silhouette) can score against the SAME bit-reproducible final
    centroids without re-deriving the trajectory. Returns the int64
    [k, d] centroid matrix on the quantized grid."""
    return _kmeans_exact_iterate(ds, k=k, iters=iters, grid=grid)


def kmeans_exact_assign(
    ds: ray.data.Dataset,
    *,
    k: int = 8,
    iters: int = 5,
    grid: float = 1e-6,
    keep_embedding: bool = False,
) -> ray.data.Dataset:
    """INTEGER-EXACT distributed Lloyd k-means: the whole trajectory is
    reproducible bit-for-bit by ANY engine, because every step is either
    integer arithmetic (summation-order-free) or a deterministic double
    operation on identical inputs:

    * embeddings quantize ONCE to the ``grid`` (half-even, like np.round)
      → int64 vectors;
    * distances are exact int64 sums of squared diffs — no float matmul,
      no association-order sensitivity; argmin ties resolve to the lowest
      cluster index;
    * per-iteration partials are int64 (cluster, dim, sum, count) rows
      folded exactly (integer addition commutes); the centroid update
      ``round_even(sum / count)`` is one deterministic double division;
    * init = the quantized embeddings of the k LOWEST vec_ids.

    This is the same shuffle shape as :func:`kmeans_assign` (k*d partial
    rows per block, model-sized driver state, centroids broadcast via
    ``ray.put``) but with a driver-hashable SQL twin: the recurrence
    unrolls into DuckDB CTEs (queries.py::KMEANS_NANO_SQL) and matches
    exactly — not a pinned golden. Returns (vec_id, cluster, dist2q)
    with dist2q on the squared-grid integer scale."""
    cents = _kmeans_exact_iterate(ds, k=k, iters=iters, grid=grid)
    work = ds.select_columns(["vec_id", "embedding"])

    def _quant(m: np.ndarray) -> np.ndarray:
        return np.round(m.astype(np.float64) / grid).astype(np.int64)

    final_ref = ray.put(cents)

    def _assign(batch: pa.Table) -> pa.Table:
        c = _cached_ref(final_ref)
        m = _quant(_matrix(batch.column("embedding")))
        d2 = ((m[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        a = np.argmin(d2, axis=1)
        cols = {
            "vec_id": batch.column("vec_id"),
            "cluster": pa.array(a.astype(np.int64)),
            "dist2q": pa.array(d2[np.arange(len(a)), a].astype(np.int64)),
        }
        if keep_embedding:
            cols["embedding"] = batch.column("embedding")
        return pa.table(cols)

    return work.map_batches(_assign, batch_format="pyarrow", zero_copy_batch=True)


def _kmeans_exact_iterate(
    ds: ray.data.Dataset,
    *,
    k: int,
    iters: int,
    grid: float,
) -> np.ndarray:
    from ..relops import topk, tree_fold

    work = ds.select_columns(["vec_id", "embedding"])

    def _quant(m: np.ndarray) -> np.ndarray:
        return np.round(m.astype(np.float64) / grid).astype(np.int64)

    seeds = topk(work, [("vec_id", "ascending")], k).take_all()
    seeds.sort(key=lambda r: r["vec_id"])
    cents = _quant(np.array([r["embedding"] for r in seeds], np.float64))
    kk, d = cents.shape
    if kk < k:
        raise ValueError(f"need >= {k} vectors, got {kk}")

    def _partial_for(ref):
        def _partial(batch: pa.Table) -> pa.Table:
            c = _cached_ref(ref)  # int64 [k, d]
            m = _quant(_matrix(batch.column("embedding")))
            # exact int64 distances; [n, k, d] diff is fine at batch size
            d2 = ((m[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            a = np.argmin(d2, axis=1)  # first occurrence = lowest cluster
            sums = np.zeros((k, d), np.int64)
            np.add.at(sums, a, m)
            counts = np.bincount(a, minlength=k).astype(np.int64)
            return pa.table(
                {
                    "cluster": pa.array(np.repeat(np.arange(k, dtype=np.int64), d)),
                    "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), k)),
                    "s": pa.array(sums.ravel()),
                    "n": pa.array(np.repeat(counts, d)),
                }
            )

        return _partial

    def _sum_partials(tables):
        s = np.zeros(k * d, np.int64)
        n = np.zeros(k * d, np.int64)
        for t in tables:
            idx = (
                t.column("cluster").to_numpy(zero_copy_only=False) * d
                + t.column("dim").to_numpy(zero_copy_only=False)
            )
            np.add.at(s, idx, t.column("s").to_numpy(zero_copy_only=False))
            np.add.at(n, idx, t.column("n").to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "cluster": pa.array(np.repeat(np.arange(k, dtype=np.int64), d)),
                "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), k)),
                "s": pa.array(s),
                "n": pa.array(n),
            }
        )

    for _ in range(iters):
        ref = ray.put(cents)
        partials = work.map_batches(
            _partial_for(ref), batch_format="pyarrow", zero_copy_batch=True
        )
        h = tree_fold(partials, _sum_partials)
        sums = h.column("s").to_numpy(zero_copy_only=False).reshape(k, d)
        counts = h.column("n").to_numpy(zero_copy_only=False).reshape(k, d)[:, 0]
        # sums < 2^53 by construction → the double division is exact-input;
        # round-half-even matches the SQL twin's emulated fe()
        upd = np.round(sums.astype(np.float64) / np.maximum(counts[:, None], 1))
        cents = np.where(counts[:, None] > 0, upd.astype(np.int64), cents)

    return cents


def semdedup_exact(
    ds: ray.data.Dataset,
    *,
    k: int = 8,
    iters: int = 5,
    grid: float = 1e-6,
    eps: float = 0.3,
    bucketed_groupby=None,
) -> ray.data.Dataset:
    """SemDeDup with an ENGINE-INDEPENDENT trajectory: clustering comes
    from :func:`kmeans_exact_assign`, and within-cluster cosine
    similarities are computed from the SAME quantized integer vectors —
    dot products and squared norms are exact integers (every partial sum
    < 2^53, so even a BLAS matmul is exact), and the only float ops are
    ``dot / (sqrt(n2x) * sqrt(n2y))`` on identical integer inputs, which
    every IEEE engine evaluates identically. No rounding gate is needed:
    the ``>= eps`` compare sees bit-identical doubles everywhere
    (distributed run, single-process replica, and the unrolled DuckDB
    twin queries.py::SEMDEDUP_EXACT_SQL).

    Keep rule mirrors :func:`semdedup_prune` (SemDeDup, Abbas et al.
    2023): priority within a cluster is dist2q DESC then vec_id ASC
    (farthest from centroid first); an item is dropped when some
    higher-priority item has cosine >= eps. Same O(c²)-per-cluster scale
    shape; k is the valve."""
    if bucketed_groupby is None:
        from ..relops import bucketed_groupby as _bg

        bucketed_groupby = _bg

    assigned = kmeans_exact_assign(
        ds, k=k, iters=iters, grid=grid, keep_embedding=True
    )

    empty = pa.table(
        {
            "vec_id": pa.array([], pa.int64()),
            "cluster": pa.array([], pa.int64()),
            "keep": pa.array([], pa.bool_()),
        }
    )

    def per_bucket(group: pa.Table) -> pa.Table:
        ids = group.column("vec_id").to_numpy(zero_copy_only=False)
        cl = group.column("cluster").to_numpy(zero_copy_only=False)
        d2 = group.column("dist2q").to_numpy(zero_copy_only=False)
        m = np.round(_matrix(group.column("embedding")) / grid)  # int-valued f64
        order = np.lexsort((ids, -d2, cl))
        ids, cl, m = ids[order], cl[order], m[order]
        s = np.sqrt((m * m).sum(axis=1))  # n2 exact int → sqrt deterministic
        starts = np.flatnonzero(np.r_[True, cl[1:] != cl[:-1]])
        bounds = np.r_[starts, len(cl)]
        keep = np.ones(len(cl), bool)
        for a, b in zip(bounds[:-1], bounds[1:]):
            c = b - a
            if c < 2:
                continue
            dots = m[a:b] @ m[a:b].T  # exact: integer-valued, < 2^53
            cos = dots / (s[a:b, None] * s[a:b][None, :])
            prior = np.tril(np.ones((c, c), bool), k=-1)
            keep[a:b] = ~np.any(prior & (cos >= eps), axis=1)
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "cluster": pa.array(cl, pa.int64()),
                "keep": pa.array(keep),
            }
        )

    return bucketed_groupby(assigned, ["cluster"], per_bucket, empty=empty)


def pca_top_component_exact(
    ds: ray.data.Dataset,
    *,
    iters: int = 8,
    grid: float = 1e-6,
    gram_shrink: float = 1e6,
) -> ray.data.Dataset:
    """Top principal direction by ENGINE-INDEPENDENT integer power
    iteration (same family as :func:`kmeans_exact_assign` /
    :func:`semdedup_exact`):

    * embeddings quantize to the ``grid`` → int64; the Gram matrix
      ``G = Σ x xᵀ`` accumulates as exact int64 partials tree-folded
      (each per-batch float64 matmul is exact — every product and partial
      sum is an integer < 2^53);
    * G shrinks once to ``Gs = round_even(G / gram_shrink)`` so each
      matvec ``w = Gs·v`` stays inside int64 with the unit-grid v
      (|v| ≤ 1e6, |Gs| ≤ ~5.6e8 at fixture scale → |w| ≤ 3.6e16);
    * the norm ``√(Σ w²)`` squares in arbitrary precision (Python int /
      DuckDB HUGEINT) before ONE deterministic int→double conversion;
    * v re-quantizes to the 1e-6 unit grid each step (half-even);
    * the final sign is fixed by making the first nonzero component
      positive.

    Every step is either order-free integer arithmetic or a
    deterministic double op on identical inputs, so the trajectory is
    bit-reproducible by the unrolled DuckDB twin
    (queries.py::PCA_EXACT_SQL). Capacity valves, documented not silent:
    int64 G holds to ~3×10⁷ rows at this grid — shrink the grid (or
    raise gram_shrink) for bigger corpora. Returns (dim, component_q)
    on the 1e-6 unit grid."""
    from ..relops import tree_fold

    work = ds.select_columns(["embedding"])
    probe = work.take_batch(1, batch_format="pyarrow")
    d = len(probe.column("embedding")[0])

    def _partial(batch: pa.Table) -> pa.Table:
        m = np.round(_matrix(batch.column("embedding")) / grid)  # int-valued f64
        g = (m.T @ m).astype(np.int64)  # exact: integer partials < 2^53
        return pa.table(
            {
                "i": pa.array(np.repeat(np.arange(d, dtype=np.int64), d)),
                "j": pa.array(np.tile(np.arange(d, dtype=np.int64), d)),
                "g": pa.array(g.ravel()),
            }
        )

    def _sum_partials(tables):
        acc = np.zeros(d * d, np.int64)
        for t in tables:
            idx = (
                t.column("i").to_numpy(zero_copy_only=False) * d
                + t.column("j").to_numpy(zero_copy_only=False)
            )
            np.add.at(acc, idx, t.column("g").to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "i": pa.array(np.repeat(np.arange(d, dtype=np.int64), d)),
                "j": pa.array(np.tile(np.arange(d, dtype=np.int64), d)),
                "g": pa.array(acc),
            }
        )

    h = tree_fold(
        work.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True),
        _sum_partials,
    )
    G = h.column("g").to_numpy(zero_copy_only=False).reshape(d, d)
    Gs = np.round(G.astype(np.float64) / gram_shrink).astype(np.int64)

    v = np.ones(d, np.int64)
    for _ in range(iters):
        w = Gs @ v  # exact int64 by the capacity argument above
        n2 = sum(int(x) * int(x) for x in w)  # arbitrary precision
        if n2 == 0:
            break
        nrm = float(np.sqrt(np.float64(n2)))
        v = np.round((w.astype(np.float64) / nrm) * 1000000.0).astype(np.int64)

    nz = np.flatnonzero(v)
    if len(nz) and v[nz[0]] < 0:
        v = -v

    return ray.data.from_arrow(
        pa.table(
            {
                "dim": pa.array(np.arange(d, dtype=np.int64)),
                "component_q": pa.array(v, pa.int64()),
            }
        )
    )


def semdedup_prune(
    assigned: ray.data.Dataset,
    *,
    eps: float,
    bucketed_groupby,
) -> ray.data.Dataset:
    """SemDeDup within-cluster pruning (Abbas et al. 2023, "SemDeDup:
    Data-efficient learning at web-scale through semantic deduplication").

    Input: (vec_id, cluster, dist2, embedding) from ``kmeans_assign(...,
    keep_embedding=True)``. Per cluster, items are ordered by keep
    priority — farthest from the centroid first (dist2 DESC, vec_id ASC,
    matching the paper's "keep the point with the lowest similarity to
    the centroid") — and item i is REMOVED when its max cosine similarity
    to any higher-priority item exceeds ``eps``. The triangular-max form
    is one vectorized matmul per cluster; both the engine and the
    single-process oracle assemble each cluster matrix in the identical
    row order, so the arithmetic is bit-identical (similarities rounded
    to 6dp before the threshold compare, like every float gate here).

    Scale shape: clusters are hash-bucketed (every cluster wholly in one
    bucket); within-cluster work is O(c²) in cluster size — the method's
    own cost model. At corpus scale c is held near corpus/k by RAISING k
    (the paper runs k=50k on LAION); a pathologically skewed cluster is
    the operator's documented limit, not a silent failure (memory is
    bounded by the bucket, and k is the valve)."""

    empty = pa.table(
        {
            "vec_id": pa.array([], pa.int64()),
            "cluster": pa.array([], pa.int64()),
            "max_prior_sim": pa.array([], pa.float64()),
            "keep": pa.array([], pa.bool_()),
        }
    )

    def per_bucket(group: pa.Table) -> pa.Table:
        ids = group.column("vec_id").to_numpy(zero_copy_only=False)
        cl = group.column("cluster").to_numpy(zero_copy_only=False)
        d2 = group.column("dist2").to_numpy(zero_copy_only=False)
        m = _matrix(group.column("embedding"))
        order = np.lexsort((ids, -d2, cl))  # cluster, dist2 DESC, vec_id ASC
        ids, cl, m = ids[order], cl[order], m[order]
        norms = np.sqrt((m * m).sum(axis=1))
        m = m / np.maximum(norms, 1e-12)[:, None]
        starts = np.flatnonzero(np.r_[True, cl[1:] != cl[:-1]])
        bounds = np.r_[starts, len(cl)]
        mx = np.full(len(cl), -1.0)  # highest-priority item has no prior
        for a, b in zip(bounds[:-1], bounds[1:]):
            c = b - a
            if c < 2:
                continue
            s = m[a:b] @ m[a:b].T
            # row i may only see higher-priority columns j < i; sims can be
            # negative, so mask with -1 (the cosine floor), not zeros
            s = np.where(np.tril(np.ones((c, c), bool), k=-1), s, -1.0)
            mx[a:b] = s.max(axis=1)
        mx = np.round(mx, 6)
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "cluster": pa.array(cl, pa.int64()),
                "max_prior_sim": pa.array(mx),
                "keep": pa.array(mx < eps),
            }
        )

    return bucketed_groupby(assigned, ["cluster"], per_bucket, empty=empty)
