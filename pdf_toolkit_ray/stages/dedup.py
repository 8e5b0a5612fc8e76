"""Deduplication stages for training-data pipelines.

Shapes (all Ray-Data-first, shuffle budget stated per op):

* exact: digest column in ``map_batches`` → one small ``groupby(digest)``
  aggregate — never ships full texts twice;
* MinHash+LSH: signature per row (actor-held permutations) → explode to
  (band_key, id, signature) → ``groupby(band_key)`` → candidate edges by
  signature-estimated Jaccard → connected components;
* SimHash: 64-bit signature + 4×16-bit band bucketing → Hamming verify;
* n-gram Jaccard: LSH candidates → exact Jaccard verify on texts.

Connected components run distributed (``connected_components``): either
union-find over the edge list inside one Ray task (edges ≪ corpus), or
iterative min-label propagation via join/groupby rounds when the edge
list itself is big. Cluster ids re-attach via broadcast map or
``Dataset.join`` — corpus rows never materialize on the driver.
"""

from __future__ import annotations

import os
from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

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
    """(digest, doc_id=min id, n=multiplicity) per distinct content.

    Texts are digested map-side and DROPPED before the groupby — the
    shuffle moves (digest, id) pairs only, never document bodies."""
    return (
        add_digest(ds.select_columns([id_col, text_col]), text_col)
        .select_columns(["digest", id_col])
        .groupby("digest")
        .aggregate(Min(id_col, alias_name=id_col), Count(alias_name="n"))
    )


def exact_dedup(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Keep one representative row (min id) per distinct text.

    Scale path: a distributed semi-join on ``(digest, id)`` against the
    ``exact_dedup_groups`` output — both sides are hash-partitioned by
    Ray's ``Dataset.join``; nothing is materialized on the driver.
    ``num_partitions`` defaults to an input-size-derived count."""
    if num_partitions is None:
        from ..relops import choose_num_partitions_for

        num_partitions = choose_num_partitions_for(ds)
    keep = exact_dedup_groups(ds, id_col, text_col).select_columns(["digest", id_col])
    keyed = add_digest(ds, text_col)
    joined = keyed.join(
        keep,
        "inner",
        num_partitions=num_partitions,
        on=("digest", id_col),
    )
    return joined.drop_columns(["digest"])


@ray.remote(num_cpus=0)
class _DigestShardActor:
    """One shard of a cluster-wide SHARED MUTABLE digest index
    (digest → min id). num_cpus=0: the actor is a memory cell that
    serves µs-scale dict updates — it must never hold a CPU slot that
    the routing tasks need (a reservation here deadlocks small
    sessions, the same lesson as relops.broadcast_join's task form).

    RAM budget: ``max_entries`` bounds the in-actor dict. When an offer
    pushes past it, the dict is flushed to a sub-bucketed parquet RUN
    under ``spill_dir`` and cleared — steady-state actor RAM is one
    budget's worth of entries regardless of how many billions of digests
    a 100-TB ingest streams through. Merge-on-read keeps exactness:

    * keep-min — global min per digest across all runs + the live dict
      (order-independent, so spill timing can't change the answer);
    * first-wins — runs merge in temporal order, earliest occurrence
      wins, live dict last (a later job can never displace an id an
      earlier flush recorded).

    The merge itself is bounded too: runs are hash-split into
    ``sub_buckets`` files at flush time and merged one sub-bucket at a
    time (peak = distinct-per-sub + run-per-sub), and ``kept_table(sub=)``
    lets the consumer pull per-sub tables so no single actor response
    carries the whole shard."""

    def __init__(
        self,
        max_entries: int | None = None,
        spill_dir: str | None = None,
        sub_buckets: int = 8,
        adopt_dir: str | None = None,
    ) -> None:
        import tempfile
        import uuid

        self._min: dict[str, int] = {}
        self._max = int(max_entries) if max_entries else None
        self._subs = max(1, int(sub_buckets))
        if adopt_dir is not None:
            # reopen a persisted shard (save_digest_index → a later Ray
            # session's load_digest_index): runs on disk are the state,
            # and run index stays the temporal order across sessions
            import pyarrow.parquet as pq

            self._dir = adopt_dir
            runs = set()
            rows = 0
            if os.path.isdir(adopt_dir):
                for name in os.listdir(adopt_dir):
                    if name.startswith("run") and name.endswith(".parquet"):
                        runs.add(int(name[3:9]))
                        rows += pq.read_metadata(
                            os.path.join(adopt_dir, name)
                        ).num_rows
            self._runs = (max(runs) + 1) if runs else 0
            self._spilled_rows = rows
            return
        base = spill_dir or os.path.join(tempfile.gettempdir(), "pdf_toolkit_ray_spill")
        self._dir = os.path.join(base, uuid.uuid4().hex)
        self._runs = 0  # flushed run count (run index = temporal order)
        self._spilled_rows = 0

    def persist(self) -> str:
        """Flush the live dict to a run (even under budget) and return the
        shard's on-disk directory — the durable form of the shard."""
        if self._min:
            self._flush()
        os.makedirs(self._dir, exist_ok=True)
        return self._dir

    def _sub_of(self, digest: str) -> int:
        # DETERMINISTIC sub-bucket (crc32, not builtin hash()): a digest
        # must land in the same sub in EVERY process — builtin str hash
        # is PYTHONHASHSEED-randomized per process, which kept merges
        # correct within one actor's lifetime but silently broke the
        # run-vs-live merge after a save/load into a new process (the
        # same digest merged in two different subs and both ids survived)
        if self._subs <= 1:
            return 0
        import zlib

        return zlib.crc32(digest.encode("utf-8")) % self._subs

    def _flush(self) -> None:
        import pyarrow.parquet as pq

        os.makedirs(self._dir, exist_ok=True)
        by_sub: list[tuple[list[str], list[int]]] = [([], []) for _ in range(self._subs)]
        for d, i in self._min.items():
            ds_, is_ = by_sub[self._sub_of(d)]
            ds_.append(d)
            is_.append(i)
        for j, (ds_, is_) in enumerate(by_sub):
            if not ds_:
                continue
            pq.write_table(
                pa.table({"digest": pa.array(ds_), "id": pa.array(is_, pa.int64())}),
                os.path.join(self._dir, f"run{self._runs:06d}_sub{j:04d}.parquet"),
            )
        self._spilled_rows += len(self._min)
        self._runs += 1
        self._min = {}

    def offer(self, digests: list[str], ids: list[int], first_wins: bool = False) -> int:
        """``first_wins=False`` (single-job): keep the MIN id per digest —
        order-independent, so the result is deterministic. ``first_wins=
        True`` (cross-job ingestion): an id already in the index is never
        displaced — a later job cannot retract rows an earlier job
        already shipped (the merge honors this across spilled runs)."""
        m = self._min
        if first_wins:
            for d, i in zip(digests, ids):
                m.setdefault(d, i)
        else:
            for d, i in zip(digests, ids):
                cur = m.get(d)
                if cur is None or i < cur:
                    m[d] = i
        if self._max is not None and len(m) > self._max:
            self._flush()
        return len(m)

    def size(self) -> int:
        """Distinct-digest UPPER BOUND (exact when nothing spilled): a
        digest flushed in several runs counts once per run. Zero iff the
        shard saw no offers — the only property consumers rely on."""
        return len(self._min) + self._spilled_rows

    def spilled_runs(self) -> int:
        return self._runs

    def _run_files(self, sub: int) -> list[str]:
        if not self._runs:
            return []
        names = [
            f"run{r:06d}_sub{sub:04d}.parquet" for r in range(self._runs)
        ]
        return [
            p for p in (os.path.join(self._dir, n) for n in names) if os.path.exists(p)
        ]

    def _merged_sub(self, sub: int, first_wins: bool) -> tuple[list[str], list[int]]:
        import pyarrow.parquet as pq

        acc: dict[str, int] = {}
        for path in self._run_files(sub):  # temporal order by filename
            t = pq.read_table(path)
            for d, i in zip(t.column("digest").to_pylist(), t.column("id").to_pylist()):
                if first_wins:
                    acc.setdefault(d, i)
                else:
                    cur = acc.get(d)
                    if cur is None or i < cur:
                        acc[d] = i
        # live dict merges LAST: for first-wins an already-flushed digest
        # keeps its earlier id; for keep-min order is irrelevant anyway
        for d, i in self._min.items():
            if self._sub_of(d) != sub:
                continue
            if first_wins:
                acc.setdefault(d, i)
            else:
                cur = acc.get(d)
                if cur is None or i < cur:
                    acc[d] = i
        return list(acc.keys()), list(acc.values())

    def kept_table(
        self, id_col: str, sub: int | None = None, first_wins: bool = False
    ) -> pa.Table:
        if not self._runs:  # fast path: pure-RAM shard, as before
            return pa.table(
                {id_col: pa.array(list(self._min.values()), pa.int64())}
            )
        subs = range(self._subs) if sub is None else [sub]
        ids: list[int] = []
        for j in subs:
            ids.extend(self._merged_sub(j, first_wins)[1])
        return pa.table({id_col: pa.array(ids, pa.int64())})

    def kept_sub_refs(self, id_col: str, first_wins: bool = False) -> list:
        """Merged kept-id tables, one OBJECT REF per non-empty sub-bucket:
        the actor holds one merged sub at a time (budget-bounded) and the
        consumer assembles the refs into a Dataset without any whole-shard
        table ever existing in actor or driver memory."""
        out = []
        for j in range(self._subs):
            ids = self._merged_sub(j, first_wins)[1]
            if ids:
                out.append(ray.put(pa.table({id_col: pa.array(ids, pa.int64())})))
        return out

    def cleanup(self) -> None:
        import shutil

        shutil.rmtree(self._dir, ignore_errors=True)


def make_digest_index(
    num_shards: int | None = None,
    *,
    max_entries_per_shard: int | None = None,
    spill_dir: str | None = None,
) -> list:
    """Create a persistent sharded digest index (list of actor handles)
    to pass as ``shards=`` across several :func:`exact_dedup_online`
    calls — cross-job / streaming-ingestion dedup, where the index must
    outlive a single dataset pass. Pair with ``first_wins=True`` so a
    later job can never retract rows an earlier job already shipped.
    ``max_entries_per_shard`` caps each actor's RAM: past it, entries
    spill to sub-bucketed parquet runs under ``spill_dir`` and are
    merged back exactly on read — a 100-TB ingest needs shard COUNT
    sized for throughput only, not for index bytes."""
    if num_shards is None:
        num_shards = max(4, int(ray.cluster_resources().get("CPU", 8)) // 2)
    return [
        _DigestShardActor.remote(
            max_entries=max_entries_per_shard, spill_dir=spill_dir
        )
        for _ in range(num_shards)
    ]


def save_digest_index(shards: list, path: str) -> str:
    """Durable form of a :func:`make_digest_index` index across Ray
    sessions: every shard flushes its live dict to its parquet runs and
    a manifest records the shard directories IN ORDER (shard routing is
    ``hash(digest) % len(shards)``, so order and count must survive).
    Reopen with :func:`load_digest_index`; pair with ``first_wins=True``
    so yesterday's job still wins over today's re-offers."""
    import json

    dirs = ray.get([s.persist.remote() for s in shards])
    os.makedirs(path, exist_ok=True)
    tmp = os.path.join(path, f"index.json.tmp.{os.getpid()}")
    with open(tmp, "w") as fh:
        json.dump({"shard_dirs": dirs}, fh, indent=1)
    os.replace(tmp, os.path.join(path, "index.json"))
    return path


def load_digest_index(
    path: str, *, max_entries_per_shard: int | None = None
) -> list:
    """Reopen a :func:`save_digest_index` directory as live shard actors
    (same count/order; each adopts its persisted runs in place)."""
    import json

    with open(os.path.join(path, "index.json")) as fh:
        doc = json.load(fh)
    return [
        _DigestShardActor.remote(max_entries=max_entries_per_shard, adopt_dir=d)
        for d in doc["shard_dirs"]
    ]


def exact_dedup_online(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    num_shards: int | None = None,
    shards: list | None = None,
    first_wins: bool = False,
) -> ray.data.Dataset:
    """Keep-min exact dedup through a shared mutable index — the operator
    shape the Dataset API genuinely cannot express (SURVEY §2 custom-op
    rule (c)): raw Ray actors hold a digest-hash-sharded ``digest →
    min id`` map that every routing task updates in place. Because the
    kept id is the MIN per digest, the result is order-independent and
    identical to :func:`exact_dedup` — one SQL twin verifies both. The
    groupby/join path stays the engine default; this is the
    ONLINE/incremental variant for streaming ingest or cross-job dedup,
    where the index must outlive a single dataset pass.

    Scale shape: the index is sharded by digest prefix across actors
    (per-actor memory = distinct digests / shards × ~60 B — shard count,
    not corpus size, is the valve); each routing task sends every
    (digest, id) pair over the wire exactly once, batched per
    (block × shard), and blocks on its own offers so the index is
    complete when the routed pass finishes. Kept ids come back as
    per-shard Arrow tables assembled into a Dataset via object refs —
    never gathered on the driver — and the corpus joins them
    distributed."""
    if shards is None:
        shards = make_digest_index(num_shards)
    num_shards = len(shards)

    keyed = add_digest(ds.select_columns([id_col, text_col]), text_col)

    def route(batch: pa.Table) -> pa.Table:
        import pandas as pd

        # vectorized shard assignment (same siphash as bucketed_groupby);
        # keep-min makes the result independent of the assignment, the
        # hash only has to put equal digests on one shard
        h = pd.util.hash_pandas_object(
            batch.column("digest").to_pandas(), index=False
        ).to_numpy(dtype=np.uint64)
        shard_of = (h % num_shards).astype(np.int64)
        order = np.argsort(shard_of, kind="stable")
        sorted_shards = shard_of[order]
        starts = np.flatnonzero(np.r_[True, sorted_shards[1:] != sorted_shards[:-1]])
        bounds = np.r_[starts, len(order)]
        digests = np.asarray(batch.column("digest").to_numpy(zero_copy_only=False))
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        refs = [
            shards[int(sorted_shards[a])].offer.remote(
                digests[order[a:b]].tolist(), ids[order[a:b]].tolist(), first_wins
            )
            for a, b in zip(bounds[:-1], bounds[1:])
        ]
        ray.get(refs)  # offers land before this task reports done
        return pa.table({"n": pa.array([batch.num_rows], pa.int64())})

    # consume the routed pass (output is one count row per block)
    keyed.map_batches(route, batch_format="pyarrow", zero_copy_batch=True).materialize()

    # assemble ONLY non-empty shard tables: Ray's JoinOperator crashes on
    # empty blocks reaching a join side (the drop_empty_blocks failure
    # mode), and shard emptiness is knowable for free from the index.
    # Spilled shards are pulled one sub-bucket per ref so no single actor
    # response carries the whole shard (merge peak stays budget-bounded).
    sizes = ray.get([s.size.remote() for s in shards])
    runs = ray.get([s.spilled_runs.remote() for s in shards])
    refs = []
    for s, n, r in zip(shards, sizes, runs):
        if not n:
            continue
        if r:
            # list of object refs, one per NON-EMPTY sub-bucket (empty
            # blocks must never reach the join side)
            refs.extend(ray.get(s.kept_sub_refs.remote(id_col, first_wins)))
        else:
            refs.append(s.kept_table.remote(id_col))
    if not refs:
        return ds.limit(0)
    kept = ray.data.from_arrow_refs(refs)
    from ..relops import choose_num_partitions_for

    return ds.join(
        kept, "inner",
        num_partitions=choose_num_partitions_for(ds),
        on=(id_col,),
    )


class _MinHashStage:
    """Actor-pool stage: per-row MinHash signature + LSH band keys.

    Fully vectorized: one ``signatures`` call per batch (numpy modular
    arithmetic over all shingles at once), integer band keys, and a
    row-repeat explode — no per-row Python loop."""

    #: extra column carried through the explode alongside the band key
    payload = "sig"

    def __init__(self, id_col: str, text_col: str, num_perm: int, bands: int):
        self.hasher = MinHasher(num_perm=num_perm, bands=bands)
        self.id_col = id_col
        self.text_col = text_col

    def _payload_array(self, batch: pa.Table, sigs: np.ndarray, repeats: int) -> pa.Array:
        width = sigs.shape[1] * 4
        rep = np.repeat(sigs, repeats, axis=0)
        return pa.FixedSizeBinaryArray.from_buffers(
            pa.binary(width), len(rep), [None, pa.py_buffer(np.ascontiguousarray(rep).tobytes())]
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        sigs = self.hasher.signatures(texts)  # (n, P) uint32
        keys = self.hasher.band_key_matrix(sigs)  # (n, B) int64
        n, n_bands = keys.shape
        idx = np.repeat(np.arange(n), n_bands)
        ids = batch.column(self.id_col).take(pa.array(idx))
        return pa.table(
            {
                "band_key": pa.array(keys.reshape(-1)),
                self.id_col: ids,
                self.payload: self._payload_array(batch, sigs, n_bands),
            }
        )


def _candidate_edges(group: pa.Table, id_col: str, threshold: float) -> pa.Table:
    """Pairwise signature-estimated Jaccard within one LSH bucket
    (vectorized (m, m, P) equality mean over the bucket's signatures)."""
    m = group.num_rows
    id_type = group.column(id_col).type
    empty = pa.table(
        {
            "a": pa.array([], type=id_type),
            "b": pa.array([], type=id_type),
            "est_jaccard": pa.array([], type=pa.float64()),
        }
    )
    if m < 2:
        return empty
    ids_arr = group.column(id_col).to_numpy(zero_copy_only=False)
    order = np.argsort(ids_arr, kind="stable")
    ids_sorted = ids_arr[order]
    width = group.column("sig").type.byte_width
    raw = b"".join(group.column("sig").to_pylist())
    sigs = np.frombuffer(raw, dtype=np.uint32).reshape(m, width // 4)[order]
    # chunked upper-triangle sweep: a degenerate bucket (skewed shingles)
    # must not allocate an O(m^2 · P) comparison tensor in one shot
    chunk = 1024
    a_parts, b_parts, s_parts = [], [], []
    for lo_a in range(0, m, chunk):
        hi_a = min(lo_a + chunk, m)
        for lo_b in range(lo_a, m, chunk):
            hi_b = min(lo_b + chunk, m)
            sims = (sigs[lo_a:hi_a, None, :] == sigs[None, lo_b:hi_b, :]).mean(axis=2)
            ia, jb = np.nonzero(sims >= threshold)
            gi, gj = ia + lo_a, jb + lo_b
            keep = (gi < gj) & (ids_sorted[gi] != ids_sorted[gj])
            if keep.any():
                a_parts.append(ids_sorted[gi[keep]])
                b_parts.append(ids_sorted[gj[keep]])
                s_parts.append(sims[ia[keep], jb[keep]])
    if not a_parts:
        return empty
    sims_all = np.concatenate(s_parts)
    return pa.table(
        {
            "a": pa.array(np.concatenate(a_parts), type=id_type),
            "b": pa.array(np.concatenate(b_parts), type=id_type),
            "est_jaccard": pa.array(
                [round_away_scalar(float(s)) for s in sims_all], type=pa.float64()
            ),
        }
    )


class _IdOnlyStage(_MinHashStage):
    """Explode variant carrying ONLY (band_key, id): the candidate shuffle
    moves ~16 bytes per (row, band) — document bodies never enter the band
    explode (with bands=32 a text payload here would cross the shuffle 32
    times per document)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        sigs = self.hasher.signatures(texts)
        keys = self.hasher.band_key_matrix(sigs)
        n, n_bands = keys.shape
        idx = np.repeat(np.arange(n), n_bands)
        ids = batch.column(self.id_col).take(pa.array(idx))
        return pa.table({"band_key": pa.array(keys.reshape(-1)), self.id_col: ids})


_HASHER_CACHE: dict[tuple, "_MinHashStage"] = {}
_ID_STAGE_CACHE: dict[tuple, _IdOnlyStage] = {}


def _id_stage_for(id_col: str, text_col: str, num_perm: int, bands: int) -> _IdOnlyStage:
    key = (id_col, text_col, num_perm, bands)
    if key not in _ID_STAGE_CACHE:
        _ID_STAGE_CACHE[key] = _IdOnlyStage(id_col, text_col, num_perm, bands)
    return _ID_STAGE_CACHE[key]


def _stage_for(id_col: str, text_col: str, num_perm: int, bands: int) -> "_MinHashStage":
    """Module-level stage cache: stateless map_batches tasks get a warmed
    MinHasher (and its word-hash cache) per worker process for free, with
    none of the actor-pool dispatch overhead."""
    key = (id_col, text_col, num_perm, bands)
    if key not in _HASHER_CACHE:
        _HASHER_CACHE[key] = _MinHashStage(id_col, text_col, num_perm, bands)
    return _HASHER_CACHE[key]


def minhash_candidate_edges(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.8,
    distinct: bool = True,
) -> ray.data.Dataset:
    """Near-duplicate candidate pairs with estimated Jaccard ≥ threshold.

    ``distinct=True`` dedups pairs that surface from several bands (one
    extra small shuffle); clustering consumers can skip it — union-find
    and label propagation are insensitive to duplicate edges."""

    def _sig_explode(batch: pa.Table) -> pa.Table:
        return _stage_for(id_col, text_col, num_perm, bands)(batch)

    exploded = ds.select_columns([id_col, text_col]).map_batches(
        _sig_explode, batch_format="pyarrow", zero_copy_batch=True
    )
    edges = exploded.groupby("band_key").map_groups(
        lambda g: _candidate_edges(g, id_col, threshold), batch_format="pyarrow"
    )
    if not distinct:
        return edges
    return edges.groupby(["a", "b"]).aggregate(Min("est_jaccard", alias_name="est_jaccard"))


@ray.remote
def _union_find_task(*edge_tables: pa.Table) -> pa.Table:
    """Union-find over an edge list inside ONE worker task (the edge list —
    near-dup pairs after LSH + verify — is orders of magnitude smaller than
    the corpus; this task never sees corpus rows)."""
    valid = [t for t in edge_tables if t.num_rows]
    if not valid:
        return pa.table({"node": pa.array([]), "label": pa.array([])})
    edges = pa.concat_tables(valid)
    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    a_col = edges.column("a").to_pylist()
    b_col = edges.column("b").to_pylist()
    for x, y in zip(a_col, b_col):
        parent.setdefault(x, x)
        parent.setdefault(y, y)
        rx, ry = find(x), find(y)
        if rx != ry:
            if ry < rx:
                rx, ry = ry, rx
            parent[ry] = rx
    nodes = list(parent)
    node_type = edges.column("a").type
    return pa.table(
        {
            "node": pa.array(nodes, type=node_type),
            "label": pa.array([find(n) for n in nodes], type=node_type),
        }
    )


def _rename(ds: ray.data.Dataset, mapping: dict[str, str]) -> ray.data.Dataset:
    def _r(batch: pa.Table) -> pa.Table:
        return batch.rename_columns([mapping.get(c, c) for c in batch.schema.names])

    return ds.map_batches(_r, batch_format="pyarrow", zero_copy_batch=True)


def _pin_schema(ds: ray.data.Dataset, schema: pa.Schema) -> ray.data.Dataset:
    """Coerce every block to ``schema`` — Ray 2.49 groupby/aggregate can emit
    zero-column empty blocks that break downstream ``Dataset.join`` key
    resolution ("No match for key field reference")."""

    def _p(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 and batch.schema.names != schema.names:
            return schema.empty_table()
        return batch.select(schema.names).cast(schema)

    return ds.map_batches(_p, batch_format="pyarrow", zero_copy_batch=True)


def connected_components(
    edges: ray.data.Dataset,
    *,
    method: str = "auto",
    local_edge_limit: int = 2_000_000,
    num_partitions: int | None = None,
    max_rounds: int = 64,
) -> ray.data.Dataset:
    """(node, label) for every node on some edge; label = min id in its
    component.

    ``method="local"``: union-find in a single Ray task — right whenever
    the *edge list* fits one worker (it is pairs-after-verify, not corpus).
    ``method="labelprop"``: fully distributed iterative min-label
    propagation — each round sends every node's current label across its
    edges and takes the per-node min (groupby), until fixpoint. O(component
    diameter) rounds; every step is edge-sized, nothing driver-side.
    ``method="auto"``: count edges, pick local under ``local_edge_limit``.
    """
    # edge lists are pairs-after-verify — tiny relative to the corpus — so
    # materializing here is cheap and avoids re-executing the candidate
    # pipeline for count() + the component rounds
    edges = edges.select_columns(["a", "b"]).materialize()
    if num_partitions is None:
        from ..relops import choose_num_partitions_for

        num_partitions = choose_num_partitions_for(edges, lo=4)
    if method == "auto":
        method = "local" if edges.count() <= local_edge_limit else "labelprop"
    if method == "local":
        refs = edges.to_arrow_refs()
        return ray.data.from_arrow_refs([_union_find_task.remote(*refs)])
    if method != "labelprop":
        raise ValueError(f"unknown components method: {method}")

    node_t = edges.schema().base_schema.field("a").type
    edge_schema = pa.schema([("a", node_t), ("b", node_t)])
    sym_schema = pa.schema([("src", node_t), ("dst", node_t)])
    label_schema = pa.schema([("node", node_t), ("label", node_t)])
    edges = _pin_schema(edges, edge_schema)

    # symmetrize once: (a,b) -> (a->b) and (b->a); one join per round
    def _forward(batch: pa.Table) -> pa.Table:
        return pa.table({"src": batch.column("a"), "dst": batch.column("b")})

    def _backward(batch: pa.Table) -> pa.Table:
        return pa.table({"src": batch.column("b"), "dst": batch.column("a")})

    sym = _pin_schema(
        edges.map_batches(_forward, batch_format="pyarrow", zero_copy_batch=True).union(
            edges.map_batches(_backward, batch_format="pyarrow", zero_copy_batch=True)
        ),
        sym_schema,
    ).repartition(num_partitions).materialize()

    def _self_label(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch.column("src"), "label": batch.column("src")})

    labels = _pin_schema(
        sym.select_columns(["src"])
        .groupby("src")
        .aggregate(Count(alias_name="_n"))
        .map_batches(
            lambda b: pa.table({"src": b.column("src")}),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        .map_batches(_self_label, batch_format="pyarrow", zero_copy_batch=True),
        label_schema,
    ).materialize()

    def _checksum(ds: ray.data.Dataset) -> int:
        """Order-independent fingerprint of the (node,label) assignment —
        labels only decrease, so equal checksums mean a fixpoint (w.h.p.).
        Vectorized: one ``hash_pandas_object`` call per batch (siphash with
        a fixed key — deterministic across worker processes), summed with
        uint64 wraparound."""

        def _h(batch: pa.Table) -> pa.Table:
            import pandas as pd

            df = pd.DataFrame(
                {
                    "node": batch.column("node").to_pandas(),
                    "label": batch.column("label").to_pandas(),
                }
            )
            hv = pd.util.hash_pandas_object(df, index=False).to_numpy()
            acc = int(np.sum(hv.astype(np.uint64), dtype=np.uint64))
            return pa.table({"h": pa.array([acc], type=pa.uint64())})

        parts = ds.map_batches(_h, batch_format="pyarrow", zero_copy_batch=True).take_all()
        return sum(int(r["h"]) for r in parts) & 0xFFFFFFFFFFFFFFFF

    prev_sum = _checksum(labels)
    converged = False
    for _round in range(max_rounds):
        # each node's label flows across every incident edge; per-node min
        msgs = _rename(
            sym.join(labels, "inner", num_partitions=num_partitions,
                     on=("src",), right_on=("node",)).select_columns(["dst", "label"]),
            {"dst": "node"},
        )
        new_labels = _pin_schema(
            labels.union(_pin_schema(msgs, label_schema))
            .groupby("node")
            .aggregate(Min("label", alias_name="label")),
            label_schema,
        ).materialize()
        new_sum = _checksum(new_labels)
        labels = new_labels
        if new_sum == prev_sum:
            converged = True
            break
        prev_sum = new_sum
    if not converged:
        # one min-label hop per round => rounds needed = component diameter.
        # Returning silently would split one true component into several
        # cluster ids — fail loudly instead.
        raise RuntimeError(
            f"label propagation did not converge in {max_rounds} rounds "
            "(component diameter exceeds max_rounds); raise max_rounds"
        )
    return labels


def attach_cluster_ids(
    ds: ray.data.Dataset,
    labels: ray.data.Dataset,
    id_col: str = "doc_id",
    *,
    broadcast_limit: int = 5_000_000,
    num_partitions: int | None = None,
    keep_columns: Sequence[str] = (),
) -> ray.data.Dataset:
    """(id, cluster_id[, keep_columns…]) for EVERY corpus row; rows in no
    component keep their own id. The label map (duplicate-involved nodes
    only) is broadcast when small, else joined; corpus ids never hit the
    driver. ``keep_columns`` carries payload columns of ``ds`` through
    (e.g. the quality column a keep-best canonicalization ranks on)."""
    keep = list(keep_columns)
    slim = ds.select_columns([id_col, *keep])
    if num_partitions is None:
        from ..relops import choose_num_partitions_for

        num_partitions = choose_num_partitions_for(slim)
    n_labels = labels.count()
    if n_labels == 0:
        # no component touches any row — every row is its own cluster.
        # (An empty union-find output is NULL-typed; joining it would
        # crash on the type mismatch, so short-circuit.)
        def _self(batch: pa.Table) -> pa.Table:
            cols = {id_col: batch.column(id_col), "cluster_id": batch.column(id_col)}
            for c in keep:
                cols[c] = batch.column(c)
            return pa.table(cols)

        return slim.map_batches(_self, batch_format="pyarrow", zero_copy_batch=True)
    if n_labels <= broadcast_limit:
        # broadcast the label map as an ARROW table (zero-copy plasma get
        # per task, no per-actor dict rebuild, no per-row python lookup):
        # per batch a vectorized pa.Table.join + coalesce
        import pyarrow.compute as pc

        label_tbl = pa.concat_tables(ray.get(labels.to_arrow_refs())).combine_chunks()
        ref = ray.put(label_tbl)

        def _attach(batch: pa.Table) -> pa.Table:
            joined = batch.join(
                ray.get(ref), keys=[id_col], right_keys=["node"],
                join_type="left outer",
            )
            cluster = pc.coalesce(joined.column("label"), joined.column(id_col))
            cols = {id_col: joined.column(id_col), "cluster_id": cluster}
            for c in keep:
                cols[c] = joined.column(c)
            return pa.table(cols)

        return slim.map_batches(_attach, batch_format="pyarrow", zero_copy_batch=True)
    joined = slim.join(
        labels, "left_outer", num_partitions=num_partitions,
        on=(id_col,), right_on=("node",),
    )

    def _coalesce(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        lbl = pc.coalesce(batch.column("label"), batch.column(id_col))
        cols = {id_col: batch.column(id_col), "cluster_id": lbl}
        for c in keep:
            cols[c] = batch.column(c)
        return pa.table(cols)

    return joined.map_batches(_coalesce, batch_format="pyarrow", zero_copy_batch=True)


def minhash_lsh_clusters(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.8,
    method: str = "auto",
) -> ray.data.Dataset:
    """(id, cluster_id) for every row; cluster_id = min id in the component.

    Pipeline: signatures + band explode (vectorized map_batches) →
    per-bucket candidate edges (groupby) → connected components
    (distributed; see ``connected_components``) → cluster map attached via
    broadcast or join. No whole-corpus materialization anywhere."""
    edges = minhash_candidate_edges(
        ds, id_col, text_col,
        num_perm=num_perm, bands=bands, threshold=threshold, distinct=False,
    )
    labels = connected_components(edges, method=method)
    return attach_cluster_ids(ds, labels, id_col)


def add_simhash(ds: ray.data.Dataset, id_col: str = "doc_id", text_col: str = "text") -> ray.data.Dataset:
    """(id, simhash) — signature stored as int64 (two's-complement of
    uint64); whole batch vectorized via ``simhash64_batch``."""
    from ..functions.hashing import simhash64_batch

    def _sim(batch: pa.Table) -> pa.Table:
        sims = simhash64_batch(batch.column(text_col).to_pylist())
        return pa.table(
            {
                id_col: batch.column(id_col),
                "simhash": pa.array(sims, type=pa.int64()),
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
        n = batch.num_rows
        col = batch.column("simhash")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        sh = col.to_numpy(zero_copy_only=False).view(np.uint64)
        keys = np.empty((n, 4), dtype=np.int64)
        for band in range(4):
            chunk = (sh >> np.uint64(band * 16)) & np.uint64(0xFFFF)
            keys[:, band] = (np.int64(band) << np.int64(16)) | chunk.astype(np.int64)
        idx = np.repeat(np.arange(n), 4)
        taken = batch.take(pa.array(idx))
        return pa.table(
            {
                "band_key": pa.array(keys.reshape(-1)),
                id_col: taken.column(id_col),
                "simhash": taken.column("simhash"),
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


def _bucket_candidate_pairs(
    exploded: ray.data.Dataset,
    id_col: str,
    id_type: pa.DataType,
) -> ray.data.Dataset:
    """Unordered id pairs sharing an LSH band, nearly distinct: ONE
    bucketed sort-shuffle on the integer band_key co-locates every band,
    then the all-pairs step is a vectorized Arrow self-join INSIDE the
    bucket and pairs surfacing from several bands in the same bucket
    dedup right there. Only CROSS-bucket duplicates (the same pair found
    via bands that hashed to different buckets) survive — the caller's
    size-gated global distinct removes those. A pathologically hot band
    of m members still implies m² candidate rows — inherent to
    all-pairs-within-bucket semantics.

    History: a Dataset.join + global sort-groupby computed the same thing
    with two all-to-alls plus per-join aggregator-actor startup, which
    dominated at realistic candidate counts (2.4-2.8 s for 160k exploded
    rows at sf0.1; this path measures ~0.8 s). Before that, a
    ``groupby(band).map_groups`` paid ~80 µs Python dispatch per
    mostly-unique band (4.2 s)."""
    from ..relops import bucketed_groupby

    empty = pa.table(
        {"a": pa.array([], type=id_type), "b": pa.array([], type=id_type)}
    )

    def per_bucket(group: pa.Table) -> pa.Table:
        right = pa.table(
            {"band_key": group.column("band_key"), "b": group.column(id_col)}
        )
        j = group.select(["band_key", id_col]).join(
            right, keys=["band_key"], join_type="inner"
        )
        kept = j.filter(pc.less(j.column(id_col), j.column("b")))
        t = pa.table({"a": kept.column(id_col), "b": kept.column("b")})
        return t.group_by(["a", "b"]).aggregate([])

    return bucketed_groupby(exploded, ["band_key"], per_bucket, empty=empty)


@ray.remote
def _concat_tables_task(*refs) -> pa.Table:
    """Concat Arrow blocks inside a worker — the result lands in plasma,
    never on the driver."""
    tables = [t for t in refs if t.num_rows]
    if not tables:
        return refs[0].slice(0, 0)
    return pa.concat_tables(tables).combine_chunks()


def _verify_pairs_batch(
    batch: pa.Table, n: int, threshold: float
) -> pa.Table:
    a = batch.column("a").to_pylist()
    b = batch.column("b").to_pylist()
    ta = batch.column("payload_a").to_pylist()
    tb = batch.column("payload_b").to_pylist()
    a_out, b_out, jac = [], [], []
    for i in range(len(a)):
        sim = jaccard_ngrams(ta[i] or "", tb[i] or "", n)
        if sim >= threshold:
            a_out.append(a[i])
            b_out.append(b[i])
            jac.append(round_away_scalar(sim))
    id_type = batch.column("a").type
    return pa.table(
        {
            "a": pa.array(a_out, type=id_type),
            "b": pa.array(b_out, type=id_type),
            "jaccard": pa.array(jac, type=pa.float64()),
        }
    )


def _pairs_empty(id_type: pa.DataType) -> pa.Table:
    return pa.table(
        {
            "a": pa.array([], type=id_type),
            "b": pa.array([], type=id_type),
            "jaccard": pa.array([], type=pa.float64()),
        }
    )


def _attach_verify_pairs(
    texts_ds: ray.data.Dataset,
    cand: ray.data.Dataset,
    id_col: str,
    id_type: pa.DataType,
    *,
    payload_of,
    verify_fn,
    out_empty: pa.Table,
    broadcast_pair_limit: int,
    num_partitions: int,
) -> ray.data.Dataset:
    """Size-gated "attach per-pair payload + exact verify" shared by the
    Jaccard (``ngram_jaccard_pairs``) and Levenshtein
    (``fuzzy_lev_pairs``) families.

    ``cand`` is an (a, b) candidate dataset, possibly with cross-bucket
    duplicates. Under ``broadcast_pair_limit`` candidates, the payloads
    for candidate ids are gathered by a shuffle-free ``pc.is_in`` filter
    over the corpus scan, concatenated INSIDE a worker task (the driver
    never holds payloads) and read zero-copy from plasma by the verify
    tasks — no hash-join shuffle at all. Above the limit, a bucketed
    global pair-distinct then two distributed ``Dataset.join``s attach
    the payloads (each crosses the wire once per pair side).

    ``payload_of(texts_batch) -> pa.Array`` projects each row's verify
    payload (full text for Jaccard, a key prefix for Levenshtein);
    ``verify_fn(joined) -> pa.Table`` sees columns
    (a, b, payload_a, payload_b) and returns the typed verified rows."""
    from ..relops import bucketed_groupby, drop_empty_blocks

    empty_pairs = pa.table(
        {"a": pa.array([], type=id_type), "b": pa.array([], type=id_type)}
    )

    if cand.count() <= broadcast_pair_limit:
        # candidate ids fit comfortably (ids only — never payloads); Ray
        # can emit schema-less empty blocks, so keep non-empty ones only
        pair_blocks = [t for t in ray.get(cand.to_arrow_refs()) if t.num_rows]
        if not pair_blocks:
            return ray.data.from_arrow(out_empty)
        # global distinct: bucketed generators dedup within a bucket only
        pairs = (
            pa.concat_tables([t.select(["a", "b"]) for t in pair_blocks])
            .group_by(["a", "b"])
            .aggregate([])
            .combine_chunks()
        )
        ids = pc.unique(
            pa.chunked_array(
                [pairs.column("a").combine_chunks(), pairs.column("b").combine_chunks()]
            ).combine_chunks()
        )
        ids_ref = ray.put(ids)

        def _select_payloads(batch: pa.Table) -> pa.Table:
            mask = pc.is_in(batch.column(id_col), value_set=ray.get(ids_ref))
            kept = batch.filter(mask)
            return pa.table(
                {id_col: kept.column(id_col), "payload": payload_of(kept)}
            )

        payload_block_refs = texts_ds.map_batches(
            _select_payloads, batch_format="pyarrow", zero_copy_batch=True
        ).to_arrow_refs()
        payloads_ref = _concat_tables_task.remote(*payload_block_refs)

        def _verify_broadcast(batch: pa.Table) -> pa.Table:
            p = ray.get(payloads_ref)
            ta = pa.table({"a": p.column(id_col), "payload_a": p.column("payload")})
            tb = pa.table({"b": p.column(id_col), "payload_b": p.column("payload")})
            joined = batch.join(ta, keys=["a"], join_type="inner")
            joined = joined.join(tb, keys=["b"], join_type="inner")
            return verify_fn(joined)

        cpus = int(ray.cluster_resources().get("CPU", 8))
        chunk = max(256, -(-pairs.num_rows // cpus))
        pair_chunks = [pairs.slice(i, chunk) for i in range(0, pairs.num_rows, chunk)]
        verified = ray.data.from_arrow(pair_chunks).map_batches(
            _verify_broadcast, batch_format="pyarrow", zero_copy_batch=True
        )
        # when EVERY candidate fails the verify, the map emits only 0-row
        # blocks whose schema Ray drops — pin the typed empty; the result
        # is tiny, so materialize for the ref-level strip
        return drop_empty_blocks(verified.materialize(), out_empty)

    # scale path: global distinct of the cross-bucket pair duplicates
    # first (a second bucketed shuffle over id-pair rows only), then
    # distributed payload attach, one crossing per pair side
    cand = bucketed_groupby(
        cand, ["a", "b"],
        lambda g: g.group_by(["a", "b"]).aggregate([]),
        empty=empty_pairs,
    )

    def _keyed(side: str):
        def fn(batch: pa.Table) -> pa.Table:
            return pa.table(
                {side: batch.column(id_col), f"payload_{side}": payload_of(batch)}
            )

        return fn

    payloads_a = texts_ds.map_batches(
        _keyed("a"), batch_format="pyarrow", zero_copy_batch=True
    )
    payloads_b = texts_ds.map_batches(
        _keyed("b"), batch_format="pyarrow", zero_copy_batch=True
    )
    cand = cand.join(payloads_a, "inner", num_partitions=num_partitions, on=("a",))
    # a join emits schema-LESS zero-row blocks for its empty partitions;
    # feeding them into the second join crashes pyarrow ("No match or
    # multiple matches for key field reference") whenever the pair-hash
    # distribution leaves a partition empty — strip at the ref level
    cand = drop_empty_blocks(
        cand,
        pa.table(
            {
                "a": pa.array([], type=id_type),
                "b": pa.array([], type=id_type),
                "payload_a": pa.array([], type=pa.string()),
            }
        ),
    )
    cand = cand.join(payloads_b, "inner", num_partitions=num_partitions, on=("b",))
    verified = cand.map_batches(
        verify_fn, batch_format="pyarrow", zero_copy_batch=True
    )
    return drop_empty_blocks(verified.materialize(), out_empty)


def ngram_jaccard_pairs(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    threshold: float = 0.5,
    n: int = 3,
    num_perm: int = 64,
    bands: int = 32,
    num_partitions: int = 8,
    broadcast_pair_limit: int = 100_000,
) -> ray.data.Dataset:
    """LSH-bucketed candidate generation + exact Jaccard verify, with the
    band explode carrying (band_key, id) ONLY — document bodies never
    enter the band shuffle (with bands=32 that would be 32x the corpus
    text bytes).

    Text attach for the exact verify is size-gated on the candidate-pair
    count: under ``broadcast_pair_limit`` the candidate texts are gathered
    by a shuffle-free ``pc.is_in`` filter over the corpus scan,
    concatenated INSIDE a worker task (the driver never holds texts) and
    read zero-copy from plasma by the verify tasks — no hash-join shuffle
    at all. Above the limit, two distributed ``Dataset.join``s attach the
    texts (each candidate body crosses the wire once per pair side).

    More bands → high recall at moderate thresholds; the exact verify step
    removes false positives, so extra candidates cost compute, not
    correctness.
    """

    def _sig_explode(batch: pa.Table) -> pa.Table:
        return _id_stage_for(id_col, text_col, num_perm, bands)(batch)

    from ..relops import drop_empty_blocks

    id_type = ds.schema().base_schema.field(id_col).type
    texts_ds = ds.select_columns([id_col, text_col])
    exploded = texts_ds.map_batches(
        _sig_explode, batch_format="pyarrow", zero_copy_batch=True
    )
    empty_pairs = pa.table(
        {"a": pa.array([], type=id_type), "b": pa.array([], type=id_type)}
    )
    cand = drop_empty_blocks(
        _bucket_candidate_pairs(exploded, id_col, id_type).materialize(),
        empty_pairs,
    )

    def _verify(batch: pa.Table) -> pa.Table:
        return _verify_pairs_batch(batch, n, threshold)

    return _attach_verify_pairs(
        texts_ds,
        cand,
        id_col,
        id_type,
        payload_of=lambda b: b.column(text_col),
        verify_fn=_verify,
        out_empty=_pairs_empty(id_type),
        broadcast_pair_limit=broadcast_pair_limit,
        num_partitions=num_partitions,
    )


def _word_shingles(text: str, gram: int) -> list[str]:
    words = text.split(" ")
    if len(words) < gram:
        return [text]
    seen: dict[str, None] = {}
    for i in range(len(words) - gram + 1):
        seen[" ".join(words[i : i + gram])] = None
    return list(seen)


def fuzzy_lev_pairs(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    key_len: int = 64,
    max_dist: int = 8,
    gram: int = 5,
    shingle_cap: int = 50,
    broadcast_pair_limit: int = 100_000,
) -> ray.data.Dataset:
    """EDIT-DISTANCE near-dup pairs — the dedup family member for
    "same document, small local edits" (retyped titles, OCR slips,
    template fills) where set-similarity (Jaccard) is the wrong lens.

    Candidate generation is a FREQUENCY-CAPPED inverted shingle index:
    explode each doc to its distinct word ``gram``-grams (docs shorter
    than ``gram`` words contribute their whole text), co-locate each
    shingle's postings with one bucketed shuffle carrying (shingle, id)
    only, DROP shingles whose posting list exceeds ``shingle_cap`` (stop
    shingles — a shingle shared by everything carries no near-dup signal
    but would emit a quadratic pair explosion), and emit the a<b pairs of
    the survivors. Verification computes the EXACT byte-level Levenshtein
    distance (``functions.editdist.levenshtein_batch``, vectorized across
    the pair batch) between the two docs' first ``key_len`` characters
    and keeps pairs at ``distance <= max_dist``.

    The candidate predicate (shared surviving shingle) and the verify
    predicate are both exactly SQL-expressible, so the whole op has a
    full-value DuckDB twin (``queries.FUZZY_LEV_SQL``) — unlike the LSH
    family there is no sampling randomness anywhere. Scale budget: the
    explode ships shingle STRINGS (~6 words) per row; at petabyte scale
    hash them to int64 first (collision odds ~1e-9 per corpus) — kept as
    strings here so the twin needs no hash emulation. Texts never enter
    the shuffle; the verify attach is size-gated on candidate count like
    ``ngram_jaccard_pairs`` (broadcast keys under the limit, distributed
    joins above)."""
    from ..functions.editdist import levenshtein_batch
    from ..relops import bucketed_groupby, drop_empty_blocks

    id_type = ds.schema().base_schema.field(id_col).type
    texts_ds = ds.select_columns([id_col, text_col])

    def _explode(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        out_ids: list = []
        out_sh: list[str] = []
        for i, t in zip(ids, texts):
            sh = _word_shingles(t or "", gram)
            out_sh.extend(sh)
            out_ids.extend([i] * len(sh))
        return pa.table(
            {"sh": pa.array(out_sh, pa.string()), id_col: pa.array(out_ids, id_type)}
        )

    exploded = texts_ds.map_batches(
        _explode, batch_format="pyarrow", zero_copy_batch=True
    )

    empty_pairs = pa.table(
        {"a": pa.array([], type=id_type), "b": pa.array([], type=id_type)}
    )

    def per_bucket(group: pa.Table) -> pa.Table:
        # whole shingle groups land in one bucket: the cap is exact
        counts = group.group_by(["sh"]).aggregate([(id_col, "count")])
        keep = counts.filter(
            pc.less_equal(counts.column(f"{id_col}_count"), shingle_cap)
        ).select(["sh"])
        kept = group.join(keep, keys=["sh"], join_type="inner")
        right = pa.table({"sh": kept.column("sh"), "b": kept.column(id_col)})
        j = kept.join(right, keys=["sh"], join_type="inner")
        p = j.filter(pc.less(j.column(id_col), j.column("b")))
        return pa.table(
            {"a": p.column(id_col), "b": p.column("b")}
        ).group_by(["a", "b"]).aggregate([])

    cand = drop_empty_blocks(
        bucketed_groupby(exploded, ["sh"], per_bucket, empty=empty_pairs).materialize(),
        empty_pairs,
    )

    def _key_of(txt: pa.ChunkedArray | pa.Array) -> pa.Array:
        return pc.utf8_slice_codeunits(txt, 0, key_len)

    def _verify(joined: pa.Table) -> pa.Table:
        d = levenshtein_batch(
            joined.column("payload_a").to_pylist(),
            joined.column("payload_b").to_pylist(),
        )
        keep = d <= max_dist
        return pa.table(
            {
                "a": joined.column("a").filter(pa.array(keep)),
                "b": joined.column("b").filter(pa.array(keep)),
                "lev": pa.array(d[keep], pa.int64()),
            }
        )

    fuzzy_empty = pa.table(
        {
            "a": pa.array([], type=id_type),
            "b": pa.array([], type=id_type),
            "lev": pa.array([], pa.int64()),
        }
    )

    return _attach_verify_pairs(
        texts_ds,
        cand,
        id_col,
        id_type,
        payload_of=lambda b: _key_of(b.column(text_col)),
        verify_fn=_verify,
        out_empty=fuzzy_empty,
        broadcast_pair_limit=broadcast_pair_limit,
        num_partitions=8,
    )


# ---------------------------------------------------------------------------
# Persisted cross-job NEAR-dup index (MinHash band keys)
# ---------------------------------------------------------------------------


def _same_band_pairs(t: pa.Table) -> pa.Table:
    """Distinct unordered id pairs sharing a band key within one table —
    the vectorized Arrow self-join shape proven in
    ``_bucket_candidate_pairs.per_bucket``."""
    left = pa.table({"band_key": t.column("band_key"), "a": t.column("id")})
    right = pa.table({"band_key": t.column("band_key"), "b": t.column("id")})
    j = left.join(right, keys=["band_key"], join_type="inner")
    kept = j.filter(pc.less(j.column("a"), j.column("b")))
    return (
        pa.table({"a": kept.column("a"), "b": kept.column("b")})
        .group_by(["a", "b"])
        .aggregate([])
    )


@ray.remote(num_cpus=0)
class _BandShardActor:
    """One shard of a cluster-wide persisted MinHash BAND index
    (band_key → member ids) — the near-dup analog of
    :class:`_DigestShardActor`, with the same RAM valve: ``max_entries``
    bounds the in-actor entry count; past it, entries flush to
    sub-bucketed parquet RUNS under ``spill_dir`` and steady-state actor
    RAM is one budget's worth regardless of how many billions of
    (band_key, id) rows a 100-TB ingest streams through.

    Unlike the digest index (whose merge must arbitrate keep-min vs
    first-wins), band entries are a pure SET — merge-on-read is a concat,
    and candidate pairs are generated one sub-bucket at a time
    (``candidate_sub_refs``) so the pair-generation peak is
    (total entries / sub_buckets), never the whole shard. The same
    band_key always lands in the same sub (SplitMix-mixed hash of the
    key), so every same-band pair forms inside exactly one sub merge.

    Reference analog: skip-if-exists resume semantics
    (/root/reference/src/pdf-toolkit/page_images.py:740-752) lifted to
    signature granularity — a document's MinHash is computed ONCE, at
    ingest, and every later job probes the persisted bands instead of
    re-signaturing the corpus."""

    def __init__(
        self,
        max_entries: int | None = None,
        spill_dir: str | None = None,
        sub_buckets: int = 8,
        adopt_dir: str | None = None,
    ) -> None:
        import tempfile
        import uuid

        self._keys: list[np.ndarray] = []
        self._ids: list[np.ndarray] = []
        self._live = 0
        self._max = int(max_entries) if max_entries else None
        self._subs = max(1, int(sub_buckets))
        if adopt_dir is not None:
            # reopen a persisted shard (save_neardup_index → a later Ray
            # session's load_neardup_index): existing runs are the state
            import pyarrow.parquet as pq

            self._dir = adopt_dir
            runs = set()
            rows = 0
            if os.path.isdir(adopt_dir):
                for name in os.listdir(adopt_dir):
                    if name.startswith("run") and name.endswith(".parquet"):
                        runs.add(int(name[3:9]))
                        rows += pq.read_metadata(
                            os.path.join(adopt_dir, name)
                        ).num_rows
            self._runs = (max(runs) + 1) if runs else 0
            self._spilled_rows = rows
            return
        base = spill_dir or os.path.join(tempfile.gettempdir(), "pdf_toolkit_ray_spill")
        self._dir = os.path.join(base, uuid.uuid4().hex)
        self._runs = 0
        self._spilled_rows = 0

    def persist(self) -> str:
        """Flush live entries to a run (even under budget) and return the
        shard's on-disk directory — the durable form of the shard."""
        if self._live:
            self._flush()
        os.makedirs(self._dir, exist_ok=True)
        return self._dir

    def _sub_of(self, keys: np.ndarray) -> np.ndarray:
        mixed = keys.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        return ((mixed >> np.uint64(33)) % np.uint64(self._subs)).astype(np.int64)

    def _flush(self) -> None:
        import pyarrow.parquet as pq

        os.makedirs(self._dir, exist_ok=True)
        k = np.concatenate(self._keys)
        i = np.concatenate(self._ids)
        sub = self._sub_of(k)
        for j in range(self._subs):
            mask = sub == j
            if not mask.any():
                continue
            pq.write_table(
                pa.table(
                    {
                        "band_key": pa.array(k[mask], pa.int64()),
                        "id": pa.array(i[mask], pa.int64()),
                    }
                ),
                os.path.join(self._dir, f"run{self._runs:06d}_sub{j:04d}.parquet"),
            )
        self._spilled_rows += self._live
        self._runs += 1
        self._keys, self._ids, self._live = [], [], 0

    def offer(self, band_keys: np.ndarray, ids: np.ndarray) -> int:
        self._keys.append(np.asarray(band_keys, np.int64))
        self._ids.append(np.asarray(ids, np.int64))
        self._live += len(band_keys)
        if self._max is not None and self._live > self._max:
            self._flush()
        return self._live

    def size(self) -> int:
        return self._live + self._spilled_rows

    def spilled_runs(self) -> int:
        return self._runs

    def _merged_sub(self, sub: int) -> pa.Table:
        import pyarrow.parquet as pq

        parts: list[pa.Table] = []
        for r in range(self._runs):
            path = os.path.join(self._dir, f"run{r:06d}_sub{sub:04d}.parquet")
            if os.path.exists(path):
                parts.append(pq.read_table(path))
        if self._live:
            k = np.concatenate(self._keys)
            i = np.concatenate(self._ids)
            mask = self._sub_of(k) == sub
            if mask.any():
                parts.append(
                    pa.table(
                        {
                            "band_key": pa.array(k[mask], pa.int64()),
                            "id": pa.array(i[mask], pa.int64()),
                        }
                    )
                )
        if not parts:
            return pa.table(
                {"band_key": pa.array([], pa.int64()), "id": pa.array([], pa.int64())}
            )
        return pa.concat_tables(parts).combine_chunks()

    def candidate_sub_refs(self) -> list:
        """Distinct same-band id pairs, one OBJECT REF per non-empty
        sub-bucket: the actor holds one merged sub at a time and the
        consumer assembles refs into a Dataset — no whole-shard pair
        table ever exists in actor or driver memory. Cross-shard/sub
        duplicates (a pair sharing bands that hashed apart) survive;
        the caller's size-gated global distinct removes those."""
        out = []
        for j in range(self._subs):
            t = self._merged_sub(j)
            if t.num_rows < 2:
                continue
            pairs = _same_band_pairs(t)
            if pairs.num_rows:
                out.append(ray.put(pairs))
        return out

    def cleanup(self) -> None:
        import shutil

        shutil.rmtree(self._dir, ignore_errors=True)


class NearDupIndex:
    """Handle for a persisted cross-job near-dup index: band shard actors
    plus the MinHash geometry they were built with (probes MUST use the
    same num_perm/bands or band keys won't align — enforced at ingest)."""

    def __init__(self, shards: list, num_perm: int, bands: int):
        self.shards = shards
        self.num_perm = num_perm
        self.bands = bands


def make_neardup_index(
    num_shards: int | None = None,
    *,
    num_perm: int = 64,
    bands: int = 32,
    max_entries_per_shard: int | None = None,
    spill_dir: str | None = None,
) -> NearDupIndex:
    """Create a persistent sharded MinHash band index to pass across
    several :func:`neardup_ingest` calls — incremental / cross-job
    near-dedup, where signatures must be computed once per document EVER
    rather than once per run. ``max_entries_per_shard`` caps each actor's
    RAM exactly as in :func:`make_digest_index`."""
    if num_shards is None:
        num_shards = max(4, int(ray.cluster_resources().get("CPU", 8)) // 2)
    shards = [
        _BandShardActor.remote(max_entries=max_entries_per_shard, spill_dir=spill_dir)
        for _ in range(num_shards)
    ]
    return NearDupIndex(shards, num_perm, bands)


def neardup_ingest(
    ds: ray.data.Dataset,
    index: NearDupIndex,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> int:
    """Ingest a corpus increment into the persisted band index: signature
    + band explode map-side (the only time these texts are ever hashed),
    then (band_key, id) rows — ~16 bytes each, never text — routed to
    shards by band-key hash. Returns the row count ingested. Blocks until
    every offer landed, so a subsequent :func:`neardup_clusters` sees a
    complete index."""
    shards = index.shards
    num_shards = len(shards)
    num_perm, bands = index.num_perm, index.bands

    def route(batch: pa.Table) -> pa.Table:
        exploded = _id_stage_for(id_col, text_col, num_perm, bands)(batch)
        keys = exploded.column("band_key").to_numpy(zero_copy_only=False)
        ids = pc.cast(exploded.column(id_col), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        shard_of = (keys.astype(np.uint64) % np.uint64(num_shards)).astype(np.int64)
        order = np.argsort(shard_of, kind="stable")
        sorted_shards = shard_of[order]
        starts = np.flatnonzero(np.r_[True, sorted_shards[1:] != sorted_shards[:-1]])
        bounds = np.r_[starts, len(order)]
        refs = [
            shards[int(sorted_shards[a])].offer.remote(
                keys[order[a:b]], ids[order[a:b]]
            )
            for a, b in zip(bounds[:-1], bounds[1:])
        ]
        ray.get(refs)  # offers land before this task reports done
        return pa.table({"n": pa.array([batch.num_rows], pa.int64())})

    counts = (
        ds.select_columns([id_col, text_col])
        .map_batches(route, batch_format="pyarrow", zero_copy_batch=True)
        .take_all()
    )
    return sum(int(r["n"]) for r in counts)


def neardup_candidate_pairs(index: NearDupIndex) -> ray.data.Dataset:
    """(a, b) candidate Dataset assembled from per-sub-bucket object refs
    across every shard — possibly with cross-shard duplicates (dedup'd
    downstream by the verify attach)."""
    refs = []
    for s in index.shards:
        refs.extend(ray.get(s.candidate_sub_refs.remote()))
    if not refs:
        return ray.data.from_arrow(
            pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
        )
    return ray.data.from_arrow_refs(refs)


def neardup_clusters(
    index: NearDupIndex,
    corpus: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    threshold: float = 0.8,
    n: int = 3,
    broadcast_pair_limit: int = 100_000,
    num_partitions: int = 8,
    method: str = "auto",
) -> ray.data.Dataset:
    """(id, cluster_id) over ``corpus`` using the PERSISTED index for
    candidate generation — the corpus is scanned only for the exact
    n-gram-Jaccard verify payloads and the final attach, never
    re-signatured. Fed the same corpus the batch path saw, the result is
    row-identical to ``minhash_clusters_documents``'s
    ``ngram_jaccard_pairs`` → components → attach pipeline (same MinHash
    geometry ⇒ same candidate set; same exact verify ⇒ same edges)."""
    id_type = corpus.schema().base_schema.field(id_col).type
    texts_ds = corpus.select_columns([id_col, text_col])
    cand = neardup_candidate_pairs(index)

    def _verify(batch: pa.Table) -> pa.Table:
        return _verify_pairs_batch(batch, n, threshold)

    pairs = _attach_verify_pairs(
        texts_ds,
        cand,
        id_col,
        id_type,
        payload_of=lambda b: b.column(text_col),
        verify_fn=_verify,
        out_empty=_pairs_empty(id_type),
        broadcast_pair_limit=broadcast_pair_limit,
        num_partitions=num_partitions,
    )
    labels = connected_components(pairs, method=method)
    return attach_cluster_ids(corpus, labels, id_col)


def destroy_neardup_index(index: NearDupIndex) -> None:
    """Release spill files and kill the shard actors. Any object refs
    previously returned by :func:`neardup_candidate_pairs` die with the
    actors — materialize results first."""
    ray.get([s.cleanup.remote() for s in index.shards])
    for s in index.shards:
        ray.kill(s)
    index.shards = []


def save_neardup_index(index: NearDupIndex, path: str) -> str:
    """Make the index durable ACROSS Ray sessions: every shard flushes
    its live entries to parquet runs and a JSON manifest records the
    MinHash geometry + shard directories. A later job (new Ray session,
    new driver) reopens it with :func:`load_neardup_index` — signatures
    computed in yesterday's ingest are never recomputed. The actors stay
    alive and usable after saving."""
    import json

    dirs = ray.get([s.persist.remote() for s in index.shards])
    os.makedirs(path, exist_ok=True)
    doc = {
        "num_perm": index.num_perm,
        "bands": index.bands,
        "shard_dirs": dirs,
    }
    tmp = os.path.join(path, f"index.json.tmp.{os.getpid()}")
    with open(tmp, "w") as fh:
        json.dump(doc, fh, indent=1)
    os.replace(tmp, os.path.join(path, "index.json"))
    return path


def load_neardup_index(
    path: str, *, max_entries_per_shard: int | None = None
) -> NearDupIndex:
    """Reopen a :func:`save_neardup_index` directory as live shard actors
    (same shard count and geometry; each actor adopts its persisted runs
    in place, so probes see every entry any earlier session ingested)."""
    import json

    with open(os.path.join(path, "index.json")) as fh:
        doc = json.load(fh)
    shards = [
        _BandShardActor.remote(
            max_entries=max_entries_per_shard, adopt_dir=d
        )
        for d in doc["shard_dirs"]
    ]
    return NearDupIndex(shards, int(doc["num_perm"]), int(doc["bands"]))
