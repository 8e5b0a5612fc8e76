"""Relational operator building blocks over Ray Data, used by the driver
contract (`__ray_entry__.queries`) and reusable as library pieces.

Scale rules encoded here (SURVEY.md §2.4-2.6, ray_guide patterns):

* aggregations pre-combine inside ``map_batches`` (one partial row per
  key per batch) before the small global ``groupby`` — the shuffle moves
  partials, not rows;
* dimension joins broadcast the small side via ``ray.put`` and merge
  per batch — no shuffle;
* top-k keeps per-batch heads before the global sort when a filter
  can't, and otherwise uses ``sort().limit()`` on the reduced set;
* distinct counts use two-level groupbys (exact), never driver sets.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Count, Max, Mean, Min, Sum


_HASH_SHUFFLE_PATCHED = False

#: Ray minor versions on which the hash-shuffle empty-block patch below is
#: REQUIRED and its private attach points are known to exist. On any other
#: version the patch degrades to a loud warning instead of a silent no-op:
#: upstream may have fixed the bug (run
#: ``tests/test_relops.py::test_join_survives_leading_empty_block`` — the
#: deterministic regression — to find out) or merely moved the API.
_HASH_SHUFFLE_PATCH_VERSIONS = ("2.49.",)


class HashShufflePatchError(RuntimeError):
    """The Ray version pins the hash-shuffle empty-block patch but its
    private attach point is missing — refuse to run joins un-patched."""


def _patch_hash_shuffle_empty_block_broadcast() -> None:
    """Work around an order-dependent Ray 2.49 hash-shuffle bug: the
    aggregator-pool schema broadcast rides along with the FIRST shuffle
    task of each input sequence (``should_broadcast_schemas``), but
    ``_shuffle_block`` returns early on zero-row blocks WITHOUT
    disseminating anything. If an upstream ``map_batches`` filter happens
    to emit a 0-row block first, every aggregator builds that side of the
    join schema-less and acero fails with "No match or multiple matches
    for key field reference". Zero-row blocks carry no data, so dropping
    them from the shuffle input driver-side is semantics-preserving and
    lets the first NON-empty block carry the broadcast. (Found by the
    hypothesis layout property suite at tiny scale; at real scale any
    selective filter ahead of a join can emit a leading empty block.
    Deterministic regression:
    ``tests/test_relops.py::test_join_survives_leading_empty_block``.)

    VERSION GUARD: the patch rewrites
    ``ray.data._internal...HashShufflingOperatorBase._do_add_input_inner``
    — a private API. On the pinned Ray versions
    (``_HASH_SHUFFLE_PATCH_VERSIONS``) a missing attach point raises
    :class:`HashShufflePatchError` (something is broken — do not run
    joins silently un-patched); on any other version it warns loudly and
    defers to the regression test, since upstream may have fixed the
    underlying bug."""
    global _HASH_SHUFFLE_PATCHED
    if _HASH_SHUFFLE_PATCHED:
        return
    _HASH_SHUFFLE_PATCHED = True
    pinned = ray.__version__.startswith(_HASH_SHUFFLE_PATCH_VERSIONS)
    try:
        from ray.data._internal.execution.operators.hash_shuffle import (
            HashShufflingOperatorBase,
        )
        from ray.data._internal.execution.interfaces.ref_bundle import RefBundle

        orig = HashShufflingOperatorBase._do_add_input_inner
    except (ImportError, AttributeError) as exc:
        if pinned:
            raise HashShufflePatchError(
                f"Ray {ray.__version__} needs the hash-shuffle empty-block "
                f"patch but its private attach point is gone ({exc!r}); "
                "joins would fail nondeterministically on leading empty "
                "blocks. Re-pin _HASH_SHUFFLE_PATCH_VERSIONS after running "
                "tests/test_relops.py::test_join_survives_leading_empty_block."
            ) from exc
        import warnings

        warnings.warn(
            f"hash-shuffle empty-block patch NOT applied on Ray "
            f"{ray.__version__} (private API moved: {exc!r}). If "
            "tests/test_relops.py::test_join_survives_leading_empty_block "
            "still passes, upstream fixed the bug and this warning can be "
            "retired; if it fails, joins are broken on this Ray version.",
            RuntimeWarning,
            stacklevel=2,
        )
        return

    def _do_add_input_inner(self, input_bundle, input_index):
        kept = [
            (ref, meta)
            for ref, meta in input_bundle.blocks
            if meta.num_rows is None or meta.num_rows > 0
        ]
        if len(kept) == len(input_bundle.blocks):
            return orig(self, input_bundle, input_index)
        if not kept:  # nothing but empties: nothing to shuffle
            return None
        slim = RefBundle(
            tuple(kept),
            owns_blocks=input_bundle.owns_blocks,
            schema=input_bundle.schema,
        )
        return orig(self, slim, input_index)

    HashShufflingOperatorBase._do_add_input_inner = _do_add_input_inner


def ensure_join_tuning() -> None:
    """Cap per-join aggregator CPU reservation on SMALL sessions: Ray's
    hash-join reserves up to half the cluster's CPUs in aggregator actors
    PER JOIN, so a pipeline chaining three Dataset.joins starves its own
    map tasks and hangs at <= 4 CPUs (observed: q5 with customer+lineitem+
    supplier joins). 0.05 CPU/partition keeps every pool schedulable; on
    larger clusters Ray's own budget (<= 50% CPUs) is left untouched."""
    from ray.data import DataContext

    _patch_hash_shuffle_empty_block_broadcast()
    ctx = DataContext.get_current()
    if ctx.join_operator_actor_num_cpus_per_partition_override is not None:
        return
    cpus = int(ray.cluster_resources().get("CPU", 8))
    if cpus <= 8:
        ctx.join_operator_actor_num_cpus_per_partition_override = 0.05


#: scans of tables at or below this on-disk size are materialized into the
#: object store ONCE per Ray session and served from plasma on every later
#: scan — a dimension-table cache.  Ray's ``read_parquet`` pays ~0.4 s of
#: metadata-prefetch/sampling overhead per pipeline EXECUTION regardless of
#: file size; multi-stage queries (curation, near-dedup) scan the same
#: small table 3-6×, so at bench scale that fixed cost dominates wall time.
#: The cached copy is also re-split to ~2 blocks/CPU so downstream
#: compute-heavy stages parallelize even when the file is one row group.
#: Tables above the gate stream from parquet on every execution exactly as
#: before — at 100-TB scale nothing qualifies except true dimension tables,
#: which is the same judgment `BROADCAST_GATE_BYTES` already encodes.
SCAN_CACHE_GATE_BYTES = 64 << 20
SCAN_CACHE_TOTAL_BYTES = 2 << 30
_SCAN_CACHE: dict[tuple, "ray.data.MaterializedDataset"] = {}
_SCAN_CACHE_SESSION: str | None = None
_SCAN_CACHE_SIZE = 0


def _scan_cached(path: str, columns: list[str] | None, st: os.stat_result):
    """Session-scoped materialized scan of one small parquet file."""
    global _SCAN_CACHE_SESSION, _SCAN_CACHE_SIZE
    session = ray.get_runtime_context().get_job_id()
    if session != _SCAN_CACHE_SESSION:
        _SCAN_CACHE.clear()
        _SCAN_CACHE_SESSION = session
        _SCAN_CACHE_SIZE = 0
    key = (path, st.st_mtime_ns, st.st_size, tuple(columns) if columns else None)
    ds = _SCAN_CACHE.get(key)
    if ds is None:
        raw = ray.data.read_parquet(path, columns=columns).materialize()
        # ~256 rows/block up to one block per CPU: enough parallelism for
        # compute-heavy downstream stages without per-task overhead
        # dominating trivial ones (measured sweet spot 16-32 at 32 CPUs)
        cpus = int(ray.cluster_resources().get("CPU", 8))
        blocks = min(cpus, max(1, raw.count() // 256))
        if raw.num_blocks() < blocks:
            raw = raw.repartition(blocks).materialize()
        cached_bytes = raw.size_bytes() or 0
        if _SCAN_CACHE_SIZE + cached_bytes > SCAN_CACHE_TOTAL_BYTES:
            return raw  # budget full: serve this result, don't retain it
        _SCAN_CACHE_SIZE += cached_bytes
        _SCAN_CACHE[key] = ds = raw
    return ds


def scan(sf_dir: str, table: str, columns: list[str] | None = None, filter=None) -> ray.data.Dataset:
    """Column-pruned, predicate-pushed parquet scan of one testdata table.
    Small (dimension-sized) unfiltered scans are served from the session
    scan cache; large or filtered scans stream from parquet."""
    ensure_join_tuning()
    path = os.path.join(sf_dir, f"{table}.parquet")
    if filter is None and ray.is_initialized():
        try:
            st = os.stat(path)
        except OSError:
            st = None
        if st is not None and st.st_size <= SCAN_CACHE_GATE_BYTES:
            return _scan_cached(path, columns, st)
    return ray.data.read_parquet(path, columns=columns, filter=filter)


def scan_path(path: str, columns: list[str] | None = None) -> ray.data.Dataset:
    """:func:`scan` for an arbitrary parquet FILE (the generated fixture
    tables): same session-cache gate. Directories (sharded fixtures) and
    files above the gate stream exactly as ``read_parquet`` would."""
    ensure_join_tuning()
    if ray.is_initialized() and os.path.isfile(path):
        try:
            st = os.stat(path)
        except OSError:
            st = None
        if st is not None and st.st_size <= SCAN_CACHE_GATE_BYTES:
            return _scan_cached(path, columns, st)
    return ray.data.read_parquet(path, columns=columns)


def choose_num_partitions(
    *paths: str, target_bytes: int = 128 << 20, lo: int = 8, hi: int = 1024
) -> int:
    """Join/shuffle partition count derived from input size instead of a
    literal: one partition per ``target_bytes`` of on-disk parquet across
    all participating tables, clamped to [lo, hi]. Compressed parquet
    expands ~3-5x in memory, so 128 MB on disk keeps a partition's working
    set well under a worker's heap at any scale factor."""
    total = 0
    for p in paths:
        if os.path.isdir(p):
            for root, _dirs, files in os.walk(p):
                total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
        elif os.path.exists(p):
            total += os.path.getsize(p)
    return max(lo, min(hi, -(-total // target_bytes)))


def table_path(sf_dir: str, table: str) -> str:
    return os.path.join(sf_dir, f"{table}.parquet")


#: dimension tables at or below this on-disk size may be read on the
#: driver and broadcast (bounded memory: ~64MB compressed ≈ a few hundred
#: MB in flight); above it, callers must hash-join distributed. This is
#: the size-gate pattern (see stages/dedup.py attach_cluster_ids): the
#: engine never ASSUMES a scaling table fits one process — it checks.
BROADCAST_GATE_BYTES = 64 << 20


def small_side(sf_dir: str, table: str, columns: list[str] | None = None):
    """(pa.Table, None) when the table is under the broadcast gate, else
    (None, Dataset) for a distributed join. Decision is by on-disk size —
    no driver read happens unless the gate passes."""
    import pyarrow.parquet as pq

    path = table_path(sf_dir, table)
    if os.path.getsize(path) <= BROADCAST_GATE_BYTES:
        return pq.read_table(path, columns=columns), None
    return None, scan(sf_dir, table, columns=columns)


def choose_num_partitions_for(
    ds: "ray.data.Dataset", target_bytes: int = 128 << 20, lo: int = 8, hi: int = 1024
) -> int:
    """Like :func:`choose_num_partitions` but from a Dataset's estimated
    size (parquet metadata when available). Falls back to the cluster CPU
    count when the size is unknown (e.g. after opaque transforms)."""
    nbytes = None
    try:
        nbytes = ds.size_bytes()
    except Exception:
        pass
    if not nbytes:
        cpus = int(ray.cluster_resources().get("CPU", 8))
        return max(lo, cpus)
    return max(lo, min(hi, -(-nbytes // target_bytes)))


def round_cols(tbl: pa.Table, cols: Sequence[str], ndigits: int = 4) -> pa.Table:
    """Round float columns (DuckDB-identical half-away rounding) so neither
    summation order nor rounding mode can flip the driver's value hash."""
    from .functions.rounding import round_away_arrow

    for col in cols:
        idx = tbl.schema.get_field_index(col)
        tbl = tbl.set_column(
            idx, col, round_away_arrow(pc.cast(tbl.column(col), pa.float64()), ndigits)
        )
    return tbl


def coalesce_partials(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Merge partial-aggregate blocks down to ~one per CPU before a
    sort-groupby: partials are one row per key per input block, so block
    COUNT (per-block shuffle metadata, sampling, merge fan-in), not bytes,
    dominates the downstream all-to-all. Keeping cpu-many blocks preserves
    parallelism at any scale (measured: 2.9 s -> 2.1 s on a 150k-partial
    groupby at 32 cpus)."""
    cpus = int(ray.cluster_resources().get("CPU", 8))
    return ds.repartition(max(8, cpus // 2))


def drop_empty_blocks(ds: ray.data.Dataset, empty: pa.Table) -> ray.data.Dataset:
    """Strip zero-row blocks from a MATERIALIZED dataset at the ref level.

    Ray's hash-join / hash-aggregate emit schema-LESS zero-row blocks for
    empty partitions, and ``map_batches`` UDFs never run on zero-row
    blocks, so no normalization stage can repair them — they survive to a
    downstream ``Dataset.join`` and crash pyarrow with "No match or
    multiple matches for key field reference". Only block METADATA is
    read on the driver; block bytes stay in the object store. ``empty``
    supplies the typed schema when every block turns out empty."""
    refs = []
    for bundle in ds.iter_internal_ref_bundles():
        for block_ref, meta in bundle.blocks:
            if meta.num_rows is None or meta.num_rows:
                refs.append(block_ref)
    if not refs:
        return ray.data.from_arrow(empty)
    return ray.data.from_arrow_refs(refs)


def pre_agg_groupby(
    ds: ray.data.Dataset,
    keys: list[str],
    partial: Callable[[pa.Table], pa.Table],
    final_aggs: list,
) -> ray.data.Dataset:
    """combiner-style aggregate: per-batch partial -> tiny global groupby."""
    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return coalesce_partials(partials).groupby(keys).aggregate(*final_aggs)


# "right" is deliberately absent: a per-batch right-outer join would
# re-emit every unmatched small-side row once PER BATCH (phantom rows);
# swap the sides and use how="left" instead.
_JOIN_TYPE = {"inner": "inner", "left": "left outer"}


def broadcast_join(
    ds: ray.data.Dataset,
    small: "pd.DataFrame | pa.Table",
    on: str | list[str],
    *,
    how: str = "inner",
) -> ray.data.Dataset:
    """Broadcast-hash join: small side shipped once via ray.put as an Arrow
    table, joined per batch with ``pa.Table.join`` (no pandas conversion in
    the hot path). Never shuffles the big side."""
    if how not in _JOIN_TYPE:
        raise ValueError(
            f"broadcast_join supports how in {sorted(_JOIN_TYPE)}; for a "
            "right join, swap the sides and use how='left'"
        )
    if isinstance(small, pd.DataFrame):
        small = pa.Table.from_pandas(small, preserve_index=False)
    keys = [on] if isinstance(on, str) else list(on)
    ref = ray.put(small.combine_chunks())

    # stateless TASKS, not an actor pool: ray.get of a plasma-resident
    # Arrow table is zero-copy shared memory (~µs once local), and tasks
    # hold no persistent CPU reservation — actor pools here deadlocked
    # small sessions when several lookup stages ran in one plan
    def _join(batch: pa.Table) -> pa.Table:
        return batch.join(ray.get(ref), keys=keys, join_type=_JOIN_TYPE[how])

    return ds.map_batches(_join, batch_format="pyarrow", zero_copy_batch=True)


def size_gated_join(
    ds: ray.data.Dataset,
    side: ray.data.Dataset,
    *,
    on: str,
    right_on: str | None = None,
    how: str = "inner",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Attach a NARROW ref-backed ``side`` to ``ds``: while the side's
    measured block bytes are under :data:`BROADCAST_GATE_BYTES` it
    broadcasts once and joins per batch with zero shuffle; above the gate
    a distributed ``Dataset.join`` runs. The gate is on BYTES because a
    flag/blob side's size is not bounded by its row count.

    ``side`` should be ref-backed (e.g. ``bucketed_groupby`` output with
    ``empty=``) so the size probe and the later ref pull reuse the same
    blocks — nothing recomputes. ``right_on`` (if given) is renamed to
    ``on`` for the broadcast path and passed through for the join path.
    ``how`` is "inner" or "left" (big side preserved)."""

    def _block_bytes(b: pa.Table) -> pa.Table:
        return pa.table({"nbytes": pa.array([b.nbytes], pa.int64())})

    probe = side.map_batches(_block_bytes, batch_format="pyarrow").to_pandas()
    # a fully empty side produces NO batches → no "nbytes" column (found by
    # the hypothesis layout property test); treat as 0 bytes → broadcast
    total = int(probe["nbytes"].sum()) if "nbytes" in probe.columns else 0
    if total <= BROADCAST_GATE_BYTES:
        blocks = [t for t in ray.get(side.to_arrow_refs()) if t.num_rows]
        if blocks:
            small = pa.concat_tables(blocks)
        else:
            schema = side.schema()
            schema = getattr(schema, "base_schema", schema)
            small = pa.table({f.name: pa.array([], f.type) for f in schema})
        if right_on and right_on != on:
            small = small.rename_columns(
                [on if c == right_on else c for c in small.column_names]
            )
        return broadcast_join(ds, small, on=on, how=how)
    if num_partitions is None:
        num_partitions = choose_num_partitions_for(ds)
    join_type = {"inner": "inner", "left": "left_outer"}[how]
    return ds.join(
        side, join_type, num_partitions=num_partitions,
        on=(on,), right_on=(right_on or on,),
    )


def semi_join_filter(ds: ray.data.Dataset, key: str, keys) -> ray.data.Dataset:
    """Semi-join by broadcasting the key set and filtering per batch with one
    vectorized ``pc.is_in`` kernel (no per-row Python; ~40x faster than the
    old ``to_pylist`` + ``in`` loop on a 150k-row batch)."""
    if isinstance(keys, pa.ChunkedArray):
        value_set = keys.combine_chunks()
    elif isinstance(keys, pa.Array):
        value_set = keys
    else:
        value_set = pa.array(sorted(keys))
    ref = ray.put(value_set)

    def _semi(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch.column(key), value_set=ray.get(ref))
        return batch.filter(mask)

    return ds.map_batches(_semi, batch_format="pyarrow", zero_copy_batch=True)


def window_topk_per_key(
    ds: ray.data.Dataset,
    key: str,
    sort_cols: list[tuple[str, str]],
    k: int,
    rank_col: str = "rn",
) -> ray.data.Dataset:
    """Group-wise top-k with rank — SQL ``row_number() OVER (PARTITION BY
    key ORDER BY ...) <= k``. Scale shape: a per-batch COMBINER keeps at
    most k rows per key first (the global per-key top-k is contained in
    the union of per-batch top-ks), so the groupby shuffle moves ≤ k rows
    per key per input block, never the full table; the final per-group
    head+rank is vectorized pandas inside each group call, and group
    dispatch parallelizes across the map_groups tasks. ``sort_cols`` must
    be a total order within a key (include a tiebreaker) or the rank is
    nondeterministic."""
    import numpy as np
    import pandas as pd

    by = [c for c, _ in sort_cols]
    asc = [d == "ascending" for _, d in sort_cols]

    def _combine(batch: pa.Table) -> pa.Table:
        # Arrow-native per-batch prune: one multi-key sort, then keep the
        # first k rows of each consecutive key run (cumcount < k) — no
        # Arrow→pandas conversion in the hot combiner.
        if batch.num_rows == 0:
            return batch
        idx = pc.sort_indices(batch, sort_keys=[(key, "ascending"), *sort_cols])
        t = batch.take(idx)
        codes = pc.dictionary_encode(t.column(key).combine_chunks()).indices
        c = codes.to_numpy(zero_copy_only=False).astype(np.float64)
        c = np.where(np.isnan(c), -1.0, c).astype(np.int64)  # null keys = own run
        new = np.empty(len(c), dtype=bool)
        new[0] = True
        new[1:] = c[1:] != c[:-1]
        starts = np.flatnonzero(new)
        run_len = np.diff(np.append(starts, len(c)))
        cum = np.arange(len(c)) - np.repeat(starts, run_len)
        return t.filter(pa.array(cum < k))

    def _final_bucket(group: pa.Table) -> pa.Table:
        # every key in the bucket at once: one sort, grouped head + rank
        df = group.to_pandas().sort_values([key] + by, ascending=[True] + asc)
        out = df.groupby(key, sort=False).head(k).copy()
        out[rank_col] = (out.groupby(key, sort=False).cumcount() + 1).astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    pruned = ds.map_batches(_combine, batch_format="pyarrow", zero_copy_batch=True)
    return bucketed_groupby(pruned, [key], _final_bucket)


def bucketed_groupby(
    ds: ray.data.Dataset,
    keys: list[str],
    per_group: Callable[[pa.Table], pa.Table],
    num_buckets: int | None = None,
    empty: pa.Table | None = None,
) -> ray.data.Dataset:
    """Exact groupby for HIGH-cardinality keys. Ray's sort-based
    ``groupby().aggregate()/map_groups`` pays per-group Python dispatch —
    ~80µs x group count, so 150k orderkeys cost seconds regardless of data
    size (measured: q18's totals groupby 9.5s at sf0.1). This routes the
    shuffle through a LOW-cardinality derived bucket = hash(keys) % B
    (vectorized siphash via pandas), then runs ``per_group`` ONCE per
    bucket where it does the real ``pa.Table.group_by`` vectorized. Every
    key lands wholly in one bucket, so any combiner-closed aggregate is
    exact. B defaults to 4x cluster CPUs: per-bucket working set is
    rows/B — scale B with the cluster, or raise it for skewed giants.
    ``per_group`` receives the bucket's rows (bucket column dropped) and
    must itself group by ``keys``. Pass ``empty`` (a typed zero-row
    table) when the RESULT feeds a ``Dataset.join``/``groupby``/``sort``:
    empty buckets emit schema-less blocks that crash those consumers, and
    ``drop_empty_blocks`` strips them at the ref level."""
    if num_buckets is None:
        num_buckets = 4 * int(ray.cluster_resources().get("CPU", 8))

    # With a typed empty available, route through the dense-int raw-task
    # exchange (result-identical — hypothesis parity property — and 2-4×
    # faster than the sort shuffle; see exchange_groupby). The sort path
    # remains for callers without an empty schema and as an escape hatch.
    if empty is not None and os.environ.get("GRAFT_BUCKETED_SORT") != "1":
        return exchange_groupby(ds, keys, per_group, empty, num_buckets=num_buckets)

    def _tag(batch: pa.Table) -> pa.Table:
        h = np.zeros(batch.num_rows, dtype=np.uint64)
        for k in keys:
            h ^= pd.util.hash_pandas_object(
                batch.column(k).to_pandas(), index=False
            ).to_numpy(dtype=np.uint64)
        return batch.append_column(
            "_bucket", pa.array((h % num_buckets).astype(np.int32))
        )

    def _run(group: pa.Table) -> pa.Table:
        return per_group(group.drop_columns(["_bucket"]))

    tagged = ds.map_batches(_tag, batch_format="pyarrow", zero_copy_batch=True)
    out = tagged.groupby("_bucket").map_groups(_run, batch_format="pyarrow")
    if empty is not None:
        out = drop_empty_blocks(out, empty)
    return out


@ray.remote
def _xgb_split(block: pa.Table, keys: list[str], nb: int):
    """Split one block into per-bucket zero-copy slices (argsort once).
    Bucket = siphash(keys) % nb — identical hashing to bucketed_groupby's
    tag stage, so the two paths co-locate keys identically."""
    if block.num_rows == 0:
        # zero-row blocks can be schema-less (empty map_batches outputs);
        # emit them unchanged — the reduce filters zero-row shards
        return block if nb == 1 else tuple(block for _ in range(nb))
    h = np.zeros(block.num_rows, dtype=np.uint64)
    for k in keys:
        h ^= pd.util.hash_pandas_object(
            block.column(k).to_pandas(), index=False
        ).to_numpy(dtype=np.uint64)
    b = (h % np.uint64(nb)).astype(np.int64)
    order = np.argsort(b, kind="stable")
    sb = b[order]
    tbl = block.take(pa.array(order))
    bounds = np.searchsorted(sb, np.arange(nb + 1))
    slices = tuple(
        tbl.slice(int(bounds[i]), int(bounds[i + 1] - bounds[i])) for i in range(nb)
    )
    # num_returns=1 means ONE return value, not a 1-tuple of values
    return slices[0] if nb == 1 else slices


@ray.remote
def _xgb_reduce(per_group: Callable[[pa.Table], pa.Table], empty: pa.Table, *shards):
    parts = [s for s in shards if s.num_rows]
    if not parts:
        return empty
    return per_group(pa.concat_tables(parts).combine_chunks())


def exchange_groupby(
    ds: ray.data.Dataset,
    keys: list[str],
    per_group: Callable[[pa.Table], pa.Table],
    empty: pa.Table,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """``bucketed_groupby`` semantics over a DENSE-INT hash exchange on
    raw Ray tasks — the generic cousin of the flagship's
    ``stages/exchange.py`` (which measured 103 s → 10 s vs the sort
    shuffle at 8 cpus). ``Dataset.groupby`` pays key sampling, range
    partitioning and merge ordering the bucket key doesn't need; here
    each block splits once (argsort + zero-copy slices,
    ``num_returns=B``) and one reduce task per bucket concatenates its
    shards and runs ``per_group`` vectorized. Same hashing as
    ``bucketed_groupby`` so results are identical. ``empty`` (a typed
    zero-row table) is REQUIRED: empty buckets return it so the
    assembled dataset keeps its schema. Object count is blocks × B —
    keep B ≤ ~1k or interpose the wave merge (exchange.py shows the
    shape)."""
    if num_buckets is None:
        num_buckets = 4 * int(ray.cluster_resources().get("CPU", 8))
    shard_refs: list[list[ray.ObjectRef]] = [[] for _ in range(num_buckets)]
    splitter = _xgb_split.options(num_returns=num_buckets)
    for bundle in ds.iter_internal_ref_bundles():
        for block_ref, meta in bundle.blocks:
            if meta.num_rows == 0:
                continue  # schema-less empties never reach the tasks
            outs = splitter.remote(block_ref, keys, num_buckets)
            if num_buckets == 1:
                outs = [outs]
            for i, ref in enumerate(outs):
                shard_refs[i].append(ref)
    out_refs = [
        _xgb_reduce.remote(per_group, empty, *shard_refs[i])
        for i in range(num_buckets)
    ]
    # identical post-condition to the sort path: empty buckets dropped at
    # the ref level (map_batches UDFs never run on zero-row blocks, so a
    # pass-through empty with the wrong schema would poison consumers);
    # a fully-empty result keeps the typed schema via ``empty``
    return drop_empty_blocks(ray.data.from_arrow_refs(out_refs), empty)


def _sample_split_points(
    ds: ray.data.Dataset,
    col: str,
    num_buckets: int,
    sample_size: int = 4096,
    per_batch: int = 16,
) -> np.ndarray:
    """Range-partitioner split points from a CROSS-BATCH stride sample:
    each batch contributes ≤ ``per_batch`` evenly-spaced values, so the
    driver's ``sample_size × per_batch`` row pull spans ~``sample_size``
    batches instead of the first one or two — when the order column
    correlates with physical layout (ids in write order), a plain
    ``limit(sample_size)`` sample put nearly every row in the LAST
    bucket and the down-sweep degenerated to one giant sort task.
    Residual bias: streaming limit still reads batches in scan order, so
    pathological layouts can still skew BALANCE — never correctness
    (bucketing is searchsorted; every consumer's result is exact for any
    split choice)."""

    def _stride(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n <= per_batch:
            return batch
        idx = np.linspace(0, n - 1, per_batch).astype(np.int64)
        return batch.take(pa.array(idx))

    sample = (
        ds.select_columns([col])
        .map_batches(_stride, batch_format="pyarrow", zero_copy_batch=True)
        .limit(sample_size * per_batch)
        .take_all()
    )
    vals = np.sort(np.array([r[col] for r in sample]))
    if len(vals):
        qs = np.linspace(0, 1, num_buckets + 1)[1:-1]
        return np.unique(np.quantile(vals, qs, method="lower"))
    return vals


def global_row_number(
    ds: ray.data.Dataset,
    value_col: str,
    tiebreak: list[str],
    *,
    descending: bool = False,
    num_buckets: int | None = None,
    sample_size: int = 4096,
    rank_col: str = "row_num",
) -> tuple[ray.data.Dataset, int]:
    """Distributed ``row_number()`` over a TOTAL order — the
    range-partitioned global rank that no single node ever materializes.
    Returns ``(ranked dataset, total row count)``.

    1. SPLITS: a deterministic cross-batch stride sample of
       ``value_col`` (``_sample_split_points``) yields the range
       partitioner's split points. Splits affect BALANCE only, never
       correctness: bucketing is ``searchsorted(splits, value)``, so
       equal values land in one bucket and buckets are contiguous key
       ranges.
    2. HISTOGRAM: a column-pruned pass counts rows per bucket map-side;
       only ``num_buckets`` ints reach the driver.
    3. OFFSETS: driver prefix sums in rank order (reversed for
       ``descending``).
    4. RANK: ONE bucket-keyed shuffle; each bucket sorts locally by the
       full key and adds its offset — 1-based SQL semantics.

    ``tiebreak`` must make the order total (a dup-free key), or ranks
    within equal full keys become layout-dependent. A pathologically hot
    value makes one bucket large — same valve philosophy as
    ``skew_join`` (raise ``num_buckets``, pre-salt upstream)."""
    if num_buckets is None:
        num_buckets = 4 * int(ray.cluster_resources().get("CPU", 8))
    splits = _sample_split_points(ds, value_col, num_buckets, sample_size)

    def _tag(batch: pa.Table) -> pa.Table:
        v = batch.column(value_col).to_numpy(zero_copy_only=False)
        b = np.searchsorted(splits, v, side="right").astype(np.int32)
        return batch.append_column("_rbucket", pa.array(b))

    # histogram over a value-col-only pipeline (the full-width scan runs
    # once, in the rank shuffle below)
    def _cnt(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["_rbucket"]).aggregate([([], "count_all")])
        return pa.table({"_rbucket": g.column("_rbucket"), "n": g.column("count_all")})

    hist = (
        ds.select_columns([value_col])
        .map_batches(_tag, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(_cnt, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_rbucket")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    counts = (
        dict(zip(hist["_rbucket"].astype(int), hist["n"].astype(int)))
        if "_rbucket" in hist.columns else {}
    )
    order = sorted(counts, reverse=descending)
    offsets, acc = {}, 0
    for b in order:
        offsets[b] = acc
        acc += counts[b]
    total = acc

    sort_keys = [(value_col, "descending" if descending else "ascending")] + [
        (t, "ascending") for t in tiebreak
    ]

    def _rank(group: pa.Table) -> pa.Table:
        b = int(group.column("_rbucket")[0].as_py())
        g = group.take(pc.sort_indices(group, sort_keys=sort_keys))
        g = g.drop_columns(["_rbucket"])
        rn = offsets[b] + 1 + np.arange(g.num_rows, dtype=np.int64)
        return g.append_column(rank_col, pa.array(rn, pa.int64()))

    tagged = ds.map_batches(_tag, batch_format="pyarrow", zero_copy_batch=True)
    ranked = tagged.groupby("_rbucket").map_groups(_rank, batch_format="pyarrow")
    return ranked, total


def select_quantiles(
    ds: ray.data.Dataset,
    value_col: str,
    fracs: Sequence[tuple[int, int]],
    *,
    num_buckets: int | None = None,
    sample_size: int = 4096,
    max_fetch_rows: int = 8_000_000,
) -> tuple[list[Any], list[int], int]:
    """EXACT distributed quantiles by rank selection — no global sort.

    ``fracs`` are rational quantiles ``(num, den)``; each resolves to the
    1-based rank ``k = ceil(num*n/den)`` computed in pure integer math
    (``(num*n + den - 1) // den``), so no float ever touches the rank and
    a SQL twin using ``//`` agrees bit-for-bit. Returns
    ``(values, ranks, total)`` with values in ``fracs`` order.

    Scale shape (the Munro-Paterson / quickselect-over-ranges idea):

    1. SPLITS: sampled split points range-partition the value domain
       (balance only — correctness never depends on the sample, same
       contract as ``global_row_number``).
    2. HISTOGRAM: one column-pruned combiner pass; ``num_buckets`` ints
       reach the driver.
    3. LOCATE: driver prefix sums find, for each requested rank, the
       owning bucket and the local index within it.
    4. FETCH: one filtered pass ships ONLY the owning buckets (≤
       len(fracs) buckets, each ~n/num_buckets rows) through a groupby;
       each bucket sorts locally and takes its requested positions.

    RECURSION: a rank-owning bucket bigger than ``max_fetch_rows`` (at
    10^12 rows a bucket is still ~n/num_buckets; a skewed domain can
    concentrate most of the corpus in one) is never fetched whole —
    steps 1-4 re-run over just that bucket's rows with the rank
    re-based locally, shrinking ~num_buckets× per level: log_B(n)
    column-pruned passes, bounded fetch, never a global sort. A bucket
    that stops shrinking (all-equal values defeat the splits) falls
    back to the direct fetch after ``_MAX_SELECT_DEPTH`` levels —
    correctness never depends on the recursion triggering."""
    pruned = ds.select_columns([value_col])
    return _select_ranks(
        pruned,
        value_col,
        fracs=fracs,
        num_buckets=num_buckets,
        sample_size=sample_size,
        max_fetch_rows=max_fetch_rows,
    )


_MAX_SELECT_DEPTH = 8


def _select_ranks(
    pruned: ray.data.Dataset,
    value_col: str,
    *,
    fracs: Sequence[tuple[int, int]] | None = None,
    ranks: list[int] | None = None,
    num_buckets: int | None = None,
    sample_size: int = 4096,
    max_fetch_rows: int = 8_000_000,
    _depth: int = 0,
) -> tuple[list[Any], list[int], int]:
    """Rank-selection engine behind :func:`select_quantiles`: resolves
    either rational ``fracs`` (top level — ranks derive from the total
    this call measures) or explicit 1-based ``ranks`` (recursive calls —
    the parent already re-based them into this bucket)."""
    if num_buckets is None:
        num_buckets = 4 * int(ray.cluster_resources().get("CPU", 8))
    ds = pruned
    splits = _sample_split_points(ds, value_col, num_buckets, sample_size)

    def _tag(batch: pa.Table) -> pa.Table:
        v = batch.column(value_col).to_numpy(zero_copy_only=False)
        b = np.searchsorted(splits, v, side="right").astype(np.int32)
        return batch.append_column("_rbucket", pa.array(b))

    def _cnt(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["_rbucket"]).aggregate([([], "count_all")])
        return pa.table({"_rbucket": g.column("_rbucket"), "n": g.column("count_all")})

    pruned = ds
    hist = (
        pruned.map_batches(_tag, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(_cnt, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_rbucket")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    counts = (
        dict(zip(hist["_rbucket"].astype(int), hist["n"].astype(int)))
        if "_rbucket" in hist.columns else {}
    )
    order = sorted(counts)
    offsets, acc = {}, 0
    for b in order:
        offsets[b] = acc
        acc += counts[b]
    total = acc

    if ranks is None:
        ranks = [(num * total + den - 1) // den for num, den in fracs]
    if total == 0:
        return [], ranks, 0
    if any(r < 1 or r > total for r in ranks):
        raise ValueError(f"rank out of range for n={total}: {ranks}")

    # rank -> (owning bucket, 0-based local index); buckets in ascending
    # value order, so a driver-side walk over the tiny histogram suffices
    need: dict[int, list[tuple[int, int]]] = {}
    for j, r in enumerate(ranks):
        for b in order:
            if offsets[b] < r <= offsets[b] + counts[b]:
                need.setdefault(b, []).append((r - offsets[b] - 1, j))
                break

    # budget split: an owning bucket over max_fetch_rows recurses instead
    # of being shipped whole to one sort task. len(splits) < 2 means the
    # domain stopped splitting (all-equal sample) — recursing can't shrink
    # it, so fetch directly (correct, and all-equal sorts are cheap).
    can_recurse = _depth < _MAX_SELECT_DEPTH and len(splits) >= 1
    small = {
        b: loc
        for b, loc in need.items()
        if counts[b] <= max_fetch_rows or not can_recurse
    }
    big = {b: loc for b, loc in need.items() if b not in small}

    by_j: dict[int, Any] = {}
    if small:
        wanted = pa.array(sorted(small), pa.int32())

        def _pick(group: pa.Table) -> pa.Table:
            b = int(group.column("_rbucket")[0].as_py())
            v = np.sort(group.column(value_col).to_numpy(zero_copy_only=False))
            loc = small[b]
            return pa.table(
                {
                    "_j": pa.array([j for _, j in loc], pa.int64()),
                    "_v": pa.array([v[i] for i, _ in loc]),
                }
            )

        picked = (
            pruned.map_batches(_tag, batch_format="pyarrow", zero_copy_batch=True)
            .map_batches(
                lambda t: t.filter(pc.is_in(t.column("_rbucket"), value_set=wanted)),
                batch_format="pyarrow", zero_copy_batch=True,
            )
            .groupby("_rbucket")
            .map_groups(_pick, batch_format="pyarrow")
            .to_pandas()
        )
        by_j.update(zip(picked["_j"].astype(int), picked["_v"]))

    for b, loc in big.items():
        sub = pruned.map_batches(
            _tag, batch_format="pyarrow", zero_copy_batch=True
        ).map_batches(
            lambda t, b=b: t.filter(
                pc.equal(t.column("_rbucket"), pa.scalar(b, pa.int32()))
            ).drop_columns(["_rbucket"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        sub_vals, _, sub_total = _select_ranks(
            sub,
            value_col,
            ranks=[i + 1 for i, _ in loc],
            num_buckets=num_buckets,
            sample_size=sample_size,
            max_fetch_rows=max_fetch_rows,
            _depth=_depth + 1,
        )
        if sub_total != counts[b]:  # histogram vs recursion disagree
            raise RuntimeError(
                f"select_quantiles recursion drift: bucket {b} counted "
                f"{counts[b]} rows but re-scan saw {sub_total}"
            )
        for v, (_, j) in zip(sub_vals, loc):
            by_j[j] = v

    return [by_j[j] for j in range(len(ranks))], ranks, total


def global_running_max(
    ds: ray.data.Dataset,
    order_col: str,
    value_col: str,
    *,
    out_col: str = "running_max",
    exclusive: bool = True,
    num_buckets: int | None = None,
    sample_size: int = 4096,
) -> ray.data.Dataset:
    """Distributed PREFIX SCAN over a total order: for every row, the
    max of ``value_col`` across all rows with strictly smaller
    ``order_col`` (``exclusive=True``, SQL ``ROWS BETWEEN UNBOUNDED
    PRECEDING AND 1 PRECEDING``; null for the first row) or including
    the row itself (``exclusive=False``). ``order_col`` must be unique
    (a total order) or the exclusive scan is ambiguous.

    The classic two-pass scan, range-partitioned like
    :func:`global_row_number`:

    1. SPLITS: sampled ``order_col`` split points (balance only — equal
       keys co-bucket and buckets are contiguous order ranges).
    2. UP-SWEEP: a column-pruned pass computes each bucket's max;
       ``num_buckets`` scalars reach the driver, which prefix-maxes them
       in bucket order to get each bucket's exclusive CARRY-IN.
    3. DOWN-SWEEP: ONE bucket-keyed shuffle; each bucket sorts by
       ``order_col`` and runs a local ``np.maximum.accumulate`` seeded
       with its carry-in.

    Values must be int64-comparable (ints / timestamps cast upstream)."""
    if num_buckets is None:
        num_buckets = 4 * int(ray.cluster_resources().get("CPU", 8))
    splits = _sample_split_points(ds, order_col, num_buckets, sample_size)

    def _tag(batch: pa.Table) -> pa.Table:
        v = batch.column(order_col).to_numpy(zero_copy_only=False)
        b = np.searchsorted(splits, v, side="right").astype(np.int32)
        return batch.append_column("_rbucket", pa.array(b))

    def _bmax(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "_rbucket": batch.column("_rbucket"),
                "m": pc.cast(batch.column(value_col), pa.int64()),
            }
        )
        g = t.group_by(["_rbucket"]).aggregate([("m", "max")])
        return pa.table({"_rbucket": g.column("_rbucket"), "m": g.column("m_max")})

    hist = (
        ds.select_columns([order_col, value_col])
        .map_batches(_tag, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(_bmax, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_rbucket")
        .aggregate(Max("m", alias_name="m"))
        .to_pandas()
    )
    bmax = (
        dict(zip(hist["_rbucket"].astype(int), hist["m"].astype(np.int64)))
        if "_rbucket" in hist.columns else {}
    )
    carry: dict[int, int | None] = {}
    acc: int | None = None
    for b in sorted(bmax):
        carry[b] = acc
        acc = bmax[b] if acc is None else max(acc, bmax[b])

    def _scan(group: pa.Table) -> pa.Table:
        b = int(group.column("_rbucket")[0].as_py())
        g = group.take(pc.sort_indices(group, sort_keys=[(order_col, "ascending")]))
        v = pc.cast(g.column(value_col), pa.int64()).to_numpy(zero_copy_only=False)
        inc = np.maximum.accumulate(v)
        seed = carry.get(b)
        if exclusive:
            prev = np.empty_like(inc)
            prev[1:] = inc[:-1]
            if seed is None:
                # globally-first row: no preceding row anywhere -> null
                prev[0] = np.iinfo(np.int64).min
                null_mask = np.zeros(len(prev), dtype=bool)
                null_mask[0] = True
                arr = pa.array(prev, pa.int64(), mask=null_mask)
            else:
                prev[0] = seed
                arr = pa.array(np.maximum(prev, seed), pa.int64())
        else:
            out = inc if seed is None else np.maximum(inc, seed)
            arr = pa.array(out, pa.int64())
        g = g.drop_columns(["_rbucket"])
        return g.append_column(out_col, arr)

    tagged = ds.map_batches(_tag, batch_format="pyarrow", zero_copy_batch=True)
    return tagged.groupby("_rbucket").map_groups(_scan, batch_format="pyarrow")


def tree_fold(ds: ray.data.Dataset, combine, fan_in: int = 16) -> pa.Table:
    """Associative fold of a dataset's blocks through a fan-in tree of
    Ray tasks: ``combine(list[pa.Table]) -> pa.Table`` (single row) runs
    at every node, so the driver receives ONE combined table instead of
    one row per block — the reduce for fixed-size partials (sketches,
    Gram matrices, bitmaps) whose block count scales with the corpus."""

    @ray.remote
    def _node(*tables) -> pa.Table:
        return combine([t for t in tables if t.num_rows])

    refs = []
    for bundle in ds.iter_internal_ref_bundles():
        refs.extend(block_ref for block_ref, _ in bundle.blocks)
    if not refs:
        return combine([])
    while len(refs) > fan_in:
        refs = [_node.remote(*refs[i : i + fan_in]) for i in range(0, len(refs), fan_in)]
    return ray.get(_node.remote(*refs))


def bloom_from_dataset(
    ds: ray.data.Dataset, key: str, m_bits: int = 1 << 20, n_hashes: int = 4
):
    """Distributed Bloom-filter build over an int64 key column: one
    fixed-size partial bitmap per batch, OR-merged by a TREE of Ray tasks
    (fan-in 16), so neither the keys nor all partial bitmaps ever gather
    in one process. Returns an object ref to the final bitmap — pass it
    to :func:`bloom_prefilter` to drop probe-side rows BEFORE a join's
    shuffle. False positives only admit extra rows into the (still
    exact) join; nothing that should match is ever dropped."""
    from .stages.sketch import bloom_build

    def partial(batch: pa.Table) -> pa.Table:
        bits = bloom_build(
            batch.column(key).to_numpy(zero_copy_only=False), m_bits, n_hashes
        )
        return pa.table({"bits": pa.array([bits.tobytes()], pa.binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    @ray.remote
    def or_group(*blocks) -> bytes:
        out = None
        for b in blocks:
            if isinstance(b, pa.Table):
                arrs = [np.frombuffer(v.as_py(), dtype=np.uint8) for v in b.column("bits")]
            else:
                arrs = [np.frombuffer(b, dtype=np.uint8)]
            for a in arrs:
                out = a.copy() if out is None else out | a
        return (out if out is not None else np.zeros(m_bits // 8, dtype=np.uint8)).tobytes()

    refs = []
    for bundle in parts.iter_internal_ref_bundles():
        refs.extend(block_ref for block_ref, _ in bundle.blocks)
    if not refs:
        return ray.put(np.zeros(m_bits // 8, dtype=np.uint8).tobytes())
    while len(refs) > 16:
        refs = [or_group.remote(*refs[i : i + 16]) for i in range(0, len(refs), 16)]
    # final fold also normalizes block tables into raw bitmap bytes
    return or_group.remote(*refs)


def bloom_prefilter(
    ds: ray.data.Dataset, key: str, bits_ref, n_hashes: int = 4
) -> ray.data.Dataset:
    """Probe-side pre-filter: keep only rows whose key MIGHT be in the
    Bloom filter (definite misses drop before the join shuffle)."""
    from .stages.sketch import bloom_might_contain

    def _filter(batch: pa.Table) -> pa.Table:
        bits = np.frombuffer(ray.get(bits_ref), dtype=np.uint8)
        keep = bloom_might_contain(
            bits, batch.column(key).to_numpy(zero_copy_only=False), n_hashes
        )
        return batch.filter(pa.array(keep))

    return ds.map_batches(_filter, batch_format="pyarrow", zero_copy_batch=True)


def topk(ds: ray.data.Dataset, sort_cols: list[tuple[str, str]], k: int) -> ray.data.Dataset:
    """Global top-k: per-batch head(k) prune, then exact sort+limit on the
    tiny survivor set (≤ k rows per batch reach the sort)."""

    def _local_head(batch: pa.Table) -> pa.Table:
        idx = pc.sort_indices(batch, sort_keys=sort_cols)
        return batch.take(idx[:k])

    pruned = ds.map_batches(_local_head, batch_format="pyarrow", zero_copy_batch=True)
    keys = [c for c, _ in sort_cols]
    descending = [d == "descending" for _, d in sort_cols]
    return pruned.sort(keys, descending=descending).limit(k)


def distinct_count(
    ds: ray.data.Dataset, group_key: str, distinct_col: str, alias: str
) -> ray.data.Dataset:
    """Exact count-distinct per group in ONE shuffle: per-batch local
    distinct first (the shuffle moves at most one row per batch-local
    distinct pair, not raw rows), then a single ``groupby(group_key).
    map_groups`` that counts unique values per group. Each group's pair
    set is bounded by the true distinct cardinality — the same bound the
    old two-level groupby chain had, minus one whole sort-shuffle."""

    def _local_distinct(batch: pa.Table) -> pa.Table:
        return batch.select([group_key, distinct_col]).group_by(
            [group_key, distinct_col]
        ).aggregate([])

    def _count_unique(group: pa.Table) -> pa.Table:
        vals = group.column(distinct_col)
        n = len(pc.unique(vals.combine_chunks() if isinstance(vals, pa.ChunkedArray) else vals))
        return pa.table(
            {
                group_key: group.column(group_key).slice(0, 1),
                alias: pa.array([n], type=pa.int64()),
            }
        )

    pairs = ds.map_batches(_local_distinct, batch_format="pyarrow", zero_copy_batch=True)
    return pairs.groupby(group_key).map_groups(_count_unique, batch_format="pyarrow")


def asof_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    key: str,
    ts_col: str,
    right_payload: dict[str, str],
) -> ray.data.Dataset:
    """Backward as-of join (DuckDB ``ASOF LEFT JOIN`` semantics): for every
    left row, attach the right row with the greatest ``ts_col`` ≤ the left
    row's, matching on ``key``; unmatched left rows keep nulls.

    Ray Data lacks a co-group primitive, so both sides are tagged, unioned
    and brought together by ONE ``groupby(key)`` shuffle; the per-group
    merge is a sorted ``searchsorted`` (no pairwise product). Partitioning
    assumption: one key's rows fit a worker (salt upstream if a key is
    pathologically hot). ``right_payload`` maps right column → output name.
    """
    left_cols = [c for c in left.schema().base_schema.names]
    r_schema = right.schema().base_schema

    def _tag_left(batch: pa.Table) -> pa.Table:
        out = batch
        for rcol, outname in right_payload.items():
            out = out.append_column(
                outname, pa.nulls(batch.num_rows, type=r_schema.field(rcol).type)
            )
        return out.append_column("_side", pa.array(np.zeros(batch.num_rows, dtype=np.int8)))

    def _tag_right(batch: pa.Table) -> pa.Table:
        cols = {key: batch.column(key), ts_col: batch.column(ts_col)}
        lf_schema = left.schema().base_schema
        for c in left_cols:
            if c not in (key, ts_col):
                cols[c] = pa.nulls(batch.num_rows, type=lf_schema.field(c).type)
        for rcol, outname in right_payload.items():
            cols[outname] = batch.column(rcol)
        cols["_side"] = pa.array(np.ones(batch.num_rows, dtype=np.int8))
        out_names = left_cols + list(right_payload.values()) + ["_side"]
        return pa.table({n: cols[n] for n in out_names})

    tagged = left.map_batches(_tag_left, batch_format="pyarrow", zero_copy_batch=True).union(
        right.map_batches(_tag_right, batch_format="pyarrow", zero_copy_batch=True)
    )

    out_payload = list(right_payload.values())

    def _merge(group: pa.Table) -> pa.Table:
        side = group.column("_side").to_numpy(zero_copy_only=False)
        lefts = group.filter(pa.array(side == 0))
        rights = group.filter(pa.array(side == 1))
        rights = rights.take(pc.sort_indices(rights, sort_keys=[(ts_col, "ascending")]))
        lt = lefts.column(ts_col).to_numpy(zero_copy_only=False)
        rt = rights.column(ts_col).to_numpy(zero_copy_only=False)
        pos = np.searchsorted(rt, lt, side="right") - 1
        valid = pos >= 0
        idx = pa.array(np.where(valid, pos, 0), type=pa.int64())
        valid_arr = pa.array(valid)
        cols = {c: lefts.column(c) for c in left_cols}
        for outname in out_payload:
            col = rights.column(outname)
            col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
            taken = col.take(idx) if rights.num_rows else pa.nulls(len(lt), type=col.type)
            cols[outname] = pc.if_else(valid_arr, taken, pa.nulls(len(lt), type=col.type))
        return pa.table(cols)

    return tagged.groupby(key).map_groups(_merge, batch_format="pyarrow")


def sessionize(
    ds: ray.data.Dataset,
    key: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> ray.data.Dataset:
    """Per-key session count with a fixed inactivity gap — the stream-shaped
    groupby(key).map_groups(sorted window logic) pattern."""
    gap = np.timedelta64(gap_minutes * 60 * 1_000_000, "us")

    def _sessions(group: pa.Table) -> pa.Table:
        ts = np.sort(group.column(ts_col).to_numpy(zero_copy_only=False))
        n_sessions = 0
        if len(ts):
            diffs = np.diff(ts)
            n_sessions = 1 + int((diffs > gap).sum())
        return pa.table(
            {
                key: pa.array([group.column(key)[0].as_py()], type=group.column(key).type),
                "n_sessions": pa.array([n_sessions], type=pa.int64()),
            }
        )

    return ds.select_columns([key, ts_col]).groupby(key).map_groups(
        _sessions, batch_format="pyarrow"
    )

def skew_join(
    big: ray.data.Dataset,
    small: ray.data.Dataset,
    *,
    on: str,
    right_on: str | None = None,
    how: str = "inner",
    num_partitions: int | None = None,
    hot_key_threshold: int | None = None,
    max_hot_keys: int = 4096,
    key_counts: "ray.data.Dataset | None" = None,
) -> ray.data.Dataset:
    """Partitioned hash join HARDENED AGAINST KEY SKEW in ``big``.

    A plain hash join sends every row of a key to ONE partition; a hot
    key (a conversation with 10^8 turns, a null-ish default id) turns
    that partition into the straggler that holds the whole stage. This
    op splits the traffic:

    1. a column-pruned COUNT pre-pass over ``big[on]`` (per-batch
       partial counts → tiny groupby) finds keys whose row count
       exceeds ``hot_key_threshold`` (default: 4× the expected
       rows-per-partition, floored at 10k — i.e. keys that alone would
       make a partition ≥4× average);
    2. HOT rows never shuffle: the hot slice of ``small`` (≤
       ``max_hot_keys`` keys — beyond that the skew needs upstream
       salting and this raises rather than silently OOMing a worker)
       broadcasts once via ``ray.put`` and joins map-side;
    3. COLD rows go through the normal partitioned ``Dataset.join``;
    4. the union of both branches is the result.

    NULL join keys (a skew magnet in real data — every unset id hashes
    to one partition) never reach the shuffle either: they are dropped
    map-side for ``how="inner"`` (SQL semantics: null matches nothing)
    and emitted with typed-null small-side columns for ``how="left"``.

    With no hot keys this degrades to exactly the plain join plus one
    cheap counting pass. ``how`` is "inner" or "left". ``big`` is
    consumed by two branch pipelines — pass a materialized/ref-backed
    dataset if its upstream is expensive to recompute. A caller that
    already holds null-inclusive per-key counts of ``big`` can pass them
    as ``key_counts`` (a Dataset with columns ``[on, "__skew_cnt"]``) to
    skip the pre-pass. The histogram stays distributed — only totals and
    the hot keys themselves reach the driver. ``small`` is materialized
    internally (it is consumed by the row probe, the hot slice, and the
    cold join)."""
    ensure_join_tuning()
    if how not in ("inner", "left"):
        raise ValueError("skew_join supports how='inner'|'left'")
    rkey = right_on or on
    # small is consumed up to three times below (row probe, hot slice,
    # cold join); it is small by definition, so pin its blocks once
    small = small.materialize()

    if key_counts is None:

        def _cnt_partial(batch: pa.Table) -> pa.Table:
            # count_all, NOT (on, "count"): the latter skips nulls, which
            # would hide a null-heavy key from both `total` and the
            # null-branch routing (found by code review + repro)
            g = batch.group_by([on]).aggregate([([], "count_all")])
            return pa.table(
                {on: g.column(on), "__skew_cnt": g.column("count_all")}
            )

        key_counts = pre_agg_groupby(
            big.select_columns([on]),
            [on],
            _cnt_partial,
            [Sum("__skew_cnt", alias_name="__skew_cnt")],
        )
    # the histogram is distinct-key-sized: it stays DISTRIBUTED and only
    # three driver-sized reductions leave it — total rows, null rows, and
    # the (few, by definition) hot keys
    key_counts = key_counts.materialize()

    def _sum_where(mask_fn) -> int:
        def part(batch: pa.Table) -> pa.Table:
            vals = batch.column("__skew_cnt").filter(mask_fn(batch))
            s = pc.sum(vals).as_py() or 0
            return pa.table({"s": pa.array([s], pa.int64())})

        df = key_counts.map_batches(
            part, batch_format="pyarrow", zero_copy_batch=True
        ).to_pandas()
        return int(df["s"].sum()) if "s" in df.columns else 0

    total = _sum_where(lambda b: pc.is_valid(b.column("__skew_cnt")))
    null_cnt = _sum_where(lambda b: pc.is_null(b.column(on)))
    if num_partitions is None:
        num_partitions = choose_num_partitions_for(big)
    if hot_key_threshold is None:
        hot_key_threshold = max(10_000, 4 * total // max(num_partitions, 1))
    # NULL keys never match any key: they get their own map-side branch
    # below (dropped for inner, typed-null-extended for left), so a
    # null-heavy column neither piles into one shuffle partition nor
    # pollutes the hot set
    thresh = hot_key_threshold

    def _hot_part(batch: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.is_valid(batch.column(on)),
            pc.greater(batch.column("__skew_cnt"), thresh),
        )
        return batch.filter(m)

    hot = key_counts.map_batches(
        _hot_part, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    if on not in hot.columns:  # all-empty blocks lose the schema
        hot = pd.DataFrame({on: []})
    if len(hot) > max_hot_keys:
        raise ValueError(
            f"skew_join: {len(hot)} keys exceed hot_key_threshold="
            f"{hot_key_threshold} (max_hot_keys={max_hot_keys}); salt the "
            "key upstream instead of brute-forcing the broadcast"
        )
    join_type = {"inner": "inner", "left": "left_outer"}[how]

    # output contract shared by every path below: big's columns then
    # small's non-key columns (non-key names must be disjoint). The typed
    # empty also repairs Ray's schema-LESS zero-row join blocks (found by
    # the hypothesis layout property suite).
    big_names = list(big.schema().names)
    small_schema = small.schema()
    out_fields = list(zip(big_names, big.schema().types)) + [
        (n, t)
        for n, t in zip(small_schema.names, small_schema.types)
        if n != rkey and n not in big_names
    ]
    expected = [n for n, _ in out_fields]
    try:
        empty_out = pa.schema(out_fields).empty_table()
    except (pa.ArrowInvalid, pa.ArrowTypeError, TypeError):
        empty_out = None  # non-arrow schema (opaque transform): best effort

    def _finish(ds_out: ray.data.Dataset) -> ray.data.Dataset:
        return drop_empty_blocks(ds_out, empty_out) if empty_out is not None else ds_out

    null_fields = [(n, t) for n, t in out_fields if n not in big_names]

    def _append_nulls(batch: pa.Table) -> pa.Table:
        for n, t in null_fields:
            batch = batch.append_column(n, pa.nulls(batch.num_rows, t))
        return batch.select(expected)

    # an EMPTY small side crashes Ray's hash join (schema-less blocks hit
    # acero's key-field resolution); resolve it without joining at all
    if small.count() == 0:
        if how == "inner":
            if empty_out is not None:
                return ray.data.from_arrow(empty_out)
            # opaque schema: an empty null-extended projection of big —
            # joining the empty small side would crash acero
            return big.limit(0).map_batches(
                _append_nulls, batch_format="pyarrow", zero_copy_batch=True
            )
        return big.map_batches(
            _append_nulls, batch_format="pyarrow", zero_copy_batch=True
        )

    def _proj(batch: pa.Table) -> pa.Table:
        return batch.select(expected)

    branches: list[ray.data.Dataset] = []
    big_nn = big
    if null_cnt:
        big_nn = big.map_batches(
            lambda b: b.filter(pc.is_valid(b.column(on))),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        if how == "left":
            branches.append(
                big.map_batches(
                    lambda b: _append_nulls(b.filter(pc.is_null(b.column(on)))),
                    batch_format="pyarrow", zero_copy_batch=True,
                )
            )

    def _union(parts: list[ray.data.Dataset]) -> ray.data.Dataset:
        return parts[0] if len(parts) == 1 else parts[0].union(*parts[1:])

    if len(hot) == 0:
        branches.append(
            big_nn.join(
                small, join_type, num_partitions=num_partitions,
                on=(on,), right_on=(rkey,),
            ).map_batches(_proj, batch_format="pyarrow", zero_copy_batch=True)
        )
        return _finish(_union(branches))

    # rows left for the cold branch, from the histogram we already hold:
    # if EVERY non-null row is hot (tiny thresholds, pathological skew),
    # the cold side is entirely empty and Ray's hash join would feed
    # schema-less zero-row partitions into acero (found by the hypothesis
    # layout property suite) — skip the shuffle branch outright instead
    hot_rows = int(hot["__skew_cnt"].sum()) if "__skew_cnt" in hot.columns else 0
    cold_rows = total - null_cnt - hot_rows

    hot_keys = pa.array(hot[on].to_list())
    hot_ref = ray.put(hot_keys)

    def _is_hot(batch: pa.Table, col: str) -> pa.Array:
        return pc.is_in(batch.column(col), value_set=ray.get(hot_ref))

    # hot slice of the SMALL side: tiny by construction (few hot keys)
    all_blocks = ray.get(
        small.map_batches(
            lambda b: b.filter(_is_hot(b, rkey)),
            batch_format="pyarrow", zero_copy_batch=True,
        ).to_arrow_refs()
    )
    hot_small_blocks = [t for t in all_blocks if t.num_rows]
    if hot_small_blocks:
        hot_small = pa.concat_tables(hot_small_blocks).combine_chunks()
    else:
        # 0-row map_batches blocks still carry their schema; fall back to
        # the dataset schema (names/types) only when there are no blocks
        proto = next((t for t in all_blocks if t.schema.names), None)
        arrow_schema = (
            proto.schema
            if proto is not None
            else pa.schema(zip(small.schema().names, small.schema().types))
        )
        hot_small = arrow_schema.empty_table()
    if rkey != on:
        hot_small = hot_small.rename_columns(
            [on if c == rkey else c for c in hot_small.column_names]
        )

    big_hot = big_nn.map_batches(
        lambda b: b.filter(_is_hot(b, on)),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    big_cold = big_nn.map_batches(
        lambda b: b.filter(pc.invert(_is_hot(b, on))),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    # the two branches come from different join kernels (pa.Table.join vs
    # Ray's hash join) whose output column ORDER differs; union requires
    # one schema, so both project to the shared output contract
    branches.append(
        broadcast_join(big_hot, hot_small, on=on, how=how).map_batches(
            _proj, batch_format="pyarrow", zero_copy_batch=True
        )
    )
    if cold_rows > 0:
        branches.append(
            big_cold.join(
                small, join_type, num_partitions=num_partitions, on=(on,), right_on=(rkey,)
            ).map_batches(_proj, batch_format="pyarrow", zero_copy_batch=True)
        )
    return _finish(_union(branches))


__all__ = [
    "scan", "round_cols", "pre_agg_groupby", "coalesce_partials", "broadcast_join",
    "semi_join_filter", "topk", "distinct_count", "sessionize", "asof_join",
    "bucketed_groupby", "skew_join", "global_row_number",
    "choose_num_partitions", "table_path",
    "Count", "Max", "Mean", "Min", "Sum",
]
