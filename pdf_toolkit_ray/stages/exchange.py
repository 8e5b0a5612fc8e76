"""Hash exchange for the finalize stage, built on Ray core tasks.

Why not ``Dataset.groupby`` here: our shuffle key is already a dense
integer partition id, so the general sort-based shuffle pays for key
sampling, range partitioning and merge ordering it doesn't need — and
under CPU starvation it degrades badly (measured on 7.6M turns:
groupby-sort finalize 103 s at 8 CPUs vs 10 s for this exchange; whole
job 46.5 s → 28.9 s at 32 CPUs). Ray Data's HASH_SHUFFLE strategy
deadlocks its aggregator actors on small CPU counts in ray 2.49.

Shape (classic two-phase MR shuffle, driver-orchestrated):

* the slot space is STATIC and known up front: one slot per
  ``(part_id, salt)`` — parts 0..n_parts-1 at salt 0, plus the salt
  chunks of each heavy conversation (the heavy map from the counts pass
  enumerates them). The salt memory valve is preserved: no reduce task
  ever sees more than ``salt_width`` turns of one conversation.
* map: each extraction output block is split into per-slot sub-tables
  (one ``argsort`` + zero-copy slices) returned as separate objects
  (``num_returns=n_slots``);
* reduce: one task per slot gathers its shards, concatenates, runs the
  per-group finalize (stable order, dedup, cross-turn columns) and
  optionally commits the partition atomically.

Blocks stream into split tasks as extraction produces them
(``iter_internal_ref_bundles``), so map-side work overlaps extraction;
the reduce barrier is inherent to the exchange (same as any shuffle).

Scale notes (10^12 turns): shard-object count is B×S (blocks × slots).
Keep S moderate (≤ ~1k) and blocks ~96 MB; beyond that, interpose a
two-level merge (split to √S buckets, sub-split in the reducers) — the
task graph composes the same way. Reducer arg lists are bounded by B;
at extreme B pre-merge shards per slot in waves.
"""

from __future__ import annotations

from typing import Any, Callable

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ..config import ExtractConfig
from ..functions.keys import part_of

_SALT_BITS = 20  # composite key = part_id << SALT_BITS | salt


def exchange_slots(cfg: ExtractConfig, heavy: dict[str, int]) -> list[tuple[int, int]]:
    """Static (part_id, salt) slot list covering every possible key."""
    slots = {(p, 0) for p in range(cfg.n_parts)}
    for conv, n_turns in heavy.items():
        part = part_of(conv, cfg.n_parts)
        for salt in range((max(0, n_turns - 1) // cfg.salt_width) + 1):
            slots.add((part, salt))
    return sorted(slots)


@ray.remote
def _split_block(block: pa.Table, composite_keys: np.ndarray, map_hook=None):
    """One extraction block → one sub-table per slot (zero-copy slices).

    ``map_hook`` is the chaos-testing hook (see :func:`mr_exchange`):
    called before any work, so a hook that SIGKILLs its own worker
    simulates a node loss mid-shuffle and exercises Ray's task retry +
    lineage reconstruction through this exact topology."""
    if map_hook is not None:
        map_hook()
    n_slots = len(composite_keys)
    if block.num_rows == 0 or "part_id" not in block.schema.names:
        # Ray Data synthesizes a schema-less empty block when every row was
        # filtered (e.g. a fully-resumed rerun) — nothing to route.
        empty = block.slice(0, 0)
        return tuple(empty for _ in range(n_slots)) if n_slots > 1 else empty
    part = block.column("part_id").to_numpy(zero_copy_only=False).astype(np.int64)
    salt = block.column("salt").to_numpy(zero_copy_only=False).astype(np.int64)
    comp = (part << _SALT_BITS) | salt
    slot = np.searchsorted(composite_keys, comp)
    order = np.argsort(slot, kind="stable")
    sorted_tbl = block.take(pa.array(order))
    sorted_slot = slot[order]
    bounds = np.searchsorted(sorted_slot, np.arange(n_slots + 1))
    out = tuple(
        sorted_tbl.slice(bounds[s], bounds[s + 1] - bounds[s])
        for s in range(n_slots)
    )
    # with num_returns=1 Ray treats a 1-tuple as THE value — unwrap
    return out if n_slots > 1 else out[0]


@ray.remote
def _reduce_slot(finalize_fn, *shards):
    from ..schema import EXTRACTED_WITH_KEYS_SCHEMA

    valid = [s for s in shards if s.num_rows and "part_id" in s.schema.names]
    if valid:
        return finalize_fn(pa.concat_tables(valid))
    # empty slot (or fully-filtered rerun where no block carried keys):
    # finalize the canonical empty pre-finalize table so Dataset consumers
    # still see a stable schema
    return finalize_fn(EXTRACTED_WITH_KEYS_SCHEMA.empty_table())


@ray.remote
def _split_block_groups(
    block: pa.Table, composite_keys: np.ndarray, group_bounds: np.ndarray, map_hook=None
):
    """One extraction block → one sub-table per slot GROUP (coarse level-1
    routing; the per-slot split happens in the level-2 merge task)."""
    if map_hook is not None:
        map_hook()
    n_groups = len(group_bounds) - 1
    if block.num_rows == 0 or "part_id" not in block.schema.names:
        empty = block.slice(0, 0)
        return tuple(empty for _ in range(n_groups)) if n_groups > 1 else empty
    part = block.column("part_id").to_numpy(zero_copy_only=False).astype(np.int64)
    salt = block.column("salt").to_numpy(zero_copy_only=False).astype(np.int64)
    comp = (part << _SALT_BITS) | salt
    slot = np.searchsorted(composite_keys, comp)
    order = np.argsort(slot, kind="stable")
    sorted_tbl = block.take(pa.array(order))
    sorted_slot = slot[order]
    bounds = np.searchsorted(sorted_slot, group_bounds)
    out = tuple(
        sorted_tbl.slice(bounds[g], bounds[g + 1] - bounds[g])
        for g in range(n_groups)
    )
    # with num_returns=1 Ray treats a 1-tuple as THE value — unwrap
    return out if n_groups > 1 else out[0]


@ray.remote
def _subsplit_group(group_keys: np.ndarray, *shards: pa.Table):
    """Level-2: concat one WAVE of a group's shards, split per slot."""
    n_slots = len(group_keys)
    valid = [s for s in shards if s.num_rows and "part_id" in s.schema.names]
    if not valid:
        from ..schema import EXTRACTED_WITH_KEYS_SCHEMA

        empty = EXTRACTED_WITH_KEYS_SCHEMA.empty_table()
        return tuple(empty for _ in range(n_slots)) if n_slots > 1 else empty
    tbl = pa.concat_tables(valid)
    part = tbl.column("part_id").to_numpy(zero_copy_only=False).astype(np.int64)
    salt = tbl.column("salt").to_numpy(zero_copy_only=False).astype(np.int64)
    comp = (part << _SALT_BITS) | salt
    slot = np.searchsorted(group_keys, comp)
    order = np.argsort(slot, kind="stable")
    sorted_tbl = tbl.take(pa.array(order))
    sorted_slot = slot[order]
    bounds = np.searchsorted(sorted_slot, np.arange(n_slots + 1))
    out = tuple(
        sorted_tbl.slice(bounds[s], bounds[s + 1] - bounds[s]) for s in range(n_slots)
    )
    return out if n_slots > 1 else out[0]


def mr_exchange(
    ds: ray.data.Dataset,
    cfg: ExtractConfig,
    heavy: dict[str, int],
    finalize_fn: Callable[[pa.Table], Any],
    est_blocks: int | None = None,
    map_hook: Callable[[], None] | None = None,
) -> list[ray.ObjectRef]:
    """Run the exchange; returns one ObjectRef per slot (slot order).

    ``map_hook`` (chaos testing): a callable executed at the START of
    every map-split task — a kill-once hook (SIGKILL own worker on first
    invocation) injects a mid-shuffle worker loss; Ray's task retry and
    lineage reconstruction must converge the exchange regardless.
    ``finalize_fn`` plays the same role for the reduce side.

    ``finalize_fn`` runs inside each reduce task: finalize-only
    (returning the finalized Arrow table — consume via
    ``ray.data.from_arrow_refs``) or finalize+atomic-write (returning a
    small metrics dict, or None for empty slots — ``ray.get`` them).

    Topology is chosen per job: the single-level exchange creates B×S
    shard objects (fine while S is moderate); when B×S would explode
    (``cfg.exchange_two_level`` True, or auto at S > 1024), a two-level
    exchange routes each block to √S slot GROUPS and merges each group's
    shards in bounded WAVES of ``cfg.exchange_wave`` blocks, so object
    count is B·√S + (B/W)·S and no driver list or reduce arg list grows
    with B×S."""
    slots = exchange_slots(cfg, heavy)
    composite = np.array([(p << _SALT_BITS) | s for p, s in slots], dtype=np.int64)
    n_slots = len(slots)
    two_level = cfg.exchange_two_level
    if two_level is None:
        # auto: engage whenever the single-level shard-object count B×S
        # would explode — by slot count alone, or by the caller's block
        # estimate against cfg.exchange_max_objects
        projected = (est_blocks or 0) * n_slots
        two_level = n_slots > 1024 or projected > cfg.exchange_max_objects

    if not two_level:
        comp_ref = ray.put(composite)
        shard_refs: list[list[ray.ObjectRef]] = [[] for _ in range(n_slots)]
        splitter = _split_block.options(num_returns=n_slots)
        for bundle in ds.iter_internal_ref_bundles():
            for block_ref in bundle.block_refs:
                outs = splitter.remote(block_ref, comp_ref, map_hook)
                if n_slots == 1:
                    outs = [outs]
                for slot_idx, ref in enumerate(outs):
                    shard_refs[slot_idx].append(ref)
        return [
            _reduce_slot.remote(finalize_fn, *shard_refs[slot_idx])
            for slot_idx in range(n_slots)
        ]

    # --- two-level path ---
    n_groups = max(1, int(np.ceil(np.sqrt(n_slots))))
    per_group = int(np.ceil(n_slots / n_groups))
    group_bounds = np.minimum(np.arange(n_groups + 1) * per_group, n_slots)
    comp_ref = ray.put(composite)
    bounds_ref = ray.put(group_bounds)
    group_key_refs = [
        ray.put(composite[group_bounds[g] : group_bounds[g + 1]])
        for g in range(n_groups)
    ]
    group_sizes = [int(group_bounds[g + 1] - group_bounds[g]) for g in range(n_groups)]

    slot_shards: list[list[ray.ObjectRef]] = [[] for _ in range(n_slots)]
    pending: list[list[ray.ObjectRef]] = [[] for _ in range(n_groups)]

    def _flush(g: int) -> None:
        if not pending[g]:
            return
        outs = _subsplit_group.options(num_returns=group_sizes[g]).remote(
            group_key_refs[g], *pending[g]
        )
        pending[g] = []
        if group_sizes[g] == 1:
            outs = [outs]
        base = int(group_bounds[g])
        for local_idx, ref in enumerate(outs):
            slot_shards[base + local_idx].append(ref)

    splitter = _split_block_groups.options(num_returns=n_groups)
    for bundle in ds.iter_internal_ref_bundles():
        for block_ref in bundle.block_refs:
            outs = splitter.remote(block_ref, comp_ref, bounds_ref, map_hook)
            if n_groups == 1:
                outs = [outs]
            for g, ref in enumerate(outs):
                pending[g].append(ref)
                if len(pending[g]) >= cfg.exchange_wave:
                    _flush(g)
    for g in range(n_groups):
        _flush(g)

    return [
        _reduce_slot.remote(finalize_fn, *slot_shards[slot_idx])
        for slot_idx in range(n_slots)
    ]
