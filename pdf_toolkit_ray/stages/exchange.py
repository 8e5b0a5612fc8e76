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
def _split_block(block: pa.Table, composite_keys: np.ndarray):
    """One extraction block → one sub-table per slot (zero-copy slices)."""
    if block.num_rows == 0 or "part_id" not in block.schema.names:
        # Ray Data synthesizes a schema-less empty block when every row was
        # filtered (e.g. a fully-resumed rerun) — nothing to route.
        empty = block.slice(0, 0)
        return tuple(empty for _ in range(len(composite_keys)))
    part = block.column("part_id").to_numpy(zero_copy_only=False).astype(np.int64)
    salt = block.column("salt").to_numpy(zero_copy_only=False).astype(np.int64)
    comp = (part << _SALT_BITS) | salt
    slot = np.searchsorted(composite_keys, comp)
    order = np.argsort(slot, kind="stable")
    sorted_tbl = block.take(pa.array(order))
    sorted_slot = slot[order]
    bounds = np.searchsorted(sorted_slot, np.arange(len(composite_keys) + 1))
    return tuple(
        sorted_tbl.slice(bounds[s], bounds[s + 1] - bounds[s])
        for s in range(len(composite_keys))
    )


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


def mr_exchange(
    ds: ray.data.Dataset,
    cfg: ExtractConfig,
    heavy: dict[str, int],
    finalize_fn: Callable[[pa.Table], Any],
) -> list[ray.ObjectRef]:
    """Run the exchange; returns one ObjectRef per slot (slot order).

    ``finalize_fn`` runs inside each reduce task: finalize-only
    (returning the finalized Arrow table — consume via
    ``ray.data.from_arrow_refs``) or finalize+atomic-write (returning a
    small metrics dict, or None for empty slots — ``ray.get`` them)."""
    slots = exchange_slots(cfg, heavy)
    composite = np.array([(p << _SALT_BITS) | s for p, s in slots], dtype=np.int64)
    comp_ref = ray.put(composite)
    n_slots = len(slots)

    shard_refs: list[list[ray.ObjectRef]] = [[] for _ in range(n_slots)]
    splitter = _split_block.options(num_returns=n_slots)
    for bundle in ds.iter_internal_ref_bundles():
        for block_ref in bundle.block_refs:
            outs = splitter.remote(block_ref, comp_ref)
            if n_slots == 1:
                outs = [outs]
            for slot_idx, ref in enumerate(outs):
                shard_refs[slot_idx].append(ref)

    return [
        _reduce_slot.remote(finalize_fn, *shard_refs[slot_idx])
        for slot_idx in range(n_slots)
    ]
