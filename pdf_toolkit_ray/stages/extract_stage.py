"""The extraction stages.

``ExtractBatcher`` is the heavy per-record transform (analog of the
reference's page render loop, ``src/pdf-toolkit/render.py:112-152``),
run as a Ray Data **actor pool**: construction happens once per actor
(T1 in SURVEY.md §2.3 — warmed parser tables / compiled regexes live at
module scope and in the config object), ``__call__`` runs per batch on
zero-copy Arrow tables.

``add_keys_fn`` / ``make_done_filter`` are cheap stateless task maps
(keys + resume skip) that Ray fuses with the read.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from ..config import ExtractConfig
from ..functions.extract import extract_batch
from ..functions.keys import conv_keys_arrays


def _resolve(maybe_ref):
    if isinstance(maybe_ref, ray.ObjectRef):
        return ray.get(maybe_ref)
    return maybe_ref


def add_keys_batch(batch: pa.Table, cfg: ExtractConfig, heavy: dict[str, int]) -> pa.Table:
    """Append (part_id, salt) shuffle keys — crc32(conv_id) % n_parts with
    salted splits for heavy conversations (SURVEY.md §4.3.1-2)."""
    turn = batch.column("turn_idx").to_numpy(zero_copy_only=False).astype(np.int64)
    part, salts = conv_keys_arrays(batch.column("conv_id"), turn, heavy, cfg)
    batch = batch.append_column("part_id", pa.array(part, type=pa.int32()))
    return batch.append_column("salt", pa.array(salts, type=pa.int32()))



def make_done_filter(done: set[tuple[int, int]]):
    """Resume filter: drop rows whose (part_id, salt) partition already has a
    valid manifest — the distributed analog of the reference's
    skip-if-output-exists rerun semantics (page_images.py:740-752)."""

    done_arr = np.array(sorted(done), dtype=np.int64) if done else np.empty((0, 2), dtype=np.int64)
    done_keys = set(map(tuple, done_arr.tolist()))

    def _filter(batch: pa.Table) -> pa.Table:
        part = batch.column("part_id").to_numpy(zero_copy_only=False)
        salt = batch.column("salt").to_numpy(zero_copy_only=False)
        keep = np.fromiter(
            ((int(p), int(s)) not in done_keys for p, s in zip(part, salt)),
            dtype=bool,
            count=len(part),
        )
        return batch.filter(pa.array(keep))

    return _filter


class ExtractBatcher:
    """Stateful extraction actor: one construction per actor, Arrow in/out.

    Also appends the (part_id, salt) shuffle keys unless the batch already
    carries them (the resume path adds keys earlier so the done-filter can
    skip committed partitions before any extraction work). Key computation
    lives in the pool rather than on the read tasks: the scan must stay a
    thin feeder, or the actor pool starves (measured 55% actor utilization
    with keys on the read path at 32 CPUs).
    """

    def __init__(self, cfg: ExtractConfig, heavy: dict[str, int] | None = None) -> None:
        self.cfg = cfg
        self.heavy = _resolve(heavy) or {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        if "part_id" not in batch.schema.names:
            batch = add_keys_batch(batch, self.cfg, self.heavy)
        return extract_batch(batch, self.cfg)
