"""The flagship pipeline: transcripts parquet → per-turn extraction →
ordered/deduped conversations → partitioned, manifested output.

Physical plan (SURVEY.md §3.4):

    read_parquet (zero-copy Arrow blocks)
      → [counts pass: column-pruned read → per-batch partial max(turn_idx)
         → tiny groupby → heavy-conv map, broadcast via ray.put]
      → map_batches(AddKeys)            # part_id = crc32(conv_id) % n_parts, salt
      → map_batches(done-filter)        # resume: skip committed partitions
      → map_batches(ExtractBatcher,     # actor pool, warmed parsers
                    batch_format="pyarrow", zero_copy_batch=True)
      → groupby(part_id, salt).map_groups(finalize)   # THE one shuffle
      → per-group atomic partition write + manifest (job mode)

Design notes for 10^12-turn scale:
* the counts pass reads only (conv_id, turn_idx) — column-pruned;
* only conversations above ``salt_threshold`` enter the broadcast heavy
  map, so its size is bounded by the skew, not the conv count;
* one all-to-all exchange total: the (part_id, salt) groupby. Everything
  before it is embarrassingly parallel and operator-fused by Ray;
* groups are bounded by ``salt_width`` turns per heavy conv (memory valve);
* output partitions commit atomically and independently → resume skips
  finished partitions at the read (filter before extraction, so no
  wasted work).
"""

from __future__ import annotations

import os
import time
from typing import Any

import pyarrow as pa

import ray
import ray.data
from ray.data.aggregate import Max

from ..config import ExtractConfig
from ..schema import validate_transcripts_schema
from ..state import manifest as manifest_mod
from ..stages.extract_stage import AddKeys, ExtractBatcher, make_done_filter
from ..stages.finalize import finalize_group, group_metrics


def read_transcripts(input_path: str, columns: list[str] | None = None) -> ray.data.Dataset:
    ds = ray.data.read_parquet(input_path, columns=columns)
    validate_transcripts_schema(ds.schema().base_schema if hasattr(ds.schema(), "base_schema") else ds.schema())
    return ds


def compute_heavy(input_path: str, cfg: ExtractConfig) -> dict[str, int]:
    """{conv_id: n_turns} for convs above the salt threshold.

    Column-pruned read + per-batch partial max (combiner) → small global
    groupby → driver-side dict. At design scale the result is bounded by
    the number of *heavy* keys (the skew tail), not the conv count.
    """

    def partial_max(batch: pa.Table) -> pa.Table:
        return batch.group_by("conv_id").aggregate([("turn_idx", "max")])

    partials = (
        ray.data.read_parquet(input_path, columns=["conv_id", "turn_idx"])
        .map_batches(partial_max, batch_format="pyarrow", zero_copy_batch=True)
    )
    agg = partials.groupby("conv_id").aggregate(Max("turn_idx_max", alias_name="max_turn"))
    heavy: dict[str, int] = {}
    for batch in agg.iter_batches(batch_format="pyarrow"):
        conv = batch.column("conv_id").to_pylist()
        mx = batch.column("max_turn").to_pylist()
        for c, m in zip(conv, mx):
            if m is not None and m + 1 > cfg.salt_threshold:
                heavy[c] = int(m) + 1
    return heavy


def _extracted(ds: ray.data.Dataset, cfg: ExtractConfig, heavy: dict[str, int],
               done: set[tuple[int, int]] | None) -> ray.data.Dataset:
    # `heavy` is bounded by the skew tail (only convs > salt_threshold), so it
    # ships to actors directly in constructor args; genuinely large broadcast
    # sides elsewhere use ray.put + lookup (see stages/ann.py).
    ds = ds.map_batches(
        AddKeys,
        fn_constructor_args=(cfg, heavy),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 8),
    )
    if done:
        ds = ds.map_batches(make_done_filter(done), batch_format="pyarrow", zero_copy_batch=True)
    concurrency = cfg.extract_concurrency
    if concurrency is None:
        cpus = int(ray.cluster_resources().get("CPU", 8))
        concurrency = (1, max(2, cpus))
    return ds.map_batches(
        ExtractBatcher,
        fn_constructor_args=(cfg,),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=cfg.batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def extract_dataset(
    input_path: str, cfg: ExtractConfig | None = None, heavy: dict[str, int] | None = None
) -> ray.data.Dataset:
    """Lazy finalized Dataset (no write) — rows match the oracle per turn."""
    cfg = cfg or ExtractConfig()
    if heavy is None:
        heavy = compute_heavy(input_path, cfg)
    ds = read_transcripts(input_path)
    ds = _extracted(ds, cfg, heavy, done=None)

    def _finalize(tbl: pa.Table) -> pa.Table:
        return finalize_group(tbl, heavy, cfg)

    return ds.groupby(["part_id", "salt"]).map_groups(_finalize, batch_format="pyarrow")


def run_extract_job(
    input_path: str,
    out_dir: str,
    cfg: ExtractConfig | None = None,
    *,
    resume: bool = True,
) -> dict[str, Any]:
    """Run the pipeline to a partitioned, manifested output directory.

    Returns the job summary (also written to ``out/_job_manifest.json``).
    Re-running after a partial failure processes only partitions without
    a valid manifest.
    """
    cfg = cfg or ExtractConfig()
    t_start = time.time()
    os.makedirs(out_dir, exist_ok=True)
    config_hash = cfg.config_hash()
    done = manifest_mod.completed_partitions(out_dir, config_hash) if resume else set()

    heavy = compute_heavy(input_path, cfg)
    ds = read_transcripts(input_path)
    ds = _extracted(ds, cfg, heavy, done=done)

    lineage = {"input": str(input_path), "config_hash": config_hash}

    def _finalize_and_write(tbl: pa.Table) -> pa.Table:
        out = finalize_group(tbl, heavy, cfg)
        if out.num_rows == 0:
            return pa.table({"part_id": pa.array([], pa.int32()),
                             "salt": pa.array([], pa.int32()),
                             "rows": pa.array([], pa.int64())})
        part_id = out.column("part_id")[0].as_py()
        salt = out.column("salt")[0].as_py()
        metrics = group_metrics(out)
        manifest_mod.write_partition(
            out_dir, part_id, salt, out, lineage=lineage, metrics=metrics
        )
        return pa.table(
            {
                "part_id": pa.array([part_id], pa.int32()),
                "salt": pa.array([salt], pa.int32()),
                "rows": pa.array([metrics["rows"]], pa.int64()),
            }
        )

    stats = (
        ds.groupby(["part_id", "salt"])
        .map_groups(_finalize_and_write, batch_format="pyarrow")
        .take_all()  # tiny: one row per partition
    )
    written = {(int(r["part_id"]), int(r["salt"])): int(r["rows"]) for r in stats}
    summary = {
        "input": str(input_path),
        "out_dir": out_dir,
        "config_hash": config_hash,
        "resumed_partitions": sorted(list(done)),
        "written_partitions": len(written),
        "rows_written": int(sum(written.values())),
        "heavy_convs": len(heavy),
        "wall_sec": round(time.time() - t_start, 3),
    }
    manifest_mod.write_job_manifest(out_dir, summary)
    return summary


def read_extracted(out_dir: str) -> ray.data.Dataset:
    """Read a job's committed output back as a Dataset."""
    paths = [
        os.path.join(out_dir, name, "data.parquet")
        for name in sorted(os.listdir(out_dir))
        if name.startswith("part-")
        and manifest_mod.load_manifest(os.path.join(out_dir, name)) is not None
    ]
    return ray.data.read_parquet(paths)
