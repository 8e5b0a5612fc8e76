"""JSONL source/sink — the interchange format of LLM-corpus tooling.

Wraps Ray Data's native ``read_json`` / ``write_json`` (streaming, one
task per file / per block — no driver materialization) with the two
details the stock calls get wrong for corpus work:

* **Typed reads.** JSON carries no schema; a shard whose sampled rows
  are all-null for a column would otherwise drift the dtype between
  shards. ``read_jsonl`` casts every block to the caller's explicit
  ``schema`` in a ``map_batches`` pass so downstream joins/groupbys see
  ONE schema regardless of shard contents.
* **Resumable sharded writes.** ``write_jsonl`` emits one
  ``part-{i:05d}.jsonl`` per block under a directory (never one giant
  file), so a re-run can skip finished partitions — mirroring the
  parquet partition-manifest convention (state/manifest.py).

Reference parity: the reference toolkit reads its page fixtures from
disk files and writes per-range outputs (`cli.py` read/write paths);
this is the same boundary for JSON-lines corpora.
"""

from __future__ import annotations

import pyarrow as pa

import ray
import ray.data


def read_jsonl(path: str, schema: pa.Schema | None = None) -> ray.data.Dataset:
    """Streaming JSONL read; optional cast of every block to ``schema``
    (column order and types pinned, missing columns filled with typed
    nulls)."""
    ds = ray.data.read_json(path)
    if schema is None:
        return ds

    def _cast(batch: pa.Table) -> pa.Table:
        cols = []
        for field in schema:
            if field.name in batch.column_names:
                cols.append(pa.compute.cast(batch.column(field.name), field.type))
            else:
                cols.append(pa.nulls(batch.num_rows, field.type))
        return pa.table(dict(zip(schema.names, cols)))

    return ds.map_batches(_cast, batch_format="pyarrow", zero_copy_batch=True)


def write_jsonl(ds: ray.data.Dataset, out_dir: str) -> None:
    """Sharded JSONL write: one ``part-*.jsonl`` file per block under
    ``out_dir`` (Ray's native distributed writer — rows never pass
    through the driver)."""
    ds.write_json(out_dir)
