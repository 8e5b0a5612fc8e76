"""Hardware-sharing floor for the 8->32 scaling measurement.

Runs K INDEPENDENT OS processes (no Ray, no object store, no scheduler),
each looping the same pure ``extract_batch`` workload over an identical
in-memory Arrow table, and reports per-process throughput at K=8 vs
K=32. Any per-row slowdown at K=32 is the machine itself — DRAM
bandwidth / allocator / cache sharing across 32 cores — and is therefore
the physical ceiling any engine on this node is subject to, independent
of its distribution machinery:

    ceiling   = (rows/s/proc @32) / (rows/s/proc @8)        (<= 1)
    engine 8->32 efficiency can never exceed `ceiling` on this host.

Usage: python tools/scaling_floor.py [rows_per_proc] -> one JSON line.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

# children import pdf_toolkit_ray; make the repo root importable no matter
# how the script is invoked
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _worker(rows: int, out_q) -> None:
    import pyarrow as pa

    from pdf_toolkit_ray.config import ExtractConfig
    from pdf_toolkit_ray.functions.extract import extract_batch
    from pdf_toolkit_ray.sources.fixtures import generate_transcripts_table

    tbl = generate_transcripts_table("correctness")  # ~8.6k rows, mixed payloads
    cfg = ExtractConfig()
    extract_batch(tbl.slice(0, 512), cfg)  # warm parsers
    done = 0
    t0 = time.time()
    while done < rows:
        n = min(8192, rows - done)
        extract_batch(tbl.slice(done % (tbl.num_rows - n), n), cfg)
        done += n
    out_q.put((done, time.time() - t0))


def measure(k: int, rows_per_proc: int) -> dict:
    q: mp.Queue = mp.Queue()
    procs = [mp.Process(target=_worker, args=(rows_per_proc, q)) for _ in range(k)]
    t0 = time.time()
    for p in procs:
        p.start()
    results = [q.get() for _ in procs]
    for p in procs:
        p.join()
    wall = time.time() - t0
    total_rows = sum(r for r, _ in results)
    per_proc = [r / t for r, t in results]
    return {
        "k": k,
        "wall_sec": round(wall, 2),
        "rows_per_sec_total": round(total_rows / wall, 1),
        "rows_per_sec_per_proc_mean": round(sum(per_proc) / len(per_proc), 1),
    }


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 120_000
    r8 = measure(8, rows)
    r32 = measure(32, rows)
    ceiling = (r32["rows_per_sec_total"] / r8["rows_per_sec_total"]) / 4.0
    print(json.dumps({
        "metric": "hardware_scaling_floor",
        "k8": r8,
        "k32": r32,
        "ceiling_8_to_32": round(ceiling, 3),
        "note": "no Ray involved: pure processes on one node; the engine's "
                "measured 8->32 efficiency divided by this ceiling is the "
                "engine's own (distribution-machinery) efficiency",
    }))


if __name__ == "__main__":
    main()
