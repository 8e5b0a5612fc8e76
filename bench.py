"""Benchmark driver.

Headline: the flagship per-turn extraction pipeline (read → sniff/extract
actor pool → salted groupby finalize → partitioned manifested write) over
a ~940k-turn synthetic transcript table (FIXTURES.md "bench" size —
generated once, cached in /tmp). Also times a representative slice of
the relational/training-data operators over ``$GRAFT_SF_DIR``.

Prints ONE JSON line:
  {"metric": "extract_pipeline_sec", "value": <sec>, "unit": "sec",
   "turns": N, "turns_per_sec": T, "queries": {...}, "sf": ..., "num_cpus": N}

``--scaling`` runs the identical job in two fresh processes
(num_cpus=8, then 32) on the same warmed input and reports both
throughputs + efficiency = (thr32/thr8)/4 — the sandbox substitute for
the N vs 4N cluster-size criterion (BASELINE.md).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

# keep the bench tail clean of Ray's harmless per-worker schema-hash-dedup
# WARNING (tools/ray_data_logging.yaml) — must be set BEFORE ray.init so
# worker processes inherit it; respect a user-provided config
os.environ.setdefault(
    "RAY_DATA_LOGGING_CONFIG",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools", "ray_data_logging.yaml"),
)

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
# headline fixture = FIXTURES.md "bench" (~950k turns); --scaling uses the
# 4x "scaling" fixture so fixed session overhead (~6 s) amortizes and the
# measurement approximates the compute-dominated 10^12-turn regime
FIXTURE = os.environ.get("GRAFT_FIXTURE", "bench")
RUN_QUERIES = os.environ.get("GRAFT_RUN_QUERIES", "1") == "1"

BENCH_QUERIES = [
    "q1_pricing_summary",
    "filter_project_revenue",
    "join_orders_customer_top",
    "count_distinct_parts",
    "dedup_exact_documents",
    "quality_documents",
    "minhash_clusters_documents",
    "embedding_topk",
    "q18_large_volume_orders",
    "ttr_documents",
    "dup_span_removal_documents",
    "dsir_weights_documents",
    "curate_documents",
    "semdedup_embeddings",
    "fuzzy_lev_pairs_documents",
    "dedup_conv_exact_transcripts",
    "conv_overlap_pairs_transcripts",
    "sft_spans_transcripts",
    "global_rank_orders",
    "embedding_topk_pq",
    "redact_pii_transcripts",
    "repetition_runs_documents",
    "bm25_topk_documents",
    "tool_latency_transcripts",
    "curate_conversations_transcripts",
    "merge_upsert_orders",
    "cohort_retention_events",
    "selfrep_adjacent_transcripts",
    "running_balance_events",
    "corpus_divergence_documents",
    "incremental_mv_orders",
    "exact_quantiles_lineitem",
    "hard_negatives_embeddings",
    "train_shard_assign_documents",
    "perplexity_buckets_documents",
    "watermark_late_events",
    "dedup_minhash_online_documents",
]


def _consume(result) -> int:
    """Materialize a query result enough to count rows (stream, don't hoard)."""
    import pandas as pd
    import pyarrow as pa

    if isinstance(result, (pd.DataFrame, pa.Table)):
        return len(result)
    total = 0
    for batch in result.iter_batches(batch_format="pyarrow"):
        total += batch.num_rows
    return total


def run_once() -> dict:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=NUM_CPUS,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.use_push_based_shuffle = True  # pipelines shuffle map/reduce: ~15% wall

    from pdf_toolkit_ray.config import ExtractConfig
    from pdf_toolkit_ray.pipelines.extract import run_extract_job
    from pdf_toolkit_ray.sources.fixtures import transcripts_path_for

    # fixture generation + warm read are untimed (measure compute, not cold disk)
    path = transcripts_path_for(FIXTURE)
    warm = ray.data.read_parquet(path).count()

    out_dir = f"/tmp/bench_out_{FIXTURE}_{NUM_CPUS}"
    shutil.rmtree(out_dir, ignore_errors=True)
    # n_parts fixed (not CPU-derived) so the --scaling comparison runs the
    # IDENTICAL job at both parallelism levels
    cfg = ExtractConfig(
        n_parts=128,
        exchange_two_level=True if os.environ.get("GRAFT_TWO_LEVEL") == "1" else None,
    )
    # min-of-k: this host's wall times wobble ±20-25% run-to-run (shared
    # neighbors); the minimum measures the code, not the interference
    reps = int(os.environ.get("GRAFT_HEADLINE_REPS", "3"))
    headline_sec, summary = None, None
    for _ in range(reps):
        shutil.rmtree(out_dir, ignore_errors=True)
        t0 = time.time()
        s = run_extract_job(path, out_dir, cfg, resume=False)
        sec = time.time() - t0
        if headline_sec is None or sec < headline_sec:
            headline_sec, summary = sec, s
    turns = summary["rows_written"]

    from pdf_toolkit_ray.queries import REGISTRY

    query_secs = {}
    q_reps = int(os.environ.get("GRAFT_QUERY_REPS", "2"))
    for name in BENCH_QUERIES if RUN_QUERIES else []:
        fn, _sql = REGISTRY[name]
        best = None
        for _ in range(q_reps):
            t0 = time.time()
            _consume(fn(SF_DIR))
            sec = time.time() - t0
            best = sec if best is None or sec < best else best
        query_secs[name] = round(best, 3)

    result = {
        "metric": "extract_pipeline_sec",
        "value": round(headline_sec, 3),
        "unit": "sec",
        "turns": int(turns),
        "input_rows": int(warm),
        "turns_per_sec": round(turns / headline_sec, 1),
        "phase_sec": summary.get("phase_sec", {}),
        "queries": query_secs,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
    }
    # per-query perf pins (tools/bench_gate.py): flag queries slower than
    # pin * tol so a regression like r4's join_orders_customer_top
    # +15% is caught in the bench output itself, not in a later diff
    try:
        sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools"))
        import bench_gate

        if os.path.exists(bench_gate.PINS_PATH):
            with open(bench_gate.PINS_PATH) as fh:
                pins = json.load(fh)
            rows, regressed = bench_gate.compare(result, pins)
            result["pin_regressions"] = sorted(
                r["query"] for r in rows if r["verdict"] == "SLOW"
            )
            result["pin_ok"] = not regressed
            # 'broad_slowdown' = >=1/3 of pins SLOW at once: the shared
            # host's load-regime signature (everything doubles together),
            # not a per-query code regression — pins are all-time quiet
            # minima, so a loaded run inflates every row uniformly
            result["pin_verdict"] = bench_gate.classify(rows)
    except Exception as exc:  # the gate must never sink the bench itself
        result["pin_error"] = repr(exc)
    ray.shutdown()
    return result


def run_scaling() -> dict:
    """Fresh processes at 8 and 32 CPUs on the same warmed input.

    Each level runs GRAFT_SCALING_REPS times (default 3) and keeps the
    fastest run: single-node wall times here vary ±25% run-to-run
    (shared-host noise), and min-of-k is the standard way to measure the
    machine rather than the interference. Fixture defaults to "scaling2"
    (~15M turns) so per-core work dominates node-fixed costs, like the
    multi-node regime the criterion models.
    """
    fixture = os.environ.get("GRAFT_SCALING_FIXTURE", "scaling2")
    reps = int(os.environ.get("GRAFT_SCALING_REPS", "3"))
    levels = tuple(
        int(x) for x in os.environ.get("GRAFT_SCALING_LEVELS", "8,32").split(",")
    )
    results = {}
    for ncpu in levels:
        best = None
        for _attempt in range(reps):
            # GRAFT_HEADLINE_REPS=1: this loop already takes min-of-reps;
            # the inner headline min-of-k would multiply wall time
            env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_FIXTURE=fixture,
                       GRAFT_RUN_QUERIES="0", GRAFT_HEADLINE_REPS="1")
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env,
                capture_output=True,
                text=True,
                check=True,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            ).stdout
            run = json.loads(out.strip().splitlines()[-1])
            if best is None or run["value"] < best["value"]:
                best = run
        results[ncpu] = best
    lo, hi = levels[0], levels[-1]
    if lo == hi:
        raise SystemExit("GRAFT_SCALING_LEVELS needs two distinct levels")
    thr_lo = results[lo]["turns_per_sec"]
    thr_hi = results[hi]["turns_per_sec"]
    eff = (thr_hi / thr_lo) / (hi / lo)
    summary = {
        "metric": "scaling_efficiency",
        "fixture": fixture,
        "levels": list(levels),
        "value": round(eff, 3),
        "unit": "ratio",
        f"turns_per_sec_{lo}": thr_lo,
        f"turns_per_sec_{hi}": thr_hi,
        f"sec_{lo}": results[lo]["value"],
        f"sec_{hi}": results[hi]["value"],
        f"phase_{lo}": results[lo].get("phase_sec", {}),
        f"phase_{hi}": results[hi].get("phase_sec", {}),
        "turns": results[hi]["turns"],
        "sf": SF_DIR,
    }
    os.makedirs("BENCH", exist_ok=True)
    # session record only — BENCH/BASELINE.md is the hand-maintained
    # POOLED table (min per level across protocol sessions; single-session
    # legs on this host wobble ±25-40%, so one run must never overwrite
    # the pooled history)
    with open("BENCH/scaling_last.json", "w") as fh:
        json.dump(summary, fh, indent=1)
    return summary


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_once()))
