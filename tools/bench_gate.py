"""Per-query perf regression gate.

Compares a bench result (the ONE-JSON-line output of ``bench.py``, or a
recorded ``BENCH_r{N}.json`` whose payload sits in ``tail``/top-level)
against the pinned sf0.1 times in ``BENCH/PINS.json`` and prints a delta
report. Exit 1 when any pinned query runs slower than ``pin * tol``.

Pins are MIN-of-history (the code's speed, not the host's mood): this
host's wall times wobble ±25% run-to-run, so the default tolerance is
1.6x (two 25% inflations compounded, with margin). A query consistently
FASTER than ``pin / tol`` prints a re-pin hint; ``--update`` ratchets
pins down to the new minima and adds pins for new queries (never raises
an existing pin — raising requires editing PINS.json by hand with a
justification line in BENCH/BASELINE.md).

Usage:
    python tools/bench_gate.py <bench.json>            # report + exit code
    python tools/bench_gate.py <bench.json> --update   # ratchet pins
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PINS_PATH = os.path.join(REPO, "BENCH", "PINS.json")
DEFAULT_TOL = 1.6
HEADLINE_KEY = "__headline_extract_sec__"


def load_bench(path: str) -> dict:
    """Accept either bench.py's raw JSON line or a driver BENCH_r{N}.json
    wrapper (whose stdout tail holds the JSON line)."""
    with open(path) as fh:
        doc = json.load(fh)
    if "queries" in doc and "value" in doc:
        return doc
    tail = doc.get("tail", "")
    for line in reversed(tail.strip().splitlines()):
        line = line.strip()
        if line.startswith("{") and '"queries"' in line:
            return json.loads(line)
    raise SystemExit(f"{path}: no bench JSON payload found")


#: when at least this fraction of pinned queries flag SLOW at once, the
#: signature is a host-load regime (this shared host's wall times double
#: under co-tenant bursts), not a per-query code regression — a real code
#: regression almost never slows EVERYTHING uniformly. The gate still
#: lists every flagged query; it just says which failure mode it sees.
BROAD_SLOWDOWN_FRAC = 1 / 3


def classify(rows: list[dict]) -> str:
    """'ok' | 'regression' (isolated SLOW rows) | 'broad_slowdown'
    (host-load signature: ≥ BROAD_SLOWDOWN_FRAC of pins SLOW at once)."""
    pinned = [r for r in rows if r["pin"] is not None and r["now"] is not None]
    slow = [r for r in pinned if r["verdict"] == "SLOW"]
    if not slow:
        return "ok"
    if len(slow) >= max(2, int(len(pinned) * BROAD_SLOWDOWN_FRAC)):
        return "broad_slowdown"
    return "regression"


def compare(bench: dict, pins: dict) -> tuple[list[dict], bool]:
    rows, regressed = [], False
    now_by_q = dict(bench.get("queries", {}))
    now_by_q[HEADLINE_KEY] = bench.get("value")
    for name, pin in sorted(pins.items()):
        now = now_by_q.get(name)
        if now is None:
            rows.append({"query": name, "pin": pin["sec"], "now": None,
                         "ratio": None, "verdict": "missing"})
            continue
        tol = pin.get("tol", DEFAULT_TOL)
        ratio = now / pin["sec"] if pin["sec"] else float("inf")
        if ratio > tol:
            verdict = "SLOW"
            regressed = True
        elif ratio < 1.0 / tol:
            verdict = "fast (re-pin?)"
        else:
            verdict = "ok"
        rows.append({"query": name, "pin": pin["sec"], "now": now,
                     "ratio": round(ratio, 2), "verdict": verdict})
    for name, now in sorted(now_by_q.items()):
        if name not in pins and now is not None:
            rows.append({"query": name, "pin": None, "now": now,
                         "ratio": None, "verdict": "unpinned"})
    return rows, regressed


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    update = "--update" in sys.argv
    if not args:
        print(__doc__)
        return 2
    bench = load_bench(args[0])
    pins = {}
    if os.path.exists(PINS_PATH):
        with open(PINS_PATH) as fh:
            pins = json.load(fh)
    rows, regressed = compare(bench, pins)
    w = max((len(r["query"]) for r in rows), default=10)
    print(f"{'query':<{w}}  {'pin':>7}  {'now':>7}  {'ratio':>6}  verdict")
    for r in rows:
        pin = f"{r['pin']:.3f}" if r["pin"] is not None else "-"
        now = f"{r['now']:.3f}" if r["now"] is not None else "-"
        ratio = f"{r['ratio']:.2f}" if r["ratio"] is not None else "-"
        print(f"{r['query']:<{w}}  {pin:>7}  {now:>7}  {ratio:>6}  {r['verdict']}")
    if update:
        now_by_q = dict(bench.get("queries", {}))
        now_by_q[HEADLINE_KEY] = bench.get("value")
        for name, now in now_by_q.items():
            if now is None:
                continue
            if name in pins:
                pins[name]["sec"] = min(pins[name]["sec"], now)
            else:
                pins[name] = {"sec": now, "tol": DEFAULT_TOL}
        os.makedirs(os.path.dirname(PINS_PATH), exist_ok=True)
        with open(PINS_PATH, "w") as fh:
            json.dump(pins, fh, indent=1, sort_keys=True)
        print(f"pins ratcheted -> {PINS_PATH}")
    if regressed:
        print("REGRESSION: at least one query exceeded pin * tol", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
