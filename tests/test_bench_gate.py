"""Unit tests for the per-query perf pin gate (tools/bench_gate.py)."""

import importlib.util
import os

_spec = importlib.util.spec_from_file_location(
    "bench_gate",
    os.path.join(os.path.dirname(__file__), "..", "tools", "bench_gate.py"),
)
bench_gate = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench_gate)


def test_compare_verdicts():
    pins = {
        "fast_q": {"sec": 1.0, "tol": 1.6},
        "slow_q": {"sec": 1.0, "tol": 1.6},
        "ok_q": {"sec": 1.0, "tol": 1.6},
        "gone_q": {"sec": 1.0, "tol": 1.6},
        bench_gate.HEADLINE_KEY: {"sec": 2.0, "tol": 1.6},
    }
    bench = {
        "value": 2.1,
        "queries": {"fast_q": 0.5, "slow_q": 1.7, "ok_q": 1.2, "new_q": 3.0},
    }
    rows, regressed = bench_gate.compare(bench, pins)
    verdicts = {r["query"]: r["verdict"] for r in rows}
    assert regressed
    assert verdicts["slow_q"] == "SLOW"
    assert verdicts["fast_q"].startswith("fast")
    assert verdicts["ok_q"] == "ok"
    assert verdicts["gone_q"] == "missing"
    assert verdicts["new_q"] == "unpinned"
    assert verdicts[bench_gate.HEADLINE_KEY] == "ok"  # 2.1/2.0 within tol


def test_compare_no_regression_when_within_tol():
    pins = {"q": {"sec": 1.0, "tol": 1.6}}
    rows, regressed = bench_gate.compare({"value": None, "queries": {"q": 1.59}}, pins)
    assert not regressed
    assert rows[0]["verdict"] == "ok"


def test_load_bench_accepts_driver_wrapper(tmp_path):
    import json

    p = tmp_path / "wrapped.json"
    payload = {"value": 1.0, "queries": {"q": 0.5}}
    p.write_text(json.dumps({"rc": 0, "tail": "noise\n" + json.dumps(payload) + "\n"}))
    assert bench_gate.load_bench(str(p)) == payload
    p2 = tmp_path / "raw.json"
    p2.write_text(json.dumps(payload))
    assert bench_gate.load_bench(str(p2)) == payload


def test_classify_regime_vs_regression():
    def rows(n_slow, n_total):
        out = []
        for i in range(n_total):
            out.append(
                {"query": f"q{i}", "pin": 1.0, "now": 2.0 if i < n_slow else 1.0,
                 "ratio": 2.0 if i < n_slow else 1.0,
                 "verdict": "SLOW" if i < n_slow else "ok"}
            )
        return out

    assert bench_gate.classify(rows(0, 30)) == "ok"
    assert bench_gate.classify(rows(1, 30)) == "regression"
    assert bench_gate.classify(rows(12, 30)) == "broad_slowdown"
    # tiny pin sets: 1 slow of 3 is still isolated (max(2, ...) floor)
    assert bench_gate.classify(rows(1, 3)) == "regression"
    assert bench_gate.classify(rows(2, 3)) == "broad_slowdown"
