import json
import subprocess
import sys


def _run(*args):
    return subprocess.run(
        [sys.executable, "-m", "pdf_toolkit_ray", *args],
        capture_output=True, text=True, cwd="/root/repo",
    )


def test_dump_default_config():
    r = _run("extract", "--dump-default-config")
    assert r.returncode == 0
    cfg = json.loads(r.stdout)
    assert cfg["split_ratio"] == 1.25


def test_missing_args_exit_2():
    r = _run("extract")
    assert r.returncode == 2
    assert "requires --input and --out" in r.stderr


def test_bad_override_exit_2():
    r = _run("extract", "--input", "x", "--out", "y", "--set", "nonsense")
    assert r.returncode == 2


def test_query_list():
    r = _run("query")
    assert r.returncode == 0
    assert "q1_pricing_summary  [sql-oracle]" in r.stdout
    assert "extract_transcripts  [rows-only]" in r.stdout
