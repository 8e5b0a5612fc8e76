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


def test_bad_turn_spec_fails_fast():
    """--turns validation happens before Ray initializes (reference
    UserError semantics: exit code 2, clear message)."""
    r = _run("extract", "--input", "x", "--out", "y", "--turns", "3-2")
    assert r.returncode == 2
    assert "start > end" in r.stderr
    r = _run("extract", "--input", "x", "--out", "y", "--turns", "1,,2")
    assert r.returncode == 2
    assert "empty token" in r.stderr


def test_dry_run_cli(tmp_path):
    from pdf_toolkit_ray.sources.fixtures import transcripts_path_for

    path = transcripts_path_for("smoke")
    out = str(tmp_path / "cli_dry")
    r = _run("extract", "--input", path, "--out", out, "--dry-run",
             "--num-cpus", "2", "--set", "n_parts=2")
    assert r.returncode == 0, r.stderr
    plan = json.loads(r.stdout)
    assert plan["dry_run"] is True
    assert plan["action_counts"]["dry-run"] == plan["planned_partitions"]
    import os
    assert not os.path.exists(os.path.join(out, "_job_manifest.json"))


def test_cli_extract_end_to_end(tmp_path):
    """Full CLI extract on the smoke fixture: job manifest written,
    partitions committed, audit counts coherent."""
    import os

    from pdf_toolkit_ray.sources.fixtures import transcripts_path_for

    path = transcripts_path_for("smoke")
    out = str(tmp_path / "cli_job")
    r = _run("extract", "--input", path, "--out", out,
             "--num-cpus", "2", "--set", "n_parts=2")
    assert r.returncode == 0, r.stderr
    summary = json.loads(r.stdout)
    assert summary["rows_written"] > 0
    assert summary["action_counts"]["written"] == summary["written_partitions"]
    assert os.path.exists(os.path.join(out, "_job_manifest.json"))


def test_query_out_writes_parquet(tmp_path):
    """query --out writes the FULL result as parquet (table result: one
    file; Dataset result: sharded write) instead of printing rows."""
    import glob

    import pyarrow.parquet as pq

    out = str(tmp_path / "res")
    r = _run(
        "query", "groupby_events", "--sf-dir", "/root/testdata/sf0.001",
        "--num-cpus", "4", "--out", out,
    )
    assert r.returncode == 0, r.stderr
    assert f"wrote {out}" in r.stdout
    files = glob.glob(out + "/*.parquet")
    assert files
    assert sum(pq.read_metadata(f).num_rows for f in files) == 5


def test_init_kwargs_local_vs_cluster():
    """Local mode keeps the sandbox knobs; a cluster RAY_ADDRESS (the
    `ray job submit` environment) must attach WITHOUT local-only kwargs
    (num_cpus / include_dashboard are invalid when connecting)."""
    from pdf_toolkit_ray.cli import _init_kwargs

    local = _init_kwargs(4, env={"RAY_ADDRESS": "local"})
    assert local["address"] == "local"
    assert local["num_cpus"] == 4 and local["include_dashboard"] is False

    unset = _init_kwargs(None, env={})
    assert unset["address"] == "local" and "num_cpus" not in unset

    cluster = _init_kwargs(4, env={"RAY_ADDRESS": "ray://head:10001"})
    assert cluster["address"] == "ray://head:10001"
    assert "num_cpus" not in cluster and "include_dashboard" not in cluster
