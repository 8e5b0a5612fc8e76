"""Turn-spec grammar + dry-run + audit-record tests — mirrors the
reference's ``tests/test_utils.py:26-58`` error cases (empty spec, empty
token, malformed range, non-digit, start>end, out-of-range, duplicates,
overlaps) on the per-turn analog."""

import pytest

from pdf_toolkit_ray import UserError
from pdf_toolkit_ray.functions.turnspec import (
    parse_turn_ranges,
    parse_turn_spec,
    turn_filter_expression,
)


def test_spec_goldens():
    assert parse_turn_spec("all", 4) == [0, 1, 2, 3]
    assert parse_turn_spec("*", 3) == [0, 1, 2]
    assert parse_turn_spec("1-3,5", 10) == [0, 1, 2, 4]
    assert parse_turn_spec("2", 5) == [1]
    assert parse_turn_spec(" 1 - 2 , 4 ", 5) == [0, 1, 3]  # spaces tolerated


@pytest.mark.parametrize(
    "spec,total,msg",
    [
        ("", 5, "empty"),
        ("   ", 5, "empty"),
        ("1,,3", 5, "empty token"),
        ("1-2-3", 5, "Invalid range"),
        ("a-3", 5, "Invalid range"),
        ("x", 5, "Invalid turn token"),
        ("0", 5, "1-based"),
        ("3-2", 5, "start > end"),
        ("6", 5, "out of range"),
        ("1,1", 5, "Duplicate turn 1"),
        ("1-3,2", 5, "Duplicate turn 2"),
    ],
)
def test_spec_errors(spec, total, msg):
    with pytest.raises(UserError, match=msg):
        parse_turn_spec(spec, total)


def test_ranges_goldens_and_errors():
    assert parse_turn_ranges("1-120,121-240", 240) == [(0, 119), (120, 239)]
    assert parse_turn_ranges("5", 10) == [(4, 4)]
    with pytest.raises(UserError, match="explicit ranges"):
        parse_turn_ranges("all", 10)
    with pytest.raises(UserError, match="Ranges overlap on turn 3"):
        parse_turn_ranges("1-3,3-5", 10)
    with pytest.raises(UserError, match="out of range"):
        parse_turn_ranges("1-11", 10)


def test_filter_expression_pushdown(ray_session, smoke_parquet):
    import ray.data

    expr = turn_filter_expression("1-2,4")
    ds = ray.data.read_parquet(smoke_parquet, filter=expr)
    got = sorted(set(ds.to_pandas()["turn_idx"]))
    assert got == [0, 1, 3]  # spec is 1-based, column 0-based
    assert turn_filter_expression("all") is None
    with pytest.raises(UserError, match="Duplicate"):
        turn_filter_expression("1,1-2")


def test_dry_run_plans_without_writing(ray_session, smoke_parquet, tmp_path):
    import os

    from pdf_toolkit_ray.config import ExtractConfig
    from pdf_toolkit_ray.pipelines.extract import run_extract_job

    out = str(tmp_path / "dry")
    cfg = ExtractConfig(n_parts=4, salt_threshold=8, salt_width=4)
    plan = run_extract_job(smoke_parquet, out, cfg, dry_run=True)
    assert plan["dry_run"] is True
    assert plan["input_rows"] > 0
    assert plan["planned_partitions"] >= 4
    assert plan["action_counts"].get("dry-run", 0) == plan["planned_partitions"]
    # nothing written — not even the output directory scaffolding
    assert not os.path.exists(os.path.join(out, "_job_manifest.json"))
    assert all(a["status"] == "dry-run" for a in plan["actions"])

    # a real run then a dry-run: completed partitions report "skipped"
    run_extract_job(smoke_parquet, out, cfg)
    plan2 = run_extract_job(smoke_parquet, out, cfg, dry_run=True)
    assert plan2["action_counts"].get("skipped", 0) > 0
    assert plan2["action_counts"].get("dry-run", 0) == 0


def test_audit_actions_in_manifests(ray_session, smoke_parquet, tmp_path):
    import os

    from pdf_toolkit_ray.config import ExtractConfig
    from pdf_toolkit_ray.pipelines.extract import run_extract_job
    from pdf_toolkit_ray.state import manifest as mf

    out = str(tmp_path / "job")
    cfg = ExtractConfig(n_parts=4, salt_threshold=8, salt_width=4)
    summary = run_extract_job(smoke_parquet, out, cfg)
    assert summary["action_counts"]["written"] == summary["written_partitions"]
    # rerun: everything skips, and the audit trail says so
    summary2 = run_extract_job(smoke_parquet, out, cfg)
    assert summary2["action_counts"].get("written", 0) == 0
    assert summary2["action_counts"]["skipped"] == summary["written_partitions"]
    # per-partition manifests carry their own action record
    pdirs = [d for d in os.listdir(out) if d.startswith("part-")]
    m = mf.load_manifest(os.path.join(out, pdirs[0]))
    assert m["actions"][0]["action"] == "write_partition"
    assert m["actions"][0]["status"] == "written"
    assert m["actions"][0]["rows"] == m["metrics"]["rows"]


def test_turns_selection_end_to_end(ray_session, smoke_parquet, tmp_path):
    from pdf_toolkit_ray.config import ExtractConfig
    from pdf_toolkit_ray.pipelines.extract import run_extract_job, read_extracted

    out = str(tmp_path / "sel")
    cfg = ExtractConfig(n_parts=4, salt_threshold=8, salt_width=4)
    run_extract_job(smoke_parquet, out, cfg, turns="1-2")
    df = read_extracted(out).to_pandas()
    assert sorted(set(df["turn_idx"])) == [0, 1]


def test_split_job_by_ranges(ray_session, smoke_parquet, tmp_path):
    """Reference `split` analog: one committed partition per turn range,
    skip-if-exists rerun semantics, streamed writes."""
    import pyarrow.parquet as pq

    from pdf_toolkit_ray.functions.turnspec import parse_turn_ranges
    from pdf_toolkit_ray.pipelines.extract import run_split_job

    out = str(tmp_path / "split")
    ranges = parse_turn_ranges("1-3,4-10")
    s1 = run_split_job(smoke_parquet, out, ranges)
    assert s1["action_counts"]["written"] == 2
    p0 = pq.read_table(f"{out}/part-00000-s00000/data.parquet")
    p1 = pq.read_table(f"{out}/part-00001-s00000/data.parquet")
    assert set(p0.column("turn_idx").to_pylist()) <= {0, 1, 2}
    assert min(p1.column("turn_idx").to_pylist()) == 3
    import pyarrow.compute as pc

    full = pq.read_table(smoke_parquet)
    in_range = pc.sum(
        pc.cast(pc.less_equal(full.column("turn_idx"), 9), "int64")
    ).as_py()
    assert p0.num_rows + p1.num_rows == in_range
    # rerun: both ranges skip
    s2 = run_split_job(smoke_parquet, out, ranges)
    assert s2["action_counts"].get("written", 0) == 0
    assert s2["action_counts"]["skipped"] == 2
    # overwrite forces rewrite
    s3 = run_split_job(smoke_parquet, out, ranges, overwrite=True)
    assert s3["action_counts"]["written"] == 2


def test_turns_filter_is_part_of_resume_identity(ray_session, smoke_parquet, tmp_path):
    """Partitions committed under a turn selection must NOT satisfy a rerun
    with a different (or no) selection — the content differs."""
    from pdf_toolkit_ray.config import ExtractConfig
    from pdf_toolkit_ray.pipelines.extract import run_extract_job, read_extracted

    out = str(tmp_path / "resel")
    cfg = ExtractConfig(n_parts=4, salt_threshold=8, salt_width=4)
    s1 = run_extract_job(smoke_parquet, out, cfg, turns="1-2")
    assert s1["written_partitions"] > 0
    # unfiltered rerun: filtered partitions are stale, everything reruns
    s2 = run_extract_job(smoke_parquet, out, cfg)
    assert s2["resumed_partitions"] == []
    assert s2["written_partitions"] > 0
    df = read_extracted(out).to_pandas()
    assert max(df["turn_idx"]) > 1  # full turn range restored
    # same-selection rerun DOES resume
    s3 = run_extract_job(smoke_parquet, out, cfg)
    assert s3["written_partitions"] == 0 and len(s3["resumed_partitions"]) > 0


def test_turnspec_fuzz_never_crashes():
    """Random garbage specs either parse or raise UserError — no other
    exception type escapes the grammar."""
    import random

    rng = random.Random(13)
    alphabet = "0123456789-, alx*"
    for _ in range(300):
        spec = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 12)))
        try:
            parse_turn_spec(spec, 50)
        except UserError:
            pass
        try:
            parse_turn_ranges(spec, 50)
        except UserError:
            pass
        try:
            turn_filter_expression(spec)
        except UserError:
            pass


def test_split_job_reordered_ranges_rewrite(ray_session, smoke_parquet, tmp_path):
    """ADVICE regression: rerunning with the SAME ranges in a DIFFERENT
    order must not skip — partition idx is the spec-order position, so
    part 0 must end up holding the new spec's first range."""
    import pyarrow.parquet as pq

    from pdf_toolkit_ray.functions.turnspec import parse_turn_ranges
    from pdf_toolkit_ray.pipelines.extract import run_split_job

    out = str(tmp_path / "split_reorder")
    run_split_job(smoke_parquet, out, parse_turn_ranges("1-3,4-10"))
    s2 = run_split_job(smoke_parquet, out, parse_turn_ranges("4-10,1-3"))
    assert s2["action_counts"].get("skipped", 0) == 0
    assert s2["action_counts"]["written"] == 2
    p0 = pq.read_table(f"{out}/part-00000-s00000/data.parquet")
    assert min(p0.column("turn_idx").to_pylist()) == 3  # 4-10 (1-based) first now
