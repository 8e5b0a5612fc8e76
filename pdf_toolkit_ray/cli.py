"""CLI: ``python -m pdf_toolkit_ray <command>``.

Mirrors the reference CLI's shape (``src/pdf-toolkit/cli.py``): subcommands,
config precedence defaults < YAML < explicit flags, a
``--dump-default-config`` short-circuit (``cli.py:571-573``), and exit
code 2 on ``UserError`` (``cli.py:645-647``).

The CLI owns its Ray session (guarded init + shutdown); library code
never initializes Ray.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys

from . import UserError
from .config import ExtractConfig, load_config


def _build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(prog="pdf_toolkit_ray")
    sub = parser.add_subparsers(dest="command", required=True)

    ext = sub.add_parser("extract", help="run the per-turn extraction job")
    ext.add_argument("--input", required=False, help="transcripts parquet path")
    ext.add_argument("--out", required=False, help="output directory")
    ext.add_argument("--config", default=None, help="YAML config path")
    ext.add_argument("--set", action="append", default=[], metavar="KEY=VALUE",
                     help="config override (repeatable)")
    ext.add_argument("--no-resume", action="store_true",
                     help="reprocess all partitions even if committed")
    ext.add_argument("--turns", default=None, metavar="SPEC",
                     help='strict 1-based turn selection, e.g. "1-3,5" or "all" '
                          "(duplicates/overlaps are errors); pushed down to the read")
    ext.add_argument("--ingest", choices=["new-files"], default=None,
                     help="incremental mode: extract only input files not "
                          "yet recorded in the output's ingest manifest, "
                          "into a new generation directory")
    ext.add_argument("--check-conv-overlap", action="store_true",
                     help="with --ingest: verify no conversation spans "
                          "ingests (one extra conv_id scan)")
    ext.add_argument("--dry-run", action="store_true",
                     help="plan only: report input size, heavy convs, partition "
                          "slots and resume skips; write nothing")
    ext.add_argument("--dump-default-config", action="store_true")
    ext.add_argument("--num-cpus", type=int, default=None)

    spl = sub.add_parser(
        "split",
        help="split transcripts into one output partition per turn range "
             "(reference `split` command analog)",
    )
    spl.add_argument("--input", required=True, help="transcripts parquet path")
    spl.add_argument("--out", required=True, help="output directory")
    spl.add_argument("--ranges", required=True, metavar="SPEC",
                     help='strict 1-based ranges, e.g. "1-120,121-240" '
                          "(overlaps are errors)")
    spl.add_argument("--overwrite", action="store_true",
                     help="rewrite ranges that already have a committed manifest")
    spl.add_argument("--num-cpus", type=int, default=None)

    cmp_ = sub.add_parser(
        "compact",
        help="compact many small committed partitions into ~target-size "
             "ones (small-files maintenance for long-lived corpora)",
    )
    cmp_.add_argument("--input", required=True, help="job output dir (part-* partitions)")
    cmp_.add_argument("--out", required=True, help="compacted output directory")
    cmp_.add_argument("--target-mb", type=int, default=128)
    cmp_.add_argument("--overwrite", action="store_true")
    cmp_.add_argument("--num-cpus", type=int, default=None)

    val = sub.add_parser(
        "validate",
        help="audit a job output: every committed partition's data file "
             "must parse and match its manifest row count (footer-only)",
    )
    val.add_argument("--out", required=True, help="job output directory")
    val.add_argument("--num-cpus", type=int, default=None)

    qry = sub.add_parser("query", help="run a registry query")
    qry.add_argument("name", nargs="?", help="query name (omit to list)")
    qry.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    qry.add_argument("--limit", type=int, default=20)
    qry.add_argument("--num-cpus", type=int, default=None)
    qry.add_argument(
        "--stats", action="store_true",
        help="print Ray Data per-stage execution stats after the result "
        "(Dataset results only; the per-operator wall/cpu/blocks table "
        "drives the measure-then-iterate perf loop)",
    )
    qry.add_argument(
        "--out", default=None, metavar="DIR",
        help="write the FULL result to DIR as parquet instead of printing "
        "rows (Dataset results stream via write_parquet — sharded, never "
        "through the driver; table results write one file)",
    )
    return parser


def _parse_overrides(pairs: list[str]) -> dict:
    out = {}
    for pair in pairs:
        if "=" not in pair:
            raise UserError(f"--set expects KEY=VALUE, got {pair!r}")
        key, _, value = pair.partition("=")
        try:
            out[key] = json.loads(value)
        except json.JSONDecodeError:
            out[key] = value
    return out


def _init_kwargs(num_cpus: int | None, env: dict | None = None) -> dict:
    """ray.init kwargs for the CLI session. ``RAY_ADDRESS`` makes the same
    commands work under ``ray job submit`` on a real cluster (the job
    runner presets it to the head node): attaching to a cluster forbids
    the local-only knobs (num_cpus, dashboard), so they are only passed
    when the address is "local"."""
    import os

    address = (env if env is not None else os.environ).get("RAY_ADDRESS") or "local"
    kwargs: dict = dict(address=address, logging_level="ERROR")
    if address == "local":
        kwargs["include_dashboard"] = False
        if num_cpus is not None:
            kwargs["num_cpus"] = num_cpus
    return kwargs


def _ray_session(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        ray.init(**_init_kwargs(num_cpus))
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    return ray


def main(argv: list[str] | None = None) -> int:
    args = _build_parser().parse_args(argv)
    try:
        if args.command == "extract":
            if args.dump_default_config:
                print(json.dumps(dataclasses.asdict(ExtractConfig()), indent=1, default=str))
                return 0
            if not args.input or not args.out:
                raise UserError("extract requires --input and --out")
            cfg = load_config(args.config, overrides=_parse_overrides(args.set))
            if args.turns is not None:
                from .functions.turnspec import turn_filter_expression

                turn_filter_expression(args.turns)  # fail fast on bad specs
            ray = _ray_session(args.num_cpus)
            from .pipelines.extract import run_extract_ingest, run_extract_job

            if args.ingest == "new-files":
                if args.dry_run:
                    raise UserError("--dry-run is not supported with --ingest")
                summary = run_extract_ingest(
                    args.input, args.out, cfg, turns=args.turns,
                    check_conv_overlap=args.check_conv_overlap,
                )
            else:
                summary = run_extract_job(
                    args.input, args.out, cfg,
                    resume=not args.no_resume, turns=args.turns, dry_run=args.dry_run,
                )
            print(json.dumps(summary, indent=1))
            ray.shutdown()
            return 0
        if args.command == "compact":
            ray = _ray_session(args.num_cpus)
            from .pipelines.extract import run_compact_job

            summary = run_compact_job(
                args.input, args.out,
                target_mb=args.target_mb, overwrite=args.overwrite,
            )
            print(json.dumps(summary, indent=1))
            ray.shutdown()
            return 0
        if args.command == "validate":
            ray = _ray_session(args.num_cpus)
            from .pipelines.extract import run_validate_job

            summary = run_validate_job(args.out)
            print(json.dumps(summary, indent=1))
            ray.shutdown()
            return 0 if summary["ok"] else 1
        if args.command == "split":
            from .functions.turnspec import parse_turn_ranges

            ranges = parse_turn_ranges(args.ranges)  # fail fast pre-Ray
            ray = _ray_session(args.num_cpus)
            from .pipelines.extract import run_split_job

            summary = run_split_job(
                args.input, args.out, ranges, overwrite=args.overwrite
            )
            print(json.dumps(summary, indent=1))
            ray.shutdown()
            return 0
        if args.command == "query":
            from .queries import REGISTRY

            if not args.name:
                for name, (_fn, sql) in REGISTRY.items():
                    print(f"{name}  [{'sql-oracle' if sql else 'rows-only'}]")
                return 0
            if args.name not in REGISTRY:
                raise UserError(f"unknown query {args.name!r}; run with no name to list")
            ray = _ray_session(args.num_cpus)
            fn, _sql = REGISTRY[args.name]
            result = fn(args.sf_dir)
            import pandas as pd
            import pyarrow as pa

            if args.out:
                import os as _os

                import pyarrow.parquet as _pq

                if _os.path.isdir(args.out) and _os.listdir(args.out):
                    # Dataset writes add uniquely-named shards; appending
                    # into a non-empty dir would mix two runs' results
                    raise UserError(f"--out {args.out} exists and is not empty")
                if isinstance(result, pd.DataFrame):
                    result = pa.Table.from_pandas(result, preserve_index=False)
                if isinstance(result, pa.Table):
                    _os.makedirs(args.out, exist_ok=True)
                    _pq.write_table(
                        result, _os.path.join(args.out, "result.parquet")
                    )
                    n = result.num_rows
                else:  # Dataset: sharded distributed write, never the driver
                    result.write_parquet(args.out)
                    n = None
                print(f"wrote {args.out}" + (f" ({n} rows)" if n is not None else ""))
                ray.shutdown()
                return 0
            stats_src = None
            if isinstance(result, pa.Table):
                df = result.to_pandas()
            elif isinstance(result, pd.DataFrame):
                df = result
            else:
                if args.stats:
                    result = result.materialize()
                    stats_src = result
                df = result.limit(args.limit).to_pandas()
            with pd.option_context("display.width", 200, "display.max_columns", 50):
                print(df.head(args.limit).to_string(index=False))
            if args.stats:
                print(
                    stats_src.stats()
                    if stats_src is not None
                    else "(no Dataset stats: query returns a driver-side table)"
                )
            ray.shutdown()
            return 0
        raise UserError(f"unknown command {args.command!r}")
    except UserError as exc:
        print(f"error: {exc}", file=sys.stderr)
        return 2
    except BrokenPipeError:
        return 0  # output piped into head/less that closed early


if __name__ == "__main__":
    raise SystemExit(main())
