"""Local replica of the driver's correctness gate: run each queries()
entry and its oracle_sql() twin on the same sf dir, compare row count,
schema (column names) and order-insensitive values.

Usage: python tools/check_queries.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(obj, pd.DataFrame):
        return obj
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    import numpy as np

    df = df[sorted(df.columns)].copy()
    for col in df.columns:
        if df[col].dtype == object:
            # lists arrive as python lists (duckdb/oracle) or numpy arrays
            # (arrow to_pandas) — normalize both to one repr
            df[col] = df[col].map(
                lambda v: repr([x for x in v])
                if isinstance(v, (list, np.ndarray))
                else str(v)
            )
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    qs, sqls = entrymod.queries(), entrymod.oracle_sql()
    # lazy twins embed a fixture path resolved for the driver's sf0.01;
    # when checking another sf, rebuild them against that sf's fixture
    import inspect

    from pdf_toolkit_ray.queries import LAZY_SQL

    for name, build in LAZY_SQL.items():
        if inspect.signature(build).parameters:
            sqls[name] = build(sf_dir)

    con = duckdb.connect()
    for table in TABLES:
        con.execute(
            f"CREATE VIEW {table} AS SELECT * FROM read_parquet('{sf_dir}/{table}.parquet')"
        )

    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: ray side raised {type(exc).__name__}: {exc}")
            failures += 1
            continue
        ray_sec = time.time() - t0
        if name not in sqls:
            # non-SQL ops with a deterministic single-process python oracle
            # still get a full-value equality check here
            from pdf_toolkit_ray.queries import PYTHON_ORACLES

            if name in PYTHON_ORACLES:
                want = to_pandas(PYTHON_ORACLES[name](sf_dir))
                a, b = canon(got), canon(want)
                try:
                    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
                    print(f"ok   {name}: {len(got)} rows match python-oracle ({ray_sec:.1f}s)")
                except AssertionError as exc:
                    print(f"FAIL {name}: python-oracle mismatch\n{str(exc)[:600]}")
                    failures += 1
                continue
            print(f"ok   {name}: rows-only ({len(got)} rows, {ray_sec:.1f}s) cols={list(got.columns)}")
            continue
        t0 = time.time()
        want = con.execute(sqls[name]).df()
        sql_sec = time.time() - t0
        if sorted(got.columns) != sorted(want.columns):
            print(f"FAIL {name}: columns {sorted(got.columns)} != {sorted(want.columns)}")
            failures += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            failures += 1
            continue
        a, b = canon(got), canon(want)
        b = b.astype(a.dtypes.to_dict(), errors="ignore") if False else b
        try:
            pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
            print(f"ok   {name}: {len(got)} rows match ({ray_sec:.1f}s ray / {sql_sec:.1f}s sql)")
        except AssertionError as exc:
            print(f"FAIL {name}: value mismatch\n{str(exc)[:600]}")
            diff = (a != b)
            bad_cols = [c for c in a.columns if diff[c].any()]
            print("  bad cols:", bad_cols)
            for c in bad_cols[:2]:
                rows = diff[c].to_numpy().nonzero()[0][:3]
                for r in rows:
                    print(f"   {c}[{r}]: ray={a[c].iloc[r]!r} sql={b[c].iloc[r]!r}")
            failures += 1
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
