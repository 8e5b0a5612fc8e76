"""Exchange-vs-sort parity harness for the bucketed-groupby routing.

The dense-int exchange (relops.exchange_groupby) and the legacy
sort-shuffle path must be result-identical for every registry op that
routes through bucketed_groupby with a typed empty. This runs each such
op TWICE in one Ray session — once on the exchange (default), once on
the sort path (GRAFT_BUCKETED_SORT=1) — and requires canonically equal
results. Ray-vs-Ray only: no DuckDB twin cost, so it is feasible at
sf0.1 where some twins (recursive CTEs) take tens of minutes.

Usage: python tools/exchange_parity.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.check_queries import canon, to_pandas  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=8, include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from pdf_toolkit_ray import relops
    from pdf_toolkit_ray.__init__ import __name__ as _  # noqa: F401
    import pdf_toolkit_ray.queries as queries

    hit = {"v": False}
    orig = relops.exchange_groupby

    def spy(*a, **k):
        hit["v"] = True
        return orig(*a, **k)

    relops.exchange_groupby = spy

    failures, checked, skipped = [], 0, 0
    for name, (fn, _sql) in queries.REGISTRY.items():
        if only and name not in only:
            continue
        os.environ.pop("GRAFT_BUCKETED_SORT", None)
        hit["v"] = False
        t0 = time.time()
        try:
            a = canon(to_pandas(fn(sf_dir)))
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"exchange path raised: {e!r}"))
            continue
        if not hit["v"]:
            skipped += 1
            continue
        t1 = time.time()
        os.environ["GRAFT_BUCKETED_SORT"] = "1"
        try:
            b = canon(to_pandas(fn(sf_dir)))
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"sort path raised: {e!r}"))
            continue
        finally:
            os.environ.pop("GRAFT_BUCKETED_SORT", None)
        t2 = time.time()
        checked += 1
        if list(a.columns) != list(b.columns):
            failures.append((name, f"columns {list(a.columns)} != {list(b.columns)}"))
        elif len(a) != len(b):
            failures.append((name, f"rows {len(a)} != {len(b)}"))
        elif not a.equals(b):
            neq = (a != b).any(axis=0)
            failures.append((name, f"values differ in {list(neq[neq].index)}"))
        else:
            print(
                f"ok   {name}: {len(a)} rows parity "
                f"(exchange {t1 - t0:.1f}s / sort {t2 - t1:.1f}s)",
                flush=True,
            )
    print(f"CHECKED: {checked}  SKIPPED(no exchange): {skipped}")
    for name, msg in failures:
        print(f"FAIL {name}: {msg}")
    print(f"FAILURES: {len(failures)}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
