"""Driver contract for the graft builder (Ray Data target).

The driver initialises Ray BEFORE importing this module; nothing here
(or in `pdf_toolkit_ray`) calls ``ray.init`` / ``ray.shutdown``.

* ``entry()``      — flagship per-turn extraction pipeline on sf0.001-scale
                     synthetic transcripts (BASELINE.json input_hint).
* ``queries()``    — one callable per implemented operator (SURVEY.md §2 +
                     training-data ops); each takes ``sf_dir``.
* ``oracle_sql()`` — DuckDB twins for the SQL-expressible subset; column
                     names match the Ray outputs exactly.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pdf_toolkit_ray.queries import LAZY_SQL, REGISTRY


def entry() -> Any:
    """Flagship pipeline at smoke scale; returns the finalized Dataset."""
    from pdf_toolkit_ray.config import ExtractConfig
    from pdf_toolkit_ray.pipelines.extract import extract_dataset
    from pdf_toolkit_ray.sources.fixtures import transcripts_path_for

    path = transcripts_path_for("smoke")
    return extract_dataset(path, ExtractConfig())


def queries() -> dict[str, Callable[[str], Any]]:
    return {name: fn for name, (fn, _sql) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    out = {name: sql for name, (_fn, sql) in REGISTRY.items() if sql is not None}
    for name, build in LAZY_SQL.items():
        out[name] = build()
    return out
