"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship streaming pipeline (clips fixture ->
epoch-framed windowed AudioEnergy aggregate through the CEP engine) at
sf0.001 scale.  ``queries()`` exposes every implemented operator from
SURVEY.md §2 (+ the training-data-pipeline suite); ``oracle_sql()``
gives the DuckDB twin for each SQL-expressible one.

Ray is initialised by the driver BEFORE this module is imported: nothing
in this module or the library calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001; driver checks rows>=0."""
    from parallel_dataflow_ray.pipelines import flagship_entry

    return flagship_entry()


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2."""
    from parallel_dataflow_ray.pipelines import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each SQL-expressible query; rows-only
    entries (sketch/heuristic/engine-specific ops) are omitted."""
    from parallel_dataflow_ray.pipelines import ORACLE_SQL

    return dict(ORACLE_SQL)
