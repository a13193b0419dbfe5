"""Table readers with column pruning (prune at the read, always).

The primary production format in the north_star is Lance; this
container has no lance wheel, so ``read_table`` reads parquet (the
driver testdata format) and ``read_lance`` raises a clearly-marked stub
unless the package is importable.  Reference analog: the Bril stdin
reader, ``utils/src/dataflow_executor.rs:29-32``.
"""

from __future__ import annotations

import os

import ray.data as rd


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def read_table(sf_dir: str, name: str, columns: list[str] | None = None,
               **kw) -> rd.Dataset:
    """read_parquet with mandatory thought about column pruning: callers
    pass exactly the columns the pipeline needs."""
    return rd.read_parquet(table_path(sf_dir, name), columns=columns, **kw)


def read_lance(uri: str, columns: list[str] | None = None) -> rd.Dataset:
    try:
        import lance  # noqa: F401
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError(
            "lance is not installed in this container; production deploys "
            "use ray.data.read_lance(uri) — parquet is the tested path"
        ) from e
    return rd.read_lance(uri, columns=columns)  # pragma: no cover
