"""Driver-style gate, run locally: every queries() entry vs its DuckDB
oracle at sf0.001 (fast tier) — row count, column set, and
order-insensitive value equality.  Mirrors the driver's CORRECTNESS
check so mismatches surface before round verification.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

import __ray_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def _to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = np.round(df[c].astype("float64"), 6)
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("int64")
        else:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), ignore_index=True)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                  f"read_parquet('{SF_DIR}/{t}.parquet')")
    return c


SQL_KEYS = sorted(entrymod.oracle_sql())
ROWS_ONLY = sorted(set(entrymod.queries()) - set(entrymod.oracle_sql()))


def test_oracle_keys_subset_of_queries():
    assert set(entrymod.oracle_sql()) <= set(entrymod.queries())


_KIND = {"i": "i", "u": "i", "f": "f", "M": "M", "O": "O", "b": "b"}


@pytest.mark.parametrize("name", SQL_KEYS)
def test_query_matches_oracle(con, name):
    got_raw = _to_pandas(entrymod.queries()[name](SF_DIR))
    want_raw = con.execute(entrymod.oracle_sql()[name]).df()
    # the driver hashes raw values: an int64 oracle column vs a float64
    # Ray column hash-mismatches even when values are equal — fail that
    # locally too (caught the r1 asof event_id float64 promotion)
    for c in want_raw.columns:
        if c in got_raw.columns:
            gk = _KIND.get(got_raw[c].dtype.kind, got_raw[c].dtype.kind)
            wk = _KIND.get(want_raw[c].dtype.kind, want_raw[c].dtype.kind)
            assert gk == wk, (f"{name}.{c}: dtype kind {got_raw[c].dtype} "
                              f"!= oracle {want_raw[c].dtype}")
    got = _canon(got_raw)
    want = _canon(want_raw)
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != {list(want.columns)}")
    assert len(got) == len(want), f"{name}: {len(got)} rows != {len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(name):
    df = _to_pandas(entrymod.queries()[name](SF_DIR))
    assert df is not None
    assert len(df.columns) > 0


def test_entry_smoke():
    df = _to_pandas(entrymod.entry())
    assert len(df) > 0
