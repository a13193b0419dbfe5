"""Registry invariants the driver contract depends on.

Round-2's CORRECTNESS sweep recorded exactly the first 50 registry
entries, so ordering is load-bearing: every oracle-gated query must sit
in the prefix, rows-only entries at the tail."""

from __future__ import annotations


def test_oracle_gated_queries_precede_rows_only():
    from parallel_dataflow_ray.pipelines import ORACLE_SQL, QUERIES

    names = list(QUERIES)
    gated = [n in ORACLE_SQL for n in names]
    # monotone: once the rows-only tail starts, no oracle entry follows
    first_rows_only = gated.index(False)
    assert all(not g for g in gated[first_rows_only:]), (
        "oracle-gated query ordered after a rows-only entry")
    # every oracle entry has a registry entry and vice-versa prefix-wise
    assert set(ORACLE_SQL) <= set(names)
    assert sum(gated) == len(ORACLE_SQL)


def test_every_query_is_callable_with_sf_dir():
    import inspect

    from parallel_dataflow_ray.pipelines import QUERIES

    for name, fn in QUERIES.items():
        params = inspect.signature(fn).parameters
        required = [p for p in params.values()
                    if p.default is inspect.Parameter.empty
                    and p.kind in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD)]
        assert len(required) == 1, (name, required)
