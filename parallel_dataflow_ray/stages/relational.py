"""Relational building blocks: cents-exact aggregates, joins, top-k.

Design rules applied throughout (SURVEY.md §4 + task brief):

- money/metric doubles are quantized ``rint(x * 10^k) -> int64`` BEFORE
  any sum, making distributed aggregation bit-exact regardless of
  partitioning / fold order (and bit-identical to the DuckDB oracle);
- grouped aggregates pre-combine inside ``map_batches`` (map-side
  partial aggregation) so the shuffle moves one row per (batch, key)
  instead of one per input row;
- small dimension tables are broadcast via ``ray.put`` once, looked up
  per batch — never shuffled;
- large-large joins use ``Dataset.join`` (hash-partitioned).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Sum


def cents(table: pa.Table, col: str, out: str, scale: int = 100) -> pa.Table:
    """Append integer-quantized column ``out = rint(col * scale)``."""
    v = np.rint(table[col].to_numpy(zero_copy_only=False) * scale).astype(np.int64)
    return table.append_column(out, pa.array(v))


class PartialGroupAgg:
    """Map-side combiner: per-batch groupby -> one partial row per key.

    The graft of the reference's partial ``meet`` over predecessor
    values (``impls/src/sequential.rs:32-37``): combine locally, merge
    the small partials in a second, cheap shuffle stage.
    """

    def __init__(self, keys: list[str], sums: list[str] | None = None,
                 count_as: str | None = None):
        self.keys = keys
        self.sums = sums or []
        self.count_as = count_as

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby(self.keys, as_index=False, sort=False)
        if self.sums:
            out = g[self.sums].sum()
            if self.count_as:
                # same GroupBy object -> identical group order for size()
                out[self.count_as] = g.size()["size"].to_numpy()
        else:
            out = g.size().rename(columns={"size": self.count_as or "n"})
        return out


def grouped_sum(ds: rd.Dataset, keys: list[str], sums: list[str],
                count_as: str | None = None) -> rd.Dataset:
    """partial-aggregate -> final groupby().aggregate() (Sum of partials)."""
    partial = ds.map_batches(PartialGroupAgg(keys, sums, count_as),
                             batch_format="pandas", batch_size=65536)
    aggs = [Sum(c, alias_name=c) for c in sums]
    if count_as:
        aggs.append(Sum(count_as, alias_name=count_as))
    return partial.groupby(keys).aggregate(*aggs)


def broadcast_lookup(ds: rd.Dataset, lookup_df: pd.DataFrame, on: str,
                     add_columns: list[str]) -> rd.Dataset:
    """Broadcast-small-side join: ``ray.put`` the dimension table once;
    every task maps keys through it — no shuffle."""
    ref = ray.put(lookup_df.set_index(on)[add_columns])

    class Lookup:
        def __init__(self):
            self.lut = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            joined = batch.join(self.lut, on=on)
            return joined

    return ds.map_batches(Lookup, batch_format="pandas", batch_size=65536,
                          concurrency=(1, 8))


def hash_join(left: rd.Dataset, right: rd.Dataset, on: tuple,
              right_on: tuple | None = None, num_partitions: int = 16,
              join_type: str = "inner") -> rd.Dataset:
    """Hash-partitioned distributed join (Ray Data native)."""
    return left.join(right, join_type=join_type, num_partitions=num_partitions,
                     on=on, right_on=right_on)


def top_k(ds: rd.Dataset, by: list[tuple[str, bool]], k: int) -> pa.Table:
    """Global top-k: per-block local top-k inside map_batches, then one
    small final merge — never a full global sort of the dataset.
    ``by`` = [(column, descending?), ...]; include a unique tiebreak."""
    order = [(c, "descending" if desc else "ascending") for c, desc in by]

    def local_topk(batch: pa.Table) -> pa.Table:
        idx = pc.sort_indices(batch, sort_keys=order)[:k]
        return batch.take(idx)

    small = ds.map_batches(local_topk, batch_format="pyarrow").take_all()
    merged = pa.Table.from_pylist(small)
    return merged.take(pc.sort_indices(merged, sort_keys=order)[:k])
