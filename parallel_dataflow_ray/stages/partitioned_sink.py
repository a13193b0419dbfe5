"""Resumable partitioned batch output: one parquet fragment per key
partition, committed atomically, so a failed run re-executed over the
same input SKIPS every finished partition and recomputes only the rest.

The batch-layer twin of ``streaming/sink.py::ExactlyOnceSink`` (same
tmp-write -> fsync -> atomic-rename protocol, reference analog: the
epoch-idempotent commit in the streaming sink; the reference's CSV perf
sink ``impls/src/bin/perf.rs:30-38`` has no resume story — this is the
100 TB requirement from the brief: "write partitioned Parquet ... so a
failed run can skip finished partitions; never one giant file").

How it scales: the partition id is a stable hash of the partition key,
so the pruning filter (drop rows of already-committed partitions) runs
map-side inside ``map_batches`` against a broadcast frozenset — no
shuffle for the skip; only surviving rows pay the one bucketed exchange
that co-locates each partition into its writer task.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data as rd

from ..streaming.partitioning import stable_hash


def _commit_marker(root: str, pid: int) -> str:
    return os.path.join(root, "_committed", f"part-{pid:05d}.json")


def committed_partitions(root: str) -> frozenset[int]:
    d = os.path.join(root, "_committed")
    if not os.path.isdir(d):
        return frozenset()
    return frozenset(int(f.split("-")[1].split(".")[0])
                     for f in os.listdir(d)
                     if f.startswith("part-") and f.endswith(".json"))


def write_partitioned(ds: rd.Dataset, root: str, key_col: str, *,
                      num_partitions: int = 64, durable: bool = True,
                      resume: bool = True) -> dict:
    """Write ``ds`` as ``num_partitions`` hash-partitioned parquet
    fragments under ``root``; returns {written, skipped, rows}.

    Re-running after a crash with ``resume=True`` prunes rows of
    committed partitions at the map side and only recomputes /
    rewrites the missing fragments.  Every fragment is tmp-written,
    fsynced (``durable``), renamed, and only then marked committed —
    a torn write can never be mistaken for a finished partition.
    """
    os.makedirs(os.path.join(root, "data"), exist_ok=True)
    os.makedirs(os.path.join(root, "_committed"), exist_ok=True)
    done = committed_partitions(root) if resume else frozenset()
    done_ref = ray.put(done)
    P = num_partitions

    def tag_and_prune(b: pd.DataFrame) -> pd.DataFrame:
        skip = ray.get(done_ref)
        pid = (stable_hash(b[key_col].to_numpy()) % np.uint64(P)).astype(np.int64)
        b = b.copy()
        b["__pid"] = pid
        if skip:
            b = b[~b["__pid"].isin(skip)]
        return b

    def write_group(g: pd.DataFrame) -> pd.DataFrame:
        pid = int(g["__pid"].iloc[0])
        table = pa.Table.from_pandas(g.drop(columns="__pid"),
                                     preserve_index=False)
        frag = os.path.join(root, "data", f"part-{pid:05d}.parquet")
        tmp = frag + f".tmp.{os.getpid()}"
        pq.write_table(table, tmp)
        if durable:
            with open(tmp, "rb+") as f:
                os.fsync(f.fileno())
        os.rename(tmp, frag)
        marker = _commit_marker(root, pid)
        mtmp = marker + f".tmp.{os.getpid()}"
        with open(mtmp, "w") as f:
            json.dump({"partition": pid, "rows": table.num_rows}, f)
            f.flush()
            if durable:
                os.fsync(f.fileno())
        os.rename(mtmp, marker)
        return pd.DataFrame({"pid": [pid], "rows": [table.num_rows]})

    stats = (ds.map_batches(tag_and_prune, batch_format="pandas",
                            batch_size=65536)
               .groupby("__pid")
               .map_groups(write_group, batch_format="pandas")
               .to_pandas())
    return {"written": len(stats), "skipped": len(done),
            "rows": int(stats["rows"].sum()) if len(stats) else 0}


def read_partitioned(root: str) -> rd.Dataset:
    """Read back ONLY committed fragments (torn/tmp files ignored)."""
    done = committed_partitions(root)
    paths = [os.path.join(root, "data", f"part-{pid:05d}.parquet")
             for pid in sorted(done)]
    if not paths:
        raise FileNotFoundError(f"no committed partitions under {root}")
    return rd.read_parquet(paths)
