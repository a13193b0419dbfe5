"""Persisted hash-bucketed table layout (sort-merge-bucket style).

The missing piece between one-shot ``bucket_join`` and a 100 TB
production pipeline: a table that is joined REPEATEDLY on the same key
(a graph's edge table across PageRank rounds, a dimension re-used by
every query) should pay its shuffle ONCE.  ``write_bucketed`` persists
the table as one parquet file per ``hash(key) % B`` bucket (Spark/Hive
bucketing, public design); afterwards

- ``smb_join`` joins two co-bucketed layouts with ZERO shuffle: one
  map task per bucket id reads both sides' bucket files and merges —
  no sort, no exchange, resumable per bucket;
- ``smb_probe_join`` joins a live Dataset against a layout by
  shuffling only the PROBE side (tag by the layout's own hash, group,
  merge per bucket against the bucket file) — the "only the rank side
  re-shuffles" shape PageRank's iteration needs.

The bucket hash is ``streaming.partitioning.stable_hash`` (pandas
``hash_array`` under a fixed key) — stable across processes and runs,
unlike the job-local tags ``bucketed_groupby`` uses, so a layout
written today co-locates with one written next week.  Layout metadata
(key, bucket count, schema) rides in ``_meta.json`` + a zero-row
``_schema.parquet``; writes are tmp+rename so a re-run skips/overwrites
whole buckets idempotently (resumable output).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from ..streaming.partitioning import stable_hash


def bucket_of(values, num_buckets: int) -> np.ndarray:
    """Stable bucket id per value (int fast path avoids object boxing)."""
    arr = np.asarray(values)
    if arr.dtype.kind not in "iu":
        return (stable_hash(arr) % np.uint64(num_buckets)).astype(np.int64)
    h = pd.util.hash_array(arr.astype(np.int64, copy=False),
                           hash_key="graft-paralleldf", categorize=False)
    return (h % np.uint64(num_buckets)).astype(np.int64)


def _bucket_path(root: str, bid: int) -> str:
    return os.path.join(root, f"bucket={bid:05d}.parquet")


def write_bucketed(ds: rd.Dataset, root: str, key: str, *,
                   num_buckets: int = 32) -> pd.DataFrame:
    """Persist ``ds`` as one parquet file per key-hash bucket.

    One shuffle (the layout's last ever); each bucket task writes its
    file via tmp+atomic-rename, so partial runs re-run per bucket.
    Returns the (tiny) manifest frame (bucket, rows)."""
    os.makedirs(root, exist_ok=True)
    def _pa_type(t):
        if isinstance(t, pa.DataType):
            return t
        dt = np.dtype(t)
        if dt.kind == "O":                    # pandas object column
            return pa.string()
        return pa.from_numpy_dtype(dt)

    sch = ds.schema()
    schema = pa.schema([(n, _pa_type(t))
                        for n, t in zip(sch.names, sch.types)])
    pq.write_table(schema.empty_table(), os.path.join(root,
                                                      "_schema.parquet"))
    with open(os.path.join(root, "_meta.json"), "w") as f:
        json.dump({"key": key, "num_buckets": num_buckets,
                   "hash": "pandas-hash_array/graft-paralleldf"}, f)

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["__bucket"] = bucket_of(b[key].to_numpy(), num_buckets)
        return b

    def write_bucket(g: pd.DataFrame) -> pd.DataFrame:
        bid = int(g["__bucket"].iloc[0])
        path = _bucket_path(root, bid)
        tmp = path + ".tmp"
        pq.write_table(pa.Table.from_pandas(
            g.drop(columns="__bucket"), schema=schema,
            preserve_index=False), tmp)
        os.rename(tmp, path)
        return pd.DataFrame({"bucket": [bid], "rows": [len(g)]})

    manifest = (ds.map_batches(tag, batch_format="pandas")
                  .groupby("__bucket")
                  .map_groups(write_bucket, batch_format="pandas"))
    return manifest.to_pandas().sort_values("bucket", ignore_index=True)


def _read_bucket(root: str, bid: int) -> pd.DataFrame:
    path = _bucket_path(root, bid)
    if not os.path.exists(path):
        path = os.path.join(root, "_schema.parquet")
    return pq.read_table(path).to_pandas()


def _meta(root: str) -> dict:
    with open(os.path.join(root, "_meta.json")) as f:
        return json.load(f)


def smb_join(root_a: str, root_b: str, *, on: str,
             right_on: str | None = None, how: str = "inner",
             suffixes=("_a", "_b")) -> rd.Dataset:
    """Join two persisted layouts bucket-by-bucket — NO shuffle: keys
    co-locate by construction, so one map task per bucket id does the
    whole join for that key range."""
    ma, mb = _meta(root_a), _meta(root_b)
    if ma["num_buckets"] != mb["num_buckets"]:
        raise ValueError("layouts bucketed differently: "
                         f"{ma['num_buckets']} vs {mb['num_buckets']}")
    if ma["key"] != on or mb["key"] != (right_on or on):
        raise ValueError("layout keys do not match the join keys")
    nb = ma["num_buckets"]

    def join_bucket(b: pd.DataFrame) -> pd.DataFrame:
        out = []
        for bid in b["bucket"].tolist():
            left = _read_bucket(root_a, int(bid))
            right = _read_bucket(root_b, int(bid))
            if right_on and right_on != on:
                right = right.rename(columns={right_on: on})
            out.append(left.merge(right, on=on, how=how,
                                  suffixes=suffixes))
        return pd.concat(out, ignore_index=True)

    items = rd.from_pandas(pd.DataFrame({"bucket": np.arange(nb)}))
    return items.repartition(nb).map_batches(join_bucket,
                                             batch_format="pandas")


def smb_probe_join(probe: rd.Dataset, root: str, *, probe_on: str,
                   how: str = "inner",
                   suffixes=("_p", "_t")) -> rd.Dataset:
    """Join a live Dataset against a persisted layout by shuffling ONLY
    the probe side: tag probe rows with the layout's stable bucket
    hash, co-group, merge each group against its bucket file.  The
    persisted table never moves — the per-iteration shape an iterative
    algorithm needs (only O(state) crosses the wire per round)."""
    m = _meta(root)
    nb, key = m["num_buckets"], m["key"]

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["__bucket"] = bucket_of(b[probe_on].to_numpy(), nb)
        return b

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        bid = int(g["__bucket"].iloc[0])
        table = _read_bucket(root, bid)
        probe_side = g.drop(columns="__bucket")
        if probe_on != key:
            table = table.rename(columns={key: probe_on})
        return probe_side.merge(table, on=probe_on, how=how,
                                suffixes=suffixes)

    return (probe.map_batches(tag, batch_format="pandas")
                 .groupby("__bucket")
                 .map_groups(join_bucket, batch_format="pandas"))


# ---------------------------------------------------------------------------
# range-partitioned layout + zone-map pruned reads
# ---------------------------------------------------------------------------


def write_range_partitioned(ds: rd.Dataset, root: str, key: str, *,
                            num_partitions: int = 32) -> pd.DataFrame:
    """Persist ``ds`` as one parquet file per KEY RANGE (int64 key) with
    a zone-map manifest — the layout a time-windowed scan wants.

    Nominal ranges are equal-width over the observed [min, max] (one
    cheap min/max pass picks them; skew cannot break correctness
    because pruning consults the MANIFEST's actual per-file min/max,
    never the nominal cuts).  One shuffle writes the layout —
    tmp+atomic-rename per partition, so a partial run re-runs
    idempotently; a later :func:`read_range_pruned` on a window then
    reads ONLY the overlapping files instead of scanning the table
    (file-level predicate pushdown, the same zone-map idea parquet
    row-group stats serve inside a file).  Returns the manifest frame
    (partition, rows, min, max), also persisted as ``_manifest.json``
    (tiny: O(partitions))."""
    os.makedirs(root, exist_ok=True)
    sch = ds.schema()
    schema = pa.schema([(n, t if isinstance(t, pa.DataType)
                         else pa.from_numpy_dtype(np.dtype(t)))
                        for n, t in zip(sch.names, sch.types)])
    pq.write_table(schema.empty_table(),
                   os.path.join(root, "_schema.parquet"))

    from ray.data.aggregate import Max, Min
    mm = ds.aggregate(Min(key), Max(key))
    lo, hi = int(mm[f"min({key})"]), int(mm[f"max({key})"])
    span = max(hi - lo + 1, 1)

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        v = b[key].to_numpy().astype(np.int64)
        p = (v - lo).astype(np.float64) * (num_partitions / span)
        b["__part"] = np.clip(p.astype(np.int64), 0, num_partitions - 1)
        return b

    def write_part(g: pd.DataFrame) -> pd.DataFrame:
        pid = int(g["__part"].iloc[0])
        body = g.drop(columns="__part").sort_values(key,
                                                    kind="mergesort")
        path = os.path.join(root, f"part={pid:05d}.parquet")
        tmp = path + ".tmp"
        pq.write_table(pa.Table.from_pandas(body, schema=schema,
                                            preserve_index=False), tmp)
        os.rename(tmp, path)
        return pd.DataFrame({"partition": [pid], "rows": [len(body)],
                             "min": [int(body[key].iloc[0])],
                             "max": [int(body[key].iloc[-1])]})

    manifest = (ds.map_batches(tag, batch_format="pandas")
                  .groupby("__part")
                  .map_groups(write_part, batch_format="pandas")
                  .to_pandas().sort_values("partition",
                                           ignore_index=True))
    with open(os.path.join(root, "_manifest.json"), "w") as f:
        json.dump({"key": key, "num_partitions": num_partitions,
                   "zones": manifest.to_dict(orient="records")}, f)
    return manifest


def read_range_pruned(root: str, *, lo: int | None = None,
                      hi: int | None = None,
                      columns: list[str] | None = None
                      ) -> tuple[rd.Dataset, dict]:
    """Read a range-partitioned layout for the window ``[lo, hi)``,
    opening ONLY the files whose zone overlaps (manifest min/max — the
    file-level analog of row-group stats).  Returns ``(dataset,
    stats)`` where stats reports files_read / files_total (no silent
    pruning: the read amplification is part of the result).  Rows are
    still exactly filtered (zones bound files, not rows)."""
    with open(os.path.join(root, "_manifest.json")) as f:
        m = json.load(f)
    key = m["key"]
    zones = m["zones"]
    keep = [z for z in zones
            if (hi is None or z["min"] < hi)
            and (lo is None or z["max"] >= lo)]
    stats = {"files_total": len(zones), "files_read": len(keep),
             "rows_in_files": int(sum(z["rows"] for z in keep))}
    if not keep:
        # read (not from_arrow): a 0-row from_arrow Dataset drops the
        # schema on to_pandas, a 0-row parquet read keeps it
        return rd.read_parquet([os.path.join(root, "_schema.parquet")],
                               columns=columns), stats
    import pyarrow.compute as _pc
    flt = None
    if lo is not None:
        flt = _pc.field(key) >= lo
    if hi is not None:
        f2 = _pc.field(key) < hi
        flt = f2 if flt is None else (flt & f2)
    files = [os.path.join(root, f"part={z['partition']:05d}.parquet")
             for z in keep]
    ds = rd.read_parquet(files, columns=columns, filter=flt)
    return ds, stats


# ---------------------------------------------------------------------------
# Z-order (Morton) layout + 2-D box-pruned reads
# ---------------------------------------------------------------------------


def _part1by1(x: np.ndarray) -> np.ndarray:
    """Spread the low 16 bits of each value so a second key can
    interleave into the odd positions (Morton encoding, public bit
    trick)."""
    x = x.astype(np.uint64) & np.uint64(0xFFFF)
    x = (x | (x << np.uint64(8))) & np.uint64(0x00FF00FF)
    x = (x | (x << np.uint64(4))) & np.uint64(0x0F0F0F0F)
    x = (x | (x << np.uint64(2))) & np.uint64(0x33333333)
    x = (x | (x << np.uint64(1))) & np.uint64(0x55555555)
    return x


def _zorder_codes(x: np.ndarray, y: np.ndarray, xlo: int, xspan: int,
                  ylo: int, yspan: int) -> np.ndarray:
    """32-bit Morton code from two int64 keys, each linearly quantized
    to 16 bits over its observed [min, max] (nominal cuts only — skew
    cannot break correctness because pruning consults the manifest's
    ACTUAL per-file min/max of each raw column, never the grid)."""
    qx = ((x.astype(np.float64) - xlo) * (65535.0 / max(xspan, 1)))
    qy = ((y.astype(np.float64) - ylo) * (65535.0 / max(yspan, 1)))
    qx = np.clip(qx, 0, 65535).astype(np.uint64)
    qy = np.clip(qy, 0, 65535).astype(np.uint64)
    return _part1by1(qx) | (_part1by1(qy) << np.uint64(1))


def write_zorder(ds: rd.Dataset, root: str, key_x: str, key_y: str, *,
                 num_partitions: int = 32) -> pd.DataFrame:
    """Persist ``ds`` as one parquet file per Z-ORDER range over two
    int64 keys — the multi-dimensional generalization of
    :func:`write_range_partitioned`: a scan restricted on EITHER key
    (or a 2-D box on both) prunes files, because Morton interleaving
    keeps both keys' locality in one linear order (the public
    Delta/Iceberg OPTIMIZE ZORDER design).

    One min/max pass per key picks the quantization grid; one shuffle
    writes the layout (tmp+atomic-rename per partition — resumable);
    the manifest records each file's actual min/max of BOTH raw keys
    (a 2-D zone map).  Pruning is bounding-box-exact: a file is read
    iff its (x, y) envelope intersects the query box — weaker than
    BIGMIN-style z-interval splitting but correct and the standard
    zone-map contract; rows are always exactly re-filtered."""
    os.makedirs(root, exist_ok=True)
    sch = ds.schema()
    schema = pa.schema([(n, t if isinstance(t, pa.DataType)
                         else pa.from_numpy_dtype(np.dtype(t)))
                        for n, t in zip(sch.names, sch.types)])
    pq.write_table(schema.empty_table(),
                   os.path.join(root, "_schema.parquet"))

    from ray.data.aggregate import Max, Min
    mm = ds.aggregate(Min(key_x), Max(key_x), Min(key_y), Max(key_y))
    xlo, xhi = int(mm[f"min({key_x})"]), int(mm[f"max({key_x})"])
    ylo, yhi = int(mm[f"min({key_y})"]), int(mm[f"max({key_y})"])
    xspan, yspan = max(xhi - xlo, 1), max(yhi - ylo, 1)
    zmax = float(1 << 32)

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        z = _zorder_codes(b[key_x].to_numpy(np.int64),
                          b[key_y].to_numpy(np.int64),
                          xlo, xspan, ylo, yspan)
        p = (z.astype(np.float64) * (num_partitions / zmax))
        b["__z"] = z.astype(np.int64)
        b["__part"] = np.clip(p.astype(np.int64), 0, num_partitions - 1)
        return b

    def write_part(g: pd.DataFrame) -> pd.DataFrame:
        pid = int(g["__part"].iloc[0])
        body = g.sort_values("__z", kind="mergesort").drop(
            columns=["__part", "__z"])
        path = os.path.join(root, f"part={pid:05d}.parquet")
        tmp = path + ".tmp"
        pq.write_table(pa.Table.from_pandas(body, schema=schema,
                                            preserve_index=False), tmp)
        os.rename(tmp, path)
        return pd.DataFrame({
            "partition": [pid], "rows": [len(body)],
            "min_x": [int(body[key_x].min())],
            "max_x": [int(body[key_x].max())],
            "min_y": [int(body[key_y].min())],
            "max_y": [int(body[key_y].max())]})

    manifest = (ds.map_batches(tag, batch_format="pandas")
                  .groupby("__part")
                  .map_groups(write_part, batch_format="pandas")
                  .to_pandas().sort_values("partition",
                                           ignore_index=True))
    with open(os.path.join(root, "_manifest.json"), "w") as f:
        json.dump({"key_x": key_x, "key_y": key_y,
                   "num_partitions": num_partitions,
                   "zones": manifest.to_dict(orient="records")}, f)
    return manifest


def read_zorder_pruned(root: str, *, x_lo: int | None = None,
                       x_hi: int | None = None, y_lo: int | None = None,
                       y_hi: int | None = None,
                       columns: list[str] | None = None
                       ) -> tuple[rd.Dataset, dict]:
    """Read a z-order layout for the half-open box
    ``[x_lo, x_hi) x [y_lo, y_hi)`` opening only files whose 2-D zone
    envelope intersects it.  Returns ``(dataset, stats)`` with
    files_read / files_total (read amplification is part of the
    result, never silent); rows are exactly re-filtered."""
    with open(os.path.join(root, "_manifest.json")) as f:
        m = json.load(f)
    kx, ky = m["key_x"], m["key_y"]
    zones = m["zones"]
    keep = [z for z in zones
            if (x_hi is None or z["min_x"] < x_hi)
            and (x_lo is None or z["max_x"] >= x_lo)
            and (y_hi is None or z["min_y"] < y_hi)
            and (y_lo is None or z["max_y"] >= y_lo)]
    stats = {"files_total": len(zones), "files_read": len(keep),
             "rows_in_files": int(sum(z["rows"] for z in keep))}
    if not keep:
        # read (not from_arrow): a 0-row from_arrow Dataset drops the
        # schema on to_pandas, a 0-row parquet read keeps it
        return rd.read_parquet([os.path.join(root, "_schema.parquet")],
                               columns=columns), stats
    import pyarrow.compute as _pc
    flt = None
    for fld, lo, hi in ((kx, x_lo, x_hi), (ky, y_lo, y_hi)):
        if lo is not None:
            e = _pc.field(fld) >= lo
            flt = e if flt is None else (flt & e)
        if hi is not None:
            e = _pc.field(fld) < hi
            flt = e if flt is None else (flt & e)
    files = [os.path.join(root, f"part={z['partition']:05d}.parquet")
             for z in keep]
    ds = rd.read_parquet(files, columns=columns, filter=flt)
    return ds, stats
