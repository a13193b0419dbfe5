"""Training-sequence packing: lay a document corpus out as fixed-size
token shards / packs — the concatenate-then-chunk step an LM data
pipeline runs after curation.

Two layouts:

- :func:`token_shards` — the GPT-style "one long token stream chunked
  every C tokens" layout: each doc's STARTING global token offset (in
  ``id`` order) determines its pack; a doc may straddle its boundary
  (readers consume with overlap).  Exact and deterministic, so it is
  SQL-gated (a shifted window SUM).  The global ordered prefix sum is
  distributed as a two-pass scan: per-range partial sums (one tiny row
  per range crosses the driver — O(#ranges), never O(rows)), exclusive
  range offsets broadcast via ``ray.put``, then a per-range local
  cumsum.  Reference analog: the worklist's block-level fold composing
  into a program-level result (``impls/src/sequential.rs:28-44``).

- :func:`pack_greedy` — next-fit packing: docs are NOT split; walk each
  range in ``id`` order, open a new pack when the next doc would
  overflow ``capacity``.  Pack ids are namespaced per range
  (``range_id << 32 | local``) so ranges pack independently — the
  resumable/parallel property a 100 TB run needs (any range can be
  re-packed in isolation).  Deterministic but not SQL-expressible
  (the overflow recurrence isn't a window function); property-tested
  instead: exact row preservation, no pack over capacity unless a
  single oversized doc, offsets contiguous within packs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data as rd


def _range_offsets(ds: rd.Dataset, id_col: str, weight_col: str,
                   range_size: int) -> dict[int, int]:
    """Pass 1 of the distributed scan: exclusive prefix sum of per-range
    totals.  Only one (range_id, total) row per range reaches the
    driver."""
    from .relational import grouped_sum

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"__range": b[id_col].to_numpy() // range_size,
                             "__w": b[weight_col].to_numpy()})

    totals = grouped_sum(ds.map_batches(tag, batch_format="pandas"),
                         ["__range"], ["__w"]).to_pandas()
    totals = totals.sort_values("__range")
    cum = totals["__w"].cumsum().shift(1, fill_value=0).astype("int64")
    return dict(zip(totals["__range"].astype("int64"), cum))


def token_shards(ds: rd.Dataset, id_col: str, weight_col: str,
                 capacity: int, range_size: int = 1024) -> rd.Dataset:
    """Append (pack_id, pack_offset): the doc's position in the global
    concatenated token stream chunked every ``capacity`` tokens, with
    the stream ordered by ``id_col``.  Output columns: id, weight,
    pack_id, pack_offset."""
    from .relational import bucketed_groupby

    offsets = ray.put(_range_offsets(ds, id_col, weight_col, range_size))

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        b = b[[id_col, weight_col]].copy()
        b["__range"] = b[id_col].to_numpy() // range_size
        return b

    tagged = ds.map_batches(tag, batch_format="pandas")

    class PerRange:
        """Instance-as-UDF: ships only the ObjectRef; the offsets dict
        is read once per task from the local object store."""

        def __init__(self):
            self.ref = offsets
            self.off: dict | None = None

        def __call__(self, g: pd.DataFrame) -> pd.DataFrame:
            if self.off is None:
                self.off = ray.get(self.ref)
            parts = []
            for rid, sub in g.groupby("__range", sort=False):
                sub = sub.sort_values(id_col, kind="mergesort")
                w = sub[weight_col].to_numpy(dtype=np.int64)
                start = int(self.off[int(rid)]) + (np.cumsum(w) - w)
                parts.append(pd.DataFrame({
                    id_col: sub[id_col].to_numpy(),
                    weight_col: w,
                    "pack_id": start // capacity,
                    "pack_offset": start % capacity,
                }))
            return pd.concat(parts, ignore_index=True)

    return bucketed_groupby(tagged, ["__range"], PerRange())


def pack_greedy(ds: rd.Dataset, id_col: str, weight_col: str,
                capacity: int, range_size: int = 1024) -> rd.Dataset:
    """Next-fit whole-doc packing per id-range (docs never split).
    Output: id, weight, pack_id (= range_id << 32 | local pack index),
    pack_offset (token offset inside the pack)."""
    from .relational import bucketed_groupby

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        b = b[[id_col, weight_col]].copy()
        b["__range"] = b[id_col].to_numpy() // range_size
        return b

    tagged = ds.map_batches(tag, batch_format="pandas")

    def per_range(g: pd.DataFrame) -> pd.DataFrame:
        parts = []
        for rid, sub in g.groupby("__range", sort=False):
            sub = sub.sort_values(id_col, kind="mergesort")
            w = sub[weight_col].to_numpy(dtype=np.int64)
            pack = np.empty(w.size, dtype=np.int64)
            offs = np.empty(w.size, dtype=np.int64)
            cur, fill = 0, 0
            for i, wi in enumerate(w):  # sequential recurrence; range-local
                if fill and fill + wi > capacity:
                    cur, fill = cur + 1, 0
                pack[i], offs[i] = cur, fill
                fill += wi
            parts.append(pd.DataFrame({
                id_col: sub[id_col].to_numpy(), weight_col: w,
                "pack_id": (int(rid) << 32) | pack,
                "pack_offset": offs}))
        return pd.concat(parts, ignore_index=True)

    return bucketed_groupby(tagged, ["__range"], per_range)


def chunk_docs(ds: rd.Dataset, *, window: int, hop: int,
               text_col: str = "text", id_col: str = "doc_id"
               ) -> rd.Dataset:
    """Fixed-window token chunking with overlap — the text analog of
    the audio chunker (stages/audio_prep.py::chunk_clips) and the
    map-only alternative to :func:`token_shards`: each doc
    independently splits into ``window``-token chunks every ``hop``
    tokens (the last chunk may be short).  Pure per-batch map — zero
    shuffles, embarrassingly parallel, so it composes with curation at
    any scale.  Output: (id, chunk_id, chunk_text, n_tokens).

    Token semantics match the repo's SQL twins exactly: single-space
    split, empty tokens preserved (``''`` is one token).  The window
    join is per-chunk Python (string assembly is inherently
    object-level, same trade as ``word_shingles``); the per-doc chunk
    plan itself is arithmetic."""

    def fn(b: pd.DataFrame) -> pd.DataFrame:
        ids: list[int] = []
        cids: list[int] = []
        texts: list[str] = []
        ntoks: list[int] = []
        for did, txt in zip(b[id_col].to_numpy(), b[text_col].fillna("")):
            toks = txt.split(" ")
            for ci, s in enumerate(range(0, len(toks), hop)):
                w = toks[s:s + window]
                ids.append(did)
                cids.append(ci)
                texts.append(" ".join(w))
                ntoks.append(len(w))
        return pd.DataFrame({id_col: np.asarray(ids, np.int64),
                             "chunk_id": np.asarray(cids, np.int64),
                             "chunk_text": pd.Series(texts, dtype=object),
                             "n_tokens": np.asarray(ntoks, np.int64)})

    return ds.map_batches(fn, batch_format="pandas", batch_size=1024)
