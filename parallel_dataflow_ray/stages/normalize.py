"""Canonicalizer stage — the graft of ``CanonicalizeLiterals``
(reference ``utils/src/dataflow_executor.rs:34-35``: run unconditionally
before any analysis).

Normalizes a clips batch in place (stateless, zero-copy where possible):
NFC-normalize + whitespace-collapse transcripts, uppercase codec names
lowered, sr_hz sanity-clamped.  Every pipeline ingests through this
stage so operator kernels can assume canonical input.
"""

from __future__ import annotations

import unicodedata

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd


def canonicalize_batch(t: pa.Table) -> pa.Table:
    cols = {}
    if "transcript" in t.column_names:
        txts = t["transcript"].to_pylist()
        norm = [" ".join(unicodedata.normalize("NFC", x or "").split())
                for x in txts]
        cols["transcript"] = pa.array(norm, type=pa.string())
    if "codec" in t.column_names:
        cols["codec"] = pc.utf8_lower(t["codec"])
    if "sr_hz" in t.column_names:
        cols["sr_hz"] = pc.max_element_wise(t["sr_hz"], 1)
    for name, arr in cols.items():
        t = t.set_column(t.column_names.index(name), name, arr)
    return t


def canonicalize(ds: rd.Dataset) -> rd.Dataset:
    return ds.map_batches(canonicalize_batch, batch_format="pyarrow",
                          batch_size=8192)
