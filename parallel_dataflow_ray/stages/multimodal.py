"""Multimodal columns: opaque binary payloads + typed metadata.

Audio decode is REAL (pcm16/ulaw via numpy — see ``functions.audio``).
Image/video decode needs external libs absent from this container, so
those kernels are deterministic fakes / NotImplementedError stubs with
REAL Ray-side plumbing: schema handling, actor-pool stage shape, batch
sizing for wide binary rows, and output layout are all exercised by
tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..functions.audio import bytes_per_sample, decode_clip, SUPPORTED_CODECS


class AudioFeatureStage:
    """Actor-pool stage: decode audio bytes -> per-clip features.

    Stateful-by-actor (decoder tables built once in ``__init__``);
    emits scalar features only — decoded PCM never enters the object
    store (a 100 TB stream of clips must not become 200 TB of floats).
    Use small ``batch_size`` for wide binary rows.
    """

    def __init__(self, quantize: int = 1 << 20):
        self.q = quantize

    def __call__(self, batch: pa.Table) -> pa.Table:
        bts = batch["bytes"].to_pylist()
        codecs = batch["codec"].to_pylist()
        n = len(bts)
        n_samples = np.zeros(n, dtype=np.int64)
        rms_q = np.zeros(n, dtype=np.int64)
        peak_q = np.zeros(n, dtype=np.int64)
        for i, (b, c) in enumerate(zip(bts, codecs)):
            pcm = decode_clip(b, c)
            n_samples[i] = pcm.size
            if pcm.size:
                rms_q[i] = int(round(float(np.sqrt(np.mean(np.square(pcm, dtype=np.float64)))) * self.q))
                peak_q[i] = int(round(float(np.max(np.abs(pcm))) * self.q))
        out = batch.drop_columns(["bytes"])
        out = out.append_column("n_samples", pa.array(n_samples))
        out = out.append_column("rms_q20", pa.array(rms_q))
        out = out.append_column("peak_q20", pa.array(peak_q))
        return out


def audio_features(ds: rd.Dataset, *, concurrency=(1, 8), batch_size=256
                   ) -> rd.Dataset:
    return ds.map_batches(AudioFeatureStage, batch_format="pyarrow",
                          batch_size=batch_size, concurrency=concurrency,
                          num_cpus=1)


def validate_clip_sizes(ds: rd.Dataset) -> rd.Dataset:
    """Metadata-only integrity check: len(bytes) must equal
    sr_hz * dur_ms / 1000 * bytes_per_sample(codec)."""

    def check(t: pa.Table) -> pa.Table:
        lens = pa.compute.binary_length(t["bytes"]).to_numpy()
        sr = t["sr_hz"].to_numpy()
        dur = t["dur_ms"].to_numpy()
        bps = np.array([bytes_per_sample(c) if c in SUPPORTED_CODECS else -1
                        for c in t["codec"].to_pylist()])
        expect = (sr.astype(np.int64) * dur // 1000) * bps
        return t.append_column("size_ok", pa.array(lens == expect))

    return ds.map_batches(check, batch_format="pyarrow")


class ImageDecodeStage:
    """STUB: image decode plumbing (schema + actor shape are real; the
    codec is not available in this container).

    In ``fake`` mode emits deterministic pseudo-features derived from the
    payload bytes so pipelines and tests can exercise the full topology.
    """

    def __init__(self, mode: str = "fake"):
        if mode not in ("fake", "strict"):
            raise ValueError(mode)
        self.mode = mode

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.mode == "strict":
            raise NotImplementedError(
                "image decoding requires PIL/opencv, not present in this "
                "container; run with mode='fake' for plumbing tests")
        payloads = batch["bytes"].to_pylist()
        h = np.array([len(p or b"") for p in payloads], dtype=np.int64)
        checksum = np.array([int(np.frombuffer(p[:8].ljust(8, b"\0"), "<u8")[0] & 0x7FFFFFFF)
                             if p else 0 for p in payloads], dtype=np.int64)
        out = batch.drop_columns(["bytes"])
        out = out.append_column("payload_len", pa.array(h))
        out = out.append_column("payload_checksum", pa.array(checksum))
        return out
