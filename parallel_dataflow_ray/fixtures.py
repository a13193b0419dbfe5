"""Deterministic synthetic fixtures (FIXTURES.md F1-F3) — seed-derived, no I/O.

The reference tests against fixed corpora (``core/`` ``rand/``
``rand_small/`` ``rand_multi_func/`` — reference
``impls/src/bin/test.rs:77-101``).  Our analog is a family of
deterministic generators: every cell of the clips table is a pure
function of ``(seed, row_index)``, so the oracle executor, the parallel
engine, and any resumed run can all regenerate byte-identical inputs
without golden files.

Schema (authoritative, from BASELINE.json ``input_hint``)::

    clip_id: string, bytes: binary, sr_hz: int32, dur_ms: int32,
    codec: string, transcript: string

plus engine columns added at ingest: ``event_ts: timestamp[us]``,
``speaker_id: string`` (skew axis), ``offset: int64`` (arrival order /
lineage).  Rows are emitted in *arrival* order: ``event_ts`` is jittered
by a bounded lateness so arrival order != event-time order (the
out-of-order tier, FIXTURES.md F3 ``ooo``).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from .functions.audio import encode_clip, synth_pcm

_VOCAB = (
    "the quick brown fox jumps over lazy dog stream window join merge "
    "watermark epoch state audio clip speaker codec frame sample batch "
    "partition offset commit replay exactly once lattice meet transfer"
).split()

_SR_CYCLE = (8000, 16000, 44100)
_BASE_TS_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in microseconds

CLIPS_SCHEMA = pa.schema(
    [
        ("clip_id", pa.string()),
        ("bytes", pa.binary()),
        ("sr_hz", pa.int32()),
        ("dur_ms", pa.int32()),
        ("codec", pa.string()),
        ("transcript", pa.string()),
        ("speaker_id", pa.string()),
        ("event_ts", pa.timestamp("us")),
        ("offset", pa.int64()),
    ]
)


def _clip_seed(seed: int, i: int) -> int:
    h = hashlib.blake2b(f"{seed}:{i}".encode(), digest_size=8).digest()
    return int.from_bytes(h, "little")


def transcript_for(seed: int, i: int, n_words: int = 8) -> str:
    rng = np.random.default_rng(_clip_seed(seed, i) + 1)
    return " ".join(_VOCAB[j] for j in rng.integers(0, len(_VOCAB), n_words))


def clip_row(seed: int, i: int, *, skew: float = 0.0, n_speakers: int = 16,
             lateness_ms: int = 0, dup_every: int = 0) -> dict:
    """One deterministic clip row. ``dup_every`` > 0 re-issues every k-th
    clip_id (a late *update* for the same key — exercises dedup / kill-set
    kernels, the reaching-defs analog)."""
    s = _clip_seed(seed, i)
    rng = np.random.default_rng(s)
    if dup_every and i > 0 and i % dup_every == 0:
        logical = i - dup_every  # re-issue an earlier clip_id (keyed update)
    else:
        logical = i
    sr = _SR_CYCLE[i % len(_SR_CYCLE)]
    dur_ms = 200 + (s % 1801)
    n = int(sr * dur_ms / 1000)
    codec = "pcm16" if (s >> 8) % 10 < 9 else "ulaw"  # ~90/10 hot-codec skew
    pcm = synth_pcm(s, n, sr)
    if skew > 0.0 and rng.random() < skew:
        speaker = "spk-0000"  # hot key
    else:
        speaker = f"spk-{(s >> 16) % n_speakers:04d}"
    jitter = int(rng.integers(0, lateness_ms * 1000 + 1)) if lateness_ms else 0
    return {
        "clip_id": f"clip-{logical:08d}",
        "bytes": encode_clip(pcm, codec),
        "sr_hz": sr,
        "dur_ms": dur_ms,
        "codec": codec,
        "transcript": transcript_for(seed, logical),
        "speaker_id": speaker,
        "event_ts": _BASE_TS_US + i * 10_000 - jitter,
        "offset": i,
    }


def clips_batch(seed: int, start: int, count: int, **kw) -> pa.Table:
    """Generate rows [start, start+count) as one Arrow table."""
    rows = [clip_row(seed, i, **kw) for i in range(start, start + count)]
    cols = {name: [r[name] for r in rows] for name in CLIPS_SCHEMA.names}
    cols["event_ts"] = pa.array(cols["event_ts"], type=pa.timestamp("us"))
    return pa.table(cols, schema=CLIPS_SCHEMA)


def clips_table(n: int, seed: int = 42, **kw) -> pa.Table:
    """Driver-local generation (tiny / unit-test tier)."""
    return clips_batch(seed, 0, n, **kw)


def clips_dataset(n: int, seed: int = 42, *, blocks: int = 0, **kw):
    """Distributed generation: ``ray.data.range(n)`` -> map_batches(gen).

    Fixture generation itself is a Ray Data pipeline so bench-scale inputs
    are produced in parallel (and would be on a cluster).
    """
    import ray.data as rd

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_numpy()
        return clips_batch(seed, int(ids[0]), len(ids), **kw)

    ds = rd.range(n, override_num_blocks=blocks or max(1, n // 2000))
    return ds.map_batches(gen, batch_format="pyarrow")


def transcript_events_table(n: int, seed: int = 42, *, lateness_ms: int = 0) -> pa.Table:
    """Second stream for the symmetric hash join (FIXTURES.md F2).

    Same clip_id key space as the clips stream, independent jitter.
    """
    rng = np.random.default_rng(seed + 7)
    jit = rng.integers(0, lateness_ms * 1000 + 1, n) if lateness_ms else np.zeros(n, dtype=np.int64)
    return pa.table(
        {
            "clip_id": [f"clip-{i:08d}" for i in range(n)],
            "transcript": [transcript_for(seed, i) for i in range(n)],
            "event_ts": pa.array((_BASE_TS_US + np.arange(n) * 10_000 + 3_000 - jit).tolist(),
                                 type=pa.timestamp("us")),
            "offset": np.arange(n, dtype=np.int64),
        }
    )
