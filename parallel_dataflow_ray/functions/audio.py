"""Audio codecs and signal kernels — pure numpy, no external audio libs.

The engine treats audio as opaque ``binary`` columns with typed metadata
(``sr_hz``, ``dur_ms``, ``codec``) per the input schema
``(clip_id, bytes, sr_hz, dur_ms, codec, transcript)``.  Two codecs are
implemented for real (both losslessly expressible in numpy):

- ``pcm16``: little-endian signed 16-bit PCM (SNR ~90 dB round-trip)
- ``ulaw``:  G.711 mu-law 8-bit companding (SNR ~35 dB round-trip,
  above the 30 dB parity floor)

Codecs that would need external libraries (mp3/opus/...) are routed to
:func:`decode_clip` 's ``NotImplementedError`` stub — the Ray-side
plumbing (schema, actor signature, batch sizing) is real and tested,
the third-party decode is not available in this container.

This file is the graft analog of the reference's parser stage
(reference ``utils/src/dataflow_executor.rs:29-32``): bytes on the wire
-> a typed in-memory value, done statelessly per batch.
"""

from __future__ import annotations

import numpy as np

_MU = 255.0

SUPPORTED_CODECS = ("pcm16", "ulaw")


# ---------------------------------------------------------------------------
# encode / decode (vectorized over one clip's samples)
# ---------------------------------------------------------------------------

def encode_pcm16(x: np.ndarray) -> bytes:
    """float32 [-1, 1] -> little-endian int16 bytes."""
    q = np.clip(np.rint(x * 32767.0), -32768, 32767).astype("<i2")
    return q.tobytes()


def decode_pcm16(b: bytes) -> np.ndarray:
    return (np.frombuffer(b, dtype="<i2").astype(np.float32)) / 32767.0


def encode_ulaw(x: np.ndarray) -> bytes:
    """float32 [-1, 1] -> G.711-style mu-law companded uint8 bytes."""
    x = np.clip(x, -1.0, 1.0)
    y = np.sign(x) * np.log1p(_MU * np.abs(x)) / np.log1p(_MU)  # [-1, 1]
    q = np.rint((y + 1.0) * 127.5).astype(np.uint8)
    return q.tobytes()


def decode_ulaw(b: bytes) -> np.ndarray:
    y = np.frombuffer(b, dtype=np.uint8).astype(np.float32) / 127.5 - 1.0
    return np.sign(y) * (np.expm1(np.abs(y) * np.log1p(_MU))) / _MU


_ENCODERS = {"pcm16": encode_pcm16, "ulaw": encode_ulaw}
_DECODERS = {"pcm16": decode_pcm16, "ulaw": decode_ulaw}


def encode_clip(x: np.ndarray, codec: str) -> bytes:
    try:
        return _ENCODERS[codec](x)
    except KeyError:
        raise NotImplementedError(
            f"codec {codec!r}: external encoder not available in this "
            f"container (supported: {SUPPORTED_CODECS})"
        ) from None


def decode_clip(b: bytes, codec: str) -> np.ndarray:
    """Decode one clip's encoded bytes to float32 PCM in [-1, 1]."""
    try:
        return _DECODERS[codec](b)
    except KeyError:
        raise NotImplementedError(
            f"codec {codec!r}: external decoder not available in this "
            f"container (supported: {SUPPORTED_CODECS})"
        ) from None


def bytes_per_sample(codec: str) -> int:
    return {"pcm16": 2, "ulaw": 1}[codec]


# ---------------------------------------------------------------------------
# signal metrics
# ---------------------------------------------------------------------------

def rms(x: np.ndarray) -> float:
    if x.size == 0:
        return 0.0
    return float(np.sqrt(np.mean(np.square(x, dtype=np.float64))))


def snr_db(ref: np.ndarray, test: np.ndarray) -> float:
    """Signal-to-noise ratio of ``test`` against reference PCM, in dB.

    The row-parity invariant for all differential tests is
    ``snr_db(oracle_pcm, engine_pcm) >= 30`` plus transcript string
    equality (BASELINE.json ``input_hint``).
    """
    if ref.shape != test.shape:
        return float("-inf")
    noise = ref.astype(np.float64) - test.astype(np.float64)
    p_sig = float(np.sum(ref.astype(np.float64) ** 2))
    p_noise = float(np.sum(noise**2))
    if p_noise == 0.0:
        return float("inf")
    if p_sig == 0.0:
        return float("-inf")
    return 10.0 * np.log10(p_sig / p_noise)


def synth_pcm(seed: int, n_samples: int, sr_hz: int) -> np.ndarray:
    """Deterministic sine-mixture + noise clip (fixture generator kernel).

    All parameters derive from ``seed`` so any process can regenerate the
    exact same PCM for a given clip — this is what makes golden-free
    differential testing possible (FIXTURES.md F1).
    """
    rng = np.random.default_rng(seed)
    t = np.arange(n_samples, dtype=np.float32) / float(sr_hz)
    out = np.zeros(n_samples, dtype=np.float32)
    for _ in range(3):
        f = float(rng.uniform(80.0, min(3800.0, sr_hz / 2.5)))
        a = float(rng.uniform(0.05, 0.25))
        ph = float(rng.uniform(0.0, 2.0 * np.pi))
        out += a * np.sin(2.0 * np.pi * f * t + ph, dtype=np.float32)
    out += rng.normal(0.0, 0.01, n_samples).astype(np.float32)
    return np.clip(out, -1.0, 1.0)
