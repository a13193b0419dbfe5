"""Codec round-trip + SNR invariant (BASELINE.json input_hint: SNR >= 30 dB)."""

import numpy as np
import pytest

from parallel_dataflow_ray.functions import audio


@pytest.mark.parametrize("codec,min_snr", [("pcm16", 80.0), ("ulaw", 30.0)])
def test_roundtrip_snr(codec, min_snr):
    pcm = audio.synth_pcm(seed=123, n_samples=16000, sr_hz=16000)
    out = audio.decode_clip(audio.encode_clip(pcm, codec), codec)
    assert out.shape == pcm.shape
    assert audio.snr_db(pcm, out) >= min_snr


def test_unknown_codec_is_stubbed():
    with pytest.raises(NotImplementedError):
        audio.decode_clip(b"\x00", "opus")
    with pytest.raises(NotImplementedError):
        audio.encode_clip(np.zeros(4, np.float32), "mp3")


def test_synth_deterministic():
    a = audio.synth_pcm(7, 1000, 8000)
    b = audio.synth_pcm(7, 1000, 8000)
    assert np.array_equal(a, b)
    c = audio.synth_pcm(8, 1000, 8000)
    assert not np.array_equal(a, c)


def test_snr_identity_and_mismatch():
    x = audio.synth_pcm(1, 100, 8000)
    assert audio.snr_db(x, x) == float("inf")
    assert audio.snr_db(x, x[:50]) == float("-inf")
