"""Audio preprocessing kernels: brute-force parity, signal-quality
bounds (SNR >= 30 dB), reconstruction laws, and Ray end-to-end."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from parallel_dataflow_ray.fixtures import clips_dataset, clips_table
from parallel_dataflow_ray.functions.audio import (
    decode_clip, decode_pcm16, encode_clip, encode_pcm16, snr_db, synth_pcm,
)
from parallel_dataflow_ray.stages.audio_prep import (
    ChunkStage, ClipQualityStage, ResampleStage, TrimSilenceStage,
    VadSegmentStage, chunk_plan, decode_flat, frame_rms, frame_starts,
    gain_normalize_flat, per_clip_peak, per_clip_rms, resample_flat,
    vad_segments,
)


def _flat_fixture(n=12, seed=3):
    t = clips_table(n, seed=seed)
    bts = t["bytes"].to_pylist()
    codecs = t["codec"].to_pylist()
    return t, decode_flat(bts, codecs)


# ---------------------------------------------------------------------------
# decode_flat
# ---------------------------------------------------------------------------

def test_decode_flat_matches_per_clip_decode():
    t, (flat, lens, off) = _flat_fixture()
    for i, (b, c) in enumerate(zip(t["bytes"].to_pylist(),
                                   t["codec"].to_pylist())):
        ref = decode_clip(b, c)
        got = flat[off[i]:off[i] + lens[i]]
        assert np.array_equal(ref, got), f"clip {i} codec {c}"


def test_decode_flat_empty_batch():
    flat, lens, off = decode_flat([], [])
    assert flat.size == 0 and lens.size == 0 and off.size == 0


# ---------------------------------------------------------------------------
# resample
# ---------------------------------------------------------------------------

def test_resample_identity_when_rates_match():
    t, (flat, lens, off) = _flat_fixture()
    sr = t["sr_hz"].to_numpy().astype(np.int64)
    for r in np.unique(sr):
        sel = sr == r
        # build a flat stream of just those clips
        idx = np.flatnonzero(sel)
        parts = [flat[off[i]:off[i] + lens[i]] for i in idx]
        f2 = np.concatenate(parts)
        l2 = lens[idx]
        o2 = np.cumsum(l2) - l2
        out, m = resample_flat(f2, l2, o2, np.full(idx.size, r), int(r))
        assert np.array_equal(m, l2)
        assert np.allclose(out, f2, atol=1e-6)


def test_resample_sine_snr_vs_analytic():
    # a bandlimited tone resampled 8k -> 16k must match the directly
    # synthesized 16 kHz tone at >= 30 dB SNR (the repo's parity floor)
    sr1, sr2, f0, dur = 8000, 16000, 440.0, 1.0
    n1 = int(sr1 * dur)
    x1 = np.sin(2 * np.pi * f0 * np.arange(n1) / sr1).astype(np.float32)
    out, m = resample_flat(x1, np.array([n1]), np.array([0]),
                           np.array([sr1]), sr2)
    n2 = int(m[0])
    ref = np.sin(2 * np.pi * f0 * np.arange(n2) / sr2).astype(np.float32)
    # ignore the last edge sample (clamped interpolation)
    assert snr_db(ref[: n2 - 2], out[: n2 - 2]) >= 30.0


def test_resample_length_law_and_downsample():
    rng = np.random.default_rng(0)
    lens = rng.integers(1, 5000, 20)
    sr_in = np.array([8000, 16000, 44100] * 7)[:20]
    flat = rng.normal(0, 0.1, int(lens.sum())).astype(np.float32)
    off = np.cumsum(lens) - lens
    out, m = resample_flat(flat, lens, off, sr_in, 16000)
    expect = (lens * 16000 + sr_in // 2) // sr_in
    assert np.array_equal(m, np.maximum(expect, 1))
    assert out.size == m.sum()


def test_resample_batch_equals_per_clip():
    # flat-vectorized resample over a batch == resampling each clip alone
    t, (flat, lens, off) = _flat_fixture(n=9, seed=11)
    sr = t["sr_hz"].to_numpy().astype(np.int64)
    out, m = resample_flat(flat, lens, off, sr, 16000)
    oo = np.cumsum(m) - m
    for i in range(lens.size):
        x = flat[off[i]:off[i] + lens[i]]
        oi, mi = resample_flat(x, lens[i:i + 1], np.array([0]),
                               sr[i:i + 1], 16000)
        assert np.array_equal(oi, out[oo[i]:oo[i] + m[i]]), f"clip {i}"


# ---------------------------------------------------------------------------
# framing / VAD
# ---------------------------------------------------------------------------

def test_frame_rms_matches_loop():
    t, (flat, lens, off) = _flat_fixture(n=8)
    sr = t["sr_hz"].to_numpy().astype(np.int64)
    flen = sr * 20 // 1000
    starts, nf, flens = frame_starts(lens, off, flen)
    got = frame_rms(flat, starts, flens)
    k = 0
    for i in range(lens.size):
        x = flat[off[i]:off[i] + lens[i]]
        L = int(flen[i])
        for j in range(int(nf[i])):
            fr = x[j * L:(j + 1) * L]
            ref = float(np.sqrt(np.mean(np.square(fr, dtype=np.float64))))
            assert got[k] == pytest.approx(ref, rel=1e-9), (i, j)
            k += 1
    assert k == got.size


def test_vad_segments_brute_force():
    rng = np.random.default_rng(5)
    nf = rng.integers(0, 9, 30)
    mask = rng.random(int(nf.sum())) < 0.5
    ci, s, e = vad_segments(mask, nf)
    # brute force per clip
    expect = []
    k = 0
    for i, f in enumerate(nf):
        m = mask[k:k + f]
        k += f
        j = 0
        while j < f:
            if m[j]:
                j2 = j
                while j2 < f and m[j2]:
                    j2 += 1
                expect.append((i, j, j2))
                j = j2
            else:
                j += 1
    got = list(zip(ci.tolist(), s.tolist(), e.tolist()))
    assert got == expect


def test_vad_stage_recovers_padded_speech():
    # synth speech padded with silence on both sides: the VAD segment
    # must cover the speech span to within one frame
    sr = 16000
    speech = synth_pcm(7, sr, sr)  # 1 s of tone mixture (rms ~ 0.2)
    pad = np.zeros(sr // 2, np.float32)  # 500 ms silence each side
    x = np.concatenate([pad, speech, pad])
    t = pa.table({
        "clip_id": ["c0"], "bytes": [encode_pcm16(x)],
        "sr_hz": pa.array([sr], pa.int32()), "dur_ms": pa.array([2000], pa.int32()),
        "codec": ["pcm16"], "transcript": ["hello world"],
    })
    seg = VadSegmentStage(frame_ms=20, thresh=0.02)(t).to_pandas()
    assert len(seg) == 1
    assert seg.start_ms[0] == pytest.approx(500, abs=20)
    assert seg.end_ms[0] == pytest.approx(1500, abs=20)


def test_trim_silence_roundtrip():
    sr = 8000
    speech = synth_pcm(9, sr * 2, sr)
    pad_l = np.zeros(sr // 4, np.float32)
    pad_r = np.zeros(sr // 2, np.float32)
    x = np.concatenate([pad_l, speech, pad_r])
    t = pa.table({
        "clip_id": ["c0"], "bytes": [encode_pcm16(x)],
        "sr_hz": pa.array([sr], pa.int32()),
        "dur_ms": pa.array([int(len(x) * 1000 / sr)], pa.int32()),
        "codec": ["pcm16"], "transcript": ["a b"],
    })
    out = TrimSilenceStage(frame_ms=20, thresh=0.02)(t)
    trimmed = decode_pcm16(out["bytes"][0].as_py())
    # trimmed signal must be the speech span to within one frame and
    # match the original content there (pcm16 requantization only)
    flen = sr * 20 // 1000
    start = int(out["trim_start_ms"][0].as_py()) * sr // 1000
    assert abs(start - len(pad_l)) <= flen
    ref = x[start:start + trimmed.size]
    assert snr_db(ref, trimmed) >= 30.0
    assert abs(trimmed.size - (speech.size)) <= 2 * flen


def test_trim_all_silence_emits_empty():
    sr = 8000
    x = np.zeros(sr, np.float32)
    t = pa.table({
        "clip_id": ["c0"], "bytes": [encode_pcm16(x)],
        "sr_hz": pa.array([sr], pa.int32()), "dur_ms": pa.array([1000], pa.int32()),
        "codec": ["pcm16"], "transcript": [""],
    })
    out = TrimSilenceStage()(t)
    assert out["n_samples"][0].as_py() == 0
    assert out["bytes"][0].as_py() == b""


# ---------------------------------------------------------------------------
# gain normalize
# ---------------------------------------------------------------------------

def test_gain_normalize_hits_target_rms():
    t, (flat, lens, off) = _flat_fixture(n=10)
    out, gain = gain_normalize_flat(flat, lens, off, target_rms=0.1)
    r = per_clip_rms(out, lens, off)
    p = per_clip_peak(out, lens, off)
    for i in range(lens.size):
        assert p[i] <= 0.99 + 1e-6
        # either the target was hit, or the peak cap bound it
        assert r[i] == pytest.approx(0.1, rel=1e-3) or \
            p[i] == pytest.approx(0.99, rel=1e-3)


def test_gain_normalize_silence_unchanged():
    x = np.zeros(100, np.float32)
    out, gain = gain_normalize_flat(x, np.array([100]), np.array([0]))
    assert np.array_equal(out, x) and gain[0] == 1.0


# ---------------------------------------------------------------------------
# chunking
# ---------------------------------------------------------------------------

def test_chunk_plan_brute_force():
    rng = np.random.default_rng(2)
    lens = rng.integers(0, 3000, 25)
    chunk = np.full(25, 800)
    hop = np.full(25, 600)
    ci, start, cnt = chunk_plan(lens, chunk, hop)
    expect = []
    for i, n in enumerate(lens):
        if n == 0:
            continue
        k = 0
        while True:
            s = k * 600
            if k > 0 and s >= n:
                break
            e = min(s + 800, n)
            expect.append((i, s, e - s))
            if e >= n:
                break
            k += 1
    got = list(zip(ci.tolist(), start.tolist(), cnt.tolist()))
    assert got == expect


def test_chunk_stage_reconstruction():
    # non-overlapping chunks (hop == chunk) concatenate back to the clip
    t = clips_table(5, seed=8)
    out = ChunkStage(chunk_ms=100, hop_ms=100)(t).to_pandas()
    for cid, grp in out.groupby("clip_id"):
        grp = grp.sort_values("chunk_idx")
        rec = np.concatenate([decode_pcm16(b) for b in grp["bytes"]])
        row = t.to_pandas().set_index("clip_id").loc[cid]
        ref = decode_clip(row["bytes"], row["codec"])
        assert rec.size == ref.size
        assert snr_db(ref, rec) >= 30.0  # pcm16 requantization only


# ---------------------------------------------------------------------------
# quality features
# ---------------------------------------------------------------------------

def test_quality_stage_features():
    t = clips_table(8, seed=4)
    out = ClipQualityStage()(t).to_pandas()
    df = t.to_pandas()
    for i in range(len(df)):
        pcm = decode_clip(df["bytes"][i], df["codec"][i])
        assert out["rms_q20"][i] == round(
            float(np.sqrt(np.mean(np.square(pcm, dtype=np.float64)))) * (1 << 20))
        assert out["n_words"][i] == len(df["transcript"][i].split(" "))
        wps = out["n_words"][i] / (df["dur_ms"][i] / 1000.0)
        assert out["wps_q10"][i] == round(wps * 1024)


# ---------------------------------------------------------------------------
# audio fingerprint / near-dup
# ---------------------------------------------------------------------------

def _fp_one(x, sr):
    from parallel_dataflow_ray.stages.audio_prep import audio_fingerprint64
    return int(audio_fingerprint64(x.astype(np.float32),
                                   np.array([x.size]), np.array([0]),
                                   np.array([sr]))[0])


def _ham(a, b):
    return bin(a ^ b).count("1")


def test_fingerprint_invariances():
    from parallel_dataflow_ray.functions.audio import encode_ulaw, decode_ulaw
    for seed in range(12):
        sr = 16000
        x = synth_pcm(seed, sr, sr)
        base = _fp_one(x, sr)
        # gain: exact invariance (rank structure is scale-free)
        assert _ham(base, _fp_one(0.5 * x, sr)) == 0
        # mu-law requantization (~ -35 dB noise): <= 3 flips
        xu = decode_ulaw(encode_ulaw(x))
        assert _ham(base, _fp_one(xu, sr)) <= 3, seed
        # 2x decimation (same recording at 8 kHz): <= 3 flips
        assert _ham(base, _fp_one(x[::2], 8000)) <= 3, seed
        # an unrelated clip: > 3
        y = synth_pcm(seed + 1000, sr, sr)
        assert _ham(base, _fp_one(y, sr)) > 3, seed


def test_fingerprint_batch_equals_per_clip():
    from parallel_dataflow_ray.stages.audio_prep import audio_fingerprint64
    t, (flat, lens, off) = _flat_fixture(n=10, seed=13)
    sr = t["sr_hz"].to_numpy().astype(np.int64)
    batch = audio_fingerprint64(flat, lens, off, sr)
    for i in range(10):
        x = flat[off[i]:off[i] + lens[i]]
        assert int(batch[i]) == _fp_one(x, int(sr[i]))


def test_audio_neardup_exact_hamming_ball_and_recall(ray_session):
    """Distributed pair set == brute-force hamming ball; every planted
    re-encode pair is found."""
    import ray.data as rd
    from parallel_dataflow_ray.pipelines.queries import PlantAudioVariants
    from parallel_dataflow_ray.stages.audio_prep import (
        FingerprintStage, audio_neardup_pairs)

    base = clips_table(80, seed=42)
    planted_tbl = PlantAudioVariants(every=10)(base)
    ds = rd.from_arrow(planted_tbl).repartition(6)
    got = audio_neardup_pairs(ds, id_col="offset", max_hamming=3) \
        .to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)

    # brute force over the same rows
    sk = FingerprintStage(id_col="offset")(planted_tbl).to_pandas()
    ids = sk["offset"].to_numpy()
    hs = sk["simhash"].to_numpy().view(np.uint64)
    expect = []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            d = bin(int(hs[i]) ^ int(hs[j])).count("1")
            if d <= 3:
                a, b = sorted((int(ids[i]), int(ids[j])))
                expect.append((a, b, d))
    expect = pd.DataFrame(sorted(expect), columns=["id_a", "id_b", "hamming"])
    pd.testing.assert_frame_equal(
        got[["id_a", "id_b", "hamming"]].astype("int64"),
        expect.astype("int64"))
    # planted recall: every (offset, offset+100000) pair present
    planted = set((int(o), int(o) + 100_000)
                  for o in range(0, 80, 10))
    found = set(zip(got["id_a"].astype(int), got["id_b"].astype(int)))
    assert planted <= found, planted - found


def _prof_one(x, sr):
    from parallel_dataflow_ray.stages.audio_prep import (band_energies,
                                                         log_band_profile)
    x = np.ascontiguousarray(x, np.float32)
    return log_band_profile(band_energies(
        x, np.array([x.size]), np.array([0]), np.array([sr])))[0]


def test_log_profile_invariances():
    from parallel_dataflow_ray.functions.audio import encode_ulaw, decode_ulaw
    for seed in range(12):
        sr = 16000
        x = synth_pcm(seed, sr, sr)
        p = _prof_one(x, sr).astype(np.float64)
        # gain by a power of two: bit-exact invariance (float32 FFT is
        # linear and the per-clip max normalization removes scale)
        assert np.array_equal(p, _prof_one(0.5 * x, sr).astype(np.float64))
        # mu-law requantization at gain 0.7 (the planted variant)
        cu = float(p @ _prof_one(decode_ulaw(encode_ulaw(0.7 * x)), sr))
        assert cu >= 0.998, (seed, cu)
        # 2x sample-rate conversion: the documented 0.99 operating point
        cd = float(p @ _prof_one(x[::2], 8000))
        assert cd >= 0.99, (seed, cd)
        # an unrelated clip stays below both gates
        cun = float(p @ _prof_one(synth_pcm(seed + 1000, sr, sr), sr))
        assert cun < 0.99, (seed, cun)


def test_audio_neardup_verified_equals_bruteforce(ray_session):
    """Distributed fingerprint->LSH->cosine-verify == brute force over
    (hamming <= 3 AND cos_micro >= 998000), and on the planted fixture
    that set is EXACTLY the planted re-encode pairs (recall 1.0,
    precision 1.0 — the unverified candidate set is ~20x larger on this
    tone-mixture corpus)."""
    import ray.data as rd
    from parallel_dataflow_ray.pipelines.queries import PlantAudioVariants
    from parallel_dataflow_ray.stages.audio_prep import (
        FingerprintStage, audio_neardup_pairs)

    base = clips_table(80, seed=42)
    planted_tbl = PlantAudioVariants(every=10)(base)
    ds = rd.from_arrow(planted_tbl).repartition(6)
    got = audio_neardup_pairs(ds, id_col="offset", max_hamming=3,
                              verify_cosine=0.998) \
        .to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)

    sk = FingerprintStage(id_col="offset", profile=True)(planted_tbl) \
        .to_pandas()
    ids = sk["offset"].to_numpy()
    hs = sk["simhash"].to_numpy().view(np.uint64)
    P = np.frombuffer(b"".join(sk["profile"]), "<f4") \
        .reshape(len(sk), 64).astype(np.float64)
    expect = []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            d = bin(int(hs[i]) ^ int(hs[j])).count("1")
            if d > 3:
                continue
            q = int(np.rint(float(P[i] @ P[j]) * 1e6))
            if q >= 998000:
                a, b = sorted((int(ids[i]), int(ids[j])))
                expect.append((a, b, d, q))
    expect = pd.DataFrame(sorted(expect),
                          columns=["id_a", "id_b", "hamming", "cos_micro"])
    pd.testing.assert_frame_equal(
        got[["id_a", "id_b", "hamming", "cos_micro"]].astype("int64"),
        expect.astype("int64"))
    planted = set((int(o), int(o) + 100_000) for o in range(0, 80, 10))
    found = set(zip(got["id_a"].astype(int), got["id_b"].astype(int)))
    assert found == planted, (planted - found, found - planted)


def test_curate_neardup_clips_vs_bruteforce(ray_session):
    """The full fuzzy-dedup audio composition vs an independent per-row
    twin: decode-per-clip quality features, the same quantized filter,
    all-pairs (hamming <= 3 AND cos_micro >= 998000), union-find,
    min-offset canonical survivors with cluster sizes."""
    import ray.data as rd
    from parallel_dataflow_ray.functions.audio import decode_clip
    from parallel_dataflow_ray.pipelines.queries import PlantAudioVariants
    from parallel_dataflow_ray.stages.audio_prep import (
        band_energies, curate_neardup_clips, log_band_profile,
        sketch_arrays)

    base = clips_table(90, seed=42)
    planted_tbl = PlantAudioVariants(every=10)(base)
    ds = rd.from_arrow(planted_tbl).repartition(6)
    got = curate_neardup_clips(ds).to_pandas() \
        .sort_values("offset").reset_index(drop=True)

    # --- independent twin, one clip at a time ---------------------------
    df = planted_tbl.to_pandas()
    q = float(1 << 20)
    feats = []
    for r in df.itertuples():
        x = decode_clip(r.bytes, r.codec)
        rms = float(np.sqrt(np.mean(x.astype(np.float64) ** 2))) if x.size else 0.0
        cr = float(np.mean(np.abs(x) >= 0.999)) if x.size else 0.0
        words = r.transcript.count(" ") + 1
        wps = words / (r.dur_ms / 1000.0) if r.dur_ms > 0 else 0.0
        E = band_energies(np.ascontiguousarray(x, np.float32),
                          np.array([x.size]), np.array([0]),
                          np.array([r.sr_hz]))
        fp, _ = sketch_arrays(E)
        feats.append({
            "offset": int(r.offset),
            "dur_ms": int(r.dur_ms),
            "rms_q20": int(np.rint(rms * q)),
            "clip_ratio_q20": int(np.rint(cr * q)),
            "wps_q10": int(np.rint(wps * 1024)),
            "fp": int(fp[0]),
            "prof": log_band_profile(E)[0].astype(np.float64),
        })
    fdf = pd.DataFrame(feats)
    keep = ((fdf["dur_ms"].between(300, 1800))
            & (fdf["rms_q20"].between(int(0.02 * q), int(0.6 * q)))
            & (fdf["clip_ratio_q20"] <= int(0.01 * q))
            & (fdf["wps_q10"].between(1 * 1024, 30 * 1024)))
    kept = fdf[keep].reset_index(drop=True)
    assert len(kept) > 60            # the fixture mostly passes the gates

    parent = {int(o): int(o) for o in kept["offset"]}

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    n_pairs = 0
    for i in range(len(kept)):
        for j in range(i + 1, len(kept)):
            d = bin(kept["fp"][i] ^ kept["fp"][j]).count("1")
            if d > 3:
                continue
            cm = int(np.rint(float(kept["prof"][i] @ kept["prof"][j]) * 1e6))
            if cm >= 998000:
                n_pairs += 1
                ra, rb = find(int(kept["offset"][i])), find(int(kept["offset"][j]))
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    assert n_pairs > 0               # planted variants survive the filter
    roots = {o: find(o) for o in parent}
    sizes = pd.Series(list(roots.values())).value_counts().to_dict()
    expect = {o: (sizes[r] if sizes[r] > 1 else 1)
              for o, r in roots.items() if r == o}  # canonical rows only

    assert dict(zip(got["offset"].astype(int),
                    got["n_neardups"].astype(int))) == expect
    # winner metadata rides through: spot-check one planted cluster
    planted_roots = [o for o, n in expect.items()
                     if n == 2 and o + 100_000 in roots]
    assert planted_roots
    row = got[got["offset"] == planted_roots[0]].iloc[0]
    src = df[df["offset"] == planted_roots[0]].iloc[0]
    assert row["clip_id"] == src["clip_id"]
    assert row["speaker_id"] == src["speaker_id"]


def test_stretch_to_fixed_endpoints():
    from parallel_dataflow_ray.stages.audio_prep import stretch_to_fixed
    x = np.arange(10, dtype=np.float32)
    out = stretch_to_fixed(x, np.array([10]), np.array([0]), 19)
    assert out.shape == (1, 19)
    assert out[0, 0] == 0.0 and out[0, -1] == 9.0
    assert np.allclose(out[0], np.arange(19) * 0.5)


# ---------------------------------------------------------------------------
# pad silence (fixture transform)
# ---------------------------------------------------------------------------

def test_pad_silence_lengths_and_vad_alignment():
    from parallel_dataflow_ray.stages.audio_prep import PadSilenceStage
    t = clips_table(10, seed=6)
    padded = PadSilenceStage(k=5, step_ms=100)(t)
    df_in = t.to_pandas()
    for i in range(10):
        pad_ms = int(padded["pad_ms"][i].as_py())
        assert pad_ms == (df_in["offset"][i] % 5) * 100
        bps = 2 if df_in["codec"][i] == "pcm16" else 1
        pad_n = df_in["sr_hz"][i] * pad_ms // 1000
        assert len(padded["bytes"][i].as_py()) == \
            len(df_in["bytes"][i]) + 2 * pad_n * bps
    # VAD over the padded clips finds exactly one segment per clip,
    # starting at pad_ms (to frame resolution)
    seg = VadSegmentStage(frame_ms=20, thresh=0.02)(padded).to_pandas()
    assert len(seg) == 10
    m = seg.merge(padded.select(["clip_id", "pad_ms"]).to_pandas(),
                  on="clip_id")
    assert (np.abs(m["start_ms"] - m["pad_ms"]) <= 20).all()


# ---------------------------------------------------------------------------
# curate_clips composition vs brute-force local twin
# ---------------------------------------------------------------------------

def test_curate_clips_vs_brute_force(ray_session):
    from parallel_dataflow_ray.stages.audio_prep import curate_clips
    n, seed = 150, 33
    ds = clips_dataset(n, seed=seed, dup_every=13, blocks=6)
    got = curate_clips(ds).to_pandas().sort_values("offset") \
                          .reset_index(drop=True)

    # independent twin: per-row loop decode + pandas ops
    t = clips_table(n, seed=seed, dup_every=13).to_pandas()
    rms, clipr = [], []
    for b, c in zip(t["bytes"], t["codec"]):
        pcm = decode_clip(b, c)
        rms.append(float(np.sqrt(np.mean(np.square(pcm, dtype=np.float64)))))
        clipr.append(float(np.mean(np.abs(pcm) >= 0.999)))
    t["rms_q20"] = np.rint(np.array(rms) * (1 << 20)).astype(np.int64)
    t["clip_ratio"] = clipr
    t["n_words"] = t["transcript"].str.split(" ").str.len()
    t["wps"] = t["n_words"] / (t["dur_ms"] / 1000.0)
    keep = t[(t.dur_ms >= 300) & (t.dur_ms <= 1800)
             & (t.rms_q20 >= int(0.02 * (1 << 20)))
             & (t.rms_q20 <= int(0.6 * (1 << 20)))
             & (t.clip_ratio <= 0.01)
             & (np.rint(t.wps * 1024) >= 1024)
             & (np.rint(t.wps * 1024) <= 30 * 1024)]
    win = keep.sort_values("offset").groupby("transcript", sort=False) \
              .agg(offset=("offset", "first"), n_dups=("offset", "size"),
                   clip_id=("clip_id", "first"),
                   speaker_id=("speaker_id", "first"),
                   dur_ms=("dur_ms", "first"), n_words=("n_words", "first"),
                   rms_q20=("rms_q20", "first")) \
              .reset_index(drop=True).sort_values("offset") \
              .reset_index(drop=True)
    assert len(got) == len(win)
    cols = ["offset", "n_dups", "clip_id", "speaker_id", "dur_ms",
            "n_words", "rms_q20"]
    pd.testing.assert_frame_equal(got[cols], win[cols])
    # the fixture's re-issued duplicates must actually be absorbed
    assert (win["n_dups"] > 1).any()


# ---------------------------------------------------------------------------
# Ray end-to-end
# ---------------------------------------------------------------------------

def test_resample_stage_ray_end_to_end(ray_session):
    ds = clips_dataset(60, seed=21, blocks=4)
    from parallel_dataflow_ray.stages.audio_prep import resample_clips
    out = resample_clips(ds, 16000, concurrency=2, batch_size=16)
    df = out.to_pandas().sort_values("clip_id").reset_index(drop=True)
    assert len(df) == 60
    assert (df["sr_hz"] == 16000).all()
    assert (df["codec"] == "pcm16").all()
    # duration preserved to within half an output sample
    t = clips_table(60, seed=21).to_pandas()
    t = t.sort_values("clip_id").reset_index(drop=True)
    n_in = np.array([len(b) // (2 if c == "pcm16" else 1)
                     for b, c in zip(t["bytes"], t["codec"])])
    expect = (n_in * 16000 + t["sr_hz"].to_numpy() // 2) // t["sr_hz"].to_numpy()
    assert np.array_equal(df["n_samples"].to_numpy(), expect)
    # payload integrity: bytes length == 2 * n_samples
    assert all(len(b) == 2 * n for b, n in zip(df["bytes"], df["n_samples"]))


# ---------------------------------------------------------------------------
# AugmentStage (speed / gain / noise-at-SNR)
# ---------------------------------------------------------------------------


def _augment(t, **kw):
    from parallel_dataflow_ray.stages.audio_prep import AugmentStage

    return AugmentStage(**kw)(t)


def test_augment_batch_invariant():
    """Output bytes are a pure function of the row: augmenting the
    whole batch == augmenting any split of it (the partition/replay
    determinism contract)."""
    t = clips_table(16, seed=11)
    whole = _augment(t, seed=5)
    parts = [_augment(t.slice(i, 4), seed=5) for i in range(0, 16, 4)]
    joined = pa.concat_tables(parts)
    assert whole.equals(joined)


def test_augment_speed_changes_length_correctly():
    t = clips_table(16, seed=11)
    out = _augment(t, seed=5, gain_db_range=(0.0, 0.0), snr_db_range=None)
    bts = t["bytes"].to_pylist()
    codecs = t["codec"].to_pylist()
    _, lens, _ = decode_flat(bts, codecs)
    m = out["n_samples"].to_numpy()
    speed = out["speed_micro"].to_numpy() / 1e6
    # resample length law: round-half-up of n / speed (via the
    # synthetic-rate quantization to 1e-4)
    sr_synth = np.rint(speed * 10_000)
    want = (lens * 10_000 + sr_synth // 2) // sr_synth
    assert np.array_equal(m, np.maximum(want, (lens > 0).astype(int)))


def test_augment_gain_only_scales_signal():
    """With speed pinned to 1 and noise off, output == gain * input to
    within pcm16 quantization."""
    t = clips_table(8, seed=3)
    out = _augment(t, seed=2, speed_range=(1.0, 1.0), snr_db_range=None)
    gains = out["gain_micro"].to_numpy() / 1e6
    for i in range(8):
        x = decode_clip(t["bytes"][i].as_py(), t["codec"][i].as_py())
        y = decode_pcm16(out["bytes"][i].as_py())
        assert len(x) == len(y)
        assert np.abs(y - np.clip(x * gains[i], -1, 1)).max() <= 1.5 / 32767
        assert np.abs(y).max() <= 0.9901  # peak cap honored


def test_augment_noise_hits_target_snr():
    """Measured residual vs the noise-free augmentation matches the
    requested SNR within ~1 dB (uniform-noise rms law + pcm16
    quantization slack)."""
    t = clips_table(8, seed=7)
    kw = dict(seed=9, speed_range=(1.0, 1.0), gain_db_range=(0.0, 0.0))
    clean = _augment(t, snr_db_range=None, **kw)
    noisy = _augment(t, snr_db_range=(20.0, 20.0), **kw)
    for i in range(8):
        c = decode_pcm16(clean["bytes"][i].as_py())
        y = decode_pcm16(noisy["bytes"][i].as_py())
        if len(c) < 2000 or np.abs(c).max() > 0.95:  # clamp would bias
            continue
        resid = y - c
        sig = np.sqrt(np.mean(c ** 2))
        got_snr = 20 * np.log10(sig / np.sqrt(np.mean(resid ** 2)))
        assert abs(got_snr - 20.0) < 1.0, (i, got_snr)


def test_augment_clips_e2e(ray_session):
    from parallel_dataflow_ray.stages.audio_prep import augment_clips

    ds = clips_dataset(64, seed=4)
    out = augment_clips(ds, seed=1, concurrency=2).to_pandas()
    assert len(out) == 64
    assert (out["codec"] == "pcm16").all()
    assert out["speed_micro"].between(900_000, 1_100_000).all()
    # deterministic across runs
    out2 = augment_clips(clips_dataset(64, seed=4), seed=1,
                         concurrency=2).to_pandas()
    a = out.sort_values("clip_id").reset_index(drop=True)
    b = out2.sort_values("clip_id").reset_index(drop=True)
    assert a.equals(b)


# ---------------------------------------------------------------------------
# audio eval-set decontamination
# ---------------------------------------------------------------------------

def _plant_eval_copies(corpus_tbl, eval_tbl, idxs, *, gain=0.6,
                       off_base=500_000):
    """Append gain-scaled mu-law re-encodes of eval rows ``idxs`` to the
    corpus — the 'eval audio leaked into the crawl' case."""
    from parallel_dataflow_ray.functions.audio import decode_clip, encode_ulaw
    cp = corpus_tbl.to_pandas()
    ev = eval_tbl.to_pandas().iloc[list(idxs)].copy()
    ev["bytes"] = [encode_ulaw(gain * decode_clip(b, c))
                   for b, c in zip(ev["bytes"], ev["codec"])]
    ev["codec"] = "ulaw"
    ev["clip_id"] = ev["clip_id"] + "-leak"
    ev["offset"] = off_base + np.arange(len(ev))
    return pa.Table.from_pandas(pd.concat([cp, ev], ignore_index=True),
                                preserve_index=False)


def _bf_decontaminate(corpus_tbl, eval_tbl, *, max_hamming=2,
                      thr_micro=None):
    """Driver-local brute-force twin: all corpus x eval hamming (+
    optional profile-cosine gate) -> (offset, n_matched, min_hamming)."""
    from parallel_dataflow_ray.stages.audio_prep import (
        FingerprintStage, _FP_BANDS)
    prof = thr_micro is not None
    csk = FingerprintStage(id_col="offset", profile=prof)(corpus_tbl) \
        .to_pandas()
    esk = FingerprintStage(id_col="offset", profile=prof)(eval_tbl) \
        .to_pandas()
    cfp = csk["simhash"].to_numpy().view(np.uint64)
    efp = esk["simhash"].to_numpy().view(np.uint64)
    if prof:
        CP = np.frombuffer(b"".join(csk["profile"]), "<f4") \
            .reshape(len(csk), _FP_BANDS).astype(np.float64)
        EP = np.frombuffer(b"".join(esk["profile"]), "<f4") \
            .reshape(len(esk), _FP_BANDS).astype(np.float64)
    rows = []
    for i in range(cfp.size):
        d = np.array([bin(int(cfp[i]) ^ int(e)).count("1") for e in efp])
        ok = d <= max_hamming
        if prof and ok.any():
            cos = np.rint(EP[ok] @ CP[i] * 1e6)
            sub = np.flatnonzero(ok)
            ok[sub[cos < thr_micro]] = False
        if ok.any():
            rows.append((int(csk["offset"][i]), int(ok.sum()),
                         int(d[ok].min())))
    return pd.DataFrame(rows, columns=["offset", "n_matched",
                                       "min_hamming"]).astype("int64")


def test_decontaminate_clips_vs_bruteforce(ray_session):
    """Distributed broadcast-LSH decontamination == brute-force corpus x
    eval hamming ball; every planted eval re-encode is flagged."""
    import ray.data as rd
    from parallel_dataflow_ray.stages.audio_prep import decontaminate_clips

    eval_tbl = clips_table(30, seed=999)
    corpus_tbl = _plant_eval_copies(clips_table(120, seed=42), eval_tbl,
                                    range(10))
    got = decontaminate_clips(
        rd.from_arrow(corpus_tbl).repartition(5), rd.from_arrow(eval_tbl),
        max_hamming=2).to_pandas() \
        .sort_values("offset").reset_index(drop=True).astype("int64")
    want = _bf_decontaminate(corpus_tbl, eval_tbl, max_hamming=2) \
        .sort_values("offset").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    # the leaked copies (gain + mu-law re-encode) are caught
    flagged = set(got["offset"])
    caught = sum(1 for i in range(10) if 500_000 + i in flagged)
    assert caught >= 8, f"only {caught}/10 planted leaks flagged"


def test_decontaminate_clips_cosine_gate(ray_session):
    """The cosine-gated variant matches its brute-force twin and stays
    a subset of the hamming-only flag set."""
    import ray.data as rd
    from parallel_dataflow_ray.stages.audio_prep import decontaminate_clips

    eval_tbl = clips_table(24, seed=777)
    corpus_tbl = _plant_eval_copies(clips_table(90, seed=21), eval_tbl,
                                    range(8), gain=0.8)
    got = decontaminate_clips(
        rd.from_arrow(corpus_tbl).repartition(4), rd.from_arrow(eval_tbl),
        max_hamming=2, verify_cosine=0.998).to_pandas() \
        .sort_values("offset").reset_index(drop=True).astype("int64")
    want = _bf_decontaminate(corpus_tbl, eval_tbl, max_hamming=2,
                             thr_micro=998_000) \
        .sort_values("offset").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    loose = decontaminate_clips(
        rd.from_arrow(corpus_tbl).repartition(4), rd.from_arrow(eval_tbl),
        max_hamming=2).to_pandas()
    assert set(got["offset"]) <= set(loose["offset"])


def test_decontaminate_clips_clean_corpus(ray_session):
    """No contamination -> empty flag table (and the schema holds)."""
    import ray.data as rd
    from parallel_dataflow_ray.stages.audio_prep import decontaminate_clips

    corpus_tbl = clips_table(60, seed=42)
    eval_tbl = clips_table(20, seed=31337)
    got = decontaminate_clips(
        rd.from_arrow(corpus_tbl).repartition(3), rd.from_arrow(eval_tbl),
        max_hamming=2).to_pandas().astype("int64")
    want = _bf_decontaminate(corpus_tbl, eval_tbl, max_hamming=2)
    assert len(got) == len(want)
    if len(want):
        pd.testing.assert_frame_equal(
            got.sort_values("offset").reset_index(drop=True),
            want.sort_values("offset").reset_index(drop=True))
    assert list(got.columns) == ["offset", "n_matched", "min_hamming"]


# ---------------------------------------------------------------------------
# per-clip DSP statistics (tonality scoring)
# ---------------------------------------------------------------------------

def test_zcr_flatness_laws():
    """Signal-theory laws: a pure sine at f has zcr ~ 2f/sr and LOW
    spectral flatness; white noise has zcr ~ 0.5 and HIGH flatness; the
    stats are gain-invariant."""
    from parallel_dataflow_ray.stages.audio_prep import (
        band_energies, per_clip_zcr, spectral_flatness)

    sr = 16000
    t = np.arange(sr, dtype=np.float32) / sr
    rng = np.random.default_rng(0)
    for f in (200, 440, 1000):
        x = np.sin(2 * np.pi * f * t).astype(np.float32)
        zcr = per_clip_zcr(x, np.array([x.size]), np.array([0]))[0]
        assert abs(zcr - 2 * f / sr) < 1e-4, (f, zcr)
        E = band_energies(x, np.array([x.size]), np.array([0]),
                          np.array([sr]))
        flat = spectral_flatness(E)[0]
        assert flat < 0.05, (f, flat)
        # gain invariance
        E2 = band_energies(0.1 * x, np.array([x.size]), np.array([0]),
                           np.array([sr]))
        assert abs(spectral_flatness(E2)[0] - flat) < 1e-9
    noise = rng.normal(0, 0.1, sr).astype(np.float32)
    zcr_n = per_clip_zcr(noise, np.array([noise.size]), np.array([0]))[0]
    assert 0.4 < zcr_n < 0.6, zcr_n
    En = band_energies(noise, np.array([noise.size]), np.array([0]),
                       np.array([sr]))
    assert spectral_flatness(En)[0] > 0.3
    # and noise is flatter than any of the sines
    assert spectral_flatness(En)[0] > 6 * flat


def test_clip_dsp_stats_batch_equals_per_clip():
    from parallel_dataflow_ray.stages.audio_prep import ClipDSPStatsStage

    tbl = clips_table(16, seed=5)
    batch = ClipDSPStatsStage()(tbl).to_pandas()
    for i in range(16):
        one = ClipDSPStatsStage()(tbl.slice(i, 1)).to_pandas()
        for c in ("zcr_micro", "flatness_micro", "centroid_micro"):
            assert one[c][0] == batch[c][i], (i, c)


def test_clip_dsp_stats_distributed_parity(ray_session):
    import ray.data as rd
    from parallel_dataflow_ray.stages.audio_prep import (
        ClipDSPStatsStage, clip_dsp_stats)

    tbl = clips_table(60, seed=11)
    got = clip_dsp_stats(rd.from_arrow(tbl).repartition(5),
                         batch_size=17).to_pandas() \
        .sort_values("clip_id").reset_index(drop=True)
    want = ClipDSPStatsStage()(tbl).to_pandas() \
        .sort_values("clip_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    assert set(got.columns) == {"clip_id", "dur_ms", "zcr_micro",
                                "flatness_micro", "centroid_micro"}


# ---------------------------------------------------------------------------
# training-shard materialization
# ---------------------------------------------------------------------------

def _bf_global_stream(tbl, sr_out):
    """Driver twin: decode + resample each clip in id order, concat,
    encode pcm16 -> the global training stream bytes."""
    from parallel_dataflow_ray.stages.audio_prep import (
        decode_flat, encode_pcm16_slices, resample_flat)
    df = tbl.to_pandas().sort_values("offset")
    flat, lens, off = decode_flat(df["bytes"].tolist(), df["codec"].tolist())
    out, m = resample_flat(flat, lens, off,
                           df["sr_hz"].to_numpy().astype(np.int64), sr_out)
    oo = np.cumsum(m) - m
    return b"".join(encode_pcm16_slices(out, oo, m))


def test_build_audio_shards_reconstructs_global_stream(ray_session):
    """Concatenating the shard blobs in shard order reproduces the
    global resampled stream BIT-EXACTLY (boundary-splitting clips
    included), every shard but the last is exactly shard-sized, and
    the output is partition-invariant."""
    import ray.data as rd
    from parallel_dataflow_ray.stages.audio_prep import build_audio_shards

    tbl = clips_table(40, seed=19)
    sr_out, shard_ms = 8000, 2000              # many shards + splits
    cap_bytes = (shard_ms * sr_out // 1000) * 2
    outs = []
    for parts in (2, 7):
        out = build_audio_shards(
            rd.from_arrow(tbl).repartition(parts), shard_ms=shard_ms,
            sr_out=sr_out, num_buckets=4).to_pandas() \
            .sort_values("shard_id").reset_index(drop=True)
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    got = outs[0]
    want = _bf_global_stream(tbl, sr_out)
    assert b"".join(got["blob"]) == want
    assert (got["n_bytes"][:-1] == cap_bytes).all()
    assert got["n_bytes"].iloc[-1] == len(want) - cap_bytes * (len(got) - 1)
    assert (got["shard_id"].to_numpy() == np.arange(len(got))).all()
    # at least one clip was split across a boundary
    assert got["n_segments"].sum() > 40


# ---------------------------------------------------------------------------
# codec transcoding
# ---------------------------------------------------------------------------

def test_transcode_clips_size_and_snr(ray_session):
    """mu-law transcode halves pcm16 storage exactly, keeps requant
    SNR >= 25 dB on the tone fixtures, and the payload round-trips
    through the standard decoder; pcm16->pcm16 is lossless."""
    import ray.data as rd
    from parallel_dataflow_ray.functions.audio import decode_clip
    from parallel_dataflow_ray.stages.audio_prep import (
        TranscodeStage, transcode_clips)

    tbl = clips_table(30, seed=9)
    got = transcode_clips(rd.from_arrow(tbl).repartition(3), "ulaw") \
        .to_pandas().sort_values("clip_id").reset_index(drop=True)
    src = tbl.to_pandas().sort_values("clip_id").reset_index(drop=True)
    pcm16 = src["codec"] == "pcm16"
    assert (got["n_bytes_out"][pcm16] * 2 == got["n_bytes_in"][pcm16]).all()
    assert (got["snr_milli_db"] >= 25_000).all(), \
        got["snr_milli_db"].min()
    # payload decodes with the standard path to the SNR the audit says
    # (a ulaw source transcodes losslessly -> the audit sentinel)
    for i in range(5):
        x = decode_clip(src["bytes"][i], src["codec"][i])
        y = decode_clip(got["bytes"][i], "ulaw")
        err = np.sum((x - y) ** 2)
        if err == 0.0:
            assert got["snr_milli_db"][i] > 1e12
            continue
        snr = 10 * np.log10(np.sum(x**2) / err)
        assert abs(snr * 1000 - got["snr_milli_db"][i]) <= 1
    # pcm16 -> pcm16 is lossless for pcm16 sources (a ulaw source
    # re-grids to int16 at ~84 dB, not exactly)
    head = tbl.slice(0, 5)
    same = TranscodeStage("pcm16")(head).to_pandas()
    was16 = np.array(head["codec"].to_pylist()) == "pcm16"
    assert (same["snr_milli_db"][was16] > 1e12).all()
    assert (same["snr_milli_db"][~was16] >= 60_000).all()


def test_plant_variants_flat_codec_bit_identical():
    """The vectorized flat-decode + one-pass mu-law plant (r5) is
    BYTE-identical to the per-row decode/encode it replaced."""
    from parallel_dataflow_ray.functions.audio import (
        decode_clip, encode_ulaw)
    from parallel_dataflow_ray.pipelines.queries import PlantAudioVariants

    base = clips_table(60, seed=7)
    out = PlantAudioVariants(every=5)(base).to_pandas()
    planted = out[out["clip_id"].str.endswith("-v")]
    assert len(planted) > 0
    originals = out.set_index("offset")
    for _, row in planted.iterrows():
        src = originals.loc[row["offset"] - 100_000]
        want = encode_ulaw(0.7 * decode_clip(src["bytes"], src["codec"]))
        assert row["bytes"] == want
