"""Pitch frontend tests (ref: src/pitch/pitch-functions.cc; the reference's
own axis is stream-vs-offline consistency of the pitch features)."""

import numpy as np
import pytest

from asr_decoder_tpu.frontend.pitch import (PitchConfig, ProcessPitchConfig,
                                            StreamPitch, compute_and_process_pitch,
                                            compute_pitch, linear_resample,
                                            merge_features)


def sine(freq, secs=1.0, sr=16000, amp=5000.0):
    t = np.arange(int(secs * sr)) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_linear_resample_preserves_tone():
    cfg = PitchConfig()
    wave = sine(250.0)[None]
    out = np.asarray(linear_resample(cfg, wave))[0]
    assert out.shape[0] == pytest.approx(len(wave[0]) / 4, abs=2)
    # dominant FFT bin still at 250 Hz at the new rate
    spec = np.abs(np.fft.rfft(out * np.hanning(len(out))))
    freq = np.fft.rfftfreq(len(out), d=1.0 / cfg.resample_freq)
    assert freq[np.argmax(spec[1:]) + 1] == pytest.approx(250.0, abs=5.0)


@pytest.mark.parametrize("f0", [100.0, 200.0, 333.0])
def test_pitch_tracks_sine(f0):
    cfg = PitchConfig()
    pitch, pov = compute_pitch(cfg, sine(f0)[None])
    pitch = np.asarray(pitch)[0]
    assert pitch.shape[0] > 50
    mid = pitch[10:-10]
    assert np.median(mid) == pytest.approx(f0, rel=0.05)
    # a pure tone is strongly voiced
    assert float(np.median(np.asarray(pov)[0, 10:-10])) > 0.7


def test_noise_is_unvoiced_vs_tone():
    cfg = PitchConfig()
    rng = np.random.default_rng(0)
    noise = (rng.standard_normal(16000) * 3000).astype(np.float32)
    _, pov_noise = compute_pitch(cfg, noise[None])
    _, pov_tone = compute_pitch(cfg, sine(150.0)[None])
    assert (np.median(np.asarray(pov_tone))
            > np.median(np.asarray(pov_noise)) + 0.2)


def test_process_pitch_dims():
    cfg, pcfg = PitchConfig(), ProcessPitchConfig()
    feats = compute_and_process_pitch(cfg, pcfg, sine(120.0, 0.5)[None])
    assert feats.shape[-1] == pcfg.dim == 3
    pcfg2 = ProcessPitchConfig(add_raw_log_pitch=True, add_delta_pitch=False)
    feats2 = compute_and_process_pitch(cfg, pcfg2, sine(120.0, 0.5)[None])
    assert feats2.shape[-1] == pcfg2.dim == 3
    # raw log pitch column ≈ log f0
    assert float(np.median(np.asarray(feats2)[0, 5:-5, -1])) == \
        pytest.approx(np.log(120.0), abs=0.15)


def test_stream_matches_offline_at_eos():
    cfg, pcfg = PitchConfig(), ProcessPitchConfig()
    wave = sine(180.0, 0.55)
    offline = np.asarray(compute_and_process_pitch(cfg, pcfg, wave[None]))
    sp = StreamPitch(cfg, pcfg, batch=1)
    outs = []
    for off in range(0, len(wave), 3000):
        end = off + 3000 >= len(wave)
        outs.append(sp.process_wave(wave[None, off:off + 3000], end=end))
    got = np.concatenate([o for o in outs if o.size], axis=1)
    assert got.shape == offline.shape
    np.testing.assert_allclose(got, offline, atol=1e-4)


def test_merge_features():
    fb = np.zeros((1, 10, 40), np.float32)
    pt = np.ones((1, 8, 3), np.float32)
    m = merge_features(fb, pt)
    assert m.shape == (1, 8, 43)
    assert m[0, 0, -1] == 1.0


def test_arbitrary_resample_recovers_bandlimited_signal():
    """ArbitraryResample (ref resample.h:72) must reproduce a bandlimited
    signal at off-grid points to high accuracy."""
    from asr_decoder_tpu.frontend.pitch import ArbitraryResample
    sr = 4000.0
    n = 800
    t = np.arange(n) / sr
    freqs = [200.0, 333.0, 540.0]
    wave = sum(np.sin(2 * np.pi * f * t + 0.3 * i)
               for i, f in enumerate(freqs)).astype(np.float32)
    rng = np.random.default_rng(0)
    pts = np.sort(rng.uniform(0.05, (n - 200) / sr, 50))
    rs = ArbitraryResample(n, sr, filter_cutoff=1000.0,
                           sample_points=pts, num_zeros=10)
    got = np.asarray(rs.resample(wave[None]))[0]
    want = sum(np.sin(2 * np.pi * f * pts + 0.3 * i)
               for i, f in enumerate(freqs))
    assert np.max(np.abs(got - want)) < 2e-2
    # batched shape
    two = np.stack([wave, 2 * wave])
    out = np.asarray(rs.resample(two))
    assert out.shape == (2, 50)
    np.testing.assert_allclose(out[1], 2 * out[0], rtol=1e-5)
