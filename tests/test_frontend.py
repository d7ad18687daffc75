"""Tests for the L2 frontend: fbank, CMVN, energy VAD.

The central axis is the reference's stream-vs-offline equivalence
(SURVEY §4): chunked processing must produce bit-identical features and
decisions."""

import numpy as np
import pytest

from asr_decoder_tpu.frontend.fbank import (CmvnConfig, FbankConfig,
                                            StreamingFbank, compute_fbank,
                                            live_cmvn, mel_banks, num_frames,
                                            utterance_cmvn)
from asr_decoder_tpu.vad.energy import (AUDIO, SIL, EnergyVadConfig,
                                        EnergyVadStream, classify_energy,
                                        frame_energy, merge_short_sil,
                                        smooth_judge, vad_segments)


def _tone(freq, n, sr=16000, amp=8000.0):
    t = np.arange(n) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_fbank_shape_and_frames():
    cfg = FbankConfig(num_bins=40)
    wave = _tone(440, 16000)[None]  # 1 second
    feats = compute_fbank(cfg, wave)
    assert feats.shape == (1, num_frames(cfg, 16000), 40)
    assert feats.shape[1] == 1 + (16000 - 400) // 160  # 98 frames
    assert np.isfinite(np.asarray(feats)).all()


def test_fbank_tone_peaks_at_right_bin():
    cfg = FbankConfig(num_bins=40, dither=0.0)
    banks = mel_banks(cfg)
    for freq in (300.0, 1000.0, 3000.0):
        wave = _tone(freq, 8000)[None]
        feats = np.asarray(compute_fbank(cfg, wave))
        fft_freqs = np.arange(cfg.fft_size // 2 + 1) * (
            cfg.sample_rate / cfg.fft_size)
        expect_bin = int(np.argmax(banks[:, np.argmin(np.abs(
            fft_freqs - freq))]))
        got_bin = int(np.argmax(feats.mean(axis=(0, 1))))
        assert abs(got_bin - expect_bin) <= 1, freq


def test_fbank_streaming_equals_offline():
    cfg = FbankConfig(num_bins=23)
    rng = np.random.default_rng(0)
    wave = (rng.standard_normal((2, 7000)) * 1000).astype(np.float32)
    offline = np.asarray(compute_fbank(cfg, wave))
    s = StreamingFbank(cfg, batch=2)
    chunks = [wave[:, :1000], wave[:, 1000:1500], wave[:, 1500:5000],
              wave[:, 5000:]]
    outs = [np.asarray(s.accept(c, end=(i == len(chunks) - 1)))
            for i, c in enumerate(chunks)]
    stream = np.concatenate([o for o in outs if o.size], axis=1)
    np.testing.assert_allclose(stream, offline, rtol=1e-5, atol=1e-5)


def test_mel_banks_cover_spectrum():
    cfg = FbankConfig(num_bins=40)
    banks = mel_banks(cfg)
    assert banks.shape == (40, cfg.fft_size // 2 + 1)
    # interior fft bins are covered by at least one filter
    coverage = banks.sum(axis=0)
    lo = int(np.ceil(cfg.low_freq / (cfg.sample_rate / cfg.fft_size))) + 2
    assert (coverage[lo:-3] > 0).all()


def test_utterance_cmvn():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 50, 8)).astype(np.float32) * 3 + 5
    y = np.asarray(utterance_cmvn(x, norm_var=True))
    np.testing.assert_allclose(y.mean(axis=1), 0.0, atol=1e-4)
    np.testing.assert_allclose(np.sqrt((y ** 2).mean(axis=1)), 1.0, atol=1e-3)


def test_live_cmvn_streaming_equals_offline():
    cfg = CmvnConfig(norm_var=True)
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 30, 4)).astype(np.float32)
    y_full, _ = live_cmvn(cfg, x)
    y1, st = live_cmvn(cfg, x[:, :11])
    y2, _ = live_cmvn(cfg, x[:, 11:], st)
    stream = np.concatenate([np.asarray(y1), np.asarray(y2)], axis=1)
    np.testing.assert_allclose(np.asarray(y_full), stream,
                               rtol=1e-5, atol=1e-5)


def _speech_like(sr=16000):
    """1s silence, 1s loud tone, 1s silence."""
    sil = np.zeros(sr, np.float32)
    loud = _tone(500, sr, amp=8000)
    return np.concatenate([sil, loud, sil])[None]


def test_energy_vad_classify():
    cfg = EnergyVadConfig()
    wave = _speech_like()
    e = frame_energy(cfg, wave)
    cls = np.asarray(classify_energy(cfg, e))
    T = cls.shape[1]
    assert (cls[0, : T // 3 - 5] == 0).all()
    assert cls[0, T // 3 + 5: 2 * T // 3 - 5].mean() >= 1.5


def test_energy_vad_segments():
    cfg = EnergyVadConfig()
    stream = EnergyVadStream(cfg)
    dec = stream.accept(_speech_like(), end=True)
    segs = vad_segments(dec[0])
    kinds = [s[0] for s in segs]
    assert kinds == [SIL, AUDIO, SIL]
    a = segs[1]
    # audio segment roughly covers the middle second (frames ~98-196)
    assert 80 < a[1] < 110 and 185 < a[2] < 215


def test_energy_vad_streaming_equals_offline():
    cfg = EnergyVadConfig()
    wave = _speech_like()
    off = EnergyVadStream(cfg).accept(wave, end=True)
    st = EnergyVadStream(cfg)
    outs = [st.accept(wave[:, :5000]), st.accept(wave[:, 5000:17000]),
            st.accept(wave[:, 17000:33000]),
            st.accept(wave[:, 33000:], end=True)]
    stream = np.concatenate([o for o in outs if o.size], axis=1)
    np.testing.assert_array_equal(off, stream)


def test_merge_short_sil():
    segs = [(AUDIO, 0, 50), (SIL, 50, 55), (AUDIO, 55, 100), (SIL, 100, 200)]
    merged = merge_short_sil(segs, min_sil_frames=10)
    assert merged == [(AUDIO, 0, 100), (SIL, 100, 200)]
