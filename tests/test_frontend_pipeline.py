"""Composed frontend tests: delta math vs direct convolution, streaming ==
offline for fbank‖pitch+delta, and a full session decode with the pitch+
delta pipeline (the DnnPitchFeat path the AM pipeline lacked,
ref: src/nnet/nnet-feature-api.h:86-185, pitch/online-feature.h:30-50)."""

import jax
import numpy as np
import pytest

from asr_decoder_tpu.frontend.fbank import FbankConfig
from asr_decoder_tpu.frontend.pipeline import (DeltaConfig, StreamingDelta,
                                               StreamingFrontend,
                                               compute_deltas, delta_coeffs)
from asr_decoder_tpu.frontend.pitch import PitchConfig, ProcessPitchConfig

from test_session import make_wave


def test_delta_coeffs_shapes():
    co = delta_coeffs(2, 2)
    assert [len(c) for c in co] == [1, 5, 9]
    # first-order delta of a linear ramp is its slope
    T, D = 20, 3
    ramp = (np.arange(T)[:, None] * np.ones(D)).astype(np.float32)
    cfg = DeltaConfig(order=1, window=2)
    out = compute_deltas(ramp[None], cfg)[0]
    assert out.shape == (T, 2 * D)
    np.testing.assert_allclose(out[5:15, D:], 1.0, atol=1e-5)


def test_streaming_delta_matches_offline():
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((1, 37, 5)).astype(np.float32)
    cfg = DeltaConfig(order=2, window=2)
    want = compute_deltas(feats, cfg)
    sd = StreamingDelta(cfg)
    got = []
    for lo in range(0, 37, 7):
        got.append(sd.accept(feats[:, lo:lo + 7], end=lo + 7 >= 37))
    got = np.concatenate(got, axis=1)
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("use_pitch", [False, True])
def test_frontend_stream_vs_offline(use_pitch):
    wave = make_wave(3, n=6400, amp=5000.0)[None]
    kw = dict(delta_cfg=DeltaConfig(order=2, window=2))
    if use_pitch:
        kw.update(pitch_cfg=PitchConfig(), ppitch_cfg=ProcessPitchConfig())
    f1 = StreamingFrontend(FbankConfig(num_bins=16), **kw)
    off = f1.accept(wave, end=True)
    f2 = StreamingFrontend(FbankConfig(num_bins=16), **kw)
    chunks = []
    for lo in range(0, 6400, 2560):
        chunks.append(f2.accept(wave[:, lo:lo + 2560],
                                end=lo + 2560 >= 6400))
    got = np.concatenate(chunks, axis=1)
    assert got.shape == off.shape
    np.testing.assert_allclose(got, off, atol=1e-4)
    assert off.shape[-1] == f1.dim
    want_dim = (16 + (3 if use_pitch else 0)) * 3
    assert f1.dim == want_dim


def test_session_decodes_with_pitch_and_delta():
    """End-to-end: a session whose AM consumes fbank‖pitch+delta features —
    stream-vs-offline equivalence of the full decode."""
    from asr_decoder_tpu.decoder.config import DecoderConfig
    from asr_decoder_tpu.fst.symbol import SymbolTable
    from asr_decoder_tpu.models.flagship import make_flagship
    from asr_decoder_tpu.serving.session import (OnlineDecoderConfig,
                                                 OnlineDecoderInfo,
                                                 OnlineDecoderSession)
    from test_beamsearch import random_decode_graph

    rng = np.random.default_rng(33)
    num_labels = 15
    fst = random_decode_graph(rng, num_states=40, num_labels=num_labels)
    dim = (16 + 3) * 3          # fbank16 ‖ pitch3, delta order 2
    nnet = make_flagship(jax.random.PRNGKey(3), feat_dim=dim, num_pdfs=16,
                         hidden=16, proj=8, num_layers=1, context=1)
    words = SymbolTable()
    words.add("<eps>", 0)
    for i in range(1, 6):
        words.add(f"w{i}", i)
    info = OnlineDecoderInfo(
        nnet, fst, words, np.arange(num_labels + 1, dtype=np.int32),
        decoder_config=DecoderConfig(beam=1e9, beam_width=64, arc_lanes=8,
                                     min_active=0),
        online_config=OnlineDecoderConfig(chunk_frames=16),
        fbank_config=FbankConfig(num_bins=16),
        pitch_config=PitchConfig(),
        process_pitch_config=ProcessPitchConfig(),
        delta_config=DeltaConfig(order=2, window=2))
    wave = make_wave(33, n=8000, amp=5000.0)
    s = OnlineDecoderSession(info)
    s.process_data(wave, eos=True)
    ref = s.get_best_path()
    assert s.num_frames_decoded > 40

    s2 = OnlineDecoderSession(info)
    for lo in range(0, 8000, 3700):
        s2.process_data(wave[lo:lo + 3700], eos=lo + 3700 >= 8000)
    got = s2.get_best_path()
    assert got["words"] == ref["words"]
    assert got["cost"] == pytest.approx(ref["cost"], abs=1e-3)
