"""Streaming session tests: stream-vs-offline equivalence (the reference's
primary verification axis, SURVEY §4) + partial results, n-best, endpointing
(ref session API: src/kaldi-nnet3/kaldi-online-nnet3-my-decoder.h:233-344)."""

import jax
import numpy as np
import pytest

from asr_decoder_tpu.decoder.config import DecoderConfig
from asr_decoder_tpu.frontend.fbank import FbankConfig
from asr_decoder_tpu.fst.symbol import SymbolTable
from asr_decoder_tpu.models.flagship import make_flagship
from asr_decoder_tpu.serving.session import (FeatureBuffer,
                                             OnlineDecoderConfig,
                                             OnlineDecoderInfo,
                                             OnlineDecoderSession)
from asr_decoder_tpu.vad.energy import EnergyVadConfig

from test_beamsearch import random_decode_graph


def make_info(seed=0, am_config=None, **online_kw):
    rng = np.random.default_rng(seed)
    num_labels = 15
    fst = random_decode_graph(rng, num_states=40, num_labels=num_labels)
    nnet = make_flagship(jax.random.PRNGKey(seed), feat_dim=16, num_pdfs=16,
                         hidden=16, proj=8, num_layers=1, context=1)
    words = SymbolTable()
    words.add("<eps>", 0)
    for i in range(1, 6):
        words.add(f"w{i}", i)
    i2p = np.arange(num_labels + 1, dtype=np.int32)
    return OnlineDecoderInfo(
        nnet, fst, words, i2p,
        decoder_config=DecoderConfig(beam=1e9, beam_width=64, arc_lanes=8,
                                     min_active=0, lattice_beam=8.0),
        online_config=OnlineDecoderConfig(
            **{"chunk_frames": 16, **online_kw}),
        fbank_config=FbankConfig(num_bins=16), am_config=am_config)


def make_wave(seed=0, n=16000, amp=4000.0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(n) * amp).astype(np.float32)


@pytest.fixture(scope="module")
def info():
    return make_info()


def test_stream_vs_offline_equivalence(info):
    wave = make_wave()
    off = OnlineDecoderSession(info)
    off.process_data(wave, eos=True)
    ref = off.get_best_path()
    assert off.num_frames_decoded > 50

    for splits in ([4000, 9000], [160, 2500, 10000, 15555], [16000]):
        s = OnlineDecoderSession(info)
        prev = 0
        for cut in splits:
            s.process_data(wave[prev:cut])
            prev = cut
        s.process_data(wave[prev:], eos=True)
        res = s.get_best_path()
        assert res["words"] == ref["words"]
        assert res["cost"] == pytest.approx(ref["cost"], abs=1e-3)
        assert s.num_frames_decoded == off.num_frames_decoded


def test_partial_then_final(info):
    wave = make_wave(1)
    s = OnlineDecoderSession(info)
    s.process_data(wave[:8000])
    partial = s.get_best_path()
    assert partial["cost"] < np.inf and s.num_frames_decoded > 0
    s.process_data(wave[8000:], eos=True)
    final = s.get_best_path()
    assert final["reached_final"]
    txt = s.get_best_path_txt()
    assert isinstance(txt, str)


def test_nbest_first_is_best(info):
    s = OnlineDecoderSession(info)
    s.process_data(make_wave(2), eos=True)
    best = s.get_best_path()
    nbest = s.get_nbest(4)
    assert len(nbest) >= 1
    assert nbest[0]["words"] == best["words"]
    costs = [r["graph_cost"] + r["am_cost"] for r in nbest]
    assert costs == sorted(costs)
    assert s.get_nbest_txt(2)[0] == s.get_best_path_txt()


def test_reset_and_reinit(info):
    wave = make_wave(3)
    s = OnlineDecoderSession(info)
    s.process_data(wave, eos=True)
    first = s.get_best_path()
    s.reset()
    s.process_data(wave, eos=True)
    again = s.get_best_path()
    assert again["words"] == first["words"]
    assert again["cost"] == pytest.approx(first["cost"], abs=1e-3)
    # init_decoding keeps AM state but restarts the search
    s.init_decoding()
    assert s.num_frames_decoded == 0
    assert s.get_best_path()["words"] == []


def test_skip_copy_decodes_every_frame():
    """skip_copy: the AM scores every 3rd frame but the search walks all
    frames with copied scores (ref _skip score copy, nnet-nnet.cc:93-116);
    chunk splits don't change the result."""
    from asr_decoder_tpu.models.nnet import AmConfig
    info_sc = make_info(am_config=AmConfig(skip=2, skip_copy=True),
                        chunk_frames=18)
    info_drop = make_info(am_config=AmConfig(skip=2), chunk_frames=18)
    wave = make_wave(9)
    ref = OnlineDecoderSession(info_sc)
    ref.process_data(wave, eos=True)
    drop = OnlineDecoderSession(info_drop)
    drop.process_data(wave, eos=True)
    # search walks (skip+1)x the frames of drop mode
    assert ref.num_frames_decoded > 2.5 * drop.num_frames_decoded
    r0 = ref.get_best_path()
    for splits in ([5000, 11000], [16000]):
        s = OnlineDecoderSession(info_sc)
        prev = 0
        for cut in splits:
            s.process_data(wave[prev:cut])
            prev = cut
        s.process_data(wave[prev:], eos=True)
        res = s.get_best_path()
        assert res["words"] == r0["words"]
        assert res["cost"] == pytest.approx(r0["cost"], abs=1e-3)
        assert s.num_frames_decoded == ref.num_frames_decoded


def _info_kwargs(seed):
    rng = np.random.default_rng(seed)
    num_labels = 15
    fst = random_decode_graph(rng, num_states=40, num_labels=num_labels)
    nnet = make_flagship(jax.random.PRNGKey(seed), feat_dim=16, num_pdfs=16,
                         hidden=16, proj=8, num_layers=1, context=1)
    words = SymbolTable()
    words.add("<eps>", 0)
    for i in range(1, 6):
        words.add(f"w{i}", i)
    i2p = np.arange(num_labels + 1, dtype=np.int32)
    return fst, nnet, words, i2p


def _stream_words(info, wave, splits=()):
    s = OnlineDecoderSession(info)
    prev = 0
    for cut in splits:
        s.process_data(wave[prev:cut])
        prev = cut
    s.process_data(wave[prev:], eos=True)
    return s.get_best_path()


def test_graph_type_biglm_session():
    """graph_type=biglm-hclg runs the in-search pair decoder in the live
    session; the diff LM visibly changes costs vs plain hclg, and chunk
    splits don't change the result."""
    from asr_decoder_tpu.lm.arpa import parse_arpa
    from asr_decoder_tpu.lm.device_lm import DeviceDiffLm
    from test_lm import ARPA, ARPA2
    fst, nnet, words, i2p = _info_kwargs(21)
    fsa1 = parse_arpa(ARPA)
    fsa2 = parse_arpa(ARPA2, word2id=fsa1.vocab)
    difflm = DeviceDiffLm.build(fsa1, fsa2, 1.0, 4.0)
    dec_cfg = DecoderConfig(beam=1e9, beam_width=64, arc_lanes=8,
                            min_active=0, eps_mode="sweeps")
    base = OnlineDecoderInfo(
        nnet, fst, words, i2p, decoder_config=dec_cfg,
        online_config=OnlineDecoderConfig(chunk_frames=16),
        fbank_config=FbankConfig(num_bins=16))
    big = OnlineDecoderInfo(
        nnet, fst, words, i2p, decoder_config=dec_cfg,
        online_config=OnlineDecoderConfig(chunk_frames=16,
                                          graph_type="biglm-hclg"),
        fbank_config=FbankConfig(num_bins=16), difflm=difflm)
    wave = make_wave(21)
    r_base = _stream_words(base, wave)
    r_big = _stream_words(big, wave)
    assert abs(r_base["cost"] - r_big["cost"]) > 1e-3  # LM applied
    r_big2 = _stream_words(big, wave, splits=(5000, 12000))
    assert r_big2["words"] == r_big["words"]
    assert r_big2["cost"] == pytest.approx(r_big["cost"], abs=1e-3)


def test_graph_type_clg_session():
    """graph_type=clg decodes the CLG⊗HMM composite in the live session."""
    from test_clg import make_clg
    _, nnet, words, _ = _info_kwargs(22)
    _, clg_graph = make_clg(22, num_pdfs=15)
    i2p = np.arange(16, dtype=np.int32)
    info = OnlineDecoderInfo(
        nnet, None, words, i2p,
        decoder_config=DecoderConfig(beam=1e9, beam_width=256, arc_lanes=8,
                                     max_active=256, min_active=0,
                                     eps_mode="sweeps"),
        online_config=OnlineDecoderConfig(chunk_frames=16,
                                          graph_type="clg"),
        fbank_config=FbankConfig(num_bins=16), clg_graph=clg_graph)
    wave = make_wave(22)
    r1 = _stream_words(info, wave)
    r2 = _stream_words(info, wave, splits=(4000, 9000))
    assert r1["words"] == r2["words"]
    assert r1["cost"] == pytest.approx(r2["cost"], abs=1e-3)
    s = OnlineDecoderSession(info)
    s.process_data(wave, eos=True)
    # CLG sessions now serve raw lattices (token-snapshot reconstruction
    # over the virtual composite); determinize=False — this worst-case
    # beam=1e9 lattice is intentionally degenerate and the determinizer's
    # work cap would just fall back to raw anyway
    lat = s.get_lattice(determinize=False)
    assert lat is not None and lat.num_states > 0
    best = s.get_best_path()
    if best["reached_final"]:
        words, _, _, _ = lat.to_vector()
        assert words == best["words"]


def test_endpoint_detection():
    info = make_info(use_energy_vad=True, endpoint_sil_frames=20,
                     min_endpoint_frames=10)
    s = OnlineDecoderSession(info)
    speech = make_wave(4, n=12000, amp=6000.0)
    sil = np.zeros(12000, np.float32)
    s.process_data(speech)
    assert not s.endpoint_detected()
    s.process_data(sil)
    assert s.endpoint_detected()


def test_feature_buffer_exactly_once():
    buf = FeatureBuffer(left=2, right=2, offsets=(-2, -1, 0, 1, 2))
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((20, 3)).astype(np.float32)
    # offline
    off = FeatureBuffer(2, 2, (-2, -1, 0, 1, 2))
    whole = off.accept(feats, end=True)
    assert whole.shape == (20, 15)
    # streamed in ragged chunks
    outs = [buf.accept(feats[:1]), buf.accept(feats[1:7]),
            buf.accept(feats[7:7]), buf.accept(feats[7:19]),
            buf.accept(feats[19:], end=True)]
    got = np.concatenate([o for o in outs if o.size], axis=0)
    np.testing.assert_allclose(got, whole, rtol=0, atol=0)


def test_skip_blank_frames_session():
    """CTC blank-skip in the session (ref SkipBlockFrame nnet-nnet.h:265):
    best path still works; lattice output is refused in this mode."""
    from asr_decoder_tpu.models.nnet import AmConfig
    info = make_info(am_config=AmConfig(block_pdf_pdfid=0, skip_block=0.2,
                                        skip_blank_frames=True))
    s = OnlineDecoderSession(info)
    s.process_data(make_wave(), eos=True)
    res = s.get_best_path()
    assert "words" in res
    with pytest.raises(RuntimeError, match="skip_blank_frames"):
        s.get_lattice()
