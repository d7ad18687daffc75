"""Batched multi-stream decoder tests: N interleaved channels through one
device program must match independent per-utterance sessions exactly
(ref: the gpu-asr batched pipeline contract, src/gpu-asr/), including
channel-slot reuse (the corr-id collision fix)."""

import numpy as np
import pytest

from asr_decoder_tpu.serving.batcher import BatchedStreamingDecoder
from asr_decoder_tpu.serving.session import OnlineDecoderSession

from test_session import make_info, make_wave


@pytest.fixture(scope="module")
def info():
    return make_info()


def session_decode(info, wave):
    s = OnlineDecoderSession(info)
    s.process_data(wave, eos=True)
    return s


def test_batched_matches_sessions_interleaved(info):
    waves = [make_wave(s, n=[16000, 9000, 12345][s]) for s in range(3)]
    want = [session_decode(info, w).get_best_path() for w in waves]

    eng = BatchedStreamingDecoder(info, num_channels=4)
    cids = [eng.acquire() for _ in range(3)]
    # interleave ragged pushes; step whenever anything is ready
    cursors = [0, 0, 0]
    chunks = [5000, 3000, 4000]
    while any(c < len(w) for c, w in zip(cursors, waves)):
        for i, cid in enumerate(cids):
            if cursors[i] >= len(waves[i]):
                continue
            n = chunks[i]
            end = cursors[i] + n >= len(waves[i])
            eng.push(cid, waves[i][cursors[i]:cursors[i] + n], eos=end)
            cursors[i] += n
        eng.step()
    eng.drain()
    for i, cid in enumerate(cids):
        got = eng.get_best_path(cid)
        assert got["words"] == want[i]["words"]
        assert got["cost"] == pytest.approx(want[i]["cost"], abs=1e-3)
        assert eng._channels[cid].frames_decoded > 0


def test_channel_reuse_is_clean(info):
    wave_a, wave_b = make_wave(10, n=9000), make_wave(11, n=9000)
    want_b = session_decode(info, wave_b).get_best_path()

    eng = BatchedStreamingDecoder(info, num_channels=2)
    cid = eng.acquire()
    eng.push(cid, wave_a, eos=True)
    eng.drain()
    first = eng.get_best_path(cid)
    assert first["cost"] < np.inf
    eng.release(cid)
    # reacquire the same slot: state must be fully reset
    cid2 = eng.acquire()
    assert cid2 == cid
    eng.push(cid2, wave_b, eos=True)
    eng.drain()
    got = eng.get_best_path(cid2)
    assert got["words"] == want_b["words"]
    assert got["cost"] == pytest.approx(want_b["cost"], abs=1e-3)


def test_idle_channels_untouched(info):
    """A channel with no input must be bit-identical after others decode."""
    eng = BatchedStreamingDecoder(info, num_channels=3)
    idle = eng.acquire()
    busy = eng.acquire()
    before = [np.asarray(a[idle]).copy() for a in eng._beam]
    eng.push(busy, make_wave(12, n=8000), eos=True)
    eng.drain()
    after = [np.asarray(a[idle]) for a in eng._beam]
    for b, a in zip(before, after):
        np.testing.assert_array_equal(b, a)
    assert eng.get_best_path(idle)["words"] == []


def test_nbest_and_lattice_match_session(info):
    wave = make_wave(13)
    sess = session_decode(info, wave)
    eng = BatchedStreamingDecoder(info, num_channels=2)
    cid = eng.acquire()
    eng.push(cid, wave, eos=True)
    eng.drain()
    assert eng.get_best_path_txt(cid) == sess.get_best_path_txt()
    got_nb = eng.get_nbest(cid, 3)
    want_nb = sess.get_nbest(3)
    assert [r["text"] for r in got_nb] == [r["text"] for r in want_nb]


def _make_info_gt(graph_type):
    """OnlineDecoderInfo for any graph type (arena generalization: the
    chunk-log split is generic over the decoder variant's log pytree)."""
    if graph_type == "hclg":
        return make_info()
    import jax
    from asr_decoder_tpu.decoder.config import DecoderConfig
    from asr_decoder_tpu.frontend.fbank import FbankConfig
    from asr_decoder_tpu.fst.symbol import SymbolTable
    from asr_decoder_tpu.models.flagship import make_flagship
    from asr_decoder_tpu.serving.session import (OnlineDecoderConfig,
                                                 OnlineDecoderInfo)
    nnet = make_flagship(jax.random.PRNGKey(0), feat_dim=16, num_pdfs=16,
                         hidden=16, proj=8, num_layers=1, context=1)
    words = SymbolTable()
    words.add("<eps>", 0)
    for i in range(1, 8):
        words.add(f"w{i}", i)
    if graph_type == "clg":
        from test_clg import make_clg
        _, g = make_clg(11, num_pdfs=15)
        return OnlineDecoderInfo(
            nnet, None, words, np.arange(16, dtype=np.int32),
            decoder_config=DecoderConfig(beam=1e9, beam_width=64,
                                         arc_lanes=8, min_active=0,
                                         lattice_beam=8.0,
                                         eps_mode="sweeps"),
            online_config=OnlineDecoderConfig(graph_type="clg",
                                              chunk_frames=16),
            fbank_config=FbankConfig(num_bins=16), clg_graph=g)
    assert graph_type == "biglm-hclg"
    from asr_decoder_tpu.lm.arpa import parse_arpa
    from asr_decoder_tpu.lm.device_lm import DeviceDiffLm
    from test_beamsearch import random_decode_graph
    from test_lm import ARPA, ARPA2
    fsa1 = parse_arpa(ARPA)
    fsa2 = parse_arpa(ARPA2, word2id=fsa1.vocab)
    fst = random_decode_graph(np.random.default_rng(4), num_states=30,
                              num_labels=6)
    return OnlineDecoderInfo(
        nnet, fst, words, np.arange(7, dtype=np.int32),
        decoder_config=DecoderConfig(beam=1e9, beam_width=64, arc_lanes=8,
                                     min_active=0, lattice_beam=1e9,
                                     eps_mode="sweeps", lm_lanes=1 << 20),
        online_config=OnlineDecoderConfig(graph_type="biglm-hclg",
                                          chunk_frames=16),
        fbank_config=FbankConfig(num_bins=16),
        difflm=DeviceDiffLm.build(fsa1, fsa2, 0.7, 1.3))


@pytest.mark.parametrize("graph_type", ["clg", "biglm-hclg"])
def test_batched_serves_all_graph_types(graph_type):
    """The arena serves clg and biglm-hclg streams too (was: hclg-only with
    a mid-stream TypeError) — batched == per-session parity."""
    gt_info = _make_info_gt(graph_type)
    waves = [make_wave(s, n=[12000, 9000][s]) for s in range(2)]
    want = [session_decode(gt_info, w).get_best_path() for w in waves]

    eng = BatchedStreamingDecoder(gt_info, num_channels=2)
    cids = [eng.acquire() for _ in range(2)]
    cursors = [0, 0]
    chunks = [5000, 3000]
    while any(c < len(w) for c, w in zip(cursors, waves)):
        for i, cid in enumerate(cids):
            if cursors[i] >= len(waves[i]):
                continue
            end = cursors[i] + chunks[i] >= len(waves[i])
            eng.push(cid, waves[i][cursors[i]:cursors[i] + chunks[i]],
                     eos=end)
            cursors[i] += chunks[i]
        eng.step()
    eng.drain()
    for i, cid in enumerate(cids):
        got = eng.get_best_path(cid)
        assert got["words"] == want[i]["words"]
        assert got["cost"] == pytest.approx(want[i]["cost"], abs=1e-3)


def test_capacity_and_double_release(info):
    eng = BatchedStreamingDecoder(info, num_channels=2)
    a, b = eng.acquire(), eng.acquire()
    with pytest.raises(RuntimeError):
        eng.acquire()
    eng.release(a)
    c = eng.acquire()
    assert c == a
    with pytest.raises(AssertionError):
        eng.release(a)
        eng.release(a)
