"""Cross-implementation parity: the device TpuBeamSearch vs the ACTUAL
reference C++ LatticeFasterDecoder (built Kaldi-free from /root/reference,
ref: src/my-decoder/lattice-faster-decoder.cc).

Same graph (via StdFst.write_binary, the reference's own on-disk format)
and same loglikes through both implementations must yield identical word
sequences and total costs — externally anchoring the repo's parity claims
(previously checked only against our own gold Python decoder)."""

import numpy as np
import pytest

from asr_decoder_tpu.decoder import ref_parity
from asr_decoder_tpu.decoder.config import DecoderConfig
from asr_decoder_tpu.fst.device_fst import DeviceFst
from asr_decoder_tpu.ops.beamsearch import TpuBeamSearch

from test_beamsearch import random_decode_graph

pytestmark = pytest.mark.skipif(
    not ref_parity.available(),
    reason="reference tree or g++ not available")


@pytest.fixture(scope="session")
def ref_binary(tmp_path_factory):
    return ref_parity.build(str(tmp_path_factory.mktemp("refparity")))


def _decode_both(ref_binary, fst, loglikes, i2p, acoustic_scale=1.0,
                 eps_mode="auto"):
    cfg = DecoderConfig(beam=1e9, beam_width=256, arc_lanes=16,
                        max_active=256, min_active=0, lattice_beam=1e9,
                        acoustic_scale=acoustic_scale, eps_mode=eps_mode)
    dev = DeviceFst.build(fst, arc_lanes=cfg.arc_lanes)
    search = TpuBeamSearch(dev, i2p, cfg)
    ours = search.traceback(*search.decode(loglikes[None]), fst)[0]
    ref = ref_parity.run(ref_binary, fst, loglikes, i2p,
                         acoustic_scale=acoustic_scale, beam=1e9,
                         max_active=1 << 30, min_active=0)
    return ours, ref


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4, 5, 6, 7])
def test_matches_reference_decoder_random_graphs(ref_binary, seed):
    rng = np.random.default_rng(seed)
    num_labels = 8
    fst = random_decode_graph(rng, num_states=40, num_labels=num_labels)
    i2p = np.arange(num_labels + 1, dtype=np.int32)
    T, V = 25, num_labels + 1
    loglikes = (rng.standard_normal((T, V)) * 3).astype(np.float32)
    ours, ref = _decode_both(ref_binary, fst, loglikes, i2p)
    assert ref["nonempty"]
    assert ours["cost"] == pytest.approx(ref["cost"], abs=1e-2)
    assert ours["words"] == ref["words"]
    assert ours["ilabels"] == ref["ilabels"]


@pytest.mark.parametrize("scale", [1.0, 0.1])
def test_matches_reference_decoder_acoustic_scale(ref_binary, scale):
    rng = np.random.default_rng(42)
    fst = random_decode_graph(rng, num_states=30, num_labels=6)
    i2p = np.arange(7, dtype=np.int32)
    loglikes = (rng.standard_normal((20, 7)) * 3).astype(np.float32)
    ours, ref = _decode_both(ref_binary, fst, loglikes, i2p,
                             acoustic_scale=scale)
    assert ours["cost"] == pytest.approx(ref["cost"], abs=1e-2)
    assert ours["words"] == ref["words"]


def test_matches_reference_decoder_ctc_mapping(ref_binary):
    """CTC-style ilabel-1 pdf mapping agrees through both decodables."""
    rng = np.random.default_rng(9)
    num_labels = 6
    fst = random_decode_graph(rng, num_states=30, num_labels=num_labels)
    # ilabel -> ilabel-1 (CTC shift); ilabel 0 unused (epsilon)
    i2p = np.concatenate([[0], np.arange(num_labels)]).astype(np.int32)
    loglikes = (rng.standard_normal((18, num_labels)) * 3).astype(np.float32)
    ours, ref = _decode_both(ref_binary, fst, loglikes, i2p)
    assert ours["cost"] == pytest.approx(ref["cost"], abs=1e-2)
    assert ours["words"] == ref["words"]
    assert ours["ilabels"] == ref["ilabels"]


def test_matches_reference_on_eval_task_graph(ref_binary):
    """The eval harness's lexicon+LM CTC decode graph through both
    implementations (the production-shaped quality anchor), with
    realistic posteriors: log-softmax over template scores."""
    from asr_decoder_tpu.eval.synth_task import SynthTask
    from asr_decoder_tpu.fst.ctc_graph import build_ctc_decode_graph
    task = SynthTask(num_phones=8, num_words=12, feat_dim=12, seed=0)
    fst, i2p = build_ctc_decode_graph(task.lexicon, task.word_costs,
                                      task.num_phones)
    rng = np.random.default_rng(3)
    _, _, feats = task.sample_utterance(rng)
    scores = feats @ task.templates.T          # [T, P+1]
    logp = scores - np.log(np.exp(scores).sum(axis=1, keepdims=True))
    loglikes = logp.astype(np.float32)
    ours, ref = _decode_both(ref_binary, fst, loglikes,
                             np.asarray(i2p, np.int32))
    assert ref["nonempty"]
    assert ours["cost"] == pytest.approx(ref["cost"], abs=1e-2)
    assert ours["words"] == ref["words"]
