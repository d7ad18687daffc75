"""End-to-end WER harness test: train the flagship CTC AM on the synthetic
phone task, decode held-out utterances through the device beam search at a
production-style operating point, and assert (a) the model actually learned
(low WER) and (b) device hypotheses exactly equal the host gold decoder's
(the WER-parity axis, BASELINE quality target)."""

import numpy as np
import pytest

from asr_decoder_tpu.decoder.config import DecoderConfig
from asr_decoder_tpu.eval.harness import evaluate_wer, train_ctc_model
from asr_decoder_tpu.eval.synth_task import SynthTask
from asr_decoder_tpu.fst.ctc_graph import build_ctc_decode_graph


def test_ctc_graph_shapes():
    task = SynthTask(num_phones=6, num_words=8, feat_dim=8, seed=1)
    fst, i2p = build_ctc_decode_graph(task.lexicon, task.word_costs,
                                      task.num_phones)
    assert fst.start == 0
    assert len(i2p) == task.num_phones + 2
    assert i2p[task.num_phones + 1] == 0          # blank ilabel → pdf 0
    assert (np.asarray(i2p[1:task.num_phones + 1])
            == np.arange(1, task.num_phones + 1)).all()


def test_train_decode_wer_parity():
    task = SynthTask(num_phones=6, num_words=8, feat_dim=10, noise=0.25,
                     seed=0)
    layers, loss = train_ctc_model(task, hidden=64, proj=32, num_layers=1,
                                   steps=700, batch=8, max_frames=96,
                                   max_label=20, lr=5e-3)
    assert loss < 3.0, f"CTC did not converge: loss={loss}"
    config = DecoderConfig(beam=16.0, beam_width=512, max_active=7000,
                           min_active=64, arc_lanes=8)
    res = evaluate_wer(task, layers, num_utts=12, batch=4, max_frames=128,
                       config=config, check_gold=6)
    # the model decodes the held-out set well...
    assert res.wer.wer < 0.2, (res.wer.errors, res.wer.ref_len)
    # ...and the device search is exactly the host gold search
    assert res.gold_mismatches == 0
    assert res.gold_wer.errors <= res.wer.errors
    assert res.rtf > 0 and res.frames > 0


def test_ctc_graph_trie_equivalent_to_flat():
    """share_prefixes (trie L, olabel-pushed-late) decodes the same best
    words at the same total cost as the flat per-word-chain topology."""
    import jax
    from asr_decoder_tpu.decoder.config import DecoderConfig
    from asr_decoder_tpu.eval.synth_task import SynthTask
    from asr_decoder_tpu.fst.ctc_graph import build_ctc_decode_graph
    from asr_decoder_tpu.fst.device_fst import DeviceFst
    from asr_decoder_tpu.ops.beamsearch import TpuBeamSearch

    task = SynthTask(num_phones=8, num_words=12, feat_dim=12, seed=0)
    flat, i2p = build_ctc_decode_graph(task.lexicon, task.word_costs,
                                       task.num_phones)
    trie, i2p2 = build_ctc_decode_graph(task.lexicon, task.word_costs,
                                        task.num_phones,
                                        share_prefixes=True)
    np.testing.assert_array_equal(i2p, i2p2)
    assert trie.num_states <= flat.num_states
    cfg = DecoderConfig(beam=1e9, beam_width=256, max_active=256,
                        arc_lanes=16, min_active=0)
    rng = np.random.default_rng(5)
    for _ in range(3):
        _, _, feats = task.sample_utterance(rng)
        scores = feats @ task.templates.T
        logp = scores - np.log(np.exp(scores).sum(axis=1, keepdims=True))
        # AM rows: 0=blank..P, plus the i2p mapping handles blank_il
        ll = logp.astype(np.float32)[None]
        s1 = TpuBeamSearch(DeviceFst.build(flat, arc_lanes=16), i2p, cfg)
        s2 = TpuBeamSearch(DeviceFst.build(trie, arc_lanes=16), i2p, cfg)
        a = s1.traceback(*s1.decode(ll), flat)[0]
        b = s2.traceback(*s2.decode(ll), trie)[0]
        assert a["words"] == b["words"]
        assert a["cost"] == pytest.approx(b["cost"], abs=1e-3)
