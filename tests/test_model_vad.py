"""Model-VAD tests (ref: src/online-vad): nnet silence posterior → judge →
segments, streaming-vs-offline consistency, and the segment post-ops."""

import jax
import numpy as np
import pytest

from asr_decoder_tpu.models import layers as L
from asr_decoder_tpu.models.nnet import Nnet
from asr_decoder_tpu.vad.energy import AUDIO, SIL, vad_segments
from asr_decoder_tpu.vad.model_vad import (VadJudgeConfig, VadNnet,
                                           VadNnetStream, compress_align_vad,
                                           merge_same_audio,
                                           restrict_max_nosil)


def make_vad_nnet(dim=8):
    """Tiny 2-class VAD net whose P(sil) follows −mean(feature):
    affine weight row0 = −1s (sil logit), row1 = +1s (speech logit)."""
    w = np.zeros((2, dim), np.float32)
    w[0] = -1.0
    w[1] = 1.0
    bias = np.array([2.0, -2.0], np.float32)  # favor sil at zero input
    aff = L.Layer({"weight": np.asarray(w), "bias": bias}, "affine", dim, 2)
    return Nnet([aff, L.make_softmax(2)])


def feats_for(pattern, dim=8, amp=2.0):
    """pattern of 0/1 per frame → features with that speech level."""
    f = np.zeros((1, len(pattern), dim), np.float32)
    f[0, np.asarray(pattern) == 1] = amp
    return f


def test_sil_prob_tracks_energy():
    vad = VadNnet(make_vad_nnet(), sil_pdfs=[0])
    st = vad.init_state(1)
    prob, _ = vad.sil_prob(feats_for([0, 1, 0, 1]), st)
    p = np.asarray(prob)[0]
    assert p[0] > 0.9 and p[2] > 0.9
    assert p[1] < 0.1 and p[3] < 0.1


def test_stream_segments_and_offline_match():
    vad = VadNnet(make_vad_nnet(), sil_pdfs=[0])
    judge = VadJudgeConfig(left_frames=4, right_frames=4)
    pattern = [0] * 20 + [1] * 30 + [0] * 25 + [1] * 15 + [0] * 10
    feats = feats_for(pattern)

    offline = VadNnetStream(vad, judge, batch=1)
    d_off = offline.accept(feats, end=True)
    assert d_off.shape[1] == len(pattern)

    stream = VadNnetStream(vad, judge, batch=1)
    outs = []
    for beg in range(0, len(pattern), 17):
        chunk = feats[:, beg:beg + 17]
        outs.append(stream.accept(chunk, end=beg + 17 >= len(pattern)))
    d_str = np.concatenate([o for o in outs if o.size], axis=1)
    np.testing.assert_array_equal(d_str, d_off)

    segs = vad_segments(d_off[0])
    audio = [s for s in segs if s[0] == AUDIO]
    assert len(audio) == 2
    # detected speech spans overlap the true ones
    assert audio[0][1] < 50 < audio[0][2] or audio[0][2] <= 50
    assert offline.nosil_frames > 30


def test_compress_align_vad():
    segs = [(SIL, 0, 40), (AUDIO, 40, 60), (SIL, 60, 100), (AUDIO, 100, 110),
            (SIL, 110, 150)]
    out = compress_align_vad(segs, sil_frames_cut=10)
    # long internal sil split into two edge-keeps of 5
    assert (SIL, 60, 65) in out and (SIL, 95, 100) in out
    # leading sil keeps only the tail, trailing sil only the head
    assert out[0] == (SIL, 30, 40)
    assert out[-1] == (SIL, 110, 120)


def test_merge_same_audio():
    segs = [(AUDIO, 0, 10), (SIL, 10, 13), (AUDIO, 13, 20), (SIL, 20, 60),
            (AUDIO, 60, 70)]
    out = merge_same_audio(segs, min_sil_frames=5)
    assert out[0] == (AUDIO, 0, 20)
    assert (SIL, 20, 60) in out


def test_restrict_max_nosil():
    segs = [(AUDIO, 0, 95), (SIL, 95, 100)]
    out = restrict_max_nosil(segs, max_nosil_frames=40)
    assert out == [(AUDIO, 0, 40), (AUDIO, 40, 80), (AUDIO, 80, 95),
                   (SIL, 95, 100)]
