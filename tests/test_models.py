"""Tests for the L3 acoustic-model runtime: layers, model IO, posterior
pipeline, transition model.

Modeled on the reference's nnet tests (ref: src/nnet/forward-test.cc,
nnet-read-test.cc, src/hmm/test-transition-model.cc) with the numeric
assertions the reference lacks."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from asr_decoder_tpu.models import layers as L
from asr_decoder_tpu.models.nnet import AmConfig, Nnet, am_forward
from asr_decoder_tpu.models.transition import KaldiStream, TransitionModel


def _np_lstm_ref(x, p, peephole=True):
    """Direct numpy port of the reference recurrence semantics
    (ref: lstm-layer.cc:34-89) for verification."""
    T, D = x.shape
    H = p["w_gifo_x"].shape[0] // 4
    c = np.zeros(H)
    m = np.zeros(H)
    sig = lambda v: 1.0 / (1.0 + np.exp(-v))
    out = np.zeros((T, H))
    for t in range(T):
        g = x[t] @ np.asarray(p["w_gifo_x"]).T + np.asarray(p["bias"])
        g = g + m @ np.asarray(p["w_gifo_m"]).T
        yg, yi, yf, yo = g[:H], g[H:2 * H], g[2 * H:3 * H], g[3 * H:]
        if peephole:
            yi = yi + np.asarray(p["phole_i"]) * c
            yf = yf + np.asarray(p["phole_f"]) * c
        yi, yf, yg = sig(yi), sig(yf), np.tanh(yg)
        c = yi * yg + yf * c
        if peephole:
            yo = yo + np.asarray(p["phole_o"]) * c
        yo = sig(yo)
        m = yo * np.tanh(c)
        out[t] = m
    return out


def test_lstm_matches_reference_recurrence():
    key = jax.random.PRNGKey(0)
    lstm = L.make_lstm(key, 6, 5)
    x = np.random.default_rng(0).standard_normal((1, 7, 6)).astype(np.float32)
    st = L.init_layer_state(lstm, 1)
    y, _ = L.layer_forward(lstm, jnp.asarray(x), st)
    ref = _np_lstm_ref(x[0], lstm.params)
    np.testing.assert_allclose(np.asarray(y)[0], ref, rtol=2e-5, atol=2e-5)


def test_lstm_streaming_equals_offline():
    """Stream-vs-offline equivalence — the reference's strongest test axis
    (SURVEY §4: stream-kaldi-forward-test)."""
    key = jax.random.PRNGKey(1)
    lstm = L.make_lstm(key, 4, 8)
    x = np.random.default_rng(1).standard_normal((2, 10, 4)).astype(np.float32)
    st = L.init_layer_state(lstm, 2)
    y_full, _ = L.layer_forward(lstm, jnp.asarray(x), st)
    st = L.init_layer_state(lstm, 2)
    y1, st = L.layer_forward(lstm, jnp.asarray(x[:, :3]), st)
    y2, st = L.layer_forward(lstm, jnp.asarray(x[:, 3:7]), st)
    y3, _ = L.layer_forward(lstm, jnp.asarray(x[:, 7:]), st)
    y_chunks = jnp.concatenate([y1, y2, y3], axis=1)
    np.testing.assert_allclose(np.asarray(y_full), np.asarray(y_chunks),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("maker", [
    lambda k: L.make_lstm_projected(k, 4, 6, 3),
    lambda k: L.make_sru(k, 4, 4),
    lambda k: L.make_lstm(k, 4, 4, peephole=False),
])
def test_recurrent_streaming_equals_offline(maker):
    layer = maker(jax.random.PRNGKey(2))
    x = np.random.default_rng(2).standard_normal((3, 8, 4)).astype(np.float32)
    st = L.init_layer_state(layer, 3)
    y_full, _ = L.layer_forward(layer, jnp.asarray(x), st)
    st = L.init_layer_state(layer, 3)
    y1, st = L.layer_forward(layer, jnp.asarray(x[:, :5]), st)
    y2, _ = L.layer_forward(layer, jnp.asarray(x[:, 5:]), st)
    np.testing.assert_allclose(
        np.asarray(y_full), np.asarray(jnp.concatenate([y1, y2], 1)),
        rtol=1e-5, atol=1e-5)


def test_splice_repeat_edge():
    sp = L.make_splice([-2, 0, 1], 2)
    x = jnp.arange(8, dtype=jnp.float32).reshape(1, 4, 2)
    y, _ = L.layer_forward(sp, x, {})
    assert y.shape == (1, 4, 6)
    # frame 0: left context clamps to frame 0
    np.testing.assert_allclose(np.asarray(y)[0, 0],
                               [0, 1, 0, 1, 2, 3])
    # last frame: right context clamps to last
    np.testing.assert_allclose(np.asarray(y)[0, 3],
                               [2, 3, 6, 7, 6, 7])


def _tiny_model(key):
    ks = jax.random.split(key, 4)
    counts = np.array([5.0, 3.0, 2.0, 7.0, 1.0])
    return Nnet([
        L.make_splice([-1, 0, 1], 3),
        L.make_affine(ks[0], 9, 8),
        L.make_lstm(ks[1], 8, 8),
        L.make_lstm_projected(ks[2], 8, 8, 6),
        L.make_sru(ks[3], 6, 6),
        L.make_affine(ks[0], 6, 5),
        L.make_softmax(5),
        L.make_prior(counts),
    ])


def test_nnet_binary_roundtrip(tmp_path):
    nnet = _tiny_model(jax.random.PRNGKey(3))
    p = str(tmp_path / "model.bin")
    nnet.write_binary(p)
    nnet2 = Nnet.read_binary(p)
    assert len(nnet2.layers) == len(nnet.layers)
    assert nnet2.context() == (1, 1)
    x = np.random.default_rng(3).standard_normal((2, 6, 3)).astype(np.float32)
    y1, _ = am_forward(nnet.layers, jnp.asarray(x), nnet.init_state(2))
    y2, _ = am_forward(nnet2.layers, jnp.asarray(x), nnet2.init_state(2))
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                               rtol=1e-6, atol=1e-6)


def test_am_forward_posterior_pipeline():
    nnet = _tiny_model(jax.random.PRNGKey(4))
    x = np.random.default_rng(4).standard_normal((1, 5, 3)).astype(np.float32)
    ll, _ = am_forward(nnet.layers, jnp.asarray(x), nnet.init_state(1))
    assert ll.shape == (1, 5, 5)
    # log softmax minus log prior: exp(ll + log_prior) sums to 1
    logp = np.asarray(nnet.layers[-1].params["log_priors"])
    post = np.exp(np.asarray(ll) + logp)
    np.testing.assert_allclose(post.sum(-1), 1.0, rtol=1e-4)
    # no-softmax mode stops before the softmax layer (raw logits)
    raw, _ = am_forward(nnet.layers, jnp.asarray(x), nnet.init_state(1),
                        do_softmax=False)
    assert not np.allclose(np.asarray(raw), np.asarray(ll))


def test_am_forward_frame_skip():
    nnet = _tiny_model(jax.random.PRNGKey(5))
    x = np.random.default_rng(5).standard_normal((1, 9, 3)).astype(np.float32)
    ll, _ = am_forward(nnet.layers, jnp.asarray(x), nnet.init_state(1), skip=2)
    assert ll.shape[1] == 3  # every 3rd frame


def test_am_forward_skip_copy():
    """skip_copy keeps T rows, copying each computed row onto the skipped
    frames (ref _skip score copy, nnet-nnet.cc:93-116)."""
    nnet = _tiny_model(jax.random.PRNGKey(6))
    x = np.random.default_rng(6).standard_normal((1, 8, 3)).astype(np.float32)
    sub, _ = am_forward(nnet.layers, jnp.asarray(x), nnet.init_state(1),
                        skip=2)
    full, _ = am_forward(nnet.layers, jnp.asarray(x), nnet.init_state(1),
                         skip=2, skip_copy=True)
    assert full.shape[1] == 8
    expect = np.repeat(np.asarray(sub), 3, axis=1)[:, :8]
    np.testing.assert_allclose(np.asarray(full), expect)


_TOPO = """<TransitionModel>
<Topology>
<TopologyEntry>
<ForPhones> 1 2 </ForPhones>
<State> 0 <PdfClass> 0 <Transition> 0 0.5 <Transition> 1 0.5 </State>
<State> 1 <PdfClass> 1 <Transition> 1 0.5 <Transition> 2 0.5 </State>
<State> 2 </State>
</TopologyEntry>
</Topology>
<Triples> 4
1 0 0
1 1 1
2 0 2
2 1 3
</Triples>
</TransitionModel>
"""


def test_transition_model_text():
    tm = TransitionModel.read_stream(KaldiStream(_TOPO.encode()))
    # 4 transition states x 2 transitions each = 8 trans-ids
    assert tm.num_transition_ids == 8
    assert tm.num_pdfs == 4
    # tid 1 = state 1 (phone1 hmm0) self-loop -> pdf 0
    assert tm.transition_id_to_pdf(1) == 0
    assert tm.transition_id_to_pdf(2) == 0
    assert tm.transition_id_to_pdf(3) == 1
    assert tm.transition_id_to_phone(5) == 2
    assert tm.self_loop_of(1) == 1
    m = tm.ilabel_map()
    assert m.shape == (9,)
    assert m[4] == 1


def test_transition_model_roundtrip(tmp_path):
    tm = TransitionModel.read_stream(KaldiStream(_TOPO.encode()))
    p = str(tmp_path / "trans.mdl")
    tm.write_text(p)
    tm2 = TransitionModel.read(p)
    assert tm2.num_transition_ids == tm.num_transition_ids
    np.testing.assert_array_equal(tm2.id2pdf, tm.id2pdf)


_REF_MDL = "/root/reference/src/hmm/kaldi.final.mdl"


@pytest.mark.skipif(not os.path.exists(_REF_MDL),
                    reason="reference fixture not available")
def test_transition_model_reads_reference_fixture():
    """Reads the reference's in-tree Kaldi model fixture
    (ref: src/hmm/kaldi.final.mdl, exercised by test-transition-model.cc)."""
    tm = TransitionModel.read(_REF_MDL)
    assert tm.num_transition_ids > 1000
    assert tm.num_pdfs > 100
    # every transition id maps to a valid pdf
    assert (tm.id2pdf[1:] >= 0).all()
    assert (tm.id2pdf[1:] < tm.num_pdfs).all()
    assert len(tm.log_probs) in (0, tm.num_transition_ids + 1)
