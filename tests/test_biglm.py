"""BigLM in-search decoder parity: device pair search vs host gold.

Covers the reference's flagship decoder variant
(src/my-decoder/online-decoder-mempool-base-biglm.h): token identity is
(fst_state, lm1_state, lm2_state), word-olabel arcs add the difference-LM
score inside the search, finals add the LM sentence-end cost.  Also checks
the device n-gram LM tables against the host ``Fsa.get_arc`` backoff chase,
and that in-search BigLM beats post-pass rescoring on tight beams (the
reason the reference builds this variant at all)."""

import numpy as np
import pytest

from asr_decoder_tpu.decoder.config import DecoderConfig
from asr_decoder_tpu.decoder.gold import GoldBigLmDecoder
from asr_decoder_tpu.fst.device_fst import DeviceFst
from asr_decoder_tpu.lm.arpa import parse_arpa
from asr_decoder_tpu.lm.device_lm import DeviceDiffLm, DeviceNgramLm, \
    lm_get_arc
from asr_decoder_tpu.ops.beamsearch_biglm import TpuBigLmBeamSearch

from test_beamsearch import random_decode_graph
from test_lm import ARPA, ARPA2


@pytest.fixture(scope="module")
def fsas():
    fsa1 = parse_arpa(ARPA)
    fsa2 = parse_arpa(ARPA2, word2id=fsa1.vocab)
    return fsa1, fsa2


@pytest.mark.parametrize("which", [0, 1])
def test_device_lm_matches_host_get_arc(fsas, which):
    fsa = fsas[which]
    lm = DeviceNgramLm.build(fsa)
    rng = np.random.default_rng(7)
    S = fsa.num_states
    V = max(fsa.vocab.values())
    s = rng.integers(0, S, 200).astype(np.int32)
    w = rng.integers(0, V + 1, 200).astype(np.int32)  # 0 = epsilon
    dst, cost = lm_get_arc(lm, s, w)
    dst, cost = np.asarray(dst), np.asarray(cost)
    for i in range(len(s)):
        if w[i] <= 0:
            assert dst[i] == s[i] and cost[i] == 0.0
        else:
            hd, hc = fsa.get_arc(int(s[i]), int(w[i]))
            assert dst[i] == hd, (s[i], w[i])
            assert cost[i] == pytest.approx(hc, abs=1e-5)


def _setup_biglm(seed, num_states=12, lm_lanes=1 << 20, **cfg_kw):
    rng = np.random.default_rng(seed)
    fst = random_decode_graph(rng, num_states=num_states, num_labels=6)
    dev = DeviceFst.build(fst, arc_lanes=8)
    i2p = np.arange(7, dtype=np.int32)
    cfg = DecoderConfig(beam=1e9, beam_width=128, arc_lanes=8,
                        max_active=128, min_active=0, lattice_beam=1e9,
                        eps_mode="sweeps", lm_lanes=lm_lanes, **cfg_kw)
    return rng, fst, dev, i2p, cfg


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_biglm_device_matches_gold(fsas, seed):
    fsa1, fsa2 = fsas
    rng, fst, dev, i2p, cfg = _setup_biglm(seed)
    T, V = 12, 7
    loglikes = rng.standard_normal((T, V)).astype(np.float32) * 3
    gold = GoldBigLmDecoder(fst, i2p, fsa1, fsa2, 0.7, 1.3, cfg) \
        .decode(loglikes)
    difflm = DeviceDiffLm.build(fsa1, fsa2, 0.7, 1.3)
    search = TpuBigLmBeamSearch(dev, i2p, difflm, cfg)
    state, init_log, logs = search.decode(loglikes[None])
    res = search.traceback(state, init_log, logs, fst)[0]
    assert not res["overflowed"]
    assert res["reached_final"] == gold.reached_final
    assert res["cost"] == pytest.approx(gold.cost, abs=1e-3)
    if gold.reached_final:
        assert res["words"] == gold.words
        assert res["ilabels"] == gold.ilabels


def test_biglm_compaction_exact_when_lanes_suffice(fsas):
    """lm_lanes < K*A engages the compaction sort; as long as the word
    candidates fit, results are bit-identical to the exact path."""
    fsa1, fsa2 = fsas
    rng, fst, dev, i2p, cfg = _setup_biglm(3, lm_lanes=256)
    T, V = 10, 7
    loglikes = rng.standard_normal((T, V)).astype(np.float32) * 3
    difflm = DeviceDiffLm.build(fsa1, fsa2)
    exact_cfg = DecoderConfig(**{**cfg.__dict__, "lm_lanes": 1 << 20})
    s1 = TpuBigLmBeamSearch(dev, i2p, difflm, exact_cfg)
    s2 = TpuBigLmBeamSearch(dev, i2p, difflm, cfg)
    r1 = s1.traceback(*s1.decode(loglikes[None]), fst)[0]
    r2 = s2.traceback(*s2.decode(loglikes[None]), fst)[0]
    assert not r2["overflowed"]
    assert r1["cost"] == pytest.approx(r2["cost"], abs=1e-4)
    assert r1["words"] == r2["words"]


def test_biglm_undersized_lm_lanes_warns_at_build(fsas):
    """Undersized lm_lanes (can drop word candidates, unlike the reference,
    ref: online-decoder-mempool-base-biglm.h:316-402) must be loud at
    build time: a warning naming the graph-derived safe bound.  (The package
    logger has propagate=False, so capture with a direct handler.)"""
    import logging
    fsa1, fsa2 = fsas
    _, fst, dev, i2p, cfg = _setup_biglm(3, lm_lanes=2)
    difflm = DeviceDiffLm.build(fsa1, fsa2)
    records = []
    h = logging.Handler()
    h.emit = records.append
    lg = logging.getLogger("asr_decoder_tpu")
    lg.addHandler(h)
    try:
        s = TpuBigLmBeamSearch(dev, i2p, difflm, cfg)
        assert any("lm_lanes" in r.getMessage() for r in records)
        assert s.lm_lanes_bound > 2
        # a safely-sized build stays quiet
        records.clear()
        big = DecoderConfig(**{**cfg.__dict__, "lm_lanes": 1 << 20})
        TpuBigLmBeamSearch(dev, i2p, difflm, big)
        assert not any("lm_lanes" in r.getMessage() for r in records)
    finally:
        lg.removeHandler(h)


def test_biglm_batched_matches_single(fsas):
    fsa1, fsa2 = fsas
    rng, fst, dev, i2p, cfg = _setup_biglm(5)
    B, T, V = 3, 9, 7
    lls = rng.standard_normal((B, T, V)).astype(np.float32) * 3
    difflm = DeviceDiffLm.build(fsa1, fsa2)
    search = TpuBigLmBeamSearch(dev, i2p, difflm, cfg)
    batch = search.traceback(*search.decode(lls), fst)
    for b in range(B):
        single = search.traceback(*search.decode(lls[b:b + 1]), fst)[0]
        assert batch[b]["cost"] == pytest.approx(single["cost"], abs=1e-4)
        assert batch[b]["words"] == single["words"]


def test_biglm_insearch_beats_postpass_on_tight_beam(fsas):
    """The point of in-search BigLM (vs post-pass lattice rescoring): with a
    tight beam, the LM steers pruning, so the in-search best path scores at
    least as well under (graph + diffLM) as rescoring whatever survived a
    no-LM search.  Checked by total cost of the in-search winner vs the
    gold-with-LM evaluation of the no-LM winner."""
    fsa1, fsa2 = fsas
    rng = np.random.default_rng(11)
    better = 0
    trials = 6
    for trial in range(trials):
        _, fst, dev, i2p, _ = _setup_biglm(100 + trial, num_states=16)
        tight = DecoderConfig(beam=1e9, beam_width=4, arc_lanes=8,
                              max_active=4, min_active=0, lattice_beam=1e9,
                              eps_mode="sweeps", lm_lanes=1 << 20)
        T, V = 10, 7
        ll = rng.standard_normal((T, V)).astype(np.float32) * 3
        difflm = DeviceDiffLm.build(fsa1, fsa2, 1.0, 4.0)
        ins = TpuBigLmBeamSearch(dev, i2p, difflm, tight)
        r_in = ins.traceback(*ins.decode(ll[None]), fst)[0]
        from asr_decoder_tpu.ops.beamsearch import TpuBeamSearch
        base = TpuBeamSearch(dev, i2p, tight)
        r_no = base.traceback(*base.decode(ll[None]), fst)[0]
        # evaluate the no-LM winner under graph+diffLM semantics
        gold = GoldBigLmDecoder(fst, i2p, fsa1, fsa2, 1.0, 4.0, tight)
        l1, l2 = fsa1.start, fsa2.start
        lm_cost = 0.0
        for a in r_no["arc_ids"]:
            l1, l2, c = gold._lm_advance(l1, l2, int(fst.arc_olabel[a]))
            lm_cost += c
        post_total = r_no["cost"] + lm_cost + gold._lm_final(l1, l2)
        assert r_in["cost"] <= post_total + 1e-3
        if r_in["cost"] < post_total - 1e-3:
            better += 1
    assert better >= 1, "in-search never strictly beat post-pass"


def test_biglm_device_lattice_matches_gold(fsas):
    """BigLM pair-search lattices: device pair-token snapshots → host
    reconstruction equals the gold decoder's lattice byte-for-byte; LM
    scores live in graph costs, LM sentence-end cost in final weights
    (ref: online-decoder-mempool-base-biglm.h + base-inl.h:869-977)."""
    fsa1, fsa2 = fsas
    rng, fst, dev, i2p, cfg = _setup_biglm(5)
    cfg.lattice_beam = 6.0
    difflm = DeviceDiffLm.build(fsa1, fsa2, 0.7, 1.3)
    T, V = 12, 7
    loglikes = (rng.standard_normal((T, V)) * 3).astype(np.float32)
    gold = GoldBigLmDecoder(fst, i2p, fsa1, fsa2, 0.7, 1.3, cfg) \
        .decode(loglikes, want_lattice=True)
    search = TpuBigLmBeamSearch(dev, i2p, difflm, cfg)
    state, init_log, logs = search.decode(loglikes[None])
    lat = search.get_lattices(init_log, logs, loglikes[None], fst)[0]
    assert lat is not None and gold.lattice is not None
    assert sorted(lat.to_text().splitlines()) == \
        sorted(gold.lattice.to_text().splitlines())
    # best path through the lattice matches the in-search traceback
    best = search.traceback(state, init_log, logs, fst)[0]
    words, _, _, _ = lat.to_vector()
    if best["reached_final"]:
        assert words == best["words"]
