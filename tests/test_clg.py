"""CLG-on-the-fly decoder tests: device vs gold parity, reference-semantics
cross-check of the entry-hop retiming, and hmm-bundle binary IO
(ref: src/my-decoder/clg-fst.h, online-clg-decoder-mempool-base.h)."""

import numpy as np
import pytest

from asr_decoder_tpu.decoder.config import DecoderConfig
from asr_decoder_tpu.decoder.gold import GoldClgDecoder
from asr_decoder_tpu.fst.clg import (ClgFst, read_hmm_bundle,
                                     write_hmm_bundle)
from asr_decoder_tpu.fst.fst import StdFst
from asr_decoder_tpu.ops.beamsearch_clg import TpuClgBeamSearch

from test_beamsearch import random_decode_graph

INF = float("inf")


def random_hmm(rng, num_states, num_pdfs):
    """Linear-chain HMM: every state has a self-loop + forward emitting
    arc; the last state exits via an ε arc (Kaldi HMM topology shape)."""
    src, il, w, dst = [], [], [], []
    for s in range(num_states):
        src.append(s)
        il.append(int(rng.integers(1, num_pdfs + 1)))
        w.append(float(rng.random()))
        dst.append(s)                       # self-loop
        if s + 1 < num_states:
            src.append(s)
            il.append(int(rng.integers(1, num_pdfs + 1)))
            w.append(float(rng.random()))
            dst.append(s + 1)               # forward
    src.append(num_states - 1)
    il.append(0)                            # exit ε
    w.append(float(rng.random()))
    dst.append(num_states - 1)
    n = len(src)
    return StdFst.from_arcs(num_states, 0, num_states - 1,
                            np.array(src), np.array(il, np.int32),
                            np.zeros(n, np.int32),
                            np.array(w, np.float32),
                            np.array(dst, np.int32))


def make_clg(seed, num_states=10, num_phones=3, num_pdfs=6):
    rng = np.random.default_rng(seed)
    clg = random_decode_graph(rng, num_states=num_states,
                              num_labels=num_phones, max_deg=2)
    hmms = [None] + [random_hmm(rng, int(rng.integers(2, 4)), num_pdfs)
                     for _ in range(num_phones)]
    return rng, ClgFst(clg, hmms)


def reference_semantics_decode(g: ClgFst, i2p, loglikes):
    """Direct transliteration of the reference's nested clg×hmm expansion
    (no resting at HMM entry states; CLG weight folded into the first
    emitting hop, ref online-clg-decoder-mempool-base.h:120-204) — used
    to prove the entry-as-ε retiming reaches the same best cost."""
    clg = g.clg
    offset = g.offset

    def closure(toks):
        work = list(toks)
        while work:
            v = work.pop()
            c = toks[v]
            if v < offset:
                lo, ee = int(clg.state_offset[v]), int(clg.state_eps_end[v])
                hops = [(int(clg.arc_dst[i]), float(clg.arc_weight[i]))
                        for i in range(lo, ee)]
            else:
                arcid, hs = g.split(v)
                h = g.hmm_of_arc(arcid)
                lo, ee = int(h.state_offset[hs]), int(h.state_eps_end[hs])
                hops = [(int(clg.arc_dst[arcid]), float(h.arc_weight[i]))
                        for i in range(lo, ee)]
            for d, w in hops:
                nc = c + w
                if nc < toks.get(d, INF):
                    toks[d] = nc
                    work.append(d)
        return toks

    def hmm_emit(h, hs, v_base, c, ll, out):
        ee = int(h.state_eps_end[hs])
        hi = int(h.state_offset[hs + 1])
        for i in range(ee, hi):
            d = int(h.arc_dst[i])
            dst = v_base if d == hs else v_base + offset
            nc = c + float(h.arc_weight[i]) \
                - float(ll[i2p[int(h.arc_ilabel[i])]])
            if nc < out.get(dst, INF):
                out[dst] = nc

    toks = {clg.start: 0.0}
    closure(toks)
    for t in range(loglikes.shape[0]):
        ll = loglikes[t]
        new = {}
        for v, c in toks.items():
            if v < offset:
                ee = int(clg.state_eps_end[v])
                hi = int(clg.state_offset[v + 1])
                for a in range(ee, hi):   # clg arc → hmm state 0 emission
                    h = g.hmm_of_arc(a)
                    hmm_emit(h, 0, a + offset,
                             c + float(clg.arc_weight[a]), ll, new)
            else:
                arcid, hs = g.split(v)
                hmm_emit(g.hmm_of_arc(arcid), hs, v, c, ll, new)
        closure(new)
        toks = new
    finals = {v: c for v, c in toks.items() if v == clg.final_state}
    return min(finals.values()) if finals else min(toks.values())


def _cfg(**kw):
    return DecoderConfig(**{**dict(beam=1e9, beam_width=256, arc_lanes=8,
                                   max_active=256, min_active=0,
                                   lattice_beam=1e9, eps_mode="sweeps"),
                            **kw})


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_clg_device_matches_gold(seed):
    rng, g = make_clg(seed)
    i2p = np.arange(7, dtype=np.int32)
    cfg = _cfg()
    T = 12
    ll = rng.standard_normal((T, 7)).astype(np.float32) * 3
    gold = GoldClgDecoder(g, i2p, cfg).decode(ll)
    search = TpuClgBeamSearch(g, i2p, cfg)
    res = search.traceback(*search.decode(ll[None]))[0]
    assert res["reached_final"] == gold.reached_final
    assert res["cost"] == pytest.approx(gold.cost, abs=1e-3)
    if gold.reached_final:
        assert res["words"] == gold.words
        assert res["ilabels"] == gold.ilabels


@pytest.mark.parametrize("seed", [0, 3])
def test_entry_retiming_matches_reference_semantics(seed):
    """Gold (entry-as-ε automaton) reaches the reference's nested-loop
    best cost exactly when beams are wide."""
    rng, g = make_clg(seed)
    i2p = np.arange(7, dtype=np.int32)
    T = 10
    ll = rng.standard_normal((T, 7)).astype(np.float32) * 2
    gold = GoldClgDecoder(g, i2p, _cfg(acoustic_scale=1.0)).decode(ll)
    ref_cost = reference_semantics_decode(g, i2p, ll)
    assert gold.cost == pytest.approx(ref_cost, abs=1e-3)


def test_clg_batched_matches_single():
    rng, g = make_clg(7)
    i2p = np.arange(7, dtype=np.int32)
    cfg = _cfg()
    search = TpuClgBeamSearch(g, i2p, cfg)
    B, T = 3, 9
    lls = rng.standard_normal((B, T, 7)).astype(np.float32) * 3
    batch = search.traceback(*search.decode(lls))
    for b in range(B):
        single = search.traceback(*search.decode(lls[b:b + 1]))[0]
        assert batch[b]["cost"] == pytest.approx(single["cost"], abs=1e-4)
        assert batch[b]["words"] == single["words"]


def test_hmm_bundle_roundtrip(tmp_path):
    rng, g = make_clg(11)
    path = str(tmp_path / "hmm.bundle")
    write_hmm_bundle(path, g.hmms)
    back = read_hmm_bundle(path)
    assert len(back) == len(g.hmms)
    for a, b in zip(g.hmms[1:], back[1:]):
        np.testing.assert_array_equal(a.arc_ilabel, b.arc_ilabel)
        np.testing.assert_array_equal(a.arc_dst, b.arc_dst)
        np.testing.assert_allclose(a.arc_weight, b.arc_weight)
        np.testing.assert_array_equal(a.state_offset, b.state_offset)
        assert b.arc_olabel.max(initial=0) == 0   # RmOlalel on load


def test_clg_rejects_broken_chain():
    """Non-chain HMM topology (skip arc) violates the virtual-state
    arithmetic and must be rejected at load."""
    src = np.array([0, 0, 1])
    il = np.array([1, 2, 1], np.int32)
    w = np.zeros(3, np.float32)
    dst = np.array([0, 2, 1], np.int32)   # 0 -> 2 skips state 1
    bad = StdFst.from_arcs(3, 0, 2, src, il, np.zeros(3, np.int32), w, dst)
    clg = random_decode_graph(np.random.default_rng(0), num_states=5,
                              num_labels=1, max_deg=2)
    with pytest.raises(ValueError):
        ClgFst(clg, [None, bad])


def test_clg_device_lattice_matches_gold():
    """CLG lattices: device token snapshots → host reconstruction equals
    the gold decoder's lattice byte-for-byte (ref: the CLG decoder inherits
    GetRawLattice, online-decoder-base-inl.h:869-977)."""
    rng, g = make_clg(3)
    i2p = np.arange(7, dtype=np.int32)
    cfg = DecoderConfig(beam=1e9, beam_width=128, arc_lanes=8,
                        max_active=128, min_active=0, lattice_beam=6.0,
                        eps_mode="sweeps")
    T, V = 10, 7
    loglikes = (rng.standard_normal((T, V)) * 3).astype(np.float32)
    gold = GoldClgDecoder(g, i2p, cfg).decode(loglikes, want_lattice=True)
    search = TpuClgBeamSearch(g, i2p, cfg)
    state, init_log, logs = search.decode(loglikes[None])
    lat = search.get_lattices(init_log, logs, loglikes[None])[0]
    assert lat is not None and gold.lattice is not None
    assert sorted(lat.to_text().splitlines()) == \
        sorted(gold.lattice.to_text().splitlines())
    # the lattice's best path carries the traceback's words
    words, _, _, _ = lat.to_vector()
    best = search.traceback(state, init_log, logs)[0]
    if best["reached_final"]:
        assert words == best["words"]


def test_clg_session_lattice_and_nbest():
    """The session layer serves CLG lattices + n-best (was: raises)."""
    from asr_decoder_tpu.frontend.fbank import FbankConfig
    from asr_decoder_tpu.fst.symbol import SymbolTable
    from asr_decoder_tpu.models.flagship import make_flagship
    from asr_decoder_tpu.serving.session import (OnlineDecoderConfig,
                                                 OnlineDecoderInfo,
                                                 OnlineDecoderSession)
    import jax

    _, g = make_clg(11, num_pdfs=15)
    nnet = make_flagship(jax.random.PRNGKey(0), feat_dim=16, num_pdfs=16,
                         hidden=16, proj=8, num_layers=1, context=1)
    words = SymbolTable()
    words.add("<eps>", 0)
    for i in range(1, 6):
        words.add(f"w{i}", i)
    info = OnlineDecoderInfo(
        nnet, None, words, np.arange(16, dtype=np.int32),
        decoder_config=DecoderConfig(beam=1e9, beam_width=64, arc_lanes=8,
                                     min_active=0, lattice_beam=8.0,
                                     eps_mode="sweeps"),
        online_config=OnlineDecoderConfig(graph_type="clg",
                                          chunk_frames=16),
        fbank_config=FbankConfig(num_bins=16), clg_graph=g)
    s = OnlineDecoderSession(info)
    wave = (np.random.default_rng(2).standard_normal(12000)
            * 4000).astype(np.float32)
    s.process_data(wave, eos=True)
    lat = s.get_lattice()
    assert lat is not None and lat.num_states > 0
    best = s.get_best_path()
    if best["reached_final"] and best["words"]:
        nbest = s.get_nbest(3)
        assert nbest and nbest[0]["words"] == best["words"]
