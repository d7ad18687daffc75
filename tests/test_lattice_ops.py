"""Determinize / n-best / WER tests (SURVEY §4 test-strategy model:
hand-built lattices like the reference's newfst/lattice-test.cc, plus
randomized cross-checks against brute-force path enumeration)."""

import numpy as np
import pytest

from asr_decoder_tpu.fst.determinize import determinize_lattice
from asr_decoder_tpu.fst.lattice import EPSILON, Lattice, LatticeArc
from asr_decoder_tpu.fst.nbest import nbest_to_lattices, nshortest
from asr_decoder_tpu.fst.semiring import LatticeWeight
from asr_decoder_tpu.utils.wer import (edit_distance, oracle_wer,
                                       score_corpus, score_pair)


def W(g, a=0.0):
    return LatticeWeight(g, a)


def build_lattice(arcs, finals, start=0, nstates=None):
    lat = Lattice()
    n = (nstates if nstates is not None
         else 1 + max(max(a[0] for a in arcs), max(a[4] for a in arcs)))
    for _ in range(n):
        lat.add_state()
    lat.set_start(start)
    for (s, il, ol, w, d) in arcs:
        lat.add_arc(s, LatticeArc(il, ol, w if isinstance(w, LatticeWeight)
                                  else W(w), d))
    for f in finals:
        if isinstance(f, tuple):
            lat.set_final(f[0], f[1])
        else:
            lat.set_final(f)
    return lat


def all_paths(lat, max_paths=10000):
    """Brute-force enumeration of (words, total_cost) over the DAG."""
    out = []

    def rec(s, words, cost):
        fw = lat.final(s)
        if not fw.is_zero():
            out.append((tuple(words), cost + fw.value))
        for a in lat.arcs(s):
            if len(out) > max_paths:
                return
            rec(a.dst, words + ([a.olabel] if a.olabel != EPSILON else []),
                cost + a.weight.value)

    rec(lat.start, [], 0.0)
    return out


def best_by_words(paths):
    best = {}
    for w, c in paths:
        if w not in best or c < best[w]:
            best[w] = c
    return best


def random_lattice(rng, nstates=14, max_arcs=3):
    lat = Lattice()
    for _ in range(nstates):
        lat.add_state()
    lat.set_start(0)
    for s in range(nstates - 1):
        for _ in range(int(rng.integers(1, max_arcs + 1))):
            d = int(rng.integers(s + 1, nstates))
            il = int(rng.integers(0, 6))
            ol = int(rng.integers(0, 4))
            lat.add_arc(s, LatticeArc(
                il, ol, W(float(rng.random() * 3),
                          float(rng.random() * 2)), d))
    lat.set_final(nstates - 1, W(float(rng.random()), 0.0))
    lat.connect()
    return lat


# ---------------------------------------------------------------------------
# determinize
# ---------------------------------------------------------------------------

def test_determinize_simple_merge():
    # two paths with the same word, different costs -> one arc, min cost
    lat = build_lattice(
        [(0, 1, 7, 2.0, 1), (0, 2, 7, 1.0, 1)], [1])
    det = determinize_lattice(lat)
    paths = all_paths(det)
    assert len(paths) == 1
    assert paths[0] == ((7,), pytest.approx(1.0))


@pytest.mark.parametrize("seed", range(6))
def test_determinize_preserves_best_per_wordseq(seed):
    rng = np.random.default_rng(seed)
    lat = random_lattice(rng)
    if lat.start < 0 or not lat.final_states():
        pytest.skip("degenerate random lattice")
    ref = best_by_words(all_paths(lat))
    det = determinize_lattice(lat)
    got_paths = all_paths(det)
    got = best_by_words(got_paths)
    assert set(got) == set(ref)
    for w in ref:
        assert got[w] == pytest.approx(ref[w], abs=1e-6), w
    # determinism: each word sequence appears exactly once
    words_list = [w for w, _ in got_paths]
    assert len(words_list) == len(set(words_list))


def test_determinize_keeps_best_alignment_cost():
    # same words, two alignments (different ilabels) — keep the cheaper one
    lat = build_lattice(
        [(0, 1, 5, W(1.0, 2.0), 1), (0, 2, 5, W(1.0, 1.0), 1),
         (1, 3, 0, W(0.5, 0.0), 2)], [2])
    det = determinize_lattice(lat)
    paths = nshortest(det, 5)
    assert len(paths) == 1
    assert paths[0].words == [5]
    assert paths[0].ilabels == [2, 3]
    assert paths[0].cost == pytest.approx(2.5)


# ---------------------------------------------------------------------------
# n-best
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("seed", range(5))
def test_nshortest_matches_bruteforce(seed):
    rng = np.random.default_rng(100 + seed)
    lat = random_lattice(rng)
    paths = all_paths(lat)
    if not paths:
        pytest.skip("empty")
    ref = sorted(best_by_words(paths).items(), key=lambda kv: kv[1])[:4]
    det = determinize_lattice(lat)
    got = nshortest(det, 4)
    assert [tuple(p.words) for p in got] == [w for w, _ in ref]
    for p, (_, c) in zip(got, ref):
        assert p.cost == pytest.approx(c, abs=1e-6)


def test_nbest_to_lattices_roundtrip():
    rng = np.random.default_rng(200)
    lat = random_lattice(rng)
    det = determinize_lattice(lat)
    got = nshortest(det, 3)
    lin = nbest_to_lattices(got)
    assert len(lin) == len(got)
    for p, l in zip(lin, got):
        words, ilabs, lm, am = p.to_vector()
        assert words == l.words
        assert lm + am == pytest.approx(l.cost, abs=1e-6)


# ---------------------------------------------------------------------------
# WER
# ---------------------------------------------------------------------------

def test_edit_distance_basic():
    assert edit_distance([1, 2, 3], [1, 2, 3]) == (0, 0, 0, 0)
    assert edit_distance([1, 2, 3], [1, 3]) == (1, 0, 0, 1)
    assert edit_distance([1, 2], [1, 2, 9]) == (1, 0, 1, 0)
    assert edit_distance([1, 2], [1, 9]) == (1, 1, 0, 0)
    assert edit_distance([], [1, 2]) == (2, 0, 2, 0)


def test_score_corpus_and_oracle():
    refs = {"a": [1, 2, 3], "b": [4, 5]}
    hyps = {"a": [1, 2, 3], "b": [4, 9]}
    st = score_corpus(refs, hyps)
    assert st.ref_len == 5 and st.errors == 1
    assert st.wer == pytest.approx(0.2)
    assert st.ser == pytest.approx(0.5)
    err, idx = oracle_wer([1, 2, 3], [[1, 9, 3], [1, 2, 3], [7]])
    assert (err, idx) == (0, 1)


# ---------------------------------------------------------------------------
# general graph algorithms (fst/algorithms.py)
# ---------------------------------------------------------------------------

def all_labeled_paths(lat, max_paths=10000):
    """(ilabels, olabels, cost) enumeration (ε labels dropped)."""
    from asr_decoder_tpu.fst.lattice import EPSILON as EPS
    out = []

    def rec(s, ils, ols, cost):
        fw = lat.final(s)
        if not fw.is_zero():
            out.append((tuple(ils), tuple(ols), round(cost + fw.value, 6)))
        for a in lat.arcs(s):
            if len(out) > max_paths:
                return
            rec(a.dst,
                ils + ([a.ilabel] if a.ilabel != EPS else []),
                ols + ([a.olabel] if a.olabel != EPS else []),
                cost + a.weight.value)

    rec(lat.start, [], [], 0.0)
    return sorted(set(out))


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_reverse_reverses_paths(seed):
    from asr_decoder_tpu.fst.algorithms import reverse
    rng = np.random.default_rng(seed)
    lat = random_lattice(rng)
    rev = reverse(lat)
    fwd = all_labeled_paths(lat)
    bwd = all_labeled_paths(rev)
    assert sorted((i[::-1], o[::-1], c) for i, o, c in fwd) == bwd


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_rmepsilon_preserves_paths(seed):
    from asr_decoder_tpu.fst.algorithms import rmepsilon
    rng = np.random.default_rng(seed + 100)
    lat = random_lattice(rng)
    before = all_labeled_paths(lat)
    rmepsilon(lat)
    for s in range(lat.num_states):
        for a in lat.arcs(s):
            assert (a.ilabel, a.olabel) != (EPSILON, EPSILON)
    after = all_labeled_paths(lat)
    # same label-sequence set; per sequence the best cost is preserved
    # (parallel same-label arcs may merge, dropping dominated duplicates)
    def best(paths):
        b = {}
        for i, o, c in paths:
            k = (i, o)
            if k not in b or c < b[k]:
                b[k] = c
        return b
    bb, ba = best(before), best(after)
    assert set(bb) == set(ba)
    for k in bb:
        assert ba[k] == pytest.approx(bb[k], abs=1e-4)


def test_scc_dag_and_cycle():
    from asr_decoder_tpu.fst.algorithms import (dfs_access,
                                                strongly_connected_components)
    rng = np.random.default_rng(3)
    lat = random_lattice(rng)
    comp = strongly_connected_components(lat)
    # DAG: every state its own component, numbered reverse-topologically
    assert len(set(comp)) == lat.num_states
    for s in range(lat.num_states):
        for a in lat.arcs(s):
            if a.dst != s:
                assert comp[a.dst] < comp[s]
    # add a cycle 1 -> 0: states 0 and 1 collapse into one component
    lat.add_arc(1, LatticeArc(1, 0, W(0.1), 0))
    comp2 = strongly_connected_components(lat)
    assert comp2[0] == comp2[1]
    acc, coacc = dfs_access(lat)
    assert acc[lat.start]
    for s in lat.final_states():
        assert coacc[s]
