"""Tests for the L1 FST kernel: CSR graph, formats, semiring, lattice ops.

Modeled on the reference's newfst tests (ref: src/newfst/lattice-test.cc,
test-connect-fst.cc) plus format round-trips the reference lacks."""

import numpy as np
import pytest

from asr_decoder_tpu.fst.fst import EPSILON, StdFst
from asr_decoder_tpu.fst.lattice import Lattice, LatticeArc
from asr_decoder_tpu.fst.semiring import (INF, LatticeWeight, approx_equal,
                                          compare, divide, plus, times)
from asr_decoder_tpu.fst.symbol import SymbolTable

# a tiny HCLG-like graph: 0 -1:10-> 1, 0 -2:20-> 2, 1 -3:0-> 3, 2 -3:0-> 3,
# 1 -0:0(eps)-> 2, final: 3 (w 0.5)
_TEXT_FST = """
0 1 1 10 0.5
0 2 2 20 1.0
1 3 3 0 0.25
2 3 3 0 0.125
1 2 0 0 0.0625
3 0.5
"""


def small_fst() -> StdFst:
    return StdFst.from_text(_TEXT_FST)


def test_from_text_structure():
    f = small_fst()
    # super-final rewrite adds one state + one eps arc
    assert f.num_states == 5
    assert f.num_arcs == 6
    assert f.start == 0
    assert f.final_state == 4
    assert f.is_final(4) and not f.is_final(3)
    # state 1: eps arc sorted first
    arcs1 = list(f.arcs(1))
    assert arcs1[0][0] == EPSILON
    assert f.num_input_epsilons(1) == 1
    assert f.num_input_epsilons(0) == 0
    # final weight became eps arc from 3
    arcs3 = list(f.arcs(3))
    assert arcs3 == [(0, 0, 0.5, 4)]


def test_binary_roundtrip(tmp_path):
    f = small_fst()
    p = str(tmp_path / "g.fst")
    f.write_binary(p)
    g = StdFst.read_binary(p)
    assert g.start == f.start and g.final_state == f.final_state
    np.testing.assert_array_equal(g.state_offset, f.state_offset)
    np.testing.assert_array_equal(g.arc_ilabel, f.arc_ilabel)
    np.testing.assert_array_equal(g.arc_olabel, f.arc_olabel)
    np.testing.assert_array_equal(g.arc_dst, f.arc_dst)
    np.testing.assert_allclose(g.arc_weight, f.arc_weight)


def test_epsilon_depth():
    f = small_fst()
    # longest eps chain: 1 -eps-> 2 (depth into 3..final): 3->final(eps) after
    # emitting arcs; chain 1->2 is length 1, 3->4 length 1
    assert f.epsilon_depth() >= 1
    # pure emitting graph has depth 0
    g = StdFst.from_text("0 1 1 1 0.0\n1")
    # super-final adds eps arc 1->2 => depth 1
    assert g.epsilon_depth() == 1


def test_max_out_degree():
    assert small_fst().max_out_degree() == 2


def test_semiring_lattice_weight():
    a = LatticeWeight(1.0, 2.0)
    b = LatticeWeight(2.0, 0.5)
    # total 3.0 vs 2.5 -> b better
    assert plus(a, b) == b
    assert compare(a, b) == -1
    assert times(a, b) == LatticeWeight(3.0, 2.5)
    assert divide(times(a, b), b) == a
    zero = LatticeWeight.zero()
    one = LatticeWeight.one()
    assert plus(a, zero) == a
    assert times(a, one) == a
    assert times(a, zero).is_zero()
    assert divide(one, zero).is_zero()
    assert approx_equal(a, LatticeWeight(1.0, 2.0 + 1e-5))
    # tie on total -> smaller value1 wins
    c = LatticeWeight(0.5, 2.5)
    assert plus(a, c) == c


def _chain_lattice(words, cost=1.0):
    lat = Lattice()
    s = lat.add_state()
    lat.set_start(s)
    for i, w in enumerate(words):
        ns = lat.add_state()
        lat.add_arc(s, LatticeArc(i + 1, w, LatticeWeight(0.5, cost), ns))
        s = ns
    lat.set_final(s)
    return lat


def test_lattice_shortest_path_picks_min():
    lat = Lattice()
    s0, s1, s2 = lat.add_state(), lat.add_state(), lat.add_state()
    lat.set_start(s0)
    lat.add_arc(s0, LatticeArc(1, 100, LatticeWeight(1.0, 1.0), s1))
    lat.add_arc(s0, LatticeArc(2, 200, LatticeWeight(0.5, 0.5), s1))
    lat.add_arc(s1, LatticeArc(3, 300, LatticeWeight(0.0, 1.0), s2))
    lat.set_final(s2, LatticeWeight(0.25, 0.0))
    words, ilabs, lm, am = lat.to_vector()
    assert words == [200, 300]
    assert ilabs == [2, 3]
    # scores include the terminal final weight (0.25 graph)
    assert lm == pytest.approx(0.75)
    assert am == pytest.approx(1.5)


def test_lattice_connect_trims_dead_states():
    lat = _chain_lattice([10, 20])
    dangling = lat.add_state()  # unreachable
    lat.add_arc(lat.start, LatticeArc(9, 9, LatticeWeight(0, 0), dangling))
    # dangling has no path to final -> should be trimmed along with its arc
    n_before = lat.num_states
    lat.connect()
    assert lat.num_states == n_before - 1
    words, _, _, _ = lat.to_vector()
    assert words == [10, 20]


def test_lattice_topsort_and_check():
    lat = Lattice()
    a, b, c = lat.add_state(), lat.add_state(), lat.add_state()
    lat.set_start(c)  # deliberately out of order: c -> a -> b
    lat.add_arc(c, LatticeArc(1, 1, LatticeWeight(0, 0), a))
    lat.add_arc(a, LatticeArc(2, 2, LatticeWeight(0, 0), b))
    lat.set_final(b)
    assert not lat.is_topsorted()
    assert lat.topsort()
    assert lat.is_topsorted()
    assert lat.start == 0


def test_lattice_cycle_detected():
    lat = Lattice()
    a, b = lat.add_state(), lat.add_state()
    lat.set_start(a)
    lat.add_arc(a, LatticeArc(1, 1, LatticeWeight(0, 0), b))
    lat.add_arc(b, LatticeArc(2, 2, LatticeWeight(0, 0), a))
    lat.set_final(b)
    assert lat.topsort_order() is None
    assert not lat.check_format()


def test_lattice_super_final_and_invert():
    lat = _chain_lattice([7])
    lat.set_final(1, LatticeWeight(0.5, 0.25))
    sf = lat.add_super_final()
    assert lat.final_states() == [sf]
    words, _, lm, am = lat.to_vector()
    assert words == [7]
    lat.invert()
    assert lat.arcs(0)[0].ilabel == 7


def test_lattice_del_same_arcs():
    lat = Lattice()
    a, b = lat.add_state(), lat.add_state()
    lat.set_start(a)
    lat.add_arc(a, LatticeArc(1, 1, LatticeWeight(2, 2), b))
    lat.add_arc(a, LatticeArc(1, 1, LatticeWeight(1, 1), b))
    lat.set_final(b)
    lat.del_same_arcs()
    assert len(lat.arcs(a)) == 1
    assert lat.arcs(a)[0].weight == LatticeWeight(1, 1)


def test_lattice_binary_roundtrip(tmp_path):
    lat = _chain_lattice([5, 6, 7], cost=0.5)
    p = str(tmp_path / "lat.bin")
    lat.write_binary(p)
    lat2 = Lattice.read_binary(p)
    assert lat2.num_states == lat.num_states
    assert lat2.to_text() == lat.to_text()


def test_symbol_table(tmp_path):
    t = SymbolTable()
    t.add("<eps>", 0)
    t.add("hello", 1)
    t.add("world", 2)
    assert t.find_id("hello") == 1
    assert t.find_id("nope") == -1
    assert t.find_word(2) == "world"
    assert t.words([1, 2]) == ["hello", "world"]
    p = str(tmp_path / "words.txt")
    t.write_text(p)
    t2 = SymbolTable.read_text(p)
    assert len(t2) == 3 and t2.find_id("world") == 2


def test_device_fst_save_load(tmp_path):
    """Prebuilt-graph persistence: a split+closed DeviceFst round-trips
    through .npz bit-exactly (the serving-startup fast path, role of the
    reference's converted binary graphs,
    ref: src/fst_format_convert_tool/README.txt)."""
    from asr_decoder_tpu.fst.device_fst import DeviceFst
    from asr_decoder_tpu.fst.synthetic import random_hclg
    rng = np.random.default_rng(5)
    fst = random_hclg(rng, num_states=800, num_ilabels=32,
                      min_degree=2, max_degree=24)
    dev = DeviceFst.build(fst, arc_lanes=8)     # forces splitting
    dev.build_closure()
    p = str(tmp_path / "g.npz")
    dev.save(p)
    got = DeviceFst.load(p)
    assert got.num_states == dev.num_states
    assert got.eps_depth == dev.eps_depth
    for k, v in dev.__dict__.items():
        if isinstance(v, np.ndarray):
            np.testing.assert_array_equal(getattr(got, k), v, err_msg=k)
    assert got.max_closure_size == dev.max_closure_size
