"""LM layer tests: ARPA parse, backoff scoring, compose, diff-LM rescoring.

Cross-checks the Fsa scorer against a direct ARPA backoff evaluator
(independent implementation), and rescoring against per-path arithmetic —
the reference has no LM unit tests, so this is an added axis (SURVEY §4)."""

import math

import numpy as np
import pytest

from asr_decoder_tpu.fst.lattice import EPSILON, Lattice, LatticeArc
from asr_decoder_tpu.fst.semiring import LatticeWeight
from asr_decoder_tpu.lm.arpa import LN10, Fsa, parse_arpa
from asr_decoder_tpu.lm.compose import (ArpaLmScore, ComposeArpaLm,
                                        DiffArpaLm, compose_lattice,
                                        rescore_lattice)

ARPA = """
\\data\\
ngram 1=5
ngram 2=4

\\1-grams:
-1.0 <s> -0.5
-1.2 </s>
-0.8 a -0.3
-0.9 b -0.4
-1.5 c

\\2-grams:
-0.4 <s> a -0.2
-0.5 a b -0.1
-0.6 b </s>
-0.7 b a

\\end\\
"""

ARPA2 = """
\\data\\
ngram 1=5
ngram 2=1

\\1-grams:
-1.0 <s> 0.0
-1.0 </s>
-0.5 a 0.0
-0.5 b 0.0
-0.5 c

\\2-grams:
-0.1 b a

\\end\\
"""


def backoff_score(ngrams, words):
    """Independent ARPA evaluator: dict {(w1..wn): (logp, bo)}; sentence
    = <s> w1..wn </s>; returns total log10 prob."""
    hist = ("<s>",)
    total = 0.0
    for w in list(words) + ["</s>"]:
        ctx = hist
        while True:
            if ctx + (w,) in ngrams:
                total += ngrams[ctx + (w,)][0]
                break
            if ctx == ():
                total += ngrams[(w,)][0]
                break
            total += ngrams[ctx][1]  # backoff weight of the context
            ctx = ctx[1:]
        hist = (hist + (w,))[-1:]  # bigram LM: keep last word
        if w == "</s>":
            break
    return total


NG = {
    ("<s>",): (-1.0, -0.5), ("</s>",): (-1.2, 0.0), ("a",): (-0.8, -0.3),
    ("b",): (-0.9, -0.4), ("c",): (-1.5, 0.0),
    ("<s>", "a"): (-0.4, -0.2), ("a", "b"): (-0.5, -0.1),
    ("b", "</s>"): (-0.6, 0.0), ("b", "a"): (-0.7, 0.0),
}


@pytest.mark.parametrize("sent", [
    ["a", "b"], ["a"], ["b", "a", "b"], ["c", "a"], ["a", "b", "c"],
])
def test_fsa_score_matches_independent_backoff(sent):
    fsa = parse_arpa(ARPA)
    got = ArpaLmScore(fsa).score_text(sent)
    want = -LN10 * backoff_score(NG, sent)
    assert got == pytest.approx(want, abs=1e-5), sent


def test_fsa_binary_roundtrip(tmp_path):
    fsa = parse_arpa(ARPA)
    p = str(tmp_path / "lm.fsa")
    fsa.write_binary(p)
    back = Fsa.read_binary(p)
    for sent in (["a", "b"], ["b", "a"]):
        assert (ArpaLmScore(back).score_text(sent)
                == pytest.approx(ArpaLmScore(fsa).score_text(sent)))
    assert back.vocab == fsa.vocab


def test_rescale():
    fsa = parse_arpa(ARPA)
    half = fsa.rescale(0.5)
    s = ArpaLmScore(fsa).score_text(["a", "b"])
    assert ArpaLmScore(half).score_text(["a", "b"]) == pytest.approx(s / 2)


def _word_lattice(seqs):
    """Union of word-id paths as a lattice (olabels = word ids)."""
    lat = Lattice()
    s0 = lat.add_state()
    lat.set_start(s0)
    end = lat.add_state()
    for seq, g in seqs:
        s = s0
        for k, w in enumerate(seq):
            nxt = end if k == len(seq) - 1 else lat.add_state()
            lat.add_arc(s, LatticeArc(
                w, w, LatticeWeight(g if k == 0 else 0.0, 0.1), nxt))
            s = nxt
    lat.set_final(end)
    return lat


def test_compose_adds_lm_scores():
    fsa = parse_arpa(ARPA)
    v = fsa.vocab
    lat = _word_lattice([([v["a"], v["b"]], 1.0), ([v["b"], v["a"]], 2.0)])
    lm = ComposeArpaLm(fsa, scale=1.0)
    out = compose_lattice(lat, lm)
    words, ilabs, g, am = out.to_vector()
    # best path should be the min over (orig graph + lm score + am)
    cand = []
    for seq, g0 in ([["a", "b"], 1.0], [["b", "a"], 2.0]):
        ids = [v[w] for w in seq]
        cand.append((g0 + fsa.score_ids(ids) + 0.2, ids))
    best = min(cand)
    assert words == best[1]
    assert g + am == pytest.approx(best[0], abs=1e-5)


def test_diff_lm_rescore_swaps_lm():
    """Composing with (G₂ − G₁) must equal scoring with G₂ when the lattice
    graph costs already contain G₁."""
    g1 = parse_arpa(ARPA)
    g2 = parse_arpa(ARPA2, word2id=g1.vocab)
    v = g1.vocab
    seqs = [[v["a"], v["b"]], [v["b"], v["a"]]]
    lat = _word_lattice([(s, g1.score_ids(s)) for s in seqs])
    out = rescore_lattice(lat, g1, g2)
    words, _, g, am = out.to_vector()
    cand = sorted((g2.score_ids(s) + 0.2, s) for s in seqs)
    assert words == cand[0][1]
    assert g + am == pytest.approx(cand[0][0], abs=1e-5)


def test_diff_lm_pair_interning_and_reset():
    g1 = parse_arpa(ARPA)
    g2 = parse_arpa(ARPA2, word2id=g1.vocab)
    d = DiffArpaLm(g1, g2)
    s = d.start()
    v = g1.vocab
    s1, c1 = d.get_arc(s, v["a"])
    s2, c2 = d.get_arc(s, v["a"])
    assert s1 == s2 and c1 == c2  # interned
    n_states = len(d._vec)
    d.reset()
    assert len(d._vec) == 1
    s3, c3 = d.get_arc(d.start(), v["a"])
    assert c3 == pytest.approx(c1)
