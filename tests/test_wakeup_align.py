"""Wakeup DTW + phone→word align tests (ref: src/wakeup, src/align)."""

import numpy as np
import pytest

from asr_decoder_tpu.align.phone_to_word import PhoneToWord
from asr_decoder_tpu.wakeup.dtw import (WakeupConfig, WakeupSearch,
                                        dtw_align, keyword_cost)


def dtw_ref(cost):
    """Scalar-loop DTW oracle (the reference DtwAlign recurrence,
    src/wakeup/dtw.h:30)."""
    T, S = cost.shape
    d = np.full((T, S), np.inf)
    d[0] = np.cumsum(cost[0])
    for t in range(1, T):
        for s in range(S):
            best = d[t - 1, s]
            if s:
                best = min(best, d[t - 1, s - 1], d[t, s - 1])
            d[t, s] = best + cost[t, s]
    return d


@pytest.mark.parametrize("shape", [(1, 5, 3), (2, 12, 7), (3, 1, 4)])
def test_dtw_matches_scalar_oracle(shape):
    rng = np.random.default_rng(0)
    cost = rng.random(shape).astype(np.float32) * 3
    total, dp = dtw_align(cost)
    for b in range(shape[0]):
        ref = dtw_ref(cost[b])
        np.testing.assert_allclose(np.asarray(dp[b]), ref, rtol=1e-5)
        assert float(total[b]) == pytest.approx(ref[-1, -1], rel=1e-5)


def _posteriors(states, V, hot=0.9, T_per=3, rng=None):
    rows = []
    for s in states:
        for _ in range(T_per):
            p = np.full(V, (1 - hot) / (V - 1), np.float32)
            p[s] = hot
            rows.append(p)
    return np.stack(rows)


def test_wakeup_fires_on_keyword():
    V = 10
    template = np.array([2, 5, 7, 3])
    cfg = WakeupConfig(window_frames=40, window_shift=4, min_frames=8,
                       wake_threshold=0.5)
    ws = WakeupSearch(cfg, template)
    noise = np.full((20, V), 1.0 / V, np.float32)
    assert not ws.process_data(noise)
    kw = _posteriors(template, V)
    assert ws.process_data(kw, end=True)
    assert ws.confidence > 0.5
    assert ws.wake_range is not None


def test_wakeup_silent_on_noise():
    V = 10
    cfg = WakeupConfig(window_frames=40, window_shift=4, min_frames=8,
                       wake_threshold=0.5)
    ws = WakeupSearch(cfg, np.array([2, 5, 7, 3]))
    rng = np.random.default_rng(1)
    post = rng.dirichlet(np.ones(V), size=60).astype(np.float32)
    assert not ws.process_data(post, end=True)
    assert ws.confidence < 0.5


def test_keyword_cost_shape():
    post = np.full((1, 6, 10), 0.1, np.float32)
    c = keyword_cost(post, np.array([1, 2]))
    assert c.shape == (1, 6, 2)
    np.testing.assert_allclose(np.asarray(c), -np.log(0.1), rtol=1e-5)


def test_phone_to_word_align():
    p2w = PhoneToWord()
    p2w.add_entry(10, [1, 2])       # "ni"  = p1 p2
    p2w.add_entry(11, [3])          # "hao" = p3
    p2w.add_entry(12, [1, 2, 3])    # longest-match wins over 10+11
    p2w.add_entry(13, [4, 5])
    words, spans, ok = p2w.align([1, 2, 3, 4, 5])
    assert ok
    assert words == [12, 13]
    assert [(s.phone_start, s.phone_end) for s in spans] == [(0, 3), (3, 5)]
    # unmatched phone is skipped and flagged
    words, _, ok = p2w.align([9, 1, 2])
    assert not ok and words == [10]


def test_align_with_frames():
    p2w = PhoneToWord()
    p2w.add_entry(1, [1, 2])
    p2w.add_entry(2, [3])
    words, times, ok = p2w.align_with_frames([1, 2, 3], [4, 9, 15])
    assert ok and words == [1, 2]
    assert times == [(0, 9), (10, 15)]
