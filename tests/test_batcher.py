"""Batched multi-stream decoder tests: N interleaved channels through one
device program must match independent per-utterance sessions exactly
(ref: the gpu-asr batched pipeline contract, src/gpu-asr/), including
channel-slot reuse (the corr-id collision fix)."""

import numpy as np
import pytest

from asr_decoder_tpu.serving.batcher import BatchedStreamingDecoder
from asr_decoder_tpu.serving.session import OnlineDecoderSession

from test_session import make_info, make_wave


@pytest.fixture(scope="module")
def info():
    return make_info()


def session_decode(info, wave):
    s = OnlineDecoderSession(info)
    s.process_data(wave, eos=True)
    return s


def test_batched_matches_sessions_interleaved(info):
    waves = [make_wave(s, n=[16000, 9000, 12345][s]) for s in range(3)]
    want = [session_decode(info, w).get_best_path() for w in waves]

    eng = BatchedStreamingDecoder(info, num_channels=4)
    cids = [eng.acquire() for _ in range(3)]
    # interleave ragged pushes; step whenever anything is ready
    cursors = [0, 0, 0]
    chunks = [5000, 3000, 4000]
    while any(c < len(w) for c, w in zip(cursors, waves)):
        for i, cid in enumerate(cids):
            if cursors[i] >= len(waves[i]):
                continue
            n = chunks[i]
            end = cursors[i] + n >= len(waves[i])
            eng.push(cid, waves[i][cursors[i]:cursors[i] + n], eos=end)
            cursors[i] += n
        eng.step()
    eng.drain()
    for i, cid in enumerate(cids):
        got = eng.get_best_path(cid)
        assert got["words"] == want[i]["words"]
        assert got["cost"] == pytest.approx(want[i]["cost"], abs=1e-3)
        assert eng._channels[cid].frames_decoded > 0


def test_channel_reuse_is_clean(info):
    wave_a, wave_b = make_wave(10, n=9000), make_wave(11, n=9000)
    want_b = session_decode(info, wave_b).get_best_path()

    eng = BatchedStreamingDecoder(info, num_channels=2)
    cid = eng.acquire()
    eng.push(cid, wave_a, eos=True)
    eng.drain()
    first = eng.get_best_path(cid)
    assert first["cost"] < np.inf
    eng.release(cid)
    # reacquire the same slot: state must be fully reset
    cid2 = eng.acquire()
    assert cid2 == cid
    eng.push(cid2, wave_b, eos=True)
    eng.drain()
    got = eng.get_best_path(cid2)
    assert got["words"] == want_b["words"]
    assert got["cost"] == pytest.approx(want_b["cost"], abs=1e-3)


def test_idle_channels_untouched(info):
    """A channel with no input must be bit-identical after others decode."""
    eng = BatchedStreamingDecoder(info, num_channels=3)
    idle = eng.acquire()
    busy = eng.acquire()
    before = [np.asarray(a[idle]).copy() for a in eng._beam]
    eng.push(busy, make_wave(12, n=8000), eos=True)
    eng.drain()
    after = [np.asarray(a[idle]) for a in eng._beam]
    for b, a in zip(before, after):
        np.testing.assert_array_equal(b, a)
    assert eng.get_best_path(idle)["words"] == []


def test_nbest_and_lattice_match_session(info):
    wave = make_wave(13)
    sess = session_decode(info, wave)
    eng = BatchedStreamingDecoder(info, num_channels=2)
    cid = eng.acquire()
    eng.push(cid, wave, eos=True)
    eng.drain()
    assert eng.get_best_path_txt(cid) == sess.get_best_path_txt()
    got_nb = eng.get_nbest(cid, 3)
    want_nb = sess.get_nbest(3)
    assert [r["text"] for r in got_nb] == [r["text"] for r in want_nb]


def test_capacity_and_double_release(info):
    eng = BatchedStreamingDecoder(info, num_channels=2)
    a, b = eng.acquire(), eng.acquire()
    with pytest.raises(RuntimeError):
        eng.acquire()
    eng.release(a)
    c = eng.acquire()
    assert c == a
    with pytest.raises(AssertionError):
        eng.release(a)
        eng.release(a)
