"""Multi-chip decode parity: the dp-sharded search and the dp-sharded
serving arena must produce bit-identical results to single-device decoding
on the 8-virtual-CPU-device mesh (BASELINE config 5; SURVEY §2.10 maps the
reference's thread-pool request parallelism, src/service2/thread-pool.h:33,
to utterance-batch data parallelism across chips)."""

import jax
import numpy as np
import pytest

from asr_decoder_tpu.decoder.config import DecoderConfig
from asr_decoder_tpu.ops.beamsearch import TpuBeamSearch
from asr_decoder_tpu.parallel.decode import dp_decode
from asr_decoder_tpu.parallel.mesh import make_mesh
from asr_decoder_tpu.serving.batcher import BatchedStreamingDecoder

from test_beamsearch import _setup
from test_session import make_info, make_wave

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 (virtual) devices")


def test_dp_decode_matches_single_device():
    rng = np.random.default_rng(0)
    fst, dev, i2p, cfg = _setup(rng)
    B, T, V = 8, 15, 9
    loglikes = (rng.standard_normal((B, T, V)) * 3).astype(np.float32)

    search = TpuBeamSearch(dev, i2p, cfg)
    state, init_log, logs = search.decode(loglikes)
    want = search.traceback(state, init_log, logs, fst)

    mesh = make_mesh(jax.devices()[:8], tp=1)
    st2, il2, logs2 = dp_decode(mesh, search, loglikes)
    # the beam state really is distributed over all 8 devices
    assert len(st2.tok_cost.sharding.device_set) == 8
    got = search.traceback(st2, il2, logs2, fst)
    for w, g in zip(want, got):
        assert g["cost"] == pytest.approx(w["cost"], abs=1e-4)
        assert g["words"] == w["words"]
        assert g["arc_ids"] == w["arc_ids"]


def test_dp_sharded_arena_matches_unsharded():
    """The batched serving arena, dp-sharded over the mesh, decodes every
    channel identically to the unsharded arena (and to plain sessions,
    covered by test_batcher)."""
    B = 8
    waves = [make_wave(200 + s, n=8000) for s in range(B)]

    def run(mesh):
        info = make_info(seed=3)
        arena = BatchedStreamingDecoder(info, B, mesh=mesh)
        cids = [arena.acquire() for _ in range(B)]
        for cid, w in zip(cids, waves):
            for lo in range(0, len(w), 4000):
                arena.push(cid, w[lo:lo + 4000],
                           eos=lo + 4000 >= len(w))
        arena.drain()
        return [arena.get_best_path(c) for c in cids]

    want = run(None)
    got = run(make_mesh(jax.devices()[:8], tp=1))
    for w, g in zip(want, got):
        assert g["cost"] == pytest.approx(w["cost"], abs=1e-4)
        assert g["words"] == w["words"]
