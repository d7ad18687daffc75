"""Multi-chip decode parity: the dp-sharded search and the dp-sharded
serving arena must produce bit-identical results to single-device decoding
on the 8-virtual-CPU-device mesh (BASELINE config 5; SURVEY §2.10 maps the
reference's thread-pool request parallelism, src/service2/thread-pool.h:33,
to utterance-batch data parallelism across chips)."""

import jax
import jax.numpy as jnp
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


def test_tp_sharded_am_decode_matches_unsharded():
    """Inference through a tp-sharded AM (weights split over the tp axis,
    SURVEY §7 "AM sharded over model axis") must produce the same
    posteriors and the same decode as the unsharded AM."""
    from asr_decoder_tpu.models.layers import init_layer_state
    from asr_decoder_tpu.models.nnet import am_forward
    from asr_decoder_tpu.parallel.mesh import shard_batch, shard_model

    info = make_info(seed=5)
    layers = info.am_layers
    rng = np.random.default_rng(2)
    B, T = 8, 24
    D = layers[0].input_dim
    feats = (rng.standard_normal((B, T, D)) * 2).astype(np.float32)
    state = [init_layer_state(l, B) for l in layers]
    ll0, _ = am_forward(layers, jnp.asarray(feats), state)

    mesh = make_mesh(jax.devices()[:8], tp=2)        # dp=4 × tp=2
    with mesh:
        sh_layers = shard_model(mesh, layers)
        feats_sh = shard_batch(mesh, jnp.asarray(feats))
        state_sh = [jax.tree.map(
            lambda a: jax.device_put(a, jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec(
                    "dp", *([None] * (a.ndim - 1))))), s) for s in state]
        ll1, _ = am_forward(sh_layers, feats_sh, state_sh)
    np.testing.assert_allclose(np.asarray(ll1), np.asarray(ll0),
                               rtol=1e-5, atol=1e-5)

    # and the decode over the tp-produced posteriors matches exactly
    search = info.search
    st0, il0, lg0 = search.decode(np.asarray(ll0))
    want = search.traceback(st0, il0, lg0, info.fst)
    st1, il1, lg1 = search.decode(np.asarray(ll1))
    got = search.traceback(st1, il1, lg1, info.fst)
    for w, g in zip(want, got):
        assert g["words"] == w["words"]
        assert g["cost"] == pytest.approx(w["cost"], abs=1e-4)


def test_multihost_skeleton_per_host_arenas():
    """The multi-host serving topology (BASELINE config 5), simulated on
    one process: N independent per-host arenas over disjoint device
    groups decode identically to plain sessions, and one 'host' losing
    its arena does not disturb another host's channels (host-loss
    isolation, parallel/multihost.py)."""
    from asr_decoder_tpu.parallel.multihost import (MultihostContext,
                                                    init_multihost,
                                                    partition_hosts,
                                                    simulated_host_arenas)
    from asr_decoder_tpu.serving.session import OnlineDecoderSession

    ctx = init_multihost()            # single-process no-op path
    assert isinstance(ctx, MultihostContext) and ctx.is_primary
    from asr_decoder_tpu.parallel.multihost import (global_mesh,
                                                    local_serving_mesh)
    assert dict(local_serving_mesh(tp=1).shape)["dp"] == \
        len(jax.local_devices())
    gm = global_mesh(ctx, tp=2)
    assert dict(gm.shape) == {"dp": len(jax.devices()) // 2, "tp": 2}
    groups = partition_hosts(jax.devices()[:8], 2)
    assert [len(g) for g in groups] == [4, 4]
    assert not set(map(id, groups[0])) & set(map(id, groups[1]))

    info = make_info(seed=9)
    wave_a, wave_b = make_wave(31, n=9000), make_wave(32, n=9000)
    want = []
    for w in (wave_a, wave_b):
        s = OnlineDecoderSession(info)
        s.process_data(w, eos=True)
        want.append(s.get_best_path())

    arenas = simulated_host_arenas(lambda: make_info(seed=9), 2,
                                   num_channels=4)
    cids = [a.acquire() for a in arenas]
    for arena, cid, w in zip(arenas, cids, (wave_a, wave_b)):
        arena.push(cid, w, eos=True)
    # "host 0 dies" mid-stream of host 1: host 1 drains unaffected
    arenas[0] = None
    arenas[1].drain()
    got_b = arenas[1].get_best_path(cids[1])
    assert got_b["words"] == want[1]["words"]
    assert got_b["cost"] == pytest.approx(want[1]["cost"], abs=1e-4)


def test_dp_decode_biglm_matches_single_device():
    """dp-sharded BigLM pair decode (graph + device LM tables replicated,
    beam state dp-sharded) equals single-device decoding."""
    from asr_decoder_tpu.lm.arpa import parse_arpa
    from asr_decoder_tpu.lm.device_lm import DeviceDiffLm
    from asr_decoder_tpu.ops.beamsearch_biglm import TpuBigLmBeamSearch
    from test_beamsearch import random_decode_graph
    from test_lm import ARPA, ARPA2
    from asr_decoder_tpu.fst.device_fst import DeviceFst

    rng = np.random.default_rng(3)
    fst = random_decode_graph(rng, num_states=14, num_labels=6)
    dev = DeviceFst.build(fst, arc_lanes=8)
    fsa1 = parse_arpa(ARPA)
    fsa2 = parse_arpa(ARPA2, word2id=fsa1.vocab)
    difflm = DeviceDiffLm.build(fsa1, fsa2, 0.7, 1.3)
    cfg = DecoderConfig(beam=1e9, beam_width=64, arc_lanes=8,
                        max_active=64, min_active=0, lattice_beam=1e9,
                        eps_mode="sweeps", lm_lanes=1 << 20)
    search = TpuBigLmBeamSearch(dev, np.arange(7, dtype=np.int32), difflm,
                                cfg)
    B, T, V = 8, 10, 7
    lls = (rng.standard_normal((B, T, V)) * 3).astype(np.float32)
    want = search.traceback(*search.decode(lls), fst)
    mesh = make_mesh(jax.devices()[:8], tp=1)
    st2, il2, lg2 = dp_decode(mesh, search, lls)
    assert len(st2.tok_cost.sharding.device_set) == 8
    got = search.traceback(st2, il2, lg2, fst)
    for w, g in zip(want, got):
        assert g["words"] == w["words"]
        assert g["cost"] == pytest.approx(w["cost"], abs=1e-4)


@pytest.mark.slow
def test_real_two_process_jax_distributed():
    """REAL multi-process jax.distributed (not simulated): two OS
    processes join a local coordinator, build the cross-host global_mesh,
    and verify tp-sharded AM parity on their own addressable shards
    (BASELINE config 5's only path single-process simulation cannot
    exercise)."""
    from asr_decoder_tpu.parallel.multihost import run_distributed_selftest
    oks = run_distributed_selftest(2)
    assert len(oks) == 2
    assert all("devices=8" in ln for ln in oks)
