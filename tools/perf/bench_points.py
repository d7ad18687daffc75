"""Compare relax/fetch configurations on the three bench operating points
(headline 200k / production 2M / realistic trie-TLG) on the real chip.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf/bench_points.py [headline|production|realistic] ...
"""

from __future__ import annotations

import sys
import time

import numpy as np


def _force(x):
    import jax
    import jax.numpy as jnp
    return float(jnp.sum(jnp.where(jnp.isfinite(x.tok_cost), x.tok_cost,
                                   0.0)))


def time_search(search, st, ll, iters=3):
    _force(search.advance(st, ll)[0])
    best = 1e30
    for _ in range(iters):
        t0 = time.perf_counter()
        _force(search.advance(st, ll)[0])
        best = min(best, time.perf_counter() - t0)
    return best


def live_stats(search, st, ll):
    import jax.numpy as jnp
    stf, _ = search.advance(st, ll)
    import numpy as _np
    live = (_np.asarray(stf.tok_cost) < _np.inf).sum(axis=1)
    return int(live.mean()), int(live.max())


def run_point(name):
    import jax
    from asr_decoder_tpu.decoder.config import DecoderConfig
    from asr_decoder_tpu.fst.device_fst import DeviceFst
    from asr_decoder_tpu.ops.beamsearch import TpuBeamSearch

    rng = np.random.default_rng(1)
    if name == "headline":
        from asr_decoder_tpu.fst.synthetic import random_hclg
        fst = random_hclg(np.random.default_rng(0), num_states=200_000,
                          num_ilabels=2048)
        i2p = np.concatenate([[0], np.arange(2048)]).astype(np.int32)
        dev = DeviceFst.build(fst, arc_lanes=8)
        B, T, V, K, lanes = 256, 88, 2048, 512, 8
        ll = np.asarray(rng.standard_normal((B, T, V)) * 3, np.float32)
        mk = lambda **kw: DecoderConfig(beam=14.0, beam_width=K,
                                        arc_lanes=lanes, max_active=K,
                                        min_active=16, eps_mode="closure",
                                        **kw)
    elif name == "production":
        sys.path.insert(0, "tools/perf")
        from profile_production import build_or_load_dev
        dev = build_or_load_dev()
        i2p = np.concatenate([[0], np.arange(2048)]).astype(np.int32)
        B, T, V, K = 32, 88, 2048, 4096
        ll = np.asarray(rng.standard_normal((B, T, V)) * 3, np.float32)
        mk = lambda **kw: DecoderConfig(beam=14.0, beam_width=K,
                                        arc_lanes=8, max_active=K,
                                        min_active=200, eps_mode="closure",
                                        **kw)
    else:  # realistic
        from asr_decoder_tpu.eval.synth_task import SynthTask
        from asr_decoder_tpu.fst.ctc_graph import build_ctc_decode_graph
        task = SynthTask(num_phones=40, num_words=30_000, feat_dim=24,
                         seed=0)
        fst, i2p = build_ctc_decode_graph(task.lexicon, task.word_costs,
                                          task.num_phones,
                                          share_prefixes=True)
        i2p = np.asarray(i2p, np.int32)
        dev = DeviceFst.build(fst, arc_lanes=16)
        B, T, K = 64, 160, 1024
        rng3 = np.random.default_rng(7)
        lls = np.zeros((B, T, task.num_phones + 1), np.float32)
        for b in range(B):
            while True:
                _, _, feats = task.sample_utterance(rng3)
                if len(feats) <= T:
                    break
            sc = feats @ task.templates.T
            lp = sc - np.log(np.exp(sc).sum(axis=1, keepdims=True))
            lls[b, :len(lp)] = lp
            lls[b, len(lp):] = lp[-1]
        ll = lls
        mk = lambda **kw: DecoderConfig(beam=14.0, beam_width=K,
                                        arc_lanes=16, max_active=K,
                                        min_active=200, eps_mode="closure",
                                        **kw)

    audio_s = B * T * 3 / 100.0 if name != "realistic" else B * T / 100.0
    # (headline/production loglikes are already subsampled ×3: 88 frames
    #  represent 8 s of audio at frame-subsampling-factor 3)
    if name == "realistic":
        audio_s = B * T / 100.0
    else:
        audio_s = B * 8.0 if T == 88 else B * T / 100.0

    variants = [("sort", dict(relax_impl="sort")),
                ("topk/dma", dict(relax_impl="topk", fetch_impl="dma")),
                ("topk/xla", dict(relax_impl="topk", fetch_impl="xla"))]
    if name == "production":
        variants = variants[1:] + variants[:1]
    import jax.numpy as jnp
    ll = jnp.asarray(ll)          # device-resident: never re-ship over the
    import jax; jax.block_until_ready(ll)   # tunnel per timed call
    for label, kw in variants:
        try:
            search = TpuBeamSearch(dev, i2p, mk(**kw))
            st, _ = search.init_state(B)
            lm, lx = live_stats(search, st, ll)
            dt = time_search(search, st, ll)
            print(f"{name:11s} {label:12s} search {dt*1e3:8.1f} ms  "
                  f"{audio_s/dt:8.1f} audio-s/s   live mean={lm} max={lx}",
                  flush=True)
        except Exception as e:
            print(f"{name} {label}: FAIL {type(e).__name__} {str(e)[:150]}",
                  flush=True)


if __name__ == "__main__":
    for p in (sys.argv[1:] or ["realistic", "headline"]):
        run_point(p)
