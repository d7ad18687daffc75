"""End-to-end decode throughput benchmark (runs on the real TPU chip).

Pipeline benchmarked — the reference's canonical serve path (SURVEY §3.1:
fbank → AM forward → WFST beam search), batched:
  16 kHz waveform batch → 80-dim fbank → flagship projected-LSTM AM with
  frame-subsampling 3 → batched frame-synchronous Viterbi beam search with
  full lattice/backpointer logging over a synthetic HCLG-shaped graph →
  per-utterance token beams.

Metric: aggregate audio-seconds decoded per wall-second per chip
(BASELINE.json).  vs_baseline: the reference's production CPU serving
configuration decodes ~60 concurrent real-time streams per node
(--nthread=60 at decoder rt ≈ 1.0, ref: src/v2-asrbin/conf/v2-conf.txt),
i.e. ~60 audio-seconds/s — vs_baseline = (audio-s/s per chip) / 60.

Timing note: device completion is forced by fetching a reduced scalar —
``jax.block_until_ready`` alone does not reliably block on the tunneled
backend used by the test harness.

Prints exactly one JSON line.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_AUDIO_S_PER_S = 60.0   # one reference CPU node (60 threads @ RTF 1)


def _force(x) -> float:
    leaves = [l for l in jax.tree.leaves(x) if hasattr(l, "dtype")]
    return float(sum(jnp.sum(l[..., -1].astype(jnp.float32))
                     for l in leaves))


def _time(fn, *args, iters=3):
    _force(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        _force(fn(*args))
    return (time.perf_counter() - t0) / iters


def main(quick: bool = False, profile_dir: str | None = None):
    from asr_decoder_tpu.decoder.config import DecoderConfig
    from asr_decoder_tpu.frontend.fbank import FbankConfig, compute_fbank
    from asr_decoder_tpu.fst.device_fst import DeviceFst
    from asr_decoder_tpu.fst.synthetic import random_hclg
    from asr_decoder_tpu.models.flagship import make_flagship
    from asr_decoder_tpu.models.nnet import am_forward
    from asr_decoder_tpu.ops.beamsearch import TpuBeamSearch

    rng = np.random.default_rng(0)
    sr = 16000
    secs = 8.0
    # 256 concurrent streams per chip: measured batch-scaling sweet spot
    # (fixed per-dispatch costs amortize: 1985 → 2895 search audio-s/s
    # going 128 → 256; 512 adds only +8% more)
    batch = 256 if not quick else 4
    num_pdfs = 2048
    skip = 2  # frame-subsampling-factor 3 (ref conf)

    fb_cfg = FbankConfig(num_bins=80)
    nnet = make_flagship(jax.random.PRNGKey(0), feat_dim=80,
                         num_pdfs=num_pdfs, hidden=1024, proj=512,
                         num_layers=3)
    layers = nnet.layers
    am_state = nnet.init_state(batch)

    fst = random_hclg(rng, num_states=200_000 if not quick else 5_000,
                      num_ilabels=num_pdfs)
    dev = DeviceFst.build(fst, arc_lanes=8)
    # search kernel scores ilabel i against AM row (i-1): CTC-style map
    # (ref: nnet-nnet.h:226 "ilabel - 1")
    ilabel2pdf = np.concatenate([[0], np.arange(num_pdfs)]).astype(np.int32)
    cfg = DecoderConfig(beam=14.0, beam_width=512, arc_lanes=8,
                        max_active=512, min_active=16, eps_mode="closure")
    search = TpuBeamSearch(dev, ilabel2pdf, cfg)

    wave = jnp.asarray(rng.standard_normal((batch, int(sr * secs))) * 1000,
                       jnp.float32)

    def am_fn(w):
        feats = compute_fbank(fb_cfg, w)
        ll, _ = am_forward(layers, feats, am_state, skip=skip)
        return ll

    am_jit = jax.jit(am_fn)
    ll = am_jit(wave)
    state0, _ = search.init_state(batch)

    def pipeline(w):
        ll = am_jit(w)
        state, init_log = search.init_state(batch)
        state, logs = search.advance(state, ll)
        return state, logs

    iters = 3 if not quick else 1
    t_am = _time(am_jit, wave, iters=iters)
    t_search = _time(lambda l: search.advance(state0, l)[0], ll, iters=iters)
    if profile_dir:
        # xprof/Perfetto capture of one full pipeline run (SURVEY §5)
        from asr_decoder_tpu.utils.profiling import trace
        with trace(profile_dir):
            _force(pipeline(wave))
    dt = _time(pipeline, wave, iters=iters)

    audio_s = batch * secs
    audio_s_per_s = audio_s / dt

    # production-scale operating point (ref conf: multi-million-state HCLG
    # at max-active 7000, src/v1-asrbin/conf/decoder.conf): a ≥2M-state /
    # ≥10M-arc graph decoded at max_active 4096, with the graph load timed
    # (build + ε-closure + device upload)
    prod = None
    if not quick:
        rng2 = np.random.default_rng(1)
        t0 = time.perf_counter()
        fst2 = random_hclg(rng2, num_states=2_000_000,
                           num_ilabels=num_pdfs)
        t_gen = time.perf_counter() - t0
        t0 = time.perf_counter()
        dev2 = DeviceFst.build(fst2, arc_lanes=8)
        cfg2 = DecoderConfig(beam=14.0, beam_width=4096, arc_lanes=8,
                             max_active=4096, min_active=200,
                             eps_mode="closure")
        search2 = TpuBeamSearch(dev2, ilabel2pdf, cfg2)
        t_load = time.perf_counter() - t0
        bp = 32
        ll2 = jnp.asarray(
            rng2.standard_normal((bp, ll.shape[1], num_pdfs)) * 3,
            jnp.float32)
        st2, _ = search2.init_state(bp)
        t_s2 = _time(lambda l: search2.advance(st2, l)[0], ll2, iters=iters)
        prod_audio_s = bp * secs
        prod = {
            "graph_states": int(dev2.num_states),
            "graph_arcs": int(fst2.num_arcs),
            "max_active": cfg2.max_active,
            "batch": bp,
            "search_audio_s_per_s": round(prod_audio_s / t_s2, 1),
            "search_ms": round(t_s2 * 1e3, 1),
            "graph_gen_s": round(t_gen, 1),
            "graph_load_s": round(t_load, 1),
        }

    # bench realism: a REAL-topology decode graph (trie TLG over a
    # 30k-word lexicon — blank/repeat self-loops, ε word exits, shared
    # prefixes) decoded over REALISTIC posteriors (template-score
    # log-softmax: peaked, near-tied) at a production-ish operating point
    realistic = None
    if not quick:
        from asr_decoder_tpu.eval.synth_task import SynthTask
        from asr_decoder_tpu.fst.ctc_graph import build_ctc_decode_graph
        task = SynthTask(num_phones=40, num_words=30_000, feat_dim=24,
                         seed=0)
        t0 = time.perf_counter()
        fst3, i2p3 = build_ctc_decode_graph(task.lexicon, task.word_costs,
                                            task.num_phones,
                                            share_prefixes=True)
        dev3 = DeviceFst.build(fst3, arc_lanes=16)
        cfg3 = DecoderConfig(beam=14.0, beam_width=1024, arc_lanes=16,
                             max_active=1024, min_active=200,
                             eps_mode="closure")
        search3 = TpuBeamSearch(dev3, np.asarray(i2p3, np.int32), cfg3)
        t_load3 = time.perf_counter() - t0
        rng3 = np.random.default_rng(7)
        Br, Tr = 64, 160
        lls3 = np.zeros((Br, Tr, task.num_phones + 1), np.float32)
        for b in range(Br):
            while True:
                _, _, feats = task.sample_utterance(rng3)
                if len(feats) <= Tr:
                    break
            sc = feats @ task.templates.T
            lp = sc - np.log(np.exp(sc).sum(axis=1, keepdims=True))
            lls3[b, :len(lp)] = lp
            lls3[b, len(lp):] = lp[-1]
        lls3 = jnp.asarray(lls3)
        st3, _ = search3.init_state(Br)
        t_s3 = _time(lambda l: search3.advance(st3, l)[0], lls3,
                     iters=iters)
        realistic = {
            "graph_states": int(dev3.num_states),
            "graph_arcs": int(fst3.num_arcs),
            "vocab": 30_000,
            "max_active": cfg3.max_active,
            "batch": Br,
            "posteriors": "template-softmax",
            "search_audio_s_per_s": round(Br * Tr / 100.0 / t_s3, 1),
            "search_ms": round(t_s3 * 1e3, 1),
            "graph_load_s": round(t_load3, 1),
        }

    print(json.dumps({
        "metric": "audio_seconds_per_second_per_chip",
        "value": round(audio_s_per_s, 2),
        "unit": "audio-s/s",
        "vs_baseline": round(audio_s_per_s / BASELINE_AUDIO_S_PER_S, 3),
        "detail": {
            "batch": batch, "wave_secs": secs,
            "graph_states": dev.num_states,
            "beam_width": cfg.beam_width,
            "am_audio_s_per_s": round(audio_s / t_am, 1),
            "search_audio_s_per_s": round(audio_s / t_search, 1),
            "am_ms": round(t_am * 1e3, 1),
            "search_ms": round(t_search * 1e3, 1),
            "frames": int(ll.shape[1]),
            "production": prod,
            "realistic": realistic,
        },
    }))


if __name__ == "__main__":
    pdir = None
    for a in sys.argv[1:]:
        if a.startswith("--profile-dir="):
            pdir = a.split("=", 1)[1]
    main(quick="--quick" in sys.argv, profile_dir=pdir)
