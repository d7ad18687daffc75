"""End-to-end decode throughput benchmark (runs on the real TPU chip).

Pipeline benchmarked — the reference's canonical serve path (SURVEY §3.1:
fbank → AM forward → WFST beam search), batched:
  16 kHz waveform batch → 80-dim fbank → flagship projected-LSTM AM with
  frame-subsampling 3 → batched frame-synchronous Viterbi beam search over a
  synthetic HCLG-shaped graph (50k states) → per-utterance token beams.

Metric: aggregate audio-seconds decoded per wall-second per chip
(BASELINE.json).  vs_baseline: the reference's production CPU serving
configuration decodes ~60 concurrent real-time streams per node
(--nthread=60 at decoder rt ≈ 1.0, ref: src/v2-asrbin/conf/v2-conf.txt),
i.e. ~60 audio-seconds/s — vs_baseline = (audio-s/s per chip) / 60.

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


def main(quick: bool = False):
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
    batch = 16 if not quick else 4
    num_pdfs = 2048
    skip = 2  # frame-subsampling-factor 3 (ref conf)

    fb_cfg = FbankConfig(num_bins=80)
    nnet = make_flagship(jax.random.PRNGKey(0), feat_dim=80,
                         num_pdfs=num_pdfs, hidden=1024, proj=512,
                         num_layers=3)
    layers = nnet.layers
    am_state = nnet.init_state(batch)

    fst = random_hclg(rng, num_states=50_000 if not quick else 5_000,
                      num_ilabels=num_pdfs)
    dev = DeviceFst.build(fst, arc_lanes=8)
    # search kernel scores ilabel i against AM row (i-1): CTC-style map
    # (ref: nnet-nnet.h:226 "ilabel - 1")
    ilabel2pdf = np.concatenate([[0], np.arange(num_pdfs)]).astype(np.int32)
    cfg = DecoderConfig(beam=14.0, beam_width=512, arc_lanes=8,
                        max_active=512, min_active=16)
    search = TpuBeamSearch(dev, ilabel2pdf, cfg)

    wave = jnp.asarray(rng.standard_normal((batch, int(sr * secs))) * 1000,
                       jnp.float32)

    def am_fn(w):
        feats = compute_fbank(fb_cfg, w)
        ll, _ = am_forward(layers, feats, am_state, skip=skip)
        return ll

    am_jit = jax.jit(am_fn)

    def pipeline(w):
        ll = am_jit(w)
        state, init_log = search.init_state(batch)
        state, logs = search.advance(state, ll)
        return state

    # warm-up / compile
    out = pipeline(wave)
    jax.block_until_ready(out.tok_cost)

    iters = 3 if not quick else 1
    t0 = time.perf_counter()
    for _ in range(iters):
        out = pipeline(wave)
    jax.block_until_ready(out.tok_cost)
    dt = time.perf_counter() - t0

    audio_s = batch * secs * iters
    audio_s_per_s = audio_s / dt
    print(json.dumps({
        "metric": "audio_seconds_per_second_per_chip",
        "value": round(audio_s_per_s, 2),
        "unit": "audio-s/s",
        "vs_baseline": round(audio_s_per_s / BASELINE_AUDIO_S_PER_S, 3),
    }))


if __name__ == "__main__":
    main(quick="--quick" in sys.argv)
