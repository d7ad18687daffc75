import time, json
import jax, jax.numpy as jnp, numpy as np
from asr_decoder_tpu.decoder.config import DecoderConfig
from asr_decoder_tpu.fst.device_fst import DeviceFst
from asr_decoder_tpu.fst.synthetic import random_hclg
from asr_decoder_tpu.ops.beamsearch import TpuBeamSearch

rng = np.random.default_rng(0)
num_pdfs = 2048
fst = random_hclg(rng, num_states=50_000, num_ilabels=num_pdfs)
dev = DeviceFst.build(fst, arc_lanes=8)
i2p = np.concatenate([[0], np.arange(num_pdfs)]).astype(np.int32)
cfg = DecoderConfig(beam=14.0, beam_width=512, arc_lanes=8, max_active=512, min_active=16)
search = TpuBeamSearch(dev, i2p, cfg)
T = 266  # 8s at skip 2
for B in (16, 64, 128):
    ll = jnp.asarray(rng.standard_normal((B, T, num_pdfs)).astype(np.float32))
    state, _ = search.init_state(B)
    s2, _ = search.advance(state, ll)
    jax.block_until_ready(s2.tok_cost)
    t0 = time.perf_counter()
    for _ in range(2):
        s2, _ = search.advance(state, ll)
    jax.block_until_ready(s2.tok_cost)
    dt = (time.perf_counter()-t0)/2
    print(json.dumps(dict(B=B, search_s=dt, audio_rate=B*8.0/dt)))
