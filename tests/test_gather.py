"""The Pallas acoustic-score gather kernel vs the XLA reference."""

import numpy as np
import pytest

from asr_decoder_tpu.ops.gather import batched_table_gather


@pytest.mark.parametrize("B,V,N", [(4, 256, 512), (1, 9, 40), (8, 2048, 128)])
def test_pallas_gather_matches_xla(B, V, N):
    rng = np.random.default_rng(0)
    table = rng.standard_normal((B, V)).astype(np.float32)
    idx = rng.integers(0, V, (B, N)).astype(np.int32)
    ref = np.take_along_axis(table, idx, axis=1)
    out_xla = np.asarray(batched_table_gather(table, idx, force="xla"))
    out_pal = np.asarray(batched_table_gather(table, idx, force="interpret"))
    np.testing.assert_allclose(out_xla, ref, rtol=0, atol=0)
    np.testing.assert_allclose(out_pal, ref, rtol=0, atol=0)


def test_device_decode_with_interpret_gather():
    """Full decode parity with the Pallas gather path (interpreter mode)."""
    from test_beamsearch import random_decode_graph
    from asr_decoder_tpu.decoder.config import DecoderConfig
    from asr_decoder_tpu.decoder.gold import GoldDecoder
    from asr_decoder_tpu.fst.device_fst import DeviceFst
    from asr_decoder_tpu.ops.beamsearch import TpuBeamSearch

    rng = np.random.default_rng(11)
    fst = random_decode_graph(rng)
    dev = DeviceFst.build(fst, arc_lanes=8)
    i2p = np.arange(9, dtype=np.int32)
    cfg = DecoderConfig(beam=1e9, beam_width=64, arc_lanes=8, max_active=64,
                        min_active=0, gather_impl="interpret")
    ll = rng.standard_normal((10, 9)).astype(np.float32) * 3
    gold = GoldDecoder(fst, i2p, cfg).decode(ll)
    search = TpuBeamSearch(dev, i2p, cfg)
    state, init_log, logs = search.decode(ll[None])
    res = search.traceback(state, init_log, logs, fst)[0]
    assert res["cost"] == pytest.approx(gold.cost, abs=1e-3)
    if gold.reached_final:
        assert res["words"] == gold.words
