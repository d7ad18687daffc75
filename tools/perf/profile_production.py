"""Profile the production-scale search point op-by-op on the real chip.

Builds (and disk-caches) the 2M-state synthetic HCLG, runs one
``search.advance`` under the JAX profiler, and prints the top device ops by
total self-time from the captured Perfetto trace — the evidence base for
kernel work on the production operating point (VERDICT r4 next-step #1).

Usage:  PYTHONPATH=/root/repo:/root/.axon_site python tools/perf/profile_production.py
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

import numpy as np

CACHE = "/tmp/prod_graph_cache_v2.npz"


def build_or_load_dev():
    from asr_decoder_tpu.fst.device_fst import DeviceFst
    from asr_decoder_tpu.fst.synthetic import random_hclg

    if os.path.exists(CACHE):
        z = np.load(CACHE, allow_pickle=False)
        dev = DeviceFst(
            start=int(z["start"]), final_state=int(z["final_state"]),
            num_states=int(z["num_states"]), eps_depth=int(z["eps_depth"]),
            orig_state=z["orig_state"],
            em_offset=z["em_offset"], em_count=z["em_count"],
            em_ilabel=z["em_ilabel"], em_olabel=z["em_olabel"],
            em_weight=z["em_weight"], em_dst=z["em_dst"],
            em_arcid=z["em_arcid"],
            eps_offset=z["eps_offset"], eps_count=z["eps_count"],
            eps_olabel=z["eps_olabel"], eps_weight=z["eps_weight"],
            eps_dst=z["eps_dst"], eps_arcid=z["eps_arcid"],
            clo_offset=z["clo_offset"], clo_count=z["clo_count"],
            clo_dst=z["clo_dst"], clo_weight=z["clo_weight"],
            clo_path_arcs=z["clo_path_arcs"],
            clo_path_off=z["clo_path_off"])
        print(f"loaded cached graph: S={dev.num_states} "
              f"C={dev.max_closure_size}", file=sys.stderr)
        return dev
    rng = np.random.default_rng(1)
    t0 = time.perf_counter()
    fst = random_hclg(rng, num_states=2_000_000, num_ilabels=2048)
    print(f"gen {time.perf_counter()-t0:.1f}s", file=sys.stderr)
    t0 = time.perf_counter()
    dev = DeviceFst.build(fst, arc_lanes=8)
    dev.build_closure()
    print(f"build+closure {time.perf_counter()-t0:.1f}s", file=sys.stderr)
    np.savez(CACHE, start=dev.start, final_state=dev.final_state,
             num_states=dev.num_states, eps_depth=dev.eps_depth,
             orig_state=dev.orig_state,
             em_offset=dev.em_offset, em_count=dev.em_count,
             em_ilabel=dev.em_ilabel, em_olabel=dev.em_olabel,
             em_weight=dev.em_weight, em_dst=dev.em_dst,
             em_arcid=dev.em_arcid,
             eps_offset=dev.eps_offset, eps_count=dev.eps_count,
             eps_olabel=dev.eps_olabel, eps_weight=dev.eps_weight,
             eps_dst=dev.eps_dst, eps_arcid=dev.eps_arcid,
             clo_offset=dev.clo_offset, clo_count=dev.clo_count,
             clo_dst=dev.clo_dst, clo_weight=dev.clo_weight,
             clo_path_arcs=dev.clo_path_arcs,
             clo_path_off=dev.clo_path_off)
    return dev


def main():
    import jax
    import jax.numpy as jnp

    from asr_decoder_tpu.decoder.config import DecoderConfig
    from asr_decoder_tpu.ops.beamsearch import TpuBeamSearch

    dev = build_or_load_dev()
    num_pdfs = 2048
    ilabel2pdf = np.concatenate([[0], np.arange(num_pdfs)]).astype(np.int32)
    cfg = DecoderConfig(beam=14.0, beam_width=4096, arc_lanes=8,
                        max_active=4096, min_active=200, eps_mode="closure")
    t0 = time.perf_counter()
    search = TpuBeamSearch(dev, ilabel2pdf, cfg)
    print(f"upload/search init {time.perf_counter()-t0:.1f}s; "
          f"mode={search.mode} stages={search.num_stages} "
          f"C={dev.max_closure_size}", file=sys.stderr)

    rng = np.random.default_rng(2)
    bp, T = 32, 88
    ll = jnp.asarray(rng.standard_normal((bp, T, num_pdfs)) * 3, jnp.float32)
    st, _ = search.init_state(bp)

    def run():
        out = search.advance(st, ll)[0]
        return float(jnp.sum(out.tok_cost[jnp.isfinite(out.tok_cost)]))

    run()  # compile
    t0 = time.perf_counter()
    run()
    wall = time.perf_counter() - t0
    print(f"advance wall {wall*1e3:.1f} ms  ({wall/T*1e3:.2f} ms/frame)  "
          f"audio-s/s = {bp*T/100.0/wall:.1f}", file=sys.stderr)

    trace_dir = "/tmp/prod_trace"
    os.system(f"rm -rf {trace_dir}")
    jax.profiler.start_trace(trace_dir)
    run()
    jax.profiler.stop_trace()

    # parse perfetto trace: sum device-op durations by op name
    files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    assert files, f"no trace in {trace_dir}"
    with gzip.open(files[0], "rt") as f:
        tr = json.load(f)
    # find TPU device track pids
    pid_name = {}
    for e in tr["traceEvents"]:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_name.items()
                if "TPU" in n or "tpu" in n.lower()}
    tot = defaultdict(float)
    cnt = defaultdict(int)
    for e in tr["traceEvents"]:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            # only leaf op events: XLA op tracks carry 'dur' in us
            tot[e["name"]] += e.get("dur", 0)
            cnt[e["name"]] += 1
    total_us = sum(tot.values())
    print(f"\ndevice pids: { {p: pid_name[p] for p in dev_pids} }")
    print(f"total device op-time {total_us/1e3:.1f} ms "
          f"(may double-count nested tracks)\n")
    for name, us in sorted(tot.items(), key=lambda kv: -kv[1])[:45]:
        print(f"{us/1e3:9.2f} ms  x{cnt[name]:<6} {name[:110]}")





def main_tlg():
    """Profile the composed-TLG production point (bench.py prod config)."""
    import jax
    import jax.numpy as jnp

    from asr_decoder_tpu.decoder.config import DecoderConfig
    from asr_decoder_tpu.fst.device_fst import DeviceFst
    from asr_decoder_tpu.fst.tlg import build_tlg
    from asr_decoder_tpu.lm.arpa import parse_arpa
    from asr_decoder_tpu.lm.synth_arpa import synth_arpa_text
    from asr_decoder_tpu.ops.beamsearch import TpuBeamSearch
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

    cache = "/tmp/tlg_graph_cache.npz"
    rng2 = np.random.default_rng(1)
    num_phones = 40
    import pickle
    pcache = "/tmp/tlg_graph_cache.pkl"
    if os.path.exists(pcache):
        with open(pcache, "rb") as f:
            dev, i2p2, lexicon = pickle.load(f)
        print(f"loaded cached TLG S={dev.num_states}", file=sys.stderr)
    else:
        text = synth_arpa_text(vocab_size=40_000, n_bigram=220_000,
                               n_trigram=130_000, n_4gram=60_000, seed=1)
        fsa = parse_arpa(text)
        lexicon = {}
        for wname, wid in fsa.vocab.items():
            if not wname.startswith("w"):
                continue
            n = int(rng2.integers(3, 8))
            ph = [int(rng2.integers(1, num_phones + 1))]
            while len(ph) < n:
                p = int(rng2.integers(1, num_phones + 1))
                if p != ph[-1]:
                    ph.append(p)
            lexicon[wid] = ph
        fst2, i2p2 = build_tlg(lexicon, fsa, num_phones)
        dev = DeviceFst.build(fst2, arc_lanes=16)
        dev.build_closure()
        with open(pcache, "wb") as f:
            pickle.dump((dev, i2p2, lexicon), f)
    print(f"TLG S={dev.num_states} A={dev.max_em_degree} "
          f"C={dev.max_closure_size}", file=sys.stderr)

    import importlib
    bench = importlib.import_module("bench")
    beam = float(os.environ.get("TLG_BEAM", "13"))
    cfg = DecoderConfig(beam=beam, beam_width=4096, arc_lanes=16,
                        max_active=4096, min_active=200, eps_mode="closure")
    search = TpuBeamSearch(dev, np.asarray(i2p2, np.int32), cfg)
    bp, Tp = 32, 264
    ll = jnp.asarray(bench._tlg_posteriors(rng2, lexicon, num_phones,
                                           bp, Tp))
    jax.block_until_ready(ll)
    st, _ = search.init_state(bp)

    def run():
        out = search.advance(st, ll)[0]
        return float(jnp.sum(jnp.where(jnp.isfinite(out.tok_cost),
                                       out.tok_cost, 0.0)))

    run()
    best = 1e30
    for _ in range(3):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    stf, _ = search.advance(st, ll)
    live = (np.asarray(stf.tok_cost) < np.inf).sum(axis=1)
    print(f"advance min {best*1e3:.1f} ms ({best/Tp*1e3:.2f} ms/frame) "
          f"live_mean={live.mean():.0f}", file=sys.stderr)

    trace_dir = "/tmp/tlg_trace"
    os.system(f"rm -rf {trace_dir}")
    jax.profiler.start_trace(trace_dir)
    run()
    jax.profiler.stop_trace()
    report(trace_dir)


def report(trace_dir):
    files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    assert files, f"no trace in {trace_dir}"
    with gzip.open(files[0], "rt") as f:
        tr = json.load(f)
    pid_name = {}
    for e in tr["traceEvents"]:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_name.items() if "TPU" in n}
    tot = defaultdict(float)
    cnt = defaultdict(int)
    for e in tr["traceEvents"]:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            tot[e["name"]] += e.get("dur", 0)
            cnt[e["name"]] += 1
    for name, us in sorted(tot.items(), key=lambda kv: -kv[1])[:30]:
        print(f"{us/1e3:9.2f} ms  x{cnt[name]:<6} {name[:110]}")


if __name__ == "__main__":
    if "--tlg" in sys.argv:
        main_tlg()
    else:
        main()
