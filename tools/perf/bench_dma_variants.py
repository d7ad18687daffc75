"""Microbench: DMA row-gather scaling (width, unroll, dynamic trip count)
plus sort variants at production shapes.  Informs the v3 search design.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf/bench_dma_variants.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S = 2_000_000
NIDX = 131_072
R = 20


def make_dma(W, block_rows=8192, nsem=32, unroll=1):
    nblk = NIDX // block_rows

    def kern(idx_ref, tab_ref, out_ref, sems):
        base = pl.program_id(0) * block_rows

        def issue(i):
            return pltpu.make_async_copy(
                tab_ref.at[idx_ref[base + i]], out_ref.at[i],
                sems.at[i % nsem])

        def warm(i, _):
            issue(i).start()
            return _
        jax.lax.fori_loop(0, nsem, warm, None, unroll=unroll)

        def body(i, _):
            issue(i).wait()
            @pl.when(i + nsem < block_rows)
            def _():
                issue(i + nsem).start()
            return _
        jax.lax.fori_loop(0, block_rows, body, None, unroll=unroll)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblk,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((block_rows, W), lambda i, idx: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((nsem,))],
    )

    def run(table, idx):
        return pl.pallas_call(
            kern, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((NIDX, W), jnp.int32),
        )(idx, table)
    return run


def make_dma_dyn(W, nlive, block_rows=8192, nsem=32):
    """Dynamic trip count: only the first ``nlive`` rows (read from a scalar
    operand) are fetched; rest of the out block is untouched."""
    nblk = NIDX // block_rows

    def kern(idx_ref, cnt_ref, tab_ref, out_ref, sems):
        base = pl.program_id(0) * block_rows
        n = jnp.clip(cnt_ref[0] - base, 0, block_rows)

        def issue(i):
            return pltpu.make_async_copy(
                tab_ref.at[idx_ref[base + i]], out_ref.at[i],
                sems.at[i % nsem])

        def warm(i, _):
            issue(i).start()
            return _
        jax.lax.fori_loop(0, jnp.minimum(n, nsem), warm, None)

        def body(i, _):
            issue(i).wait()
            @pl.when(i + nsem < n)
            def _():
                issue(i + nsem).start()
            return _
        jax.lax.fori_loop(0, n, body, None)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nblk,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((block_rows, W), lambda i, idx, cnt: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((nsem,))],
    )

    def run(table, idx):
        cnt = jnp.full((1,), nlive, jnp.int32)
        return pl.pallas_call(
            kern, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((NIDX, W), jnp.int32),
        )(idx, cnt, table)
    return run


def bench_gather(fn, W, label, SW=None):
    SW = SW or S

    @jax.jit
    def loop(table, idx0):
        def body(carry, _):
            out = fn(table, carry)
            nxt = (carry + out[:, 0] + 1) % SW
            return nxt, ()
        return jax.lax.scan(body, idx0, None, length=R)[0]

    table = jax.jit(lambda k: jax.random.randint(
        k, (SW, W), 0, 127, jnp.int32))(jax.random.PRNGKey(0))
    idx = jax.jit(lambda k: jax.random.randint(
        k, (NIDX,), 0, SW, jnp.int32))(jax.random.PRNGKey(1))
    jax.block_until_ready((table, idx))
    try:
        r = loop(table, idx)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        r = loop(table, idx)
        _ = np.asarray(r[:8])
        per = (time.perf_counter() - t0) / R
        print(f"{label:42s} {per*1e3:8.3f} ms  {per/NIDX*1e9:6.1f} ns/idx  "
              f"{NIDX*W*4/per/1e9:6.1f} GB/s", flush=True)
    except Exception as e:
        print(f"{label}: FAIL {type(e).__name__} {str(e)[:200]}", flush=True)


def bench_sort():
    B = 32
    for N, nk, nops, label in [
        (32768, 3, 4, "sort 3key 4ops [32,32768] (current emit)"),
        (32768, 1, 3, "sort 1key 3ops [32,32768] (cost-sort)"),
        (8192, 1, 3, "sort 1key 3ops [32,8192]"),
        (4096, 3, 4, "sort 3key 4ops [32,4096] (dedup)"),
        (4096, 1, 3, "sort 1key 3ops [32,4096]"),
        (20480, 1, 3, "sort 1key 3ops [32,20480] (closure)"),
    ]:
        def mk(N=N, nk=nk, nops=nops):
            @jax.jit
            def loop(key, dst, idx):
                def body(carry, _):
                    ops = (carry, dst, idx, jnp.float32(0) * carry)[:nops]
                    out = jax.lax.sort(ops, num_keys=nk, is_stable=False)
                    return out[0] + 1e-6, ()
                return jax.lax.scan(body, key, None, length=R)[0]
            return loop
        loop = mk()
        key = jax.jit(lambda k: jax.random.uniform(k, (B, N)))(
            jax.random.PRNGKey(2))
        dst = jax.jit(lambda k: jax.random.randint(k, (B, N), 0, S,
                                                   jnp.int32))(
            jax.random.PRNGKey(3))
        idx = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None], (B, N))
        jax.block_until_ready((key, dst, idx))
        r = loop(key, dst, idx)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        r = loop(key, dst, idx)
        _ = np.asarray(r[:2, :2])
        per = (time.perf_counter() - t0) / R
        print(f"{label:42s} {per*1e3:8.3f} ms", flush=True)

    # top_k for reference
    @jax.jit
    def tkloop(key):
        def body(carry, _):
            v, i = jax.lax.top_k(carry, 4096)
            return jnp.pad(v, ((0, 0), (0, 32768 - 4096))) + 1e-6, ()
        return jax.lax.scan(body, key, None, length=R)[0]
    key = jax.jit(lambda k: jax.random.uniform(k, (B, 32768)))(
        jax.random.PRNGKey(4))
    jax.block_until_ready(key)
    r = tkloop(key)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    r = tkloop(key)
    _ = np.asarray(r[:2, :2])
    print(f"{'top_k 32768->4096 [32]':42s} "
          f"{(time.perf_counter()-t0)/R*1e3:8.3f} ms", flush=True)


def main():
    print("== sorts ==")
    bench_sort()
    print("== dma width scaling (block 8192, nsem 32) ==")
    for W in (128, 256, 512):
        bench_gather(make_dma(W), W, f"dma W={W} ({W*4}B rows)")
    print("== dma unroll ==")
    for unroll in (4, 8):
        bench_gather(make_dma(128, unroll=unroll), 128,
                     f"dma W=128 unroll={unroll}")
    print("== dma dynamic live count (W=128) ==")
    for nlive in (131_072, 32_768, 8_192):
        bench_gather(make_dma_dyn(128, nlive), 128,
                     f"dma W=128 live={nlive}")
    print("== xla gather [2M,32] clean ==")
    bench_gather(lambda t, i: t[i], 32, "xla [2M,32]")
    bench_gather(lambda t, i: t[i], 32, "xla [250k,32]", SW=250_000)


if __name__ == "__main__":
    main()
