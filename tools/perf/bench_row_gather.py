"""Microbenchmark: HBM row-gather strategies for the search's arc fetch.

The production-point profile shows the two XLA row gathers (em_rec, clo_rec)
at ~50 ns/index on a 2M-row table = 74% of per-frame device time.  This
compares, at production shapes ([2M, 32] i32 table, 131072 indices):

  xla      — baseline jnp table[idx]
  dma      — Pallas per-row async-copy pipeline (scalar-prefetched indices,
             NSEM in-flight DMAs, rows land directly in the VMEM out block)

Marginal-cost method (axon tunnel has 30-70 ms dispatch floor): R repeats
inside one lax.scan with a data dependency through the output.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf/bench_row_gather.py
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S = 2_000_000
W = 128          # row lanes (512 B rows, native HBM tiling)
NIDX = 131_072
R = 20            # scan repeats


def xla_row_gather(table, idx):
    return table[idx]


def make_dma_gather(block_rows: int, nsem: int):
    """Rows gathered one async-copy each, ``nsem`` DMAs in flight."""

    def kernel(idx_ref, tab_ref, out_ref, sems):
        nb = out_ref.shape[0]

        def issue(i):
            return pltpu.make_async_copy(
                tab_ref.at[idx_ref[i]], out_ref.at[i], sems.at[i % nsem])

        def warm(i, _):
            issue(i).start()
            return _

        jax.lax.fori_loop(0, nsem, warm, None)

        def body(i, _):
            issue(i).wait()        # slot free
            @pl.when(i + nsem < nb)
            def _():
                issue(i + nsem).start()
            return _

        jax.lax.fori_loop(0, nb, body, None)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(NIDX // block_rows,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((block_rows, W), lambda i, idx: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((nsem,))],
    )

    def kern(idx_ref, tab_ref, out_ref, sems):
        base = pl.program_id(0) * block_rows

        def issue(i):
            return pltpu.make_async_copy(
                tab_ref.at[idx_ref[base + i]], out_ref.at[i],
                sems.at[i % nsem])

        def warm(i, _):
            issue(i).start()
            return _
        jax.lax.fori_loop(0, min(nsem, block_rows), warm, None)

        def body(i, _):
            issue(i).wait()
            @pl.when(i + nsem < block_rows)
            def _():
                issue(i + nsem).start()
            return _
        jax.lax.fori_loop(0, block_rows, body, None)

    @jax.jit
    def run(table, idx):
        return pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((NIDX, W), jnp.int32),
        )(idx, table)

    return run


def bench(fn, table, idx, label):
    @jax.jit
    def loop(table, idx0):
        def body(carry, _):
            out = fn(table, carry)
            # data dependency: next indices derived from gathered rows
            nxt = (carry + out[:, 0] + 1) % S
            return nxt, ()
        final, _ = jax.lax.scan(body, idx0, None, length=R)
        return final

    r = loop(table, idx)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    r = loop(table, idx)
    _ = np.asarray(r[:8])
    dt = time.perf_counter() - t0
    per = dt / R
    print(f"{label:28s} {per*1e3:8.3f} ms/call  "
          f"{per/NIDX*1e9:6.1f} ns/idx  "
          f"{NIDX*W*4/per/1e9:7.1f} GB/s")


def main():
    # generate on device: a 1 GB host->device transfer stalls the tunnel
    table = jax.jit(lambda k: jax.random.randint(k, (S, W), 0, 127,
                                                 jnp.int32))(
        jax.random.PRNGKey(0))
    idx = jax.jit(lambda k: jax.random.randint(k, (NIDX,), 0, S,
                                               jnp.int32))(
        jax.random.PRNGKey(1))
    jax.block_until_ready((table, idx))
    bench(xla_row_gather, table, idx, "xla")
    for block in (8192,):
        for nsem in (16, 64, 256):
            try:
                fn = make_dma_gather(block, nsem)
                bench(fn, table, idx, f"dma block={block} nsem={nsem}")
            except Exception as e:
                print(f"dma block={block} nsem={nsem}: FAIL "
                      f"{type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()
