"""Live-adaptive HBM state-record fetch for the beam search.

The search's hot memory op is fetching each active state's arc records from
an HBM-resident table (the reference's per-token `ArcIterator` walk,
ref: src/newfst/arc-iter.h:10-43).  Two measured facts on v5e drive this
design (tools/perf/bench_dma_variants.py):

  * XLA's gather degrades with table size (≈19 ns/idx at 250k rows →
    ≈45 ns at 2M — TLB-bound random access) and falls off a cliff for wide
    rows.
  * A Pallas per-row async-copy pipeline is flat in table size (≈35 ns/row
    marginal, descriptor-bound) and supports a **dynamic trip count**: only
    the first ``live[b]`` rows are fetched.

So each state's full record (emitting arcs + ε-closure entries, field-major)
is packed into one fixed 128-byte-aligned lane group of a ``[S_pages, 128]``
i32 page table (``PAGE_LANES=128`` is the HBM tile width — narrower rows
cannot be DMA-sliced), and the fetch kernel DMAs exactly one page per *live*
token.  Because the beam is kept live-prefix (dead slots sort last), fetch
cost scales with the **actual** number of active tokens — the TPU-native
analogue of the reference decoder's adaptive-beam expansion skip
(ref: src/my-decoder/online-decoder-base-inl.h:269-290), where tokens
outside the beam are never expanded.

``fetch_impl``:
  * ``dma``  — Pallas kernel (TPU); cost ∝ live tokens.
  * ``xla``  — plain XLA gather of page rows (CPU tests, small tables).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

PAGE_LANES = 128


def pack_state_records(field_arrays, lanes_per_state: int):
    """Pack per-state field blocks into page rows.

    ``field_arrays``: list of np.int32 [S, L_f] blocks (already padded
    per-field); total lanes ≤ ``lanes_per_state`` which must divide 128.
    Returns (pages np.int32[S_pages, 128], states_per_page).
    """
    assert PAGE_LANES % lanes_per_state == 0
    spp = PAGE_LANES // lanes_per_state
    S = field_arrays[0].shape[0]
    tot = sum(f.shape[1] for f in field_arrays)
    assert tot <= lanes_per_state, (tot, lanes_per_state)
    Sp = -(-S // spp)
    rec = np.zeros((Sp * spp, lanes_per_state), np.int32)
    col = 0
    for f in field_arrays:
        if f.dtype == np.float32:
            f = f.view(np.int32)
        rec[:S, col:col + f.shape[1]] = f
        col += f.shape[1]
    return rec.reshape(Sp, PAGE_LANES), spp


@partial(jax.jit, static_argnums=(3, 4))
def _dma_fetch(pages, state, live, K: int, nsem: int):
    """out[b, k, :] = pages[state[b,k] // spp] group-selected later; fetches
    only k < live[b].  pages i32[Sp,128], state i32[B,K], live i32[B]."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B = state.shape[0]

    def kern(idx_ref, cnt_ref, tab_ref, out_ref, sems):
        b = pl.program_id(0)
        n = cnt_ref[b]

        def issue(i):
            return pltpu.make_async_copy(
                tab_ref.at[idx_ref[b * K + i]], out_ref.at[0, i],
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
        grid=(B,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, K, PAGE_LANES),
                               lambda b, idx, cnt: (b, 0, 0)),
        scratch_shapes=[pltpu.SemaphoreType.DMA((nsem,))],
    )
    return pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, K, PAGE_LANES), jnp.int32),
    )(state.reshape(-1), live, pages)


def fetch_pages(pages, state, live, spp: int, lanes: int,
                impl: str = "dma"):
    """Fetch each token's state record: returns i32[B, K, lanes].

    ``state`` i32[B,K] (dead slots must be ≥ 0 or masked upstream);
    ``live`` i32[B] live-prefix lengths (dma impl only fetches those rows;
    the rest of the output is unspecified garbage — callers must mask by
    their own validity, which the search does via ``state != NO_STATE``).
    """
    s_safe = jnp.maximum(state, 0)
    page = s_safe // spp if spp > 1 else s_safe
    if impl == "xla":
        rows = pages[page]                      # [B,K,128]
    else:
        K = state.shape[1]
        rows = _dma_fetch(pages, page, live, K, 32)
    if spp == 1:
        return rows[:, :, :lanes]
    # select this state's lane group within the page
    grp = (s_safe % spp)[:, :, None]            # [B,K,1]
    out = rows[:, :, :lanes]
    for g in range(1, spp):
        out = jnp.where(grp == g, rows[:, :, g * lanes:(g + 1) * lanes],
                        out)
    return out
