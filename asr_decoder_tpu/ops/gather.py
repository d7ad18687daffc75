"""Fast batched small-table gather: ``out[b, n] = table[b, idx[b, n]]``.

The acoustic-score lookup of the beam search (one log-likelihood per arc
candidate, ref LogLikelihood src/nnet/nnet-nnet.h:212-233) is a random gather
of ~K·A indices per utterance from the per-frame posterior row.  XLA lowers
arbitrary gathers on TPU to a near-scalar path (~7 ns/element — measured
3.7 ms for [128, 4096] on v5e); this Pallas kernel instead uses the VPU's
intra-vreg ``dynamic_gather`` (via ``jnp.take_along_axis`` on lane-chunks)
and runs the same gather in ~0.02 ms.

The table is tiled into 128-lane chunks; each output block gathers from
every chunk and selects the in-range one — O(V/128) vector ops per output
vreg, all in VMEM.  Requires the table width to be a multiple of 128 (the
wrapper pads) and is TPU-only (falls back to an XLA flat gather elsewhere).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_LANES = 128


def _llg_kernel(tab_ref, idx_ref, out_ref, *, nb, nc):
    tab = tab_ref[:]
    B = tab.shape[0]
    for jb in range(nb):
        ib = idx_ref[:, jb * _LANES:(jb + 1) * _LANES]      # [B,128]
        acc = jnp.zeros((B, _LANES), tab.dtype)
        for c in range(nc):
            rel = ib - c * _LANES
            inb = (rel >= 0) & (rel < _LANES)
            g = jnp.take_along_axis(tab[:, c * _LANES:(c + 1) * _LANES],
                                    jnp.where(inb, rel, 0), axis=1)
            acc = jnp.where(inb, g, acc)
        out_ref[:, jb * _LANES:(jb + 1) * _LANES] = acc


@partial(jax.jit, static_argnums=(2,))
def _pallas_gather(table, idx, interpret: bool):
    from jax.experimental import pallas as pl
    B, V = table.shape
    N = idx.shape[1]
    # tile the batch so the per-call VMEM block (table + idx + out rows)
    # stays within scoped-vmem limits at any B (a 512-channel arena blew
    # the whole-array kernel at 23 MB scoped vmem)
    # Mosaic double-buffers each block, so budget ~2×block ≤ ~6 MB
    row_bytes = (V + 2 * N) * 4
    bb = max(8, min(B, 128, (3 << 20) // row_bytes // 8 * 8 or 8))
    if B % bb:
        pad = bb - B % bb
        table = jnp.pad(table, ((0, pad), (0, 0)))
        idx = jnp.pad(idx, ((0, pad), (0, 0)))
    Bp = table.shape[0]
    kernel = partial(_llg_kernel, nb=N // _LANES, nc=V // _LANES)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Bp, N), table.dtype),
        grid=(Bp // bb,),
        in_specs=[pl.BlockSpec((bb, V), lambda i: (i, 0)),
                  pl.BlockSpec((bb, N), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((bb, N), lambda i: (i, 0)),
        interpret=interpret,
    )(table, idx)
    return out[:B] if Bp != B else out


def _xla_gather(table, idx):
    B, V = table.shape
    row = jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0) * V
    return table.reshape(-1)[row + idx]


_BACKEND_IS_TPU: bool | None = None


def _on_tpu() -> bool:
    global _BACKEND_IS_TPU
    if _BACKEND_IS_TPU is None:
        try:
            d = jax.devices()[0]
            _BACKEND_IS_TPU = ("tpu" in d.platform.lower()
                               or "tpu" in getattr(d, "device_kind",
                                                   "").lower())
        except Exception:
            _BACKEND_IS_TPU = False
    return _BACKEND_IS_TPU


def batched_table_gather(table, idx, force: str | None = None):
    """``out[b, n] = table[b, idx[b, n]]`` — f32/i32 table [B, V],
    idx i32[B, N] with values in [0, V).

    ``force``: None = auto (Pallas on TPU, XLA elsewhere), "pallas",
    "interpret" (Pallas in interpreter mode, for tests), "xla".
    """
    mode = force or ("pallas" if _on_tpu() else "xla")
    if mode == "xla":
        return _xla_gather(table, idx)
    B, V = table.shape
    N = idx.shape[1]
    pv = (-V) % _LANES
    pn = (-N) % _LANES
    if pv:
        table = jnp.pad(table, ((0, 0), (0, pv)))
    if pn:
        idx = jnp.pad(idx, ((0, 0), (0, pn)))
    out = _pallas_gather(table, idx, mode == "interpret")
    return out[:, :N] if pn else out
