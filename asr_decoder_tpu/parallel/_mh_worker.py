"""Worker process for the real multi-process jax.distributed selftest.

Run as ``python -m asr_decoder_tpu.parallel._mh_worker <coordinator>
<num_processes> <process_id>``: joins the coordinator on CPU devices,
builds the cross-host global mesh, runs a tp-sharded AM forward over a
dp-sharded global batch, and checks this process's addressable shards
against the locally-computed unsharded reference.  Prints ``MH_OK`` on
success (the spawner greps for it).

This is the only code path where ``jax.distributed.initialize`` actually
executes (BASELINE config 5's cross-host mesh; everything else in
``multihost.py`` runs per-host arenas that need no distributed init).
"""

from __future__ import annotations

import os
import sys


def main(coordinator: str, num_processes: int, process_id: int,
         local_devices: int = 4) -> None:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={local_devices}").strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from asr_decoder_tpu.models.layers import (init_layer_state, make_affine,
                                               make_lstm_projected)
    from asr_decoder_tpu.models.nnet import am_forward
    from asr_decoder_tpu.parallel.mesh import shard_model
    from asr_decoder_tpu.parallel.multihost import global_mesh, init_multihost

    ctx = init_multihost(coordinator_address=coordinator,
                         num_processes=num_processes, process_id=process_id)
    assert jax.process_count() == num_processes
    assert len(jax.devices()) == num_processes * local_devices

    key = jax.random.PRNGKey(0)              # same seed on every process
    k1, k2 = jax.random.split(key)
    D, H, P_, V = 16, 32, 24, 40
    layers = [make_lstm_projected(k1, D, H, P_),
              make_affine(k2, P_, V)]
    rng = np.random.default_rng(0)
    B, T = 8, 12
    feats = (rng.standard_normal((B, T, D)) * 2).astype(np.float32)
    state = [init_layer_state(l, B) for l in layers]

    # local unsharded reference (every process computes the same thing)
    ll0, _ = am_forward(layers, jnp.asarray(feats), state)
    ll0 = np.asarray(ll0)

    mesh = global_mesh(ctx, tp=2)            # dp=(2*4)/2 x tp=2
    from jax.sharding import NamedSharding, PartitionSpec as P

    def make_global(arr, spec):
        sh = NamedSharding(mesh, spec)
        return jax.make_array_from_callback(
            arr.shape, sh, lambda idx: arr[idx])

    with mesh:
        sh_layers = shard_model(mesh, layers)
        feats_g = make_global(feats, P("dp", None, None))
        state_g = [jax.tree.map(
            lambda a: make_global(np.asarray(a),
                                  P("dp", *([None] * (a.ndim - 1)))), s)
            for s in state]
        ll1, _ = am_forward(sh_layers, feats_g, state_g)

    # compare this process's addressable shards to the reference slices
    for shard in ll1.addressable_shards:
        got = np.asarray(shard.data)
        want = ll0[shard.index]
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    # a cross-process consistency check: a computation over the GLOBAL
    # sharded array (runs a collective under the hood on every process)
    tot = float(jnp.sum(jnp.isfinite(ll1).astype(jnp.float32)))
    want_tot = float(np.isfinite(ll0).sum())
    assert tot == want_tot, (tot, want_tot)
    print(f"MH_OK process={process_id}/{num_processes} "
          f"devices={len(jax.devices())} shards="
          f"{len(ll1.addressable_shards)}", flush=True)


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]), int(sys.argv[3]))
