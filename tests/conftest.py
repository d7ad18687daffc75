"""Test harness: force an 8-virtual-device CPU platform so sharding tests run
hermetically without TPU hardware (bench.py, not tests, uses the real chip).

Note: the environment's sitecustomize registers the `axon` TPU-tunnel backend
and calls jax.config.update("jax_platforms", "axon,cpu"), which overrides the
JAX_PLATFORMS env var — so we must override the config, not just the env.
Set ASR_TPU_TESTS=1 to run the suite against the real chip instead.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

if not os.environ.get("ASR_TPU_TESTS"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

    # persistent XLA compilation cache: the suite is compile-dominated
    # (large jitted search/session programs); repeat runs hit the cache
    # and skip recompiles entirely
    try:
        cache_dir = os.path.join(os.path.dirname(__file__), "..",
                                 ".pytest_cache", "jax_cache")
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running test (multi-process, big graphs)")
