'''
Test configuration: all tests run on a virtual 8-device CPU platform so that
multi-chip sharding semantics (pjit / shard_map over a Mesh) are exercised without
TPU hardware.

Note: this environment force-registers a TPU ('axon') PJRT plugin via sitecustomize and
exports JAX_PLATFORMS=axon, so we must override the platform *in-process* before any
backend initializes; otherwise tests run on the single TPU chip and each process hangs
~100 s at exit on tunnel teardown.
'''

import os

flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    flags = (flags + ' --xla_force_host_platform_device_count=8').strip()
if '--xla_backend_optimization_level' not in flags:
    # Tests are compile-dominated (1-CPU host, tiny tensors): skipping XLA's
    # backend optimization pipeline roughly halves suite wall-clock with
    # identical results (execution time is negligible at test scales).
    flags = (flags + ' --xla_backend_optimization_level=0').strip()
os.environ['XLA_FLAGS'] = flags
os.environ['JAX_PLATFORMS'] = 'cpu'
os.environ.setdefault('JAX_ENABLE_X64', '0')

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

# NO persistent compilation cache for the CPU suite (round 5, measured): the
# XLA:CPU AOT loader stamps tuning pseudo-features (+prefer-no-scatter/gather)
# into every cache entry and then rejects them against the RAW host feature
# list on load — even a same-host round-trip fails, so every lookup pays a
# failed deserialize plus a multi-KB E-log line and then recompiles anyway.
# Opt into a cache dir explicitly via O4D_TEST_CACHE if a future jax release
# fixes the loader.
_cache_dir = os.environ.get('O4D_TEST_CACHE')
if _cache_dir:
    os.makedirs(_cache_dir, exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', _cache_dir)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
    jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)
