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
    os.environ['XLA_FLAGS'] = (flags + ' --xla_force_host_platform_device_count=8').strip()
os.environ['JAX_PLATFORMS'] = 'cpu'
os.environ.setdefault('JAX_ENABLE_X64', '0')

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
