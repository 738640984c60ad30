"""Test configuration: run all tests on a virtual 8-device CPU platform.

Multi-device tests use the standard JAX fake-multi-device trick
(XLA_FLAGS=--xla_force_host_platform_device_count=8) since only one real
TPU chip is available; sharding semantics are platform-independent.
This must run before jax is imported anywhere.
"""

import os

os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

# this jax build hardcodes jax_platforms='axon,cpu' (ignores the env var):
# force the CPU backend explicitly so tests use the virtual 8-device mesh
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_default_matmul_precision', 'highest')
