"""Test session config: run JAX on a virtual 8-device CPU mesh.

The TPU image pre-sets JAX_PLATFORMS=axon and a plugin imports jax before
conftest runs, so env vars alone don't stick — `jax.config.update` does,
as long as it happens before the backend is first used (backends
initialize lazily at first device access, which is after collection).
"""
import os

os.environ['JAX_PLATFORMS'] = 'cpu'
xla_flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in xla_flags:
    os.environ['XLA_FLAGS'] = (
        xla_flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
