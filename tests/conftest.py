"""Test session config: run JAX on a virtual 8-device CPU mesh.

Must set env vars before the first `import jax` anywhere in the test
session; pytest imports conftest.py before test modules, which guarantees
that ordering.
"""
import os

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
xla_flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in xla_flags:
    os.environ['XLA_FLAGS'] = (
        xla_flags + ' --xla_force_host_platform_device_count=8').strip()
