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

import sys  # noqa: E402

import pytest  # noqa: E402

_REFERENCE = '/root/reference'


@pytest.fixture(autouse=True)
def _isolate_reference_imports():
    """Parity tests put /root/reference on sys.path to import the torch
    reference under its own top-level names (models, utils, ...). Strip
    the path and purge those cached modules after every test so later
    tests can't accidentally resolve OUR top-level packages (e.g.
    notebook_utils) to the reference's."""
    yield
    sys.path[:] = [p for p in sys.path
                   if p.rstrip('/') != _REFERENCE]
    for name, mod in list(sys.modules.items()):
        origin = getattr(mod, '__file__', None) or ''
        if not origin:
            paths = list(getattr(mod, '__path__', None) or [])
            origin = paths[0] if paths else ''
        if origin.startswith(_REFERENCE):
            del sys.modules[name]
