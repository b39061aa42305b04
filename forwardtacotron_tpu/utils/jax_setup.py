"""Process-level JAX configuration for the CLI tools."""
from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    """Persistent XLA compilation cache: repeated CLI invocations (and the
    bucket ladder in preprocessing) skip recompiles across processes."""
    import jax
    cache_dir = path or os.environ.get(
        'FORWARDTACOTRON_TPU_CACHE',
        os.path.join(os.path.expanduser('~'), '.cache',
                     'forwardtacotron_tpu_xla'))
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update('jax_compilation_cache_dir', cache_dir)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass  # older jax without the knobs
