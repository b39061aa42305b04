"""Multi-host (DCN) scaling utilities.

The reference is single-process/single-device (SURVEY.md §2.2-2.3);
single-host multi-chip scaling here is pure GSPMD (parallel/mesh.py).
This module adds the multi-host layer on top:

- `maybe_initialize()` brings up the JAX distributed runtime when a
  coordinator is configured (TPU pods auto-detect; elsewhere the
  standard JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
  JAX_PROCESS_ID env vars are honored);
- `host_local_batch_to_global()` assembles a globally-sharded batch
  from each host's local shard via
  jax.make_array_from_process_local_data, so the training step's
  in_shardings see one logical array spanning the pod while every
  host only materializes its own rows;
- `process_slice()` gives each host its deterministic row range of a
  global batch (the BucketBatcher is seed-deterministic, so every
  host computes identical global batches and takes its slice — no
  data service needed at this scale).

Single-process runs pass through unchanged (the global array is just
device_put), so the trainer uses one code path everywhere.
"""
from __future__ import annotations

import os
from typing import Any, Dict

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_initialize(config: Dict[str, Any] = None) -> bool:
    """Initialize jax.distributed when a multi-host run is configured.
    Returns True if the distributed runtime is (already) up.

    Must not touch the XLA backend before jax.distributed.initialize
    (jax.process_count() would initialize it and make initialize()
    illegal), so the already-up check inspects the distributed client
    directly.
    """
    try:
        from jax._src import distributed as _dist
        if getattr(_dist.global_state, 'client', None) is not None:
            return True
    except (ImportError, AttributeError):  # private layout changed
        if jax.process_count() > 1:
            return True
    cfg = (config or {}).get('tpu', {})
    want = bool(cfg.get('multihost')) \
        or os.environ.get('JAX_COORDINATOR_ADDRESS') \
        or os.environ.get('COORDINATOR_ADDRESS')
    if not want:
        return False
    kwargs = {}
    addr = os.environ.get('JAX_COORDINATOR_ADDRESS') \
        or os.environ.get('COORDINATOR_ADDRESS')
    if addr:
        kwargs['coordinator_address'] = addr
    if os.environ.get('JAX_NUM_PROCESSES'):
        kwargs['num_processes'] = int(os.environ['JAX_NUM_PROCESSES'])
    if os.environ.get('JAX_PROCESS_ID'):
        kwargs['process_id'] = int(os.environ['JAX_PROCESS_ID'])
    jax.distributed.initialize(**kwargs)
    return True


def process_slice(global_batch_size: int) -> slice:
    """This host's deterministic row range of a global batch."""
    n = jax.process_count()
    idx = jax.process_index()
    per = global_batch_size // n
    if per * n != global_batch_size:
        raise ValueError(f'global batch {global_batch_size} not divisible '
                         f'by {n} processes')
    return slice(idx * per, (idx + 1) * per)


def host_local_batch_to_global(mesh: Mesh, global_batch: Dict[str, Any],
                               shardings: Dict[str, Any] = None
                               ) -> Dict[str, Any]:
    """Turn per-host batch rows into globally-sharded jax.Arrays.

    `global_batch` holds the full logical batch (numpy) — each host
    passes the same values (seed-deterministic batcher) and only its
    process_slice() rows are actually uploaded. With one process this
    reduces to device_put with the batch sharding.
    """
    from forwardtacotron_tpu.parallel.mesh import batch_shardings
    if shardings is None:
        shardings = batch_shardings(mesh, global_batch)
    n = jax.process_count()
    out = {}
    for k, v in global_batch.items():
        sh = shardings[k]
        v = np.asarray(v)
        if n == 1 or v.ndim == 0 or v.shape[0] % n != 0 \
                or sh.spec == P():
            out[k] = jax.device_put(v, sh)
            continue
        local = v[process_slice(v.shape[0])]
        out[k] = jax.make_array_from_process_local_data(sh, local)
    return out
