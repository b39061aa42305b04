"""Non-blocking checkpoint writes for the training step loop.

The reference saves checkpoints synchronously inside its train loops
(utils/checkpoints.py:12-21 called from trainer/forward_trainer.py:76-80
and trainer/taco_trainer.py), which stalls every step that hits
`checkpoint_every` for the full GPU->host copy plus disk write. On TPU
through a remote runtime the device->host fetch is the expensive part,
so this writer splits a save into:

  1. an on-device snapshot — ONE jitted identity copy of the pytree
     (fresh HBM buffers, a single dispatch). This is what makes the
     scheme safe with buffer donation: the step functions donate the
     TrainState (train/*_trainer.py, donate_argnums=(0,)), so the live
     state's buffers are invalidated by the *next* step. The snapshot
     buffers belong to nobody else and stay valid for as long as the
     writer needs them.
  2. the device->host fetch + serialization + atomic rename, all on a
     single background thread (utils/checkpoints.save_checkpoint — the
     same format, so readers are unaffected).

The step loop therefore pays one HBM copy dispatch per checkpoint
instead of a blocking multi-megabyte fetch.

Policy: at most ONE save in flight. `save()` first waits for the
previous save (bounds host+device memory to a single extra payload and
guarantees files appear in submission order, so `latest_model.fjax` is
always the newest accepted state). `wait()` drains the queue and
re-raises any background exception — trainers call it at session end
and on the preemption path so a checkpoint is never lost to process
exit.
"""
from __future__ import annotations

import threading
from concurrent.futures import Future, ThreadPoolExecutor
from typing import Any, Dict, Optional

import jax

from forwardtacotron_tpu.utils.checkpoints import save_checkpoint


@jax.jit
def _device_copy(tree):
    """Identity copy as ONE dispatched program: every leaf gets a fresh
    on-device buffer (immune to later donation of the originals)."""
    return jax.tree.map(lambda x: x.copy(), tree)


def _snapshot(tree):
    """On-device snapshot of a pytree; non-array leaves pass through."""
    arrays, treedef = jax.tree.flatten(tree)
    if not arrays:
        return tree
    copied = _device_copy(arrays)
    return jax.tree.unflatten(treedef, copied)


class AsyncCheckpointWriter:
    """Background checkpoint writer. One instance per trainer; thread
    count is 1 by design (ordering + bounded memory)."""

    def __init__(self) -> None:
        self._pool = ThreadPoolExecutor(
            max_workers=1, thread_name_prefix='ckpt-writer')
        self._inflight: Optional[Future] = None
        self._lock = threading.Lock()

    def save(self, variables: Dict[str, Any], config: Dict[str, Any],
             path, opt_state: Any = None, step: int = 0,
             backend: str = None, on_complete=None) -> None:
        """Snapshot on device and hand off to the writer thread.

        The snapshot (a ~1 ms dispatch) happens BEFORE draining any
        in-flight save, so back-to-back saves (latest_model + top-k at
        an epoch boundary) don't stall the caller for the previous
        fetch+write — at the cost of at most two payloads alive at
        once. Blocks only if a previous save is still running.

        `on_complete` (optional, zero-arg) runs ON THE WRITER THREAD
        strictly after this save's atomic rename succeeds — the hook
        for durability-ordered follow-ups (top-k prune + index write,
        TopKTracker) without stalling the step loop. It is skipped if
        the save fails (the failure surfaces via the next wait())."""
        snap_v = _snapshot(variables)
        snap_o = None if opt_state is None else _snapshot(opt_state)
        self.wait()  # <=1 in flight; re-raises prior failures

        def job():
            save_checkpoint(snap_v, config, path,
                            opt_state=snap_o, step=step, backend=backend)
            if on_complete is not None:
                on_complete()

        with self._lock:
            self._inflight = self._pool.submit(job)

    def wait(self) -> None:
        """Drain the in-flight save; re-raise its exception if it
        failed."""
        with self._lock:
            fut, self._inflight = self._inflight, None
        if fut is not None:
            fut.result()

    def close(self) -> None:
        self.wait()
        self._pool.shutdown(wait=True)
