"""Shared training machinery: train state, optimizer, jitted step builders.

Replaces the reference's torch Adam + backward + clip loop
(trainer/forward_trainer.py:98-102) with optax inside a single jitted
step: loss + grads + global-norm clip + Adam update + BN stats update all
fuse into one XLA program. Learning rate is an injected hyperparameter so
the schedule sessions (lr, max_step, bs) reuse one compiled step.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from forwardtacotron_tpu.ops.masking import masked_l1


# ---------------------------------------------------------------------
# Graceful preemption (beyond the reference, which has no notion of it):
# production TPU jobs get SIGTERM'd on preemption/maintenance. Trainers
# poll `preempted()` once per step and, when set, save `latest_model`
# and return cleanly — the existing resume path (restore-if-exists +
# schedule skip) then continues the run on the next invocation.

_PREEMPT_EVENT = None


def install_preemption_handler(signals=None) -> None:
    """Install SIGTERM/SIGINT handlers that request a graceful stop.

    Idempotent; only effective in the main thread (signal module
    restriction) — elsewhere it's a no-op and `preempted()` stays
    False. Previous handlers are chained."""
    global _PREEMPT_EVENT
    import signal as _signal
    import threading
    if _PREEMPT_EVENT is not None:
        return
    if threading.current_thread() is not threading.main_thread():
        return
    event = threading.Event()
    if signals is None:
        signals = (_signal.SIGTERM, _signal.SIGINT)
    for sig in signals:
        prev = _signal.getsignal(sig)

        def _handler(signum, frame, _prev=prev):
            # Second SIGINT escalates to KeyboardInterrupt: the first
            # requests a graceful stop (finish step, save latest), but
            # the step loop only polls between steps — a run wedged
            # inside a long compile/device call must stay abortable.
            if event.is_set() and signum == _signal.SIGINT:
                raise KeyboardInterrupt
            event.set()
            # Chain a genuine user-installed handler, but NOT Python's
            # default SIGINT handler — that raises KeyboardInterrupt and
            # would abort the step loop before the graceful-save path
            # (preempted() -> break -> save latest) can run.
            if callable(_prev) and _prev not in (
                    _signal.SIG_IGN, _signal.SIG_DFL, _handler,
                    _signal.default_int_handler):
                _prev(signum, frame)

        try:
            _signal.signal(sig, _handler)
        except (ValueError, OSError):  # non-main thread / exotic env
            return
    _PREEMPT_EVENT = event


def preempted() -> bool:
    return _PREEMPT_EVENT is not None and _PREEMPT_EVENT.is_set()


def request_preemption() -> None:
    """Programmatic stop request (tests; cooperative schedulers)."""
    global _PREEMPT_EVENT
    import threading
    if _PREEMPT_EVENT is None:
        _PREEMPT_EVENT = threading.Event()
    _PREEMPT_EVENT.set()


def clear_preemption() -> None:
    if _PREEMPT_EVENT is not None:
        _PREEMPT_EVENT.clear()


class Averager:
    def __init__(self) -> None:
        self.count = 0
        self.val = 0.0

    def add(self, val: float) -> None:
        self.val += float(val)
        self.count += 1

    def reset(self) -> None:
        self.val, self.count = 0.0, 0

    def get(self) -> float:
        return self.val / self.count if self.count > 0 else 0.0


class TTSSession:
    def __init__(self, index: int, r: int, lr: float, max_step: int,
                 bs: int, train_set, val_set,
                 start_step: int = 0) -> None:
        self.index = index
        self.r = r
        self.lr = lr
        self.max_step = max_step
        self.bs = bs
        self.train_set = train_set
        self.val_set = val_set
        self.start_step = start_step
        self.val_sample = val_set.first_batch() if hasattr(
            val_set, 'first_batch') else None


class VocSession:
    def __init__(self, index: int, lr: float, max_step: int, bs: int,
                 train_set, val_set, val_set_samples,
                 start_step: int = 0) -> None:
        self.index = index
        self.lr = lr
        self.max_step = max_step
        self.bs = bs
        self.train_set = train_set
        self.val_set = val_set
        self.val_set_samples = val_set_samples
        self.start_step = start_step


class DeferredFlush:
    """One-iteration-late metric fetch for the async step loops.

    The trainers dispatch step k+1 BEFORE blocking on step k's device
    metrics, so host logging/TB IO overlaps device compute. This holds
    the single pending item and guarantees exactly-once flushing; the
    trainer supplies the flush function (which is what actually calls
    float() on the metrics and blocks)."""

    def __init__(self, flush_fn) -> None:
        self._fn = flush_fn
        self._pending = None

    def push(self, *item) -> None:
        """Flush the previous step's item (blocking on its device
        work), then hold this one."""
        if self._pending is not None:
            self._fn(*self._pending)
        self._pending = item

    def flush(self) -> None:
        """Drain the held item (loop exits, epoch boundaries)."""
        if self._pending is not None:
            self._fn(*self._pending)
            self._pending = None


def resume_position(current_step: int, session_start: int,
                    iters_per_epoch: int) -> Tuple[int, int]:
    """Mid-epoch exact resume: where in the session's data stream step
    `current_step` sits. Sessions always begin at a schedule boundary
    (`session_start` = the previous session's max_step) and every step
    consumes exactly one batch, so the (epoch, batch offset) a resumed
    run must continue from is a pure function of the step count — no
    extra checkpoint payload. Paired with the epoch-seeded batchers
    (data/dataset.py: BucketBatcher.epoch_plan / VocBatcher.epoch_plan)
    this makes interrupt+resume bit-identical to an uninterrupted run;
    the reference (trainer/forward_trainer.py) restarts epochs with a
    fresh shuffle on resume."""
    done = max(int(current_step) - int(session_start), 0)
    iters = max(int(iters_per_epoch), 1)
    return done // iters, done % iters


@struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray
    # Exponential moving average of params (beyond-reference; enabled by
    # training.ema_decay > 0). None = not tracked.
    ema_params: Any = None

    @property
    def variables(self) -> Dict[str, Any]:
        return {'params': self.params, 'batch_stats': self.batch_stats}

    @property
    def save_variables(self) -> Dict[str, Any]:
        """Checkpoint payload: raw params + BN stats (+ EMA weights
        when tracked, stored under 'ema_params')."""
        v = {'params': self.params, 'batch_stats': self.batch_stats}
        if self.ema_params is not None:
            v['ema_params'] = self.ema_params
        return v

    @property
    def eval_variables(self) -> Dict[str, Any]:
        """Weights for eval/synthesis: the EMA ones when tracked (the
        smoothed weights are the ones meant to be served), else raw."""
        params = self.params if self.ema_params is None else self.ema_params
        return {'params': params, 'batch_stats': self.batch_stats}


def half_dtype(train_cfg: Dict[str, Any]):
    """Mixed-precision selector: training.precision 'bf16' casts the
    forward/backward compute to bfloat16 (1.5x steps/s on v5e) while
    master params, Adam state, losses, and BatchNorm running stats stay
    f32. Default 'f32' is bit-compatible with the reference."""
    name = str(train_cfg.get('precision', 'f32')).lower()
    if name in ('bf16', 'bfloat16', 'mixed'):
        return jnp.bfloat16
    if name in ('f32', 'float32', 'fp32'):
        return None
    raise ValueError(f'Unknown training precision: {name}')


def cast_half(tree, dtype):
    """Cast float32 leaves to `dtype`; leave ints/other dtypes alone."""
    return jax.tree.map(
        lambda x: x.astype(dtype)
        if hasattr(x, 'dtype') and x.dtype == jnp.float32 else x, tree)


def cast_full(tree, half):
    return jax.tree.map(
        lambda x: x.astype(jnp.float32)
        if hasattr(x, 'dtype') and x.dtype == half else x, tree)


def make_optimizer(clip_grad_norm: Optional[float], lr: float = 1e-4
                   ) -> optax.GradientTransformation:
    """Global-norm clip + Adam (torch defaults), lr injectable."""
    adam = optax.inject_hyperparams(optax.adam)(learning_rate=lr)
    if clip_grad_norm is not None:
        return optax.chain(optax.clip_by_global_norm(float(clip_grad_norm)),
                           adam)
    return adam


def set_learning_rate(opt_state, lr: float):
    """Update the injected lr inside an optimizer state pytree."""
    def update(s):
        if hasattr(s, 'hyperparams') and 'learning_rate' in s.hyperparams:
            s.hyperparams['learning_rate'] = jnp.asarray(
                lr, dtype=s.hyperparams['learning_rate'].dtype)
        return s
    if isinstance(opt_state, tuple) and not hasattr(opt_state, 'hyperparams'):
        return tuple(update(s) for s in opt_state)
    return update(opt_state)


def init_train_state(model, optimizer, example_batch, rng,
                     step: int = 0, init_kwargs: Optional[Dict] = None,
                     with_ema: bool = False) -> TrainState:
    variables = model.init({'params': rng, 'dropout': rng}, example_batch,
                           **(init_kwargs or {}))
    params = variables['params']
    batch_stats = variables.get('batch_stats', {})
    opt_state = optimizer.init(params)
    # EMA seeds as a COPY of params: aliasing the same buffers would
    # make the donated train step see one buffer donated twice
    ema = jax.tree.map(jnp.array, params) if with_ema else None
    return TrainState(params=params, batch_stats=batch_stats,
                      opt_state=opt_state, step=jnp.asarray(step, jnp.int32),
                      ema_params=ema)


def ema_update(ema, params, decay: float):
    """ema <- decay * ema + (1 - decay) * params, leafwise."""
    return jax.tree.map(lambda e, p: decay * e + (1.0 - decay) * p,
                        ema, params)


def forward_loss(pred: Dict[str, jnp.ndarray], batch: Dict[str, jnp.ndarray],
                 pitch_target: jnp.ndarray, energy_target: jnp.ndarray,
                 train_cfg: Dict[str, Any]) -> Tuple[jnp.ndarray, Dict]:
    """ForwardTacotron/FastPitch loss (forward_trainer.py:86-96)."""
    m1 = masked_l1(pred['mel'], batch['mel'], batch['mel_len'])
    m2 = masked_l1(pred['mel_post'], batch['mel'], batch['mel_len'])
    dur_loss = masked_l1(pred['dur'], batch['dur'], batch['x_len'])
    pitch_loss = masked_l1(pred['pitch'], pitch_target, batch['x_len'])
    energy_loss = masked_l1(pred['energy'], energy_target, batch['x_len'])
    loss = (m1 + m2
            + train_cfg['dur_loss_factor'] * dur_loss
            + train_cfg['pitch_loss_factor'] * pitch_loss
            + train_cfg['energy_loss_factor'] * energy_loss)
    metrics = {'loss': loss, 'mel_loss': m1 + m2, 'dur_loss': dur_loss,
               'pitch_loss': pitch_loss, 'energy_loss': energy_loss}
    return loss, metrics


def build_forward_train_step(model, optimizer,
                             train_cfg: Dict[str, Any]) -> Callable:
    """One fused training step for ForwardTacotron/FastPitch.

    Includes the pitch/energy zoneout input masking
    (forward_trainer.py:76-82) driven by the step rng.
    """
    pitch_zoneout = float(train_cfg.get('pitch_zoneout', 0.0))
    energy_zoneout = float(train_cfg.get('energy_zoneout', 0.0))
    ema_decay = float(train_cfg.get('ema_decay', 0.0) or 0.0)
    half = half_dtype(train_cfg)
    accum = int(train_cfg.get('grad_accum', 1) or 1)
    remat = bool(train_cfg.get('remat', False))

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray],
                   rng: jax.Array) -> Tuple[TrainState, Dict]:
        zo_rng, dropout_rng = jax.random.split(rng)
        pitch_target = batch['pitch']
        energy_target = batch['energy']
        if pitch_zoneout > 0 or energy_zoneout > 0:
            k1, k2 = jax.random.split(zo_rng)
            pitch_mask = (jax.random.uniform(k1, batch['x'].shape)
                          > pitch_zoneout).astype(jnp.float32)
            energy_mask = (jax.random.uniform(k2, batch['x'].shape)
                           > energy_zoneout).astype(jnp.float32)
            batch = dict(batch, pitch=batch['pitch'] * pitch_mask,
                         energy=batch['energy'] * energy_mask)

        def apply_model(p, stats, b, drng):
            return model.apply(
                {'params': p, 'batch_stats': stats},
                b, train=True, mutable=['batch_stats'],
                rngs={'dropout': drng})
        if remat:
            # rematerialize activations in the backward pass: trades
            # FLOPs for HBM so longer utterances / bigger buckets fit
            apply_model = jax.checkpoint(apply_model)

        def loss_fn(params, stats, b, pt, et, drng):
            # bf16 compute when configured: params/inputs cast at the
            # boundary (grads flow back to f32 masters through the
            # casts); batch_stats stay f32 so BN momentum updates keep
            # full precision; losses computed on f32 targets
            p = cast_half(params, half) if half else params
            bb = cast_half(b, half) if half else b
            pred, mutated = apply_model(p, stats, bb, drng)
            if half:
                pred = cast_full(pred, half)
            loss, metrics = forward_loss(pred, b, pt, et, train_cfg)
            new_stats = mutated['batch_stats']
            if half:
                new_stats = cast_full(new_stats, half)
            return loss, (metrics, new_stats)

        grad_fn = jax.grad(loss_fn, has_aux=True)
        if accum <= 1:
            grads, (metrics, new_stats) = grad_fn(
                state.params, state.batch_stats, batch, pitch_target,
                energy_target, dropout_rng)
        else:
            # gradient accumulation: scan over `accum` micro-batches
            # (leading-axis split of the batch), averaging grads into
            # ONE optimizer update; BN stats update sequentially
            B = batch['x'].shape[0]
            assert B % accum == 0, \
                f'batch size {B} not divisible by grad_accum={accum}'

            def micro(leaf):
                return leaf.reshape((accum, B // accum) + leaf.shape[1:])
            micro_batches = jax.tree.map(micro, batch)
            micro_pt = micro(pitch_target)
            micro_et = micro(energy_target)
            micro_rngs = jax.random.split(dropout_rng, accum)

            def body(carry, xs):
                grads_acc, stats = carry
                mb, pt, et, drng = xs
                g, (m, stats) = grad_fn(state.params, stats, mb, pt, et,
                                        drng)
                grads_acc = jax.tree.map(jnp.add, grads_acc, g)
                return (grads_acc, stats), m

            zero_grads = jax.tree.map(jnp.zeros_like, state.params)
            (grads, new_stats), ms = jax.lax.scan(
                body, (zero_grads, state.batch_stats),
                (micro_batches, micro_pt, micro_et, micro_rngs))
            grads = jax.tree.map(lambda g: g / accum, grads)
            metrics = jax.tree.map(lambda m: jnp.mean(m, axis=0), ms)
        updates, new_opt_state = optimizer.update(grads, state.opt_state,
                                                  state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_ema = state.ema_params
        if ema_decay > 0 and state.ema_params is not None:
            new_ema = ema_update(state.ema_params, new_params, ema_decay)
        new_state = TrainState(params=new_params, batch_stats=new_stats,
                               opt_state=new_opt_state,
                               step=state.step + 1, ema_params=new_ema)
        metrics['grad_norm'] = optax.global_norm(grads)
        return new_state, metrics

    return train_step


def build_forward_eval_step(model, train_cfg: Dict[str, Any]) -> Callable:
    @jax.jit
    def eval_step(variables, batch):
        pred = model.apply(variables, batch, train=False)
        _, metrics = forward_loss(pred, batch, batch['pitch'],
                                  batch['energy'], train_cfg)
        return metrics
    return eval_step


class TopKTracker:
    """Keep the k best checkpoints by score (lower = better) with
    on-disk pruning — the reference tracks top-k only for the vocoder
    (voc_trainer.py:204-226); this generalizes it to any trainer.
    Persists its index to `<directory>/top_k.pkl` so resumes continue
    the same leaderboard."""

    def __init__(self, directory, k: int, prefix: str,
                 ckpt_writer=None) -> None:
        from pathlib import Path
        from forwardtacotron_tpu.utils.files import unpickle_binary
        self.directory = Path(directory)
        self.k = int(k)
        self.prefix = prefix
        # optional AsyncCheckpointWriter: top-k payloads can be hundreds
        # of MB; saving them synchronously stalls every improving epoch
        # boundary for the device->host fetch (utils/async_ckpt.py)
        self.ckpt_writer = ckpt_writer
        self.index_path = self.directory / 'top_k.pkl'
        self.entries = []  # [(score, step, filename)]
        if self.index_path.exists():
            self.entries = unpickle_binary(self.index_path)

    def update(self, score: float, variables, config, opt_state,
               step: int) -> bool:
        """Offer a checkpoint; saves + prunes if it makes the top k.
        Returns True if it was kept."""
        import os
        from forwardtacotron_tpu.utils.checkpoints import save_checkpoint
        from forwardtacotron_tpu.utils.files import pickle_binary
        if self.k <= 0:
            return False
        if len(self.entries) >= self.k \
                and score >= max(e[0] for e in self.entries):
            return False
        name = f'{self.prefix}_step{step}_score{score:.5f}.fjax'
        # Update the in-memory leaderboard synchronously (later update()
        # calls must see it); exact-resume replay (resume_position) can
        # re-offer the same epoch boundary: replace, never duplicate.
        new_entries = [e for e in self.entries if e[2] != name]
        new_entries.append((float(score), int(step), name))
        new_entries.sort(key=lambda e: e[0])
        pruned = [old for _, _, old in new_entries[self.k:]]
        self.entries = new_entries[:self.k]
        kept = list(self.entries)
        directory, index_path = self.directory, self.index_path

        def finalize():
            # Prune + index persistence. Crash-safety invariant: the
            # index must never reference a file that was never written,
            # so this runs strictly AFTER the new checkpoint's atomic
            # rename — on the (single, ordered) writer thread in the
            # async path, inline in the sync path. The step loop never
            # blocks on the fetch+serialize either way. `kept` is
            # re-filtered against the disk because an EARLIER async
            # save may have failed after its update() mutated the
            # leaderboard — its phantom name must never reach the
            # index (this save's own file exists: finalize runs after
            # its rename).
            for old in pruned:
                try:
                    os.remove(directory / old)
                except OSError:
                    pass
            pickle_binary([e for e in kept
                           if (directory / e[2]).exists()], index_path)

        if self.ckpt_writer is not None:
            try:
                self.ckpt_writer.save(variables, config,
                                      self.directory / name,
                                      opt_state=opt_state, step=step,
                                      on_complete=finalize)
            except Exception:
                # save() drains the previous save first and re-raises
                # its failure — which means that earlier update()'s
                # entry (and possibly this one's: never submitted)
                # references a file that never landed. Drop every
                # leaderboard entry with no file on disk so a caller
                # that catches and retries can't persist a phantom.
                self.entries = [e for e in self.entries
                                if (self.directory / e[2]).exists()]
                raise
        else:
            save_checkpoint(variables, config, self.directory / name,
                            opt_state=opt_state, step=step)
            finalize()
        return True
