"""Neural-aligner trainer (teacher-free duration extraction).

Beyond the reference: there, durations require training the AR Tacotron
teacher for its full schedule (reference train_tacotron.py) before
`train_forward.py` can run. This trainer fits the non-autoregressive
`align/aligner.py` model with the monotonic forward-sum loss — minutes
of training instead of the teacher's tens of thousands of AR steps —
and then writes the exact same on-disk artifacts (`alg/*.npy`,
`att_score_dict.pkl`, `phon_pitch/`, `phon_energy/`), so everything
downstream (dataset filtering, the forward trainer, gen CLIs) is
untouched.

The whole optimization step is one jitted XLA program; batches come
from the same static-shape bucket batcher as the teacher
(data/dataset.py, model_type='tacotron'), so each bucket compiles
once. Sharding over a device mesh works like every other trainer here:
batch over 'data', wide matrices over 'model' (parallel/mesh.py).
"""
from __future__ import annotations

import time
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from forwardtacotron_tpu.align.aligner import (aligner_from_config,
                                               build_align_extract_step,
                                               forward_sum_loss)
from forwardtacotron_tpu.data.dataset import Prefetcher, get_tts_datasets
from forwardtacotron_tpu.train import common as tc
from forwardtacotron_tpu.utils.display import simple_table, stream
from forwardtacotron_tpu.utils.files import parse_schedule
from forwardtacotron_tpu.utils.paths import Paths


def build_aligner_train_step(model, optimizer) -> Callable:

    def train_step(state: tc.TrainState, batch: Dict[str, jnp.ndarray],
                   rng: jax.Array) -> Tuple[tc.TrainState, Dict]:
        def loss_fn(params):
            log_att = model.apply(
                {'params': params}, batch['x'], batch['mel'],
                batch['x_len'], batch['mel_len'], train=True,
                rngs={'dropout': jax.random.fold_in(rng, state.step)})
            return forward_sum_loss(log_att, batch['x_len'],
                                    batch['mel_len'])

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, new_opt = optimizer.update(grads, state.opt_state,
                                            state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = tc.TrainState(params=new_params, batch_stats={},
                                  opt_state=new_opt,
                                  step=state.step + 1)
        return new_state, {'loss': loss}

    return train_step


def build_aligner_eval_step(model) -> Callable:
    @jax.jit
    def eval_step(variables, batch):
        log_att = model.apply(variables, batch['x'], batch['mel'],
                              batch['x_len'], batch['mel_len'],
                              train=False)
        return forward_sum_loss(log_att, batch['x_len'],
                                batch['mel_len'])
    return eval_step


def _to_device(batch: Dict[str, Any]) -> Dict[str, jnp.ndarray]:
    return {k: jnp.asarray(v) for k, v in batch.items()
            if isinstance(v, np.ndarray)}


class AlignerTrainer:

    def __init__(self, paths: Paths, config: Dict[str, Any],
                 writer=None, mesh=None) -> None:
        self.paths = paths
        self.config = config
        self.train_cfg = config.get('aligner', {}).get('training', {})
        self._writer = writer
        # multi-device: batch over 'data', wide weights over 'model'
        # (GSPMD; parallel/mesh.py) — same contract as the other
        # trainers. None = single device.
        self.mesh = mesh
        if self.mesh is None and len(jax.devices()) > 1:
            from forwardtacotron_tpu.parallel.mesh import mesh_from_config
            self.mesh = mesh_from_config(config)
        # background checkpoint writes (utils/async_ckpt.py)
        from forwardtacotron_tpu.utils.async_ckpt import \
            AsyncCheckpointWriter
        self._ckpt = AsyncCheckpointWriter()

    def _shard_state(self, state: tc.TrainState) -> tc.TrainState:
        from forwardtacotron_tpu.parallel import mesh as pmesh
        return jax.device_put(state, pmesh.state_shardings(self.mesh,
                                                           state))

    def _shard_batch(self, batch: Dict[str, Any]) -> Dict[str, Any]:
        arrays = _to_device(batch)
        if self.mesh is None:
            return arrays
        from forwardtacotron_tpu.parallel.distributed import (
            host_local_batch_to_global)
        return host_local_batch_to_global(
            self.mesh, {k: np.asarray(v) for k, v in arrays.items()})

    @property
    def writer(self):
        if self._writer is None:
            from tensorboardX import SummaryWriter
            self._writer = SummaryWriter(
                log_dir=str(self.paths.aligner_log))
        return self._writer

    def train(self, model, state: Optional[tc.TrainState] = None,
              seed: int = 42,
              max_steps_override: Optional[int] = None) -> tc.TrainState:
        optimizer = tc.make_optimizer(
            self.train_cfg.get('clip_grad_norm', 1.0))
        schedule = parse_schedule(self.train_cfg.get(
            'schedule', ['1e-3, 10_000, 32']))
        rng = jax.random.PRNGKey(seed)
        tc.install_preemption_handler()

        session_start = 0
        for i, (lr, max_step, bs) in enumerate(schedule, 1):
            prev_max, session_start = session_start, max_step
            if tc.preempted():
                break
            if max_steps_override is not None:
                max_step = min(max_step, max_steps_override)
            current = 0 if state is None else int(state.step)
            if current >= max_step:
                continue
            train_set, val_set = get_tts_datasets(
                path=self.paths.data, batch_size=bs, r=1,
                model_type='tacotron',
                max_mel_len=self.train_cfg.get('max_mel_len', 1250))
            if state is None:
                example = _to_device(next(iter(train_set)))
                variables = model.init(
                    {'params': rng, 'dropout': rng}, example['x'],
                    example['mel'], example['x_len'],
                    example['mel_len'], train=True)
                state = tc.TrainState(
                    params=variables['params'], batch_stats={},
                    opt_state=optimizer.init(variables['params']),
                    step=jnp.asarray(0, jnp.int32))
            if self.mesh is not None:
                state = self._shard_state(state)
            simple_table([('Session', i), ('lr', lr),
                          ('max_step', max_step), ('batch_size', bs),
                          ('batches/epoch', len(train_set))])
            state = self._session(model, optimizer, state, lr,
                                  max_step, train_set, val_set, rng,
                                  session_start=prev_max)
        return state

    def _session(self, model, optimizer, state, lr, max_step,
                 train_set, val_set, rng,
                 session_start: int = 0) -> tc.TrainState:
        train_step = jax.jit(build_aligner_train_step(model, optimizer),
                             donate_argnums=(0,))
        eval_step = build_aligner_eval_step(model)
        state = tc.TrainState(
            params=state.params, batch_stats={},
            opt_state=tc.set_learning_rate(state.opt_state, lr),
            step=state.step)
        avg, t0 = tc.Averager(), time.time()
        ckpt_every = int(self.train_cfg.get('checkpoint_every', 10_000))
        # async step loop: host-side counter + one-iteration-late metric
        # fetch (same scheme as forward_trainer.train_session)
        step = int(state.step)

        def flush_metrics(metrics, pstep) -> None:
            nonlocal t0
            avg.add(float(metrics['loss']))  # blocks on that step
            if pstep % 10 == 0:
                sps = 10 / max(time.time() - t0, 1e-9)
                t0 = time.time()
                stream(f'| Aligner step {pstep}/{max_step} '
                       f'loss {avg.get():.4f} {sps:.1f} steps/s ')
                self.writer.add_scalar('aligner/loss',
                                       avg.get(), pstep)
                avg.reset()

        deferred = tc.DeferredFlush(flush_metrics)

        while step < max_step and not tc.preempted():
            # mid-epoch exact resume (common.py: resume_position)
            epoch, start = tc.resume_position(step, session_start,
                                              len(train_set))
            batches = train_set.batches(epoch, start) \
                if hasattr(train_set, 'batches') else train_set
            for batch in Prefetcher(batches):
                state, metrics = train_step(state,
                                            self._shard_batch(batch),
                                            rng)
                step += 1
                deferred.push(metrics, step)
                if step % ckpt_every == 0 or step >= max_step:
                    val = self._evaluate(eval_step, state, val_set)
                    self.writer.add_scalar('aligner/val_loss', val, step)
                    self._ckpt.save(
                        state.variables, self.config,
                        self.paths.aligner_checkpoints
                        / 'latest_model.fjax',
                        opt_state=state.opt_state, step=step)
                if step >= max_step or tc.preempted():
                    break
        deferred.flush()
        self._ckpt.wait()  # checkpoint durable before the session returns
        return state

    def _evaluate(self, eval_step, state, val_set) -> float:
        losses = [float(eval_step(state.variables, _to_device(b)))
                  for b in val_set]
        return float(np.mean(losses)) if losses else float('nan')


def create_align_features_from_aligner(model, state, train_set, val_set,
                                       paths: Paths,
                                       config: Dict[str, Any],
                                       pitch_max_freq: float) -> None:
    """Aligner-path analog of align/features.py:create_align_features:
    durations from on-device Viterbi (no host DP at all), attention
    scores from the soft posterior, then the shared phoneme
    pitch/energy averaging. Output artifacts are byte-compatible with
    the teacher path."""
    from forwardtacotron_tpu.align.features import extract_pitch_energy
    from forwardtacotron_tpu.align.metrics import attention_score
    from forwardtacotron_tpu.utils.display import progbar
    from forwardtacotron_tpu.utils.files import pickle_binary

    extract = build_align_extract_step(model)
    att_score_dict = {}
    iters = len(train_set) + len(val_set)
    i = 0
    for batcher in (train_set, val_set):
        for batch in batcher:
            dev = _to_device(batch)
            durs, att = extract(state.variables, dev['x'], dev['mel'],
                                dev['x_len'], dev['mel_len'])
            align_scores, sharp_scores = attention_score(
                att, dev['mel_len'], r=1)
            durs = np.asarray(durs)
            n_real = batch.get('n_real', durs.shape[0])
            for j in range(n_real):
                item_id = batch['item_id'][j]
                x_len = int(batch['x_len'][j])
                mel_len = int(batch['mel_len'][j])
                d = durs[j, :x_len]
                if int(d.sum()) != mel_len:
                    print(f'WARNING: Sum of durations did not match mel '
                          f'length for item {item_id}!')
                att_score_dict[item_id] = (float(align_scores[j]),
                                           float(sharp_scores[j]))
                np.save(str(paths.alg / f'{item_id}.npy'),
                        d.astype(np.int32), allow_pickle=False)
            i += 1
            stream(f'{progbar(i, iters)} {i}/{iters} Batches ')

    pickle_binary(att_score_dict, paths.data / 'att_score_dict.pkl')
    print('\nExtracting Pitch Values...')
    extract_pitch_energy(paths, save_path_pitch=paths.phon_pitch,
                         save_path_energy=paths.phon_energy,
                         pitch_max_freq=pitch_max_freq)
