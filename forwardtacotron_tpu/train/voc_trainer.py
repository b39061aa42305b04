"""WaveRNN vocoder trainer.

Parity surface: trainer/voc_trainer.py — (lr, step, bs) schedule,
cross-entropy (RAW) or discretized-MOL loss, periodic sample generation
scored by mel-L1 of the regenerated audio, top-k model retention with
on-disk pruning. The training step is one jitted XLA program; sample
generation uses the scan sampler (models/wavernn.py).
"""
from __future__ import annotations

import time
from typing import Any, Callable, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from forwardtacotron_tpu.data.dataset import Prefetcher, get_vocoder_datasets
from forwardtacotron_tpu.models.wavernn import WaveRNN, generate_wav
from forwardtacotron_tpu.ops.mol import discretized_mix_logistic_loss
from forwardtacotron_tpu.train import common as tc
from forwardtacotron_tpu.utils.decorators import ignore_exception
from forwardtacotron_tpu.utils.display import (log_audio, simple_table,
                                               stream)
from forwardtacotron_tpu.utils.files import parse_schedule
from forwardtacotron_tpu.utils.paths import Paths


def build_voc_train_step(model: WaveRNN, optimizer, mode: str,
                         train_cfg: Dict[str, Any] = None) -> Callable:
    half = tc.half_dtype(train_cfg or {})

    def apply_model(p, stats, x, mel):
        return model.apply({'params': p, 'batch_stats': stats},
                           x, mel, train=True, mutable=['batch_stats'])
    if (train_cfg or {}).get('remat'):
        # the teacher-forced GRU holds per-sample activations over the
        # whole seq_len window for backward; remat trades that HBM for
        # a forward recompute (longer windows / bigger batches)
        apply_model = jax.checkpoint(apply_model)

    def train_step(state: tc.TrainState, batch: Dict[str, jnp.ndarray]
                   ) -> Tuple[tc.TrainState, Dict]:
        def loss_fn(params):
            p = tc.cast_half(params, half) if half else params
            x = batch['x'].astype(half) if half else batch['x']
            mel = batch['mel'].astype(half) if half else batch['mel']
            logits, mutated = apply_model(p, state.batch_stats, x, mel)
            if half:
                logits = logits.astype(jnp.float32)
            if mode == 'RAW':
                loss = jnp.mean(
                    optax.softmax_cross_entropy_with_integer_labels(
                        logits, batch['y'].astype(jnp.int32)))
            else:
                loss = discretized_mix_logistic_loss(logits, batch['y'])
            new_stats = mutated['batch_stats']
            if half:
                new_stats = tc.cast_full(new_stats, half)
            return loss, new_stats

        (loss_val, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt_state = optimizer.update(grads, state.opt_state,
                                                  state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = tc.TrainState(params=new_params, batch_stats=new_stats,
                                  opt_state=new_opt_state,
                                  step=state.step + 1)
        return new_state, {'loss': loss_val}

    return jax.jit(train_step, donate_argnums=(0,))


def build_voc_eval_step(model: WaveRNN, mode: str) -> Callable:
    @jax.jit
    def eval_step(variables, batch):
        logits = model.apply(variables, batch['x'], batch['mel'],
                             train=False)
        if mode == 'RAW':
            return jnp.mean(
                optax.softmax_cross_entropy_with_integer_labels(
                    logits, batch['y'].astype(jnp.int32)))
        return discretized_mix_logistic_loss(logits, batch['y'])
    return eval_step


def _to_jnp(batch: Dict[str, Any]) -> Dict[str, jnp.ndarray]:
    return {k: jnp.asarray(v) for k, v in batch.items()
            if isinstance(v, np.ndarray)}


class VocTrainer:

    def __init__(self, paths: Paths, dsp, config: Dict[str, Any],
                 writer=None, mesh=None) -> None:
        self.paths = paths
        self.dsp = dsp
        self.config = config
        self.train_cfg = config['vocoder']['training']
        self._writer = writer
        from forwardtacotron_tpu.utils.profiling import StepTraceController
        self._tracer = StepTraceController()
        # background checkpoint writes (utils/async_ckpt.py)
        from forwardtacotron_tpu.utils.async_ckpt import \
            AsyncCheckpointWriter
        self._ckpt = AsyncCheckpointWriter()
        # multi-device: shard batches over 'data', wide weights over
        # 'model' (GSPMD; parallel/mesh.py). None = single device.
        self.mesh = mesh
        if self.mesh is None and len(jax.devices()) > 1:
            from forwardtacotron_tpu.parallel.mesh import mesh_from_config
            self.mesh = mesh_from_config(config)
        # unified top-k tracker (common.py): only qualifying scores are
        # saved at all, files land via the async writer, index written
        # after the file is durable; reads any pre-existing top_k.pkl
        self._top_k = tc.TopKTracker(
            paths.voc_top_k, k=int(self.train_cfg.get('keep_top_k', 3)),
            prefix='wave', ckpt_writer=self._ckpt)

    @property
    def writer(self):
        if self._writer is None:
            from tensorboardX import SummaryWriter
            self._writer = SummaryWriter(log_dir=str(self.paths.voc_log))
        return self._writer

    def train(self, model: WaveRNN, state=None, train_gta: bool = False,
              seed: int = 42, max_steps_override=None) -> tc.TrainState:
        optimizer = tc.make_optimizer(self.train_cfg.get('clip_grad_norm'))
        schedule = parse_schedule(self.train_cfg['schedule'])
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
            train_set, val_set, val_set_samples = get_vocoder_datasets(
                path=self.paths.data, batch_size=bs, train_gta=train_gta,
                max_mel_len=self.train_cfg['max_mel_len'],
                hop_length=self.dsp.hop_length, voc_pad=model.pad,
                voc_seq_len=self.train_cfg['seq_len'],
                voc_mode=self.dsp.voc_mode, bits=self.dsp.bits,
                num_gen_samples=self.train_cfg['num_gen_samples'])
            session = tc.VocSession(index=i, lr=lr, max_step=max_step,
                                    bs=bs, train_set=train_set,
                                    val_set=val_set,
                                    val_set_samples=val_set_samples,
                                    start_step=prev_max)
            if state is None:
                example = _to_jnp(next(iter(train_set)))
                variables = model.init(rng, example['x'], example['mel'],
                                       train=True)
                state = tc.TrainState(
                    params=variables['params'],
                    batch_stats=variables.get('batch_stats', {}),
                    opt_state=optimizer.init(variables['params']),
                    step=jnp.asarray(0, jnp.int32))
            if self.mesh is not None:
                state = self._shard_state(state)
            state = self.train_session(model, optimizer, state, session,
                                       train_gta)
        return state

    def _shard_state(self, state: tc.TrainState) -> tc.TrainState:
        from forwardtacotron_tpu.parallel import mesh as pmesh
        return jax.device_put(state, pmesh.state_shardings(self.mesh, state))

    def _shard_batch(self, batch: Dict[str, Any]) -> Dict[str, Any]:
        if self.mesh is None:
            return batch
        from forwardtacotron_tpu.parallel.distributed import (
            host_local_batch_to_global)
        return host_local_batch_to_global(self.mesh, batch)

    def train_session(self, model, optimizer, state, session,
                      train_gta: bool) -> tc.TrainState:
        current_step = int(state.step)
        training_steps = session.max_step - current_step
        total_iters = len(session.train_set)
        # mid-epoch exact resume (common.py: resume_position)
        epoch0, offset0 = tc.resume_position(current_step,
                                             session.start_step,
                                             total_iters)
        epochs = max((training_steps + offset0) // max(total_iters, 1) + 1,
                     1)
        simple_table([('Remaining', str(training_steps // 1000) + 'k Steps'),
                      ('Batch Size', session.bs),
                      ('LR', session.lr),
                      ('Sequence Len', self.train_cfg['seq_len']),
                      ('GTA Train', train_gta)])

        state = state.replace(
            opt_state=tc.set_learning_rate(state.opt_state, session.lr))
        train_step = build_voc_train_step(model, optimizer,
                                          self.dsp.voc_mode,
                                          train_cfg=self.train_cfg)
        eval_step = build_voc_eval_step(model, self.dsp.voc_mode)

        loss_avg, duration_avg = tc.Averager(), tc.Averager()

        # async step loop (same scheme as forward_trainer.train_session):
        # host-side step counter + one-iteration-late metric fetch
        step = current_step
        last_t = time.time()

        def flush_metrics(metrics, pstep, pe, pi) -> None:
            nonlocal last_t
            loss = float(metrics['loss'])  # blocks on that step
            loss_avg.add(loss)
            now = time.time()
            duration_avg.add(now - last_t)
            last_t = now
            speed = 1.0 / max(duration_avg.get(), 1e-9)
            msg = (f'| Epoch: {pe}/{epochs} ({pi}/{total_iters}) '
                   f'| Loss: {loss_avg.get():.4} '
                   f'| {speed:.1f} steps/s | Step: {pstep // 1000}k | ')
            self.writer.add_scalar('Loss/train', loss, pstep)
            self.writer.add_scalar('Params/batch_size', session.bs,
                                   pstep)
            self.writer.add_scalar('Params/learning_rate', session.lr,
                                   pstep)
            stream(msg)

        deferred = tc.DeferredFlush(flush_metrics)

        for e in range(1, epochs + 1):
            epoch = epoch0 + e - 1
            start = offset0 if epoch == epoch0 else 0
            batches = session.train_set.batches(epoch, start) \
                if hasattr(session.train_set, 'batches') \
                else session.train_set
            for i, batch in enumerate(Prefetcher(batches), start + 1):
                state, metrics = train_step(state,
                                            self._shard_batch(_to_jnp(batch)))
                step += 1
                self._tracer.tick(step)
                deferred.push(metrics, step, e, i)

                if step % self.train_cfg['gen_samples_every'] == 0:
                    mel_loss = self.generate_samples(model, state, session)
                    if mel_loss is not None:
                        self.track_top_models(mel_loss, state, step)
                if step % self.train_cfg['checkpoint_every'] == 0:
                    self._ckpt.save(state.variables, self.config,
                                    self.paths.voc_checkpoints /
                                    f'wave_step{step // 1000}k.fjax',
                                    opt_state=state.opt_state, step=step)
                if tc.preempted():
                    stream('\n| Preemption requested — saving '
                           'latest_model and stopping cleanly.\n')
                    break
                if step >= session.max_step:
                    break
            else:
                deferred.flush()
                val_loss = self.evaluate(eval_step, state, session.val_set)
                self.writer.add_scalar('Loss/val', val_loss, step)
                self._ckpt.save(state.variables, self.config,
                                self.paths.voc_checkpoints /
                                'latest_model.fjax',
                                opt_state=state.opt_state, step=step)
                loss_avg.reset()
                duration_avg.reset()
                last_t = time.time()
                print(' ')
                continue
            break

        deferred.flush()
        self._ckpt.save(state.variables, self.config,
                        self.paths.voc_checkpoints / 'latest_model.fjax',
                        opt_state=state.opt_state, step=step)
        self._ckpt.wait()  # checkpoint durable before the session returns
        return state

    def evaluate(self, eval_step, state, val_set) -> float:
        val_loss, n = 0.0, 0
        for batch in val_set:
            val_loss += float(eval_step(state.variables, _to_jnp(batch)))
            n += 1
        return val_loss / max(n, 1)

    @ignore_exception
    def generate_samples(self, model, state, session):
        """Regenerate validation samples; score mel-L1 of the resynthesis
        (voc_trainer.py:160-202)."""
        step = int(state.step)
        mel_losses = []
        for idx, sample in enumerate(session.val_set_samples, 1):
            mel = sample['mel']  # (n_mels, T) on disk layout
            wav = generate_wav(
                model, state.variables, mel,
                batched=self.train_cfg['gen_batched'],
                target=self.train_cfg['target'],
                overlap=self.train_cfg['overlap'],
                mu_law=self.dsp.mu_law)
            gen_mel = self.dsp.wav_to_mel_bucketed(
                np.asarray(wav, dtype=np.float32))
            T = min(gen_mel.shape[-1], mel.shape[-1])
            mel_losses.append(float(np.mean(
                np.abs(gen_mel[:, :T] - mel[:, :T]))))
            log_audio(self.writer, f'Samples/generated_{idx}',
                      np.asarray(wav, dtype=np.float32), step,
                      self.dsp.sample_rate,
                      fallback_dir=self.paths.voc_log / 'audio')
        mel_loss = float(np.mean(mel_losses)) if mel_losses else None
        if mel_loss is not None:
            self.writer.add_scalar('Loss/generated_mel_l1', mel_loss, step)
        return mel_loss

    def track_top_models(self, mel_loss: float, state, step: int) -> None:
        """Keep the top-k checkpoints by generated mel-L1
        (voc_trainer.py:204-226), via the unified tracker."""
        self._top_k.update(mel_loss, state.variables, self.config,
                           None, step)
