"""ForwardTacotron/FastPitch trainer.

Parity surface: trainer/forward_trainer.py in the reference — progressive
(lr, max_step, bs) schedule sessions, masked L1 losses with 0.1-weighted
duration/pitch/energy terms, pitch/energy zoneout, grad clipping,
TensorBoard scalars/figures/audio, `latest_model` + step-named
checkpoints. TPU specifics: the whole optimization step is one jitted
XLA program (train/common.py), batches come from static-shape buckets
(data/dataset.py) so each bucket compiles exactly once, and data
parallelism over a device mesh is a sharding annotation, not a code path.
"""
from __future__ import annotations

import time
from typing import Any, Dict, Optional

import jax
import numpy as np

from forwardtacotron_tpu.data.dataset import Prefetcher, get_tts_datasets
from forwardtacotron_tpu.train import common as tc
from forwardtacotron_tpu.utils.decorators import ignore_exception
from forwardtacotron_tpu.utils.display import (log_audio, plot_mel,
                                               plot_pitch, simple_table,
                                               stream)
from forwardtacotron_tpu.utils.files import parse_schedule
from forwardtacotron_tpu.utils.paths import Paths


def _batch_to_device(batch: Dict[str, Any], sharding=None) -> Dict[str, Any]:
    import jax.numpy as jnp
    out = {}
    for k, v in batch.items():
        if isinstance(v, np.ndarray):
            arr = jnp.asarray(v)
            if sharding is not None:
                arr = jax.device_put(arr, sharding)
            out[k] = arr
    return out


class ForwardTrainer:

    def __init__(self, paths: Paths, dsp, config: Dict[str, Any],
                 writer=None, mesh=None) -> None:
        self.paths = paths
        self.dsp = dsp
        self.config = config
        model_type = config.get('tts_model', 'forward_tacotron')
        self.train_cfg = config[model_type]['training']
        self._writer = writer
        self._train_step = None
        from forwardtacotron_tpu.utils.profiling import (
            StepTraceController)
        self._tracer = StepTraceController()
        self._eval_step = None
        self._top_k = None
        # background checkpoint writes: the step loop pays one HBM
        # snapshot dispatch, never the device->host fetch + disk IO
        # (utils/async_ckpt.py)
        from forwardtacotron_tpu.utils.async_ckpt import \
            AsyncCheckpointWriter
        self._ckpt = AsyncCheckpointWriter()
        # multi-device: shard batches over 'data', wide weights over
        # 'model' (GSPMD; parallel/mesh.py). None = single device.
        self.mesh = mesh
        if self.mesh is None and len(jax.devices()) > 1:
            from forwardtacotron_tpu.parallel.mesh import mesh_from_config
            self.mesh = mesh_from_config(config)
        self._batch_sharding = None
        self._state_sharding = None

    @property
    def writer(self):
        if self._writer is None:
            from tensorboardX import SummaryWriter
            self._writer = SummaryWriter(log_dir=str(self.paths.forward_log))
        return self._writer

    def train(self, model, state: Optional[tc.TrainState] = None,
              seed: int = 42, max_steps_override: Optional[int] = None
              ) -> tc.TrainState:
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
            train_set, val_set = get_tts_datasets(
                path=self.paths.data, batch_size=bs, r=1,
                model_type='forward',
                max_mel_len=self.train_cfg['max_mel_len'],
                filter_attention=self.train_cfg['filter_attention'],
                filter_min_alignment=self.train_cfg[
                    'min_attention_alignment'],
                filter_min_sharpness=self.train_cfg[
                    'min_attention_sharpness'])
            if len(train_set) == 0:
                raise RuntimeError(
                    'No training items left after filtering — check '
                    'attention scores (filter_attention) and max_mel_len.')
            session = tc.TTSSession(index=i, r=1, lr=lr, max_step=max_step,
                                    bs=bs, train_set=train_set,
                                    val_set=val_set, start_step=prev_max)
            if state is None:
                example = session.val_sample if session.val_sample \
                    is not None else next(iter(train_set))
                state = tc.init_train_state(
                    model, optimizer, _batch_to_device(example), rng,
                    init_kwargs={'train': True},
                    with_ema=float(self.train_cfg.get('ema_decay', 0)
                                   or 0) > 0)
            if self.mesh is not None:
                state = self._shard_state(state)
            state = self.train_session(model, optimizer, state, session, rng)
        return state

    def _shard_state(self, state: tc.TrainState) -> tc.TrainState:
        from forwardtacotron_tpu.parallel import mesh as pmesh
        self._state_sharding = pmesh.state_shardings(self.mesh, state)
        return jax.device_put(state, self._state_sharding)

    def _shard_batch(self, batch: Dict[str, Any]) -> Dict[str, Any]:
        if self.mesh is None:
            return batch
        # single host: device_put over the mesh; multi host: each
        # process uploads only its rows (parallel/distributed.py)
        from forwardtacotron_tpu.parallel.distributed import (
            host_local_batch_to_global)
        return host_local_batch_to_global(self.mesh, batch)

    def train_session(self, model, optimizer, state: tc.TrainState,
                      session: tc.TTSSession, rng) -> tc.TrainState:
        current_step = int(state.step)
        training_steps = session.max_step - current_step
        total_iters = len(session.train_set)
        # mid-epoch exact resume: continue the epoch-seeded data stream
        # exactly where step `current_step` left it (common.py:
        # resume_position)
        epoch0, offset0 = tc.resume_position(current_step,
                                             session.start_step,
                                             total_iters)
        epochs = max((training_steps + offset0) // max(total_iters, 1) + 1,
                     1)
        simple_table([('Steps', str(training_steps // 1000) + 'k Steps'),
                      ('Batch Size', session.bs),
                      ('Learning Rate', session.lr)])

        state = state.replace(
            opt_state=tc.set_learning_rate(state.opt_state, session.lr))
        if self._train_step is None:
            self._train_step = jax.jit(
                tc.build_forward_train_step(model, optimizer,
                                            self.train_cfg),
                donate_argnums=(0,))
        train_step = self._train_step
        if self._eval_step is None:
            self._eval_step = tc.build_forward_eval_step(model,
                                                         self.train_cfg)

        m_loss_avg, dur_loss_avg = tc.Averager(), tc.Averager()
        duration_avg, pitch_loss_avg = tc.Averager(), tc.Averager()

        # Async step loop: `step` is a host-side counter (one train_step
        # == one step, the invariant resume_position already relies on),
        # and each step's metrics are fetched one iteration LATE — after
        # the next step has been dispatched. The old pattern
        # (int(state.step) + float(metrics) every iteration) forced a
        # full device round-trip per step, idling the TPU during host
        # logging/TB IO; now fetch, logging, and the next upload overlap
        # with device compute. Loss values in logs lag by one step.
        step = current_step
        last_t = time.time()

        def flush_metrics(metrics, pstep, pe, pi, mel_shape) -> None:
            nonlocal last_t
            m_loss = float(metrics['mel_loss'])  # blocks on that step
            dur_loss = float(metrics['dur_loss'])
            pitch_loss = float(metrics['pitch_loss'])
            m_loss_avg.add(m_loss)
            dur_loss_avg.add(dur_loss)
            pitch_loss_avg.add(pitch_loss)
            now = time.time()
            duration_avg.add(now - last_t)
            last_t = now
            speed = 1.0 / max(duration_avg.get(), 1e-9)
            msg = (f'| Epoch: {pe}/{epochs} ({pi}/{total_iters}) '
                   f'| Mel Loss: {m_loss_avg.get():#.4} '
                   f'| Dur Loss: {dur_loss_avg.get():#.4} '
                   f'| Pitch Loss: {pitch_loss_avg.get():#.4} '
                   f'| {speed:#.2} steps/s | Step: {pstep // 1000}k | ')
            w = self.writer
            w.add_scalar('Perf/steps_per_sec', speed, pstep)
            w.add_scalar('Perf/mel_frames_per_sec',
                         speed * mel_shape[0] * mel_shape[1], pstep)
            w.add_scalar('Mel_Loss/train', m_loss, pstep)
            w.add_scalar('Pitch_Loss/train', pitch_loss, pstep)
            w.add_scalar('Energy_Loss/train',
                         float(metrics['energy_loss']), pstep)
            w.add_scalar('Duration_Loss/train', dur_loss, pstep)
            w.add_scalar('Params/batch_size', session.bs, pstep)
            w.add_scalar('Params/learning_rate', session.lr, pstep)
            stream(msg)

        deferred = tc.DeferredFlush(flush_metrics)

        for e in range(1, epochs + 1):
            epoch = epoch0 + e - 1
            start = offset0 if epoch == epoch0 else 0
            batches = session.train_set.batches(epoch, start) \
                if hasattr(session.train_set, 'batches') \
                else session.train_set
            for i, batch in enumerate(Prefetcher(batches), start + 1):
                step_rng = jax.random.fold_in(rng, step)
                jbatch = self._shard_batch(_batch_to_device(batch))
                state, metrics = train_step(state, jbatch, step_rng)
                step += 1
                self._tracer.tick(step)
                deferred.push(metrics, step, e, i,
                              (batch['mel'].shape[0],
                               batch['mel'].shape[1]))

                if step % self.train_cfg['checkpoint_every'] == 0:
                    self._ckpt.save(
                        state.save_variables, self.config,
                        self.paths.forward_checkpoints /
                        f'forward_step{step // 1000}k.fjax',
                        opt_state=state.opt_state, step=step)

                if step % self.train_cfg['plot_every'] == 0:
                    self.generate_plots(model, state, session)

                if tc.preempted():
                    stream('\n| Preemption requested — saving '
                           'latest_model and stopping cleanly.\n')
                    break
                if step >= session.max_step:
                    break
            else:
                deferred.flush()
                val_out = self.evaluate(state, session.val_set)
                self.writer.add_scalar('Mel_Loss/val',
                                       val_out['mel_loss'], step)
                self.writer.add_scalar('Duration_Loss/val',
                                       val_out['dur_loss'], step)
                self.writer.add_scalar('Pitch_Loss/val',
                                       val_out['pitch_loss'], step)
                self.writer.add_scalar('Energy_Loss/val',
                                       val_out['energy_loss'], step)
                self._ckpt.save(state.save_variables, self.config,
                                self.paths.forward_checkpoints /
                                'latest_model.fjax',
                                opt_state=state.opt_state, step=step)
                # beyond-reference: keep the k best student checkpoints
                # by val mel loss (reference has this for the vocoder
                # only, voc_trainer.py:204-226)
                if self._top_k is None:
                    self._top_k = tc.TopKTracker(
                        self.paths.forward_top_k,
                        k=int(self.train_cfg.get('keep_top_k', 3)),
                        prefix='forward', ckpt_writer=self._ckpt)
                self._top_k.update(val_out['mel_loss'], state.save_variables,
                                   self.config, state.opt_state, step)
                m_loss_avg.reset()
                duration_avg.reset()
                pitch_loss_avg.reset()
                last_t = time.time()
                print(' ')
                continue
            break  # max_step reached

        deferred.flush()
        self._ckpt.save(state.save_variables, self.config,
                        self.paths.forward_checkpoints / 'latest_model.fjax',
                        opt_state=state.opt_state, step=step)
        self._ckpt.wait()  # checkpoint durable before the session returns
        return state

    def evaluate(self, state: tc.TrainState, val_set) -> Dict[str, float]:
        totals = {'mel_loss': 0.0, 'dur_loss': 0.0, 'pitch_loss': 0.0,
                  'energy_loss': 0.0}
        n = 0
        for batch in val_set:
            # EMA weights when tracked — the served weights are the
            # ones that should gate top-k checkpoint selection
            metrics = self._eval_step(state.eval_variables,
                                      _batch_to_device(batch))
            totals['mel_loss'] += float(metrics['mel_loss'])
            totals['dur_loss'] += float(metrics['dur_loss'])
            totals['pitch_loss'] += float(metrics['pitch_loss'])
            totals['energy_loss'] += float(metrics['energy_loss'])
            n += 1
        return {k: v / max(n, 1) for k, v in totals.items()}

    @ignore_exception
    def generate_plots(self, model, state: tc.TrainState,
                       session: tc.TTSSession) -> None:
        batch = _batch_to_device(session.val_sample)
        step = int(state.step)
        pred = model.apply(state.eval_variables, batch, train=False)
        m1_hat = np.asarray(pred['mel'])[0, :600]
        m2_hat = np.asarray(pred['mel_post'])[0, :600]
        m_target = np.asarray(batch['mel'])[0, :600]

        w = self.writer
        w.add_figure('Ground_Truth_Aligned/target', plot_mel(m_target), step)
        w.add_figure('Ground_Truth_Aligned/linear', plot_mel(m1_hat), step)
        w.add_figure('Ground_Truth_Aligned/postnet', plot_mel(m2_hat), step)
        w.add_figure('Pitch/target',
                     plot_pitch(np.asarray(batch['pitch'][0])), step)
        w.add_figure('Pitch/ground_truth_aligned',
                     plot_pitch(np.asarray(pred['pitch'][0])), step)
        w.add_figure('Energy/target',
                     plot_pitch(np.asarray(batch['energy'][0])), step)
        w.add_figure('Energy/ground_truth_aligned',
                     plot_pitch(np.asarray(pred['energy'][0])), step)

        m2_wav = self.dsp.griffinlim(m2_hat.T)
        target_wav = self.dsp.griffinlim(m_target.T)
        sr = self.dsp.sample_rate
        audio_dir = self.paths.forward_log / 'audio'
        log_audio(w, 'Ground_Truth_Aligned/target_wav', target_wav, step,
                  sr, fallback_dir=audio_dir)
        log_audio(w, 'Ground_Truth_Aligned/postnet_wav', m2_wav, step, sr,
                  fallback_dir=audio_dir)

        # free-running generation on the first val item
        x_len = int(batch['x_len'][0])
        x = batch['x'][0:1]
        max_t = int(batch['mel'].shape[1])
        gen = model.apply(state.eval_variables, x, max_t,
                          method='generate',
                          x_len=batch['x_len'][0:1])
        gen_len = int(gen['mel_len'][0])
        m2_gen = np.asarray(gen['mel_post'])[0, :max(gen_len, 1)]
        w.add_figure('Generated/postnet', plot_mel(m2_gen), step)
        w.add_figure('Pitch/generated',
                     plot_pitch(np.asarray(gen['pitch'][0][:x_len])), step)
        w.add_figure('Energy/generated',
                     plot_pitch(np.asarray(gen['energy'][0][:x_len])), step)
        log_audio(w, 'Generated/postnet_wav',
                  self.dsp.griffinlim(m2_gen.T), step, sr,
                  fallback_dir=audio_dir)
