"""Tacotron teacher trainer.

Parity surface: trainer/taco_trainer.py — (r, lr, max_step, bs) schedule
with per-session reduction factor, plain (unmasked) L1 on mel + postnet
outputs, attention score logging, checkpoint + plot cadence. Each r value
compiles its own XLA train step (4 values for the default schedule).
"""
from __future__ import annotations

import time
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from forwardtacotron_tpu.align.metrics import attention_score
from forwardtacotron_tpu.data.dataset import Prefetcher, get_tts_datasets
from forwardtacotron_tpu.train import common as tc
from forwardtacotron_tpu.utils.decorators import ignore_exception
from forwardtacotron_tpu.utils.display import (log_audio, plot_attention,
                                               plot_mel, simple_table,
                                               stream)
from forwardtacotron_tpu.utils.files import parse_schedule
from forwardtacotron_tpu.utils.paths import Paths


def build_taco_train_step(model, optimizer, r: int,
                          train_cfg: Dict[str, Any] = None) -> Callable:
    half = tc.half_dtype(train_cfg or {})

    def apply_model(p, stats, x, mel_in, dec_rng, dropout_rng, spk):
        return model.apply(
            {'params': p, 'batch_stats': stats},
            x, mel_in, r, train=True, rng=dec_rng, speaker=spk,
            mutable=['batch_stats'], rngs={'dropout': dropout_rng})
    if (train_cfg or {}).get('remat'):
        # the LSA decoder scan holds per-frame attention/RNN
        # activations for backward — rematerializing them fits much
        # longer utterances per HBM byte
        apply_model = jax.checkpoint(apply_model)

    accum = int((train_cfg or {}).get('grad_accum', 1) or 1)

    def train_step(state: tc.TrainState, batch: Dict[str, jnp.ndarray],
                   rng: jax.Array) -> Tuple[tc.TrainState, Dict]:
        dec_rng, dropout_rng = jax.random.split(rng)

        def loss_fn(params, stats, x, mel, drng1, drng2, spk=None):
            # bf16 compute when training.precision is 'bf16': params and
            # the teacher-forced mel cast at the boundary, f32 masters,
            # BN stats, and losses (same recipe as common.py:178-196)
            p = tc.cast_half(params, half) if half else params
            mel_in = mel.astype(half) if half else mel
            (m1, m2, att), mutated = apply_model(
                p, stats, x, mel_in, drng1, drng2, spk)
            if half:
                m1, m2, att = (m1.astype(jnp.float32),
                               m2.astype(jnp.float32),
                               att.astype(jnp.float32))
            m1_loss = jnp.mean(jnp.abs(m1 - mel))
            m2_loss = jnp.mean(jnp.abs(m2 - mel))
            loss = m1_loss + m2_loss
            new_stats = mutated['batch_stats']
            if half:
                new_stats = tc.cast_full(new_stats, half)
            return loss, (att, new_stats,
                          {'loss': loss, 'm1_loss': m1_loss,
                           'm2_loss': m2_loss})

        grad_fn = jax.grad(loss_fn, has_aux=True)
        spk = batch.get('speaker')
        if accum <= 1:
            grads, (att, new_stats, metrics) = grad_fn(
                state.params, state.batch_stats, batch['x'],
                batch['mel'], dec_rng, dropout_rng, spk)
        else:
            # grad accumulation (training.grad_accum): scan over
            # leading-axis micro-batches, averaging grads into ONE
            # update; BN stats update sequentially, attention maps
            # re-assemble to the full batch for plots/scores
            B = batch['x'].shape[0]
            assert B % accum == 0, \
                f'batch size {B} not divisible by grad_accum={accum}'

            def micro(leaf):
                return leaf.reshape((accum, B // accum) + leaf.shape[1:])
            xs = (micro(batch['x']), micro(batch['mel']),
                  jax.random.split(dec_rng, accum),
                  jax.random.split(dropout_rng, accum),
                  None if spk is None else micro(spk))

            def body(carry, inputs):
                grads_acc, stats = carry
                mb_x, mb_mel, d1, d2, mb_spk = inputs
                g, (att, stats, m) = grad_fn(state.params, stats,
                                             mb_x, mb_mel, d1, d2,
                                             mb_spk)
                return (jax.tree.map(jnp.add, grads_acc, g),
                        stats), (att, m)

            zero = jax.tree.map(jnp.zeros_like, state.params)
            (grads, new_stats), (atts, ms) = jax.lax.scan(
                body, (zero, state.batch_stats), xs)
            grads = jax.tree.map(lambda g: g / accum, grads)
            metrics = jax.tree.map(lambda m: jnp.mean(m, axis=0), ms)
            att = atts.reshape((B,) + atts.shape[2:])
        updates, new_opt_state = optimizer.update(grads, state.opt_state,
                                                  state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = tc.TrainState(params=new_params, batch_stats=new_stats,
                                  opt_state=new_opt_state,
                                  step=state.step + 1)
        return new_state, (metrics, att)

    return jax.jit(train_step, donate_argnums=(0,))


def build_taco_eval_step(model, r: int) -> Callable:
    @jax.jit
    def eval_step(variables, batch):
        m1, m2, att = model.apply(variables, batch['x'], batch['mel'], r,
                                  train=False,
                                  speaker=batch.get('speaker'))
        m1_loss = jnp.mean(jnp.abs(m1 - batch['mel']))
        m2_loss = jnp.mean(jnp.abs(m2 - batch['mel']))
        return m1_loss + m2_loss, att
    return eval_step


def _to_jnp(batch: Dict[str, Any]) -> Dict[str, jnp.ndarray]:
    return {k: jnp.asarray(v) for k, v in batch.items()
            if isinstance(v, np.ndarray)}


class TacoTrainer:

    def __init__(self, paths: Paths, dsp, config: Dict[str, Any],
                 writer=None, mesh=None) -> None:
        self.paths = paths
        self.dsp = dsp
        self.config = config
        self.train_cfg = config['tacotron']['training']
        self._writer = writer
        self._top_k = None
        from forwardtacotron_tpu.utils.profiling import (
            StepTraceController)
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

    def _shard_state(self, state: tc.TrainState) -> tc.TrainState:
        from forwardtacotron_tpu.parallel import mesh as pmesh
        return jax.device_put(state, pmesh.state_shardings(self.mesh, state))

    def _shard_batch(self, batch: Dict[str, Any]) -> Dict[str, Any]:
        if self.mesh is None:
            return batch
        from forwardtacotron_tpu.parallel.distributed import (
            host_local_batch_to_global)
        return host_local_batch_to_global(self.mesh, batch)

    @property
    def writer(self):
        if self._writer is None:
            from tensorboardX import SummaryWriter
            self._writer = SummaryWriter(log_dir=str(self.paths.taco_log))
        return self._writer

    def train(self, model, state=None, seed: int = 42,
              max_steps_override=None) -> tc.TrainState:
        optimizer = tc.make_optimizer(self.train_cfg.get('clip_grad_norm'))
        schedule = parse_schedule(self.train_cfg['schedule'])
        rng = jax.random.PRNGKey(seed)
        tc.install_preemption_handler()

        session_start = 0
        for i, (r, lr, max_step, bs) in enumerate(schedule, 1):
            prev_max, session_start = session_start, max_step
            if tc.preempted():
                break
            if max_steps_override is not None:
                max_step = min(max_step, max_steps_override)
            current = 0 if state is None else int(state.step)
            if current >= max_step:
                continue
            train_set, val_set = get_tts_datasets(
                path=self.paths.data, batch_size=bs, r=r,
                model_type='tacotron',
                max_mel_len=self.train_cfg['max_mel_len'],
                filter_attention=False)
            session = tc.TTSSession(index=i, r=r, lr=lr, max_step=max_step,
                                    bs=bs, train_set=train_set,
                                    val_set=val_set, start_step=prev_max)
            if state is None:
                example = _to_jnp(session.val_sample or
                                  next(iter(train_set)))
                variables = model.init(
                    {'params': rng, 'dropout': rng}, example['x'],
                    example['mel'], r, train=True, rng=rng)
                opt_state = optimizer.init(variables['params'])
                state = tc.TrainState(
                    params=variables['params'],
                    batch_stats=variables.get('batch_stats', {}),
                    opt_state=opt_state, step=jnp.asarray(0, jnp.int32))
            if self.mesh is not None:
                state = self._shard_state(state)
            state = self.train_session(model, optimizer, state, session,
                                       rng)
        return state

    def train_session(self, model, optimizer, state, session, rng
                      ) -> tc.TrainState:
        current_step = int(state.step)
        training_steps = session.max_step - current_step
        total_iters = len(session.train_set)
        # mid-epoch exact resume (common.py: resume_position)
        epoch0, offset0 = tc.resume_position(current_step,
                                             session.start_step,
                                             total_iters)
        epochs = max((training_steps + offset0) // max(total_iters, 1) + 1,
                     1)
        simple_table([
            (f'Steps with r={session.r}',
             str(training_steps // 1000) + 'k Steps'),
            ('Batch Size', session.bs),
            ('Learning Rate', session.lr),
            ('Outputs/Step (r)', session.r)])

        state = state.replace(
            opt_state=tc.set_learning_rate(state.opt_state, session.lr))
        train_step = build_taco_train_step(model, optimizer, session.r,
                                           self.train_cfg)
        eval_step = build_taco_eval_step(model, session.r)

        loss_avg, duration_avg = tc.Averager(), tc.Averager()

        # async step loop: host-side step counter + one-iteration-late
        # metric fetch so device compute overlaps host logging/upload
        # (same scheme as forward_trainer.train_session)
        step = current_step
        last_t = time.time()

        def flush_metrics(metrics, att, mel_len, pstep, pe, pi) -> None:
            nonlocal last_t
            loss = float(metrics['loss'])  # blocks on that step
            loss_avg.add(loss)
            now = time.time()
            duration_avg.add(now - last_t)
            last_t = now
            speed = 1.0 / max(duration_avg.get(), 1e-9)
            msg = (f'| Epoch: {pe}/{epochs} ({pi}/{total_iters}) '
                   f'| Loss: {loss_avg.get():#.4} '
                   f'| {speed:#.2} steps/s | Step: {pstep // 1000}k | ')
            _, att_score = attention_score(att, mel_len, r=session.r)
            self.writer.add_scalar('Attention_Score/train',
                                   float(jnp.mean(att_score)), pstep)
            self.writer.add_scalar('Loss/train', loss, pstep)
            self.writer.add_scalar('Params/reduction_factor',
                                   session.r, pstep)
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
                step_rng = jax.random.fold_in(rng, step)
                jbatch = self._shard_batch(_to_jnp(batch))
                state, (metrics, att) = train_step(state, jbatch, step_rng)
                step += 1
                self._tracer.tick(step)
                deferred.push(metrics, att, jbatch['mel_len'], step, e, i)

                if step % self.train_cfg['checkpoint_every'] == 0:
                    self._ckpt.save(state.variables, self.config,
                                    self.paths.taco_checkpoints /
                                    f'taco_step{step // 1000}k.fjax',
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
                val_loss, val_att = self.evaluate(eval_step, state,
                                                  session.val_set)
                self.writer.add_scalar('Loss/val', val_loss, step)
                self.writer.add_scalar('Attention_Score/val', val_att, step)
                self._ckpt.save(state.variables, self.config,
                                self.paths.taco_checkpoints /
                                'latest_model.fjax',
                                opt_state=state.opt_state, step=step)
                # beyond-reference: keep the k best teacher checkpoints
                # by val attention score — the teacher's product is
                # alignments, so attention quality (negated: tracker
                # keeps lowest) is the retention metric
                if self._top_k is None:
                    self._top_k = tc.TopKTracker(
                        self.paths.taco_top_k,
                        k=int(self.train_cfg.get('keep_top_k', 3)),
                        prefix='taco', ckpt_writer=self._ckpt)
                self._top_k.update(-val_att, state.variables,
                                   self.config, state.opt_state, step)
                loss_avg.reset()
                duration_avg.reset()
                last_t = time.time()
                print(' ')
                continue
            break

        deferred.flush()
        self._ckpt.save(state.variables, self.config,
                        self.paths.taco_checkpoints / 'latest_model.fjax',
                        opt_state=state.opt_state, step=step)
        self._ckpt.wait()  # checkpoint durable before the session returns
        return state

    def evaluate(self, eval_step, state, val_set) -> Tuple[float, float]:
        val_loss, val_att, n = 0.0, 0.0, 0
        for batch in val_set:
            jbatch = _to_jnp(batch)
            loss, att = eval_step(state.variables, jbatch)
            _, att_score = attention_score(att, jbatch['mel_len'], r=1)
            val_loss += float(loss)
            val_att += float(jnp.mean(att_score))
            n += 1
        return val_loss / max(n, 1), val_att / max(n, 1)

    @ignore_exception
    def generate_plots(self, model, state, session) -> None:
        batch = _to_jnp(session.val_sample)
        step = int(state.step)
        spk = batch.get('speaker')
        m1, m2, att = model.apply(state.variables, batch['x'],
                                  batch['mel'], session.r, train=False,
                                  speaker=spk)
        att0 = np.asarray(att)[0]
        m1_hat = np.asarray(m1)[0, :600]
        m2_hat = np.asarray(m2)[0, :600]
        m_target = np.asarray(batch['mel'])[0, :600]
        w = self.writer
        w.add_figure('Ground_Truth_Aligned/attention',
                     plot_attention(att0), step)
        w.add_figure('Ground_Truth_Aligned/target', plot_mel(m_target), step)
        w.add_figure('Ground_Truth_Aligned/linear', plot_mel(m1_hat), step)
        w.add_figure('Ground_Truth_Aligned/postnet', plot_mel(m2_hat), step)
        if self.dsp is not None:
            sr = self.dsp.sample_rate
            audio_dir = self.paths.taco_log / 'audio'
            log_audio(w, 'Ground_Truth_Aligned/target_wav',
                      self.dsp.griffinlim(m_target.T), step, sr,
                      fallback_dir=audio_dir)
            log_audio(w, 'Ground_Truth_Aligned/postnet_wav',
                      self.dsp.griffinlim(m2_hat.T), step, sr,
                      fallback_dir=audio_dir)

        # free-running generation (reference taco_trainer.py:173-186)
        gen_steps = int(batch['mel_len'][0]) + 20
        gen_steps += (-gen_steps) % session.r
        m1g, m2g, attg, n_valid = model.apply(
            state.variables, batch['x'][0:1], gen_steps, session.r,
            method='generate',
            speaker=None if spk is None else spk[0:1])
        n_valid = max(int(n_valid), 1)
        w.add_figure('Generated/attention',
                     plot_attention(np.asarray(attg)[0]), step)
        w.add_figure('Generated/linear',
                     plot_mel(np.asarray(m1g)[0, :n_valid]), step)
        w.add_figure('Generated/postnet',
                     plot_mel(np.asarray(m2g)[0, :n_valid]), step)
        if self.dsp is not None:
            log_audio(w, 'Generated/postnet_wav',
                      self.dsp.griffinlim(np.asarray(m2g)[0, :n_valid].T),
                      step, sr, fallback_dir=audio_dir)
