"""Adversarial HiFi-GAN vocoder trainer (beyond the reference).

The reference trains only WaveRNN and points users at an external
HiFi-GAN for its best-quality samples (reference README.md sample
pages, gen_forward.py hifigan export). This trainer closes that loop
on TPU: the generator (models/hifigan.py) trains against the MPD+MSD
discriminators (models/gan_discriminators.py) with the LSGAN +
feature-matching + mel-L1 recipe (train/gan_losses.py), over the same
on-disk data layout the other trainers use — including `--gta` mels
from the student so generation-time inputs match training inputs.

TPU design: the discriminator update and the generator update run as
ONE jitted XLA program per step (both grads, both AdamW updates, the
on-device log-mel for the reconstruction loss). Sessions follow the
repo's (lr, max_step, bs) schedule convention with injected learning
rates, so one compiled step serves every session at a given batch
shape.
"""
from __future__ import annotations

import time
from typing import Any, Callable, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from forwardtacotron_tpu.data.dataset import (Prefetcher,
                                              get_gan_vocoder_datasets)
from forwardtacotron_tpu.models.gan_discriminators import (
    HiFiGANDiscriminators)
from forwardtacotron_tpu.models.hifigan import (HiFiGANGenerator,
                                                vocode_hifigan)
from forwardtacotron_tpu.train import common as tc
from forwardtacotron_tpu.train.gan_losses import (
    discriminator_loss, feature_matching_loss,
    generator_adversarial_loss, mel_l1_loss)
from forwardtacotron_tpu.utils.decorators import ignore_exception
from forwardtacotron_tpu.utils.display import (log_audio, simple_table,
                                               stream)
from forwardtacotron_tpu.utils.files import parse_schedule
from forwardtacotron_tpu.utils.paths import Paths


@struct.dataclass
class GANTrainState:
    gen_params: Any
    disc_params: Any
    gen_opt: Any
    disc_opt: Any
    step: jnp.ndarray

    @property
    def generator_variables(self) -> Dict[str, Any]:
        return {'params': self.gen_params}

    @property
    def variables(self) -> Dict[str, Any]:
        """Full GAN state as one variables pytree (checkpoint layout)."""
        return {'params': {'generator': self.gen_params,
                           'discriminator': self.disc_params}}


def make_gan_optimizer(lr: float = 2e-4) -> optax.GradientTransformation:
    """AdamW with the official betas (0.8, 0.99), lr injectable."""
    return optax.inject_hyperparams(optax.adamw)(
        learning_rate=lr, b1=0.8, b2=0.99, weight_decay=0.01)


def make_generator(config: Dict[str, Any]):
    """Build the generator to train adversarially:
    `hifigan.model.generator_type: hifigan (default) | melgan`.
    Both expose mel (B, T, n_mels) -> wav (B, T*hop) and a
    `hop_length`, so the trainer is oblivious to which one runs."""
    model_cfg = config['hifigan']['model']
    kind = str(model_cfg.get('generator_type', 'hifigan')).lower()
    if kind == 'melgan':
        from forwardtacotron_tpu.models.melgan import MelGANGenerator
        return MelGANGenerator(
            n_mels=config['dsp']['num_mels'],
            base_channels=model_cfg.get('upsample_initial_channel', 512),
            upsample_rates=tuple(model_cfg.get('upsample_rates',
                                               (8, 8, 2, 2))))
    if kind != 'hifigan':
        raise ValueError(f'unknown generator_type: {kind}')
    return HiFiGANGenerator.from_config(model_cfg)


def vocode_generator(gen, variables: Dict, mel: np.ndarray,
                     pcm16: bool = False) -> np.ndarray:
    """Whole-utterance vocoding dispatch for either generator type."""
    from forwardtacotron_tpu.models.melgan import (MelGANGenerator,
                                                   vocode_melgan)
    if isinstance(gen, MelGANGenerator):
        return vocode_melgan(gen, variables, mel, pcm16=pcm16)
    return vocode_hifigan(gen, variables, mel, pcm16=pcm16)


def build_gan_train_step(gen: HiFiGANGenerator,
                         disc: HiFiGANDiscriminators,
                         gen_optimizer, disc_optimizer,
                         wav_to_mel: Callable,
                         train_cfg: Dict[str, Any] = None) -> Callable:
    # training.precision 'bf16': forward/backward compute in bfloat16,
    # f32 master params/AdamW state/losses (same scheme as the other
    # trainers, train/common.py:half_dtype)
    half = tc.half_dtype(train_cfg or {})

    def train_step(state: GANTrainState, batch: Dict[str, jnp.ndarray]
                   ) -> Tuple[GANTrainState, Dict]:
        mel, y = batch['mel'], batch['audio']
        if half:
            mel = mel.astype(half)

        def _gen_wav(gp):
            p = tc.cast_half(gp, half) if half else gp
            y_hat = gen.apply({'params': p}, mel)
            return y_hat.astype(jnp.float32) if half else y_hat

        def _disc(dp, y_real, y_gen):
            p = tc.cast_half(dp, half) if half else dp
            if half:
                y_real = y_real.astype(half)
                y_gen = y_gen.astype(half)
            lr_, lg_, fr, fg = disc.apply({'params': p}, y_real, y_gen)
            if half:
                to32 = lambda t: jax.tree.map(
                    lambda x: x.astype(jnp.float32), t)
                lr_, lg_, fr, fg = (to32(lr_), to32(lg_), to32(fr),
                                    to32(fg))
            return lr_, lg_, fr, fg

        # 1) discriminator update on a stop-gradiented generation
        y_hat_sg = jax.lax.stop_gradient(_gen_wav(state.gen_params))

        def d_loss_fn(dp):
            lr_, lg_, _, _ = _disc(dp, y, y_hat_sg)
            return discriminator_loss(lr_, lg_)

        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(
            state.disc_params)
        d_updates, new_disc_opt = disc_optimizer.update(
            d_grads, state.disc_opt, state.disc_params)
        new_disc_params = optax.apply_updates(state.disc_params,
                                              d_updates)

        # 2) generator update against the UPDATED discriminator
        #    (matches the official step ordering)
        def g_loss_fn(gp):
            y_hat2 = _gen_wav(gp)
            _, lg_, fr, fg = _disc(new_disc_params, y, y_hat2)
            adv = generator_adversarial_loss(lg_)
            fm = feature_matching_loss(fr, fg)
            mel_l = mel_l1_loss(wav_to_mel, y, y_hat2)
            return adv + fm + mel_l, {'gen_adv': adv, 'gen_fm': fm,
                                      'gen_mel': mel_l}

        (g_loss, parts), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(state.gen_params)
        g_updates, new_gen_opt = gen_optimizer.update(
            g_grads, state.gen_opt, state.gen_params)
        new_gen_params = optax.apply_updates(state.gen_params, g_updates)

        new_state = GANTrainState(
            gen_params=new_gen_params, disc_params=new_disc_params,
            gen_opt=new_gen_opt, disc_opt=new_disc_opt,
            step=state.step + 1)
        metrics = {'disc_loss': d_loss, 'gen_loss': g_loss, **parts}
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=(0,))


def build_gan_eval_step(gen: HiFiGANGenerator,
                        wav_to_mel: Callable) -> Callable:
    @jax.jit
    def eval_step(gen_params, batch):
        y_hat = gen.apply({'params': gen_params}, batch['mel'])
        return mel_l1_loss(wav_to_mel, batch['audio'], y_hat)
    return eval_step


def _to_jnp(batch: Dict[str, Any]) -> Dict[str, jnp.ndarray]:
    return {k: jnp.asarray(v) for k, v in batch.items()
            if isinstance(v, np.ndarray)}


class HiFiGANTrainer:

    def __init__(self, paths: Paths, dsp, config: Dict[str, Any],
                 writer=None, mesh=None) -> None:
        self.paths = paths
        self.dsp = dsp
        self.config = config
        self.train_cfg = config['hifigan']['training']
        self._writer = writer
        # multi-device: batches shard over 'data', wide conv kernels
        # over 'model' (GSPMD, parallel/mesh.py). None = single device.
        self.mesh = mesh
        if self.mesh is None and len(jax.devices()) > 1:
            from forwardtacotron_tpu.parallel.mesh import mesh_from_config
            self.mesh = mesh_from_config(config)
        from forwardtacotron_tpu.utils.profiling import StepTraceController
        self._tracer = StepTraceController()
        # background checkpoint writes (utils/async_ckpt.py)
        from forwardtacotron_tpu.utils.async_ckpt import \
            AsyncCheckpointWriter
        self._ckpt = AsyncCheckpointWriter()
        # unified top-k tracker (common.py): only qualifying scores are
        # saved at all, files land via the async writer, index written
        # after the file is durable; reads any pre-existing top_k.pkl
        self._top_k = tc.TopKTracker(
            paths.hifigan_top_k,
            k=int(self.train_cfg.get('keep_top_k', 3)),
            prefix='hifigan', ckpt_writer=self._ckpt)
        from forwardtacotron_tpu.dsp.stft import wav_to_mel_fn
        self.wav_to_mel = wav_to_mel_fn(dsp.mel_basis, dsp.n_fft,
                                        dsp.hop_length, dsp.win_length)

    @property
    def writer(self):
        if self._writer is None:
            from tensorboardX import SummaryWriter
            self._writer = SummaryWriter(
                log_dir=str(self.paths.hifigan_log))
        return self._writer

    def train(self, gen: HiFiGANGenerator, state: GANTrainState = None,
              train_gta: bool = False, seed: int = 42,
              max_steps_override=None) -> GANTrainState:
        disc = HiFiGANDiscriminators()
        gen_optimizer = make_gan_optimizer()
        disc_optimizer = make_gan_optimizer()
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
            train_set, val_set, val_set_samples = \
                get_gan_vocoder_datasets(
                    path=self.paths.data, batch_size=bs,
                    train_gta=train_gta,
                    max_mel_len=self.train_cfg['max_mel_len'],
                    hop_length=self.dsp.hop_length,
                    seg_len=self.train_cfg['seg_len'],
                    voc_mode=self.dsp.voc_mode, bits=self.dsp.bits,
                    mu_law=self.dsp.mu_law,
                    num_gen_samples=self.train_cfg['num_gen_samples'])
            session = tc.VocSession(index=i, lr=lr, max_step=max_step,
                                    bs=bs, train_set=train_set,
                                    val_set=val_set,
                                    val_set_samples=val_set_samples,
                                    start_step=prev_max)
            if state is None:
                example = _to_jnp(next(iter(train_set)))
                k1, k2 = jax.random.split(rng)
                gen_vars = gen.init(k1, example['mel'])
                disc_vars = disc.init(k2, example['audio'],
                                      example['audio'])
                state = GANTrainState(
                    gen_params=gen_vars['params'],
                    disc_params=disc_vars['params'],
                    gen_opt=gen_optimizer.init(gen_vars['params']),
                    disc_opt=disc_optimizer.init(disc_vars['params']),
                    step=jnp.asarray(0, jnp.int32))
            if self.mesh is not None:
                from forwardtacotron_tpu.parallel import mesh as pmesh
                state = jax.device_put(
                    state, pmesh.gan_state_shardings(self.mesh, state))
            state = self.train_session(gen, disc, gen_optimizer,
                                       disc_optimizer, state, session,
                                       train_gta)
        return state

    def _shard_batch(self, batch: Dict[str, jnp.ndarray]
                     ) -> Dict[str, jnp.ndarray]:
        if self.mesh is None:
            return batch
        from forwardtacotron_tpu.parallel.distributed import (
            host_local_batch_to_global)
        return host_local_batch_to_global(self.mesh, batch)

    def train_session(self, gen, disc, gen_optimizer, disc_optimizer,
                      state, session, train_gta: bool) -> GANTrainState:
        current_step = int(state.step)
        training_steps = session.max_step - current_step
        total_iters = len(session.train_set)
        # mid-epoch exact resume (common.py: resume_position)
        epoch0, offset0 = tc.resume_position(current_step,
                                             session.start_step,
                                             total_iters)
        epochs = max((training_steps + offset0) // max(total_iters, 1) + 1,
                     1)
        simple_table([('Remaining',
                       str(training_steps // 1000) + 'k Steps'),
                      ('Batch Size', session.bs),
                      ('LR', session.lr),
                      ('Segment Len', self.train_cfg['seg_len']),
                      ('GTA Train', train_gta)])

        state = state.replace(
            gen_opt=tc.set_learning_rate(state.gen_opt, session.lr),
            disc_opt=tc.set_learning_rate(state.disc_opt, session.lr))
        train_step = build_gan_train_step(gen, disc, gen_optimizer,
                                          disc_optimizer,
                                          self.wav_to_mel,
                                          train_cfg=self.train_cfg)
        eval_step = build_gan_eval_step(gen, self.wav_to_mel)

        loss_avg, duration_avg = tc.Averager(), tc.Averager()

        # async step loop (same scheme as forward_trainer.train_session):
        # host-side step counter + one-iteration-late metric fetch
        step = current_step
        last_t = time.time()

        def flush_metrics(metrics, pstep, pe, pi) -> None:
            nonlocal last_t
            gen_loss = float(metrics['gen_loss'])  # blocks on that step
            loss_avg.add(gen_loss)
            now = time.time()
            duration_avg.add(now - last_t)
            last_t = now
            speed = 1.0 / max(duration_avg.get(), 1e-9)
            msg = (f'| Epoch: {pe}/{epochs} ({pi}/{total_iters}) '
                   f'| Gen: {loss_avg.get():.4} '
                   f'| Disc: {float(metrics["disc_loss"]):.4} '
                   f'| {speed:.1f} steps/s | Step: {pstep // 1000}k | ')
            for name in ('disc_loss', 'gen_loss', 'gen_adv',
                         'gen_fm', 'gen_mel'):
                self.writer.add_scalar(f'Loss/{name}',
                                       float(metrics[name]), pstep)
            self.writer.add_scalar('Params/learning_rate',
                                   session.lr, pstep)
            stream(msg)

        deferred = tc.DeferredFlush(flush_metrics)

        for e in range(1, epochs + 1):
            epoch = epoch0 + e - 1
            start = offset0 if epoch == epoch0 else 0
            batches = session.train_set.batches(epoch, start) \
                if hasattr(session.train_set, 'batches') \
                else session.train_set
            for i, batch in enumerate(Prefetcher(batches), start + 1):
                state, metrics = train_step(
                    state, self._shard_batch(_to_jnp(batch)))
                step += 1
                self._tracer.tick(step)
                deferred.push(metrics, step, e, i)

                if step % self.train_cfg['gen_samples_every'] == 0:
                    mel_loss = self.generate_samples(gen, state, session)
                    if mel_loss is not None:
                        self.track_top_models(mel_loss, state, step)
                if step % self.train_cfg['checkpoint_every'] == 0:
                    self._ckpt.save(state.variables, self.config,
                                    self.paths.hifigan_checkpoints /
                                    f'hifigan_step{step // 1000}k.fjax',
                                    opt_state=(state.gen_opt,
                                               state.disc_opt),
                                    step=step)
                if tc.preempted():
                    stream('\n| Preemption requested — saving '
                           'latest_model and stopping cleanly.\n')
                    break
                if step >= session.max_step:
                    break
            else:
                deferred.flush()
                val_loss = self.evaluate(eval_step, state,
                                         session.val_set)
                self.writer.add_scalar('Loss/val_mel', val_loss, step)
                self._ckpt.save(state.variables, self.config,
                                self.paths.hifigan_checkpoints /
                                'latest_model.fjax',
                                opt_state=(state.gen_opt,
                                           state.disc_opt), step=step)
                loss_avg.reset()
                duration_avg.reset()
                last_t = time.time()
                print(' ')
                continue
            break

        deferred.flush()
        self._ckpt.save(state.variables, self.config,
                        self.paths.hifigan_checkpoints /
                        'latest_model.fjax',
                        opt_state=(state.gen_opt, state.disc_opt),
                        step=step)
        self._ckpt.wait()  # checkpoint durable before the session returns
        return state

    def evaluate(self, eval_step, state, val_set) -> float:
        val_loss, n = 0.0, 0
        for batch in val_set:
            val_loss += float(eval_step(state.gen_params,
                                        _to_jnp(batch)))
            n += 1
        return val_loss / max(n, 1)

    @ignore_exception
    def generate_samples(self, gen, state, session):
        """Vocode whole validation mels; score mel-L1 of the
        resynthesis (the quality proxy the reference uses for its
        vocoder, voc_trainer.py:160-202)."""
        step = int(state.step)
        mel_losses = []
        for idx, sample in enumerate(session.val_set_samples, 1):
            mel = sample['mel']                  # (n_mels, T)
            wav = vocode_generator(gen, state.generator_variables, mel)
            gen_mel = self.dsp.wav_to_mel_bucketed(
                np.asarray(wav, dtype=np.float32))
            T = min(gen_mel.shape[-1], mel.shape[-1])
            mel_losses.append(float(np.mean(
                np.abs(gen_mel[:, :T] - mel[:, :T]))))
            log_audio(self.writer, f'Samples/generated_{idx}',
                      np.asarray(wav, dtype=np.float32), step,
                      self.dsp.sample_rate,
                      fallback_dir=self.paths.hifigan_log / 'audio')
        mel_loss = float(np.mean(mel_losses)) if mel_losses else None
        if mel_loss is not None:
            self.writer.add_scalar('Loss/generated_mel_l1', mel_loss,
                                   step)
        return mel_loss

    def track_top_models(self, mel_loss: float, state, step: int
                         ) -> None:
        """Top-k generator checkpoints by generated mel-L1, via the
        unified tracker (common.py:TopKTracker)."""
        self._top_k.update(mel_loss, state.generator_variables,
                           self.config, None, step)
