"""HiFi-GAN generator — TPU-native neural vocoder (inference).

The reference exports mels for an EXTERNAL HiFi-GAN (`gen_forward.py`
hifigan subcommand saves `.npy`, reference gen_forward.py:129-131;
the sample pages headline HiFiGAN@80k). This module goes beyond that
parity surface: the generator itself, implemented as a time-major
(B, T, C) flax module so a user's trained HiFi-GAN checkpoint (the
official `generator` format) vocodes directly on TPU — a fully
convolutional stack that, unlike the AR WaveRNN, maps 1:1 onto the
MXU with no sequential dependence.

Design notes:
- All convs run in NTC layout via `lax.conv_general_dilated`
  ('NHC'/'HIO') — XLA tiles them onto the MXU; the whole generator is
  one fused program under jit.
- Torch `ConvTranspose1d(k, stride=s, padding=p)` is expressed as an
  input-dilated convolution (lhs_dilation=s, padding k-1-p, flipped
  kernel): identical output, no separate transpose lowering.
- Weight normalization is folded into plain kernels at conversion
  time (w = g * v / ||v||) — inference-exact, one less elementwise op
  per conv at runtime.
- The official V1/V2/V3 configs differ only in these hyperparams
  (resblock kind, upsample rates/kernels, channels), all carried in
  the config dict.
"""
from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

LRELU_SLOPE = 0.1

# official HiFi-GAN V1 hyperparameters (config_v1.json of the official
# release; 22.05 kHz, hop 256) — the default when no config is given
V1_CONFIG = {
    'resblock': '1',
    'upsample_rates': [8, 8, 2, 2],
    'upsample_kernel_sizes': [16, 16, 4, 4],
    'upsample_initial_channel': 512,
    'resblock_kernel_sizes': [3, 7, 11],
    'resblock_dilation_sizes': [[1, 3, 5], [1, 3, 5], [1, 3, 5]],
}


def _conv1d(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
            dilation: int = 1) -> jnp.ndarray:
    """Same-length dilated conv. x (B, T, Cin), w (k, Cin, Cout)."""
    k = w.shape[0]
    pad = (k - 1) * dilation // 2
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(1,), padding=[(pad, pad)],
        rhs_dilation=(dilation,),
        dimension_numbers=('NHC', 'HIO', 'NHC'))
    return y + b


def _conv_transpose1d(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                      stride: int, torch_padding: int) -> jnp.ndarray:
    """torch ConvTranspose1d semantics. w (k, Cin, Cout) ALREADY
    flipped+transposed to regular-conv layout by the converter/init."""
    k = w.shape[0]
    pad = k - 1 - torch_padding
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(1,), padding=[(pad, pad)],
        lhs_dilation=(stride,),
        dimension_numbers=('NHC', 'HIO', 'NHC'))
    return y + b


class _Conv(nn.Module):
    """Plain conv params in flax layout (k, Cin, Cout) + bias."""
    out_channels: int
    kernel: int

    @nn.compact
    def __call__(self, x, dilation: int = 1):
        cin = x.shape[-1]
        bound = 1.0 / (cin * self.kernel) ** 0.5

        def init(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        w = self.param('kernel', init,
                       (self.kernel, cin, self.out_channels))
        b = self.param('bias', init, (self.out_channels,))
        return _conv1d(x, w, b, dilation)


class _ConvT(nn.Module):
    out_channels: int
    kernel: int
    stride: int

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        bound = 1.0 / (cin * self.kernel) ** 0.5

        def init(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        w = self.param('kernel', init,
                       (self.kernel, cin, self.out_channels))
        b = self.param('bias', init, (self.out_channels,))
        return _conv_transpose1d(x, w, b, self.stride,
                                 (self.kernel - self.stride) // 2)


class ResBlock1(nn.Module):
    """V1/V2 MRF block: 3x (dilated conv + dilation-1 conv) residual
    pairs (official model.py ResBlock1 structure)."""
    channels: int
    kernel: int
    dilations: Sequence[int] = (1, 3, 5)

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dilations):
            y = nn.leaky_relu(x, LRELU_SLOPE)
            y = _Conv(self.channels, self.kernel,
                      name=f'convs1_{i}')(y, dilation=d)
            y = nn.leaky_relu(y, LRELU_SLOPE)
            y = _Conv(self.channels, self.kernel,
                      name=f'convs2_{i}')(y, dilation=1)
            x = x + y
        return x


class ResBlock2(nn.Module):
    """V3 MRF block: 2 single dilated-conv residual taps."""
    channels: int
    kernel: int
    dilations: Sequence[int] = (1, 3)

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dilations):
            y = nn.leaky_relu(x, LRELU_SLOPE)
            y = _Conv(self.channels, self.kernel,
                      name=f'convs_{i}')(y, dilation=d)
            x = x + y
        return x


class HiFiGANGenerator(nn.Module):
    """mel (B, T, n_mels) -> waveform (B, T * prod(upsample_rates)).

    Structure-compatible with the official generator so its trained
    checkpoints convert weight-for-weight (see
    `convert_hifigan_generator`).
    """
    resblock: str = '1'
    upsample_rates: Sequence[int] = (8, 8, 2, 2)
    upsample_kernel_sizes: Sequence[int] = (16, 16, 4, 4)
    upsample_initial_channel: int = 512
    resblock_kernel_sizes: Sequence[int] = (3, 7, 11)
    resblock_dilation_sizes: Sequence[Sequence[int]] = \
        ((1, 3, 5), (1, 3, 5), (1, 3, 5))

    @classmethod
    def from_config(cls, config: Dict[str, Any]) -> 'HiFiGANGenerator':
        cfg = dict(V1_CONFIG)
        cfg.update({k: v for k, v in config.items() if k in V1_CONFIG})
        return cls(
            resblock=str(cfg['resblock']),
            upsample_rates=tuple(cfg['upsample_rates']),
            upsample_kernel_sizes=tuple(cfg['upsample_kernel_sizes']),
            upsample_initial_channel=cfg['upsample_initial_channel'],
            resblock_kernel_sizes=tuple(cfg['resblock_kernel_sizes']),
            resblock_dilation_sizes=tuple(
                tuple(d) for d in cfg['resblock_dilation_sizes']))

    @property
    def hop_length(self) -> int:
        return int(np.prod(self.upsample_rates))

    def __hash__(self):  # value-keyed jit caches (see wavernn.py)
        return hash((type(self).__name__, self.resblock,
                     tuple(self.upsample_rates),
                     tuple(self.upsample_kernel_sizes),
                     self.upsample_initial_channel,
                     tuple(self.resblock_kernel_sizes),
                     tuple(map(tuple, self.resblock_dilation_sizes))))

    def __eq__(self, other):
        return isinstance(other, HiFiGANGenerator) \
            and hash(self) == hash(other)

    @nn.compact
    def __call__(self, mel: jnp.ndarray) -> jnp.ndarray:
        block = ResBlock1 if self.resblock == '1' else ResBlock2
        n_kernels = len(self.resblock_kernel_sizes)
        x = _Conv(self.upsample_initial_channel, 7, name='conv_pre')(mel)
        for i, (u, k) in enumerate(zip(self.upsample_rates,
                                       self.upsample_kernel_sizes)):
            ch = self.upsample_initial_channel // (2 ** (i + 1))
            x = nn.leaky_relu(x, LRELU_SLOPE)
            x = _ConvT(ch, k, u, name=f'ups_{i}')(x)
            acc = None
            for j, (kr, dr) in enumerate(zip(
                    self.resblock_kernel_sizes,
                    self.resblock_dilation_sizes)):
                y = block(ch, kr, tuple(dr),
                          name=f'resblocks_{i * n_kernels + j}')(x)
                acc = y if acc is None else acc + y
            x = acc / n_kernels
        # final activation uses the torch default slope 0.01 (the
        # official generator calls leaky_relu without a slope here)
        x = nn.leaky_relu(x, 0.01)
        x = _Conv(1, 7, name='conv_post')(x)
        return jnp.tanh(x)[..., 0]


# ---------------------------------------------------------------------------
# official-checkpoint conversion


def _fold_weight_norm(sd: Dict[str, Any], name: str) -> np.ndarray:
    """weight_norm fold: w = g * v / ||v|| (norm over all dims but 0,
    torch's default dim=0 semantics for conv weights)."""
    v = np.asarray(sd[f'{name}.weight_v'], np.float32)
    g = np.asarray(sd[f'{name}.weight_g'], np.float32)
    norm = np.sqrt((v ** 2).sum(axis=tuple(range(1, v.ndim)),
                                keepdims=True))
    return g * v / norm


def _get_weight(sd: Dict[str, Any], name: str) -> np.ndarray:
    if f'{name}.weight_v' in sd:
        return _fold_weight_norm(sd, name)
    return np.asarray(sd[f'{name}.weight'], np.float32)


def _conv_params(sd: Dict[str, Any], name: str) -> Dict[str, np.ndarray]:
    w = _get_weight(sd, name)          # (Cout, Cin, k)
    return {'kernel': np.transpose(w, (2, 1, 0)),
            'bias': np.asarray(sd[f'{name}.bias'], np.float32)}


def _convt_params(sd: Dict[str, Any], name: str) -> Dict[str, np.ndarray]:
    w = _get_weight(sd, name)          # (Cin, Cout, k) for ConvTranspose
    # flip taps + swap to regular-conv (k, Cin, Cout) layout so the
    # lhs-dilated regular conv reproduces torch ConvTranspose exactly
    return {'kernel': np.transpose(w[:, :, ::-1], (2, 0, 1)).copy(),
            'bias': np.asarray(sd[f'{name}.bias'], np.float32)}


def convert_hifigan_generator(state_dict: Dict[str, Any],
                              model: HiFiGANGenerator) -> Dict[str, Any]:
    """Official `generator` state_dict (conv_pre / ups.N /
    resblocks.N.convs{1,2}.M / conv_post, weight-normed) -> flax params."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params: Dict[str, Any] = {
        'conv_pre': _conv_params(sd, 'conv_pre'),
        'conv_post': _conv_params(sd, 'conv_post'),
    }
    for i in range(len(model.upsample_rates)):
        params[f'ups_{i}'] = _convt_params(sd, f'ups.{i}')
    n_blocks = len(model.upsample_rates) * len(model.resblock_kernel_sizes)
    for n in range(n_blocks):
        blk: Dict[str, Any] = {}
        if model.resblock == '1':
            dils = model.resblock_dilation_sizes[
                n % len(model.resblock_kernel_sizes)]
            for j in range(len(dils)):
                blk[f'convs1_{j}'] = _conv_params(
                    sd, f'resblocks.{n}.convs1.{j}')
                blk[f'convs2_{j}'] = _conv_params(
                    sd, f'resblocks.{n}.convs2.{j}')
        else:
            dils = model.resblock_dilation_sizes[
                n % len(model.resblock_kernel_sizes)]
            for j in range(len(dils)):
                blk[f'convs_{j}'] = _conv_params(
                    sd, f'resblocks.{n}.convs.{j}')
        params[f'resblocks_{n}'] = blk
    return {'params': params}


def load_hifigan(path, config: Dict[str, Any] = None
                 ) -> Tuple[HiFiGANGenerator, Dict[str, Any]]:
    """Load a HiFi-GAN generator checkpoint.

    Accepts this framework's `.fjax` files (from train_hifigan.py —
    either full GAN state or generator-only top-k checkpoints; the
    embedded config rebuilds the model) and official torch files
    ({'generator': state_dict} or a bare state_dict, with an optional
    config dict / auto-detected config.json alongside)."""
    import json
    from pathlib import Path
    path = Path(path)

    if path.suffix == '.fjax':
        from forwardtacotron_tpu.utils.checkpoints import (
            restore_checkpoint)
        payload = restore_checkpoint(path)
        model_cfg = payload['config'].get('hifigan', {}).get('model', {})
        if str(model_cfg.get('generator_type', 'hifigan')) == 'melgan':
            from forwardtacotron_tpu.train.hifigan_trainer import (
                make_generator)
            model = make_generator(payload['config'])
        else:
            model = HiFiGANGenerator.from_config(model_cfg)
        params = payload['model']['params']
        if 'generator' in params:       # full GAN train state
            params = params['generator']
        return model, {'params': params}

    if config is None:
        cand = path.parent / 'config.json'
        if cand.exists():
            with open(cand) as f:
                config = json.load(f)
        else:
            config = V1_CONFIG
    model = HiFiGANGenerator.from_config(config)
    import torch
    ckpt = torch.load(path, map_location='cpu', weights_only=True)
    sd = ckpt.get('generator', ckpt) if isinstance(ckpt, dict) else ckpt
    sd = {k: v.numpy() if hasattr(v, 'numpy') else v
          for k, v in sd.items()}
    variables = convert_hifigan_generator(sd, model)
    return model, variables


def load_gan_vocoder(path, voc_type: str = 'auto',
                     config: Dict[str, Any] = None):
    """Load either GAN generator (HiFi-GAN or MelGAN) from any
    supported checkpoint format.

    `.fjax` files embed their config (generator_type) and dispatch
    themselves. For torch files, `voc_type='auto'` sniffs the state
    dict: HiFi-GAN checkpoints carry `conv_pre`/`ups.*` keys (official
    layout), MelGAN hub files carry positional sequential keys or a
    `model_g` wrapper. Pass voc_type explicitly to override."""
    from pathlib import Path as _Path
    path = _Path(path)
    if voc_type not in ('auto', 'hifigan', 'melgan'):
        raise ValueError(f'unknown voc_type: {voc_type}')
    if path.suffix == '.fjax':
        return load_hifigan(path, config)   # embedded config dispatches
    if voc_type == 'auto':
        import torch
        ckpt = torch.load(path, map_location='cpu', weights_only=True)
        if isinstance(ckpt, dict) and 'model_g' in ckpt:
            voc_type = 'melgan'
        else:
            sd = ckpt.get('generator', ckpt) \
                if isinstance(ckpt, dict) else ckpt
            keys = list(getattr(sd, 'keys', list)())
            hifi = any('conv_pre' in k or k.startswith('ups.')
                       or '.ups.' in k or 'resblocks' in k for k in keys)
            voc_type = 'hifigan' if hifi else 'melgan'
    if voc_type == 'melgan':
        from forwardtacotron_tpu.models.melgan import load_melgan
        return load_melgan(path)
    return load_hifigan(path, config)


_JIT_CACHE: Dict[Any, Any] = {}


def vocode_hifigan(model: HiFiGANGenerator, variables: Dict,
                   mel: np.ndarray, frame_bucket: int = 64,
                   pcm16: bool = False) -> np.ndarray:
    """mel (n_mels, T) or (T, n_mels) -> waveform (T * hop,).

    Pads T up to a `frame_bucket` multiple (one XLA compile per bucket,
    jit-stable shapes) and trims the output to the exact length.
    """
    mel = np.asarray(mel, np.float32)
    if mel.ndim != 2:
        raise ValueError(f'mel must be 2-D, got {mel.shape}')
    n_mels = variables['params']['conv_pre']['kernel'].shape[1]
    if mel.shape[0] == n_mels and mel.shape[1] != n_mels:
        mel = mel.T                     # (n_mels, T) -> (T, n_mels)
    t = mel.shape[0]
    t_pad = ((t + frame_bucket - 1) // frame_bucket) * frame_bucket
    if t_pad > t:
        mel = np.pad(mel, ((0, t_pad - t), (0, 0)))

    key = (model, t_pad, pcm16)
    run = _JIT_CACHE.get(key)
    if run is None:
        def _run(variables, mel):
            wav = model.apply(variables, mel[None])[0]
            if pcm16:
                wav = (jnp.clip(wav, -1.0, 1.0) * 32767.0
                       ).astype(jnp.int16)
            return wav
        run = jax.jit(_run)
        _JIT_CACHE[key] = run
    wav = np.asarray(run(variables, jnp.asarray(mel)))
    return wav[:t * model.hop_length]
