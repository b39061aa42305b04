"""MelGAN generator — TPU-native neural vocoder (inference).

The reference's notebook synthesizer pulls a pretrained MelGAN from
torch.hub and its gen CLIs export `.mel` files for it
(notebook_utils/synthesize.py:1-58, gen_forward.py:120-127). This
module implements that generator (the hub model's architecture:
reflection-padded conv stem, 4 weight-normed ConvTranspose upsample
stages with 3-block dilated residual stacks, tanh head) as a
time-major flax convnet so checkpoints of that lineage vocode directly
on TPU in one fused XLA program.

Conversion is POSITIONAL: weight-normed conv tensors are folded and
matched to this module's conv list in definition order with shape
checking, so the converter tolerates the naming differences between
melgan forks (hub `model.generator.N...`, descript `generator.N...`)
as long as the architecture matches.
"""
from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from forwardtacotron_tpu.models.hifigan import (_conv1d,
                                                _conv_transpose1d)

LRELU = 0.2


def _reflect_pad(x: jnp.ndarray, pad: int) -> jnp.ndarray:
    return jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode='reflect')


class _Conv(nn.Module):
    out_channels: int
    kernel: int

    @nn.compact
    def __call__(self, x, dilation: int = 1, pad: bool = False):
        cin = x.shape[-1]
        bound = 1.0 / (cin * self.kernel) ** 0.5

        def init(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        w = self.param('kernel', init,
                       (self.kernel, cin, self.out_channels))
        b = self.param('bias', init, (self.out_channels,))
        if pad:                     # valid conv over reflection padding
            x = _reflect_pad(x, (self.kernel - 1) * dilation // 2)
            y = jax.lax.conv_general_dilated(
                x, w, window_strides=(1,), padding=[(0, 0)],
                rhs_dilation=(dilation,),
                dimension_numbers=('NHC', 'HIO', 'NHC'))
            return y + b
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


class ResStack(nn.Module):
    """3 dilated residual blocks with 1x1 shortcut convs:
    x = shortcut(x) + conv1x1(lrelu(conv_d(lrelu(x))))."""
    channels: int
    n_blocks: int = 3

    @nn.compact
    def __call__(self, x):
        for i in range(self.n_blocks):
            d = 3 ** i
            y = nn.leaky_relu(x, LRELU)
            y = _Conv(self.channels, 3, name=f'block_{i}_dilated')(
                y, dilation=d, pad=True)
            y = nn.leaky_relu(y, LRELU)
            y = _Conv(self.channels, 1, name=f'block_{i}_out')(y)
            s = _Conv(self.channels, 1, name=f'shortcut_{i}')(x)
            x = s + y
        return x


class MelGANGenerator(nn.Module):
    """mel (B, T, n_mels) -> waveform (B, T * hop). hop = prod(rates)."""
    n_mels: int = 80
    base_channels: int = 512
    upsample_rates: Sequence[int] = (8, 8, 2, 2)

    @property
    def hop_length(self) -> int:
        return int(np.prod(self.upsample_rates))

    def __hash__(self):
        return hash((type(self).__name__, self.n_mels,
                     self.base_channels, tuple(self.upsample_rates)))

    def __eq__(self, other):
        return isinstance(other, MelGANGenerator) \
            and hash(self) == hash(other)

    @nn.compact
    def __call__(self, mel: jnp.ndarray) -> jnp.ndarray:
        x = _Conv(self.base_channels, 7, name='conv_pre')(mel, pad=True)
        ch = self.base_channels
        for i, r in enumerate(self.upsample_rates):
            ch //= 2
            x = nn.leaky_relu(x, LRELU)
            x = _ConvT(ch, 2 * r, r, name=f'ups_{i}')(x)
            x = ResStack(ch, name=f'res_{i}')(x)
        x = nn.leaky_relu(x, LRELU)
        x = _Conv(1, 7, name='conv_post')(x, pad=True)
        return jnp.tanh(x)[..., 0]


# ---------------------------------------------------------------------------
# positional converter


def _fold_wn(sd: Dict[str, np.ndarray], base: str) -> np.ndarray:
    v = np.asarray(sd[f'{base}.weight_v'], np.float32)
    g = np.asarray(sd[f'{base}.weight_g'], np.float32)
    norm = np.sqrt((v ** 2).sum(axis=tuple(range(1, v.ndim)),
                                keepdims=True))
    return g * v / norm


def _ordered_convs(sd: Dict[str, Any]) -> List[Tuple[np.ndarray,
                                                     np.ndarray]]:
    """(weight, bias) pairs in state-dict order, weight norm folded."""
    out = []
    for k in sd:
        if k.endswith('.weight_v'):
            base = k[:-len('.weight_v')]
            out.append((_fold_wn(sd, base),
                        np.asarray(sd[f'{base}.bias'], np.float32)))
        elif k.endswith('.weight') and f'{k[:-7]}.bias' in sd:
            base = k[:-len('.weight')]
            out.append((np.asarray(sd[k], np.float32),
                        np.asarray(sd[f'{base}.bias'], np.float32)))
    return out


def convert_melgan_generator(state_dict: Dict[str, Any],
                             model: MelGANGenerator) -> Dict[str, Any]:
    """Match torch conv tensors to this module's convs positionally.

    Both the hub generator and this module define convs in the same
    order (stem, then per stage: ConvTranspose + 3x[dilated, 1x1,
    shortcut], then head). Each assignment is shape-checked; a
    mismatch raises with both shapes so architecture drift is loud,
    not silent.
    """
    convs = _ordered_convs({k: np.asarray(v)
                            for k, v in state_dict.items()})
    # flax-side conv slots in definition order
    # state-dict order: the ResStack defines its `blocks` ModuleList
    # before `shortcuts`, so all dilated/1x1 pairs precede the
    # shortcut convs within each stage
    slots: List[Tuple[str, ...]] = [('conv_pre',)]
    for i in range(len(model.upsample_rates)):
        slots.append((f'ups_{i}',))
        for j in range(3):
            slots.append((f'res_{i}', f'block_{j}_dilated'))
            slots.append((f'res_{i}', f'block_{j}_out'))
        for j in range(3):
            slots.append((f'res_{i}', f'shortcut_{j}'))
    slots.append(('conv_post',))
    if len(convs) != len(slots):
        raise ValueError(
            f'checkpoint has {len(convs)} conv layers, the generator '
            f'defines {len(slots)} — architecture mismatch')

    params: Dict[str, Any] = {}
    for slot, (w, b) in zip(slots, convs):
        is_transpose = slot[0].startswith('ups_')
        if is_transpose:              # torch (Cin, Cout, k)
            kernel = np.transpose(w[:, :, ::-1], (2, 0, 1)).copy()
        else:                         # torch (Cout, Cin, k)
            kernel = np.transpose(w, (2, 1, 0))
        node = params
        for part in slot[:-1]:
            node = node.setdefault(part, {})
        node[slot[-1]] = {'kernel': kernel, 'bias': b}
        want_cout = b.shape[0]
        if kernel.shape[-1] != want_cout:
            raise ValueError(f'{slot}: kernel {kernel.shape} does not '
                             f'end in Cout={want_cout}')
    return {'params': params}


def load_melgan(path, n_mels: int = 80,
                upsample_rates: Sequence[int] = (8, 8, 2, 2)
                ) -> Tuple[MelGANGenerator, Dict[str, Any]]:
    """Load a MelGAN generator checkpoint (torch file: bare state_dict
    or {'model_g'| 'generator': sd}; hub-style `generator.*` prefixes
    are fine because matching is positional)."""
    import torch
    ckpt = torch.load(path, map_location='cpu', weights_only=True)
    if isinstance(ckpt, dict):
        for key in ('model_g', 'generator', 'state_dict'):
            if key in ckpt and isinstance(ckpt[key], dict):
                ckpt = ckpt[key]
                break
    sd = {k: v.numpy() if hasattr(v, 'numpy') else np.asarray(v)
          for k, v in ckpt.items()}
    stem = next(w for w, _ in _ordered_convs(sd))
    model = MelGANGenerator(n_mels=stem.shape[1],
                            base_channels=stem.shape[0],
                            upsample_rates=tuple(upsample_rates))
    return model, convert_melgan_generator(sd, model)


_JIT_CACHE: Dict[Any, Any] = {}


def vocode_melgan(model: MelGANGenerator, variables: Dict,
                  mel: np.ndarray, frame_bucket: int = 64,
                  pcm16: bool = False) -> np.ndarray:
    """mel (n_mels, T) or (T, n_mels) -> waveform (T * hop,)."""
    mel = np.asarray(mel, np.float32)
    if mel.shape[0] == model.n_mels and mel.shape[1] != model.n_mels:
        mel = mel.T
    t = mel.shape[0]
    t_pad = ((t + frame_bucket - 1) // frame_bucket) * frame_bucket
    if t_pad > t:
        mel = np.pad(mel, ((0, t_pad - t), (0, 0)), mode='edge')

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
