"""MelGAN generator tests.

Parity target: a minimal torch implementation of the hub MelGAN
generator architecture the reference consumes via torch.hub
(notebook_utils/synthesize.py in the reference): reflection-padded
stem conv, per upsample stage [lrelu, weight-normed ConvTranspose,
3-block dilated residual stack with 1x1 shortcuts], lrelu,
reflection-padded head conv, tanh. Exercises the POSITIONAL
shape-matched converter, which must also survive arbitrary key
prefixes (hub checkpoints nest under `generator.`)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip('torch')
import torch.nn as tnn  # noqa: E402

from forwardtacotron_tpu.models.melgan import (  # noqa: E402
    MelGANGenerator, convert_melgan_generator, load_melgan,
    vocode_melgan)


def _wn(m):
    return tnn.utils.weight_norm(m)


class _TorchResStack(tnn.Module):
    def __init__(self, ch):
        super().__init__()
        self.blocks = tnn.ModuleList([
            tnn.Sequential(
                tnn.LeakyReLU(0.2),
                tnn.ReflectionPad1d(3 ** i),
                _wn(tnn.Conv1d(ch, ch, 3, dilation=3 ** i)),
                tnn.LeakyReLU(0.2),
                _wn(tnn.Conv1d(ch, ch, 1)),
            ) for i in range(3)])
        self.shortcuts = tnn.ModuleList([
            _wn(tnn.Conv1d(ch, ch, 1)) for _ in range(3)])

    def forward(self, x):
        for block, shortcut in zip(self.blocks, self.shortcuts):
            x = shortcut(x) + block(x)
        return x


class _TorchMelGAN(tnn.Module):
    def __init__(self, n_mels=80, ch0=512, rates=(8, 8, 2, 2)):
        super().__init__()
        layers = [tnn.ReflectionPad1d(3),
                  _wn(tnn.Conv1d(n_mels, ch0, 7))]
        ch = ch0
        for r in rates:
            layers += [tnn.LeakyReLU(0.2),
                       _wn(tnn.ConvTranspose1d(ch, ch // 2, 2 * r, r,
                                               padding=(2 * r - r) // 2)),
                       _TorchResStack(ch // 2)]
            ch //= 2
        layers += [tnn.LeakyReLU(0.2), tnn.ReflectionPad1d(3),
                   _wn(tnn.Conv1d(ch, 1, 7)), tnn.Tanh()]
        self.generator = tnn.Sequential(*layers)

    def forward(self, mel):
        return self.generator(mel)


TINY = dict(n_mels=12, ch0=32, rates=(4, 2, 2))


def _models(seed=0):
    torch.manual_seed(seed)
    tmodel = _TorchMelGAN(**TINY).eval()
    model = MelGANGenerator(n_mels=TINY['n_mels'],
                            base_channels=TINY['ch0'],
                            upsample_rates=TINY['rates'])
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    variables = convert_melgan_generator(sd, model)
    return tmodel, model, variables


def test_generator_parity():
    tmodel, model, variables = _models()
    mel = np.random.RandomState(1).randn(2, TINY['n_mels'], 19) \
        .astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(mel))[:, 0].numpy()
    got = np.asarray(model.apply(
        jax.tree.map(jnp.asarray, variables),
        jnp.asarray(mel.transpose(0, 2, 1))))
    assert got.shape == want.shape
    hop = int(np.prod(TINY['rates']))
    assert got.shape[-1] == 19 * hop
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_converter_counts_convs():
    _, model, _ = _models()
    with pytest.raises(ValueError, match='architecture mismatch'):
        convert_melgan_generator({'x.weight': np.zeros((4, 4, 1)),
                                  'x.bias': np.zeros(4)}, model)


def test_load_melgan_infers_shape_and_matches(tmp_path):
    tmodel, _, _ = _models(seed=2)
    p = tmp_path / 'melgan.pt'
    torch.save({'model_g': tmodel.state_dict()}, p)
    model, variables = load_melgan(p, upsample_rates=TINY['rates'])
    assert model.n_mels == TINY['n_mels']
    assert model.base_channels == TINY['ch0']
    mel = np.random.RandomState(3).randn(1, TINY['n_mels'], 11) \
        .astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(mel))[:, 0].numpy()
    got = np.asarray(model.apply(
        jax.tree.map(jnp.asarray, variables),
        jnp.asarray(mel.transpose(0, 2, 1))))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_vocode_melgan_lengths():
    _, model, variables = _models(seed=4)
    variables = jax.tree.map(jnp.asarray, variables)
    mel = np.random.RandomState(5).randn(TINY['n_mels'], 21) \
        .astype(np.float32)
    hop = model.hop_length
    wav = vocode_melgan(model, variables, mel, frame_bucket=8)
    assert wav.shape == (21 * hop,)
    assert np.isfinite(wav).all()
    pcm = vocode_melgan(model, variables, mel, frame_bucket=8, pcm16=True)
    assert pcm.dtype == np.int16 and pcm.shape == (21 * hop,)
