"""HiFi-GAN generator tests.

Parity target is a minimal torch implementation of the official
generator architecture (written here from the published architecture:
conv_pre -> [lrelu, ConvTranspose, MRF resblock average] per upsample
stage -> lrelu -> conv_post -> tanh, weight-normed convs) using the
official checkpoint key layout (conv_pre / ups.N / resblocks.N.convsX.M
/ conv_post). This validates the JAX module's conv semantics AND the
weight-norm-folding converter, so a real trained official checkpoint
loads correctly.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip('torch')
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from forwardtacotron_tpu.models.hifigan import (  # noqa: E402
    HiFiGANGenerator, convert_hifigan_generator, vocode_hifigan)


def _wn(m):
    return tnn.utils.weight_norm(m)


class _TorchResBlock1(tnn.Module):
    def __init__(self, ch, k, dilations):
        super().__init__()
        self.convs1 = tnn.ModuleList([
            _wn(tnn.Conv1d(ch, ch, k, 1, dilation=d,
                           padding=(k - 1) * d // 2)) for d in dilations])
        self.convs2 = tnn.ModuleList([
            _wn(tnn.Conv1d(ch, ch, k, 1, dilation=1, padding=(k - 1) // 2))
            for _ in dilations])

    def forward(self, x):
        for c1, c2 in zip(self.convs1, self.convs2):
            y = F.leaky_relu(x, 0.1)
            y = c1(y)
            y = F.leaky_relu(y, 0.1)
            y = c2(y)
            x = x + y
        return x


class _TorchResBlock2(tnn.Module):
    def __init__(self, ch, k, dilations):
        super().__init__()
        self.convs = tnn.ModuleList([
            _wn(tnn.Conv1d(ch, ch, k, 1, dilation=d,
                           padding=(k - 1) * d // 2)) for d in dilations])

    def forward(self, x):
        for c in self.convs:
            y = F.leaky_relu(x, 0.1)
            y = c(y)
            x = x + y
        return x


class _TorchGenerator(tnn.Module):
    def __init__(self, cfg, n_mels=80):
        super().__init__()
        ch0 = cfg['upsample_initial_channel']
        self.conv_pre = _wn(tnn.Conv1d(n_mels, ch0, 7, 1, padding=3))
        block = _TorchResBlock1 if cfg['resblock'] == '1' \
            else _TorchResBlock2
        self.ups = tnn.ModuleList()
        self.resblocks = tnn.ModuleList()
        self.num_kernels = len(cfg['resblock_kernel_sizes'])
        for i, (u, k) in enumerate(zip(cfg['upsample_rates'],
                                       cfg['upsample_kernel_sizes'])):
            cin, cout = ch0 // (2 ** i), ch0 // (2 ** (i + 1))
            self.ups.append(_wn(tnn.ConvTranspose1d(
                cin, cout, k, u, padding=(k - u) // 2)))
            for kr, dr in zip(cfg['resblock_kernel_sizes'],
                              cfg['resblock_dilation_sizes']):
                self.resblocks.append(block(cout, kr, dr))
        self.conv_post = _wn(tnn.Conv1d(cout, 1, 7, 1, padding=3))

    def forward(self, mel):
        x = self.conv_pre(mel)
        for i, up in enumerate(self.ups):
            x = F.leaky_relu(x, 0.1)
            x = up(x)
            xs = 0
            for j in range(self.num_kernels):
                xs = xs + self.resblocks[i * self.num_kernels + j](x)
            x = xs / self.num_kernels
        x = F.leaky_relu(x)
        return torch.tanh(self.conv_post(x))


TINY = {
    'resblock': '1',
    'upsample_rates': [4, 2, 2],
    'upsample_kernel_sizes': [8, 4, 4],
    'upsample_initial_channel': 32,
    'resblock_kernel_sizes': [3, 5],
    'resblock_dilation_sizes': [[1, 3], [1, 3]],
}


def _parity(cfg, n_mels=12, T=17, atol=2e-5):
    torch.manual_seed(0)
    tmodel = _TorchGenerator(cfg, n_mels=n_mels).eval()
    model = HiFiGANGenerator.from_config(cfg)
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    variables = convert_hifigan_generator(sd, model)

    mel = np.random.RandomState(1).randn(2, n_mels, T).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(mel))[:, 0].numpy()
    got = np.asarray(model.apply(
        jax.tree.map(jnp.asarray, variables),
        jnp.asarray(mel.transpose(0, 2, 1))))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=atol)


def test_generator_parity_v1_style():
    _parity(TINY)


def test_generator_parity_resblock2():
    cfg = dict(TINY, resblock='2',
               resblock_dilation_sizes=[[1, 3], [1, 3]])
    _parity(cfg)


def test_generator_parity_odd_kernels_and_rates():
    cfg = dict(TINY, upsample_rates=[8, 2], upsample_kernel_sizes=[16, 4],
               resblock_kernel_sizes=[3, 7, 11],
               resblock_dilation_sizes=[[1, 3, 5]] * 3)
    _parity(cfg)


def test_vocode_hifigan_bucketing_and_pcm16():
    model = HiFiGANGenerator.from_config(TINY)
    n_mels, T = 12, 23
    mel = np.random.RandomState(2).randn(n_mels, T).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 8, n_mels)))
    hop = model.hop_length
    wav = vocode_hifigan(model, variables, mel, frame_bucket=8)
    assert wav.shape == (T * hop,)
    assert np.isfinite(wav).all()
    # (T, n_mels) orientation gives the same result
    wav2 = vocode_hifigan(model, variables, mel.T, frame_bucket=8)
    np.testing.assert_allclose(wav, wav2)
    # padding must not change the unpadded prefix (convs see zero pad
    # only beyond the true frames; check the region unaffected by the
    # receptive field at the junction)
    pcm = vocode_hifigan(model, variables, mel, frame_bucket=8, pcm16=True)
    assert pcm.dtype == np.int16
    assert pcm.shape == (T * hop,)


def test_official_checkpoint_file_roundtrip(tmp_path):
    """A torch-saved {'generator': sd} file + config.json loads via
    load_hifigan."""
    import json
    from forwardtacotron_tpu.models.hifigan import load_hifigan
    torch.manual_seed(3)
    tmodel = _TorchGenerator(TINY, n_mels=12).eval()
    p = tmp_path / 'g_00100000'
    torch.save({'generator': tmodel.state_dict()}, p)
    with open(tmp_path / 'config.json', 'w') as f:
        json.dump(dict(TINY, num_mels=12), f)
    model, variables = load_hifigan(p)
    assert model.upsample_rates == tuple(TINY['upsample_rates'])
    mel = np.random.RandomState(4).randn(1, 12, 9).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(mel))[:, 0].numpy()
    got = np.asarray(model.apply(
        jax.tree.map(jnp.asarray, variables),
        jnp.asarray(mel.transpose(0, 2, 1))))
    np.testing.assert_allclose(got, want, atol=2e-5)
