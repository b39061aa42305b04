"""Reverse checkpoint converters: this framework's flax variables ->
reference-format torch checkpoints.

`torch_compat.py` makes reference `.pt` files load here; this module is
its inverse, so models TRAINED here deploy on the reference (or any
torch runtime) unchanged: the exported file is exactly what the
reference's own `save_checkpoint` writes
(`/root/reference/utils/checkpoints.py:12-18` —
``torch.save({'model': state_dict, 'optim': ..., 'config': config})``),
with the full strict-load key set including buffers
(``step``, BatchNorm ``num_batches_tracked``, FastPitch positional
``pe``, Tacotron ``decoder.r``/``stop_threshold``), so
``model.load_state_dict(checkpoint['model'])`` in the reference's
loaders (`/root/reference/gen_forward.py:19-38`) succeeds with
``strict=True``. ``optim`` is saved as ``None``: the reference reads it
only when resuming training; export targets inference/deployment.

Weight-layout transforms are the exact inverses of `torch_compat.py`:
conv kernels transpose back (W,Cin,Cout)->(Cout,Cin,W), dense kernels
transpose back, RNN gate layouts are shared (torch ordering is the
on-disk layout in both directions).
"""
from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import numpy as np


def _t(a):
    import torch
    return torch.from_numpy(np.ascontiguousarray(np.asarray(a)))


def _long_scalar(v: int):
    import torch
    return torch.tensor([int(v)], dtype=torch.long)


# -------------------------------------------------------------- primitives
# Each put_* writes the torch keys that the matching reader in
# torch_compat.py consumes.

def put_conv1d(out: Dict, name: str, p: Dict) -> None:
    out[f'{name}.weight'] = _t(np.transpose(np.asarray(p['kernel']),
                                            (2, 1, 0)))
    if 'bias' in p:
        out[f'{name}.bias'] = _t(p['bias'])


def put_dense(out: Dict, name: str, p: Dict) -> None:
    out[f'{name}.weight'] = _t(np.asarray(p['kernel']).T)
    if 'bias' in p:
        out[f'{name}.bias'] = _t(p['bias'])


def put_embed(out: Dict, name: str, p: Dict) -> None:
    out[f'{name}.weight'] = _t(p['embedding'])


def put_batchnorm(out: Dict, name: str, params: Dict, stats: Dict) -> None:
    import torch
    out[f'{name}.weight'] = _t(params['scale'])
    out[f'{name}.bias'] = _t(params['bias'])
    out[f'{name}.running_mean'] = _t(stats['mean'])
    out[f'{name}.running_var'] = _t(stats['var'])
    # strict-load requires the buffer; its value only matters for
    # momentum=None BN, which the reference never uses
    out[f'{name}.num_batches_tracked'] = torch.tensor(0, dtype=torch.long)


def put_rnn_dir(out: Dict, name: str, d: Dict, reverse: bool = False) -> None:
    sfx = '_reverse' if reverse else ''
    out[f'{name}.weight_ih_l0{sfx}'] = _t(d['w_ih'])
    out[f'{name}.weight_hh_l0{sfx}'] = _t(d['w_hh'])
    out[f'{name}.bias_ih_l0{sfx}'] = _t(d['b_ih'])
    out[f'{name}.bias_hh_l0{sfx}'] = _t(d['b_hh'])


def put_birnn(out: Dict, name: str, p: Dict) -> None:
    put_rnn_dir(out, name, p['fwd'])
    put_rnn_dir(out, name, p['bwd'], reverse=True)


def put_bn_conv(out: Dict, name: str, params: Dict, stats: Dict) -> None:
    put_conv1d(out, f'{name}.conv', params['conv'])
    put_batchnorm(out, f'{name}.bnorm', params['bnorm'], stats['bnorm'])


def put_cbhg(out: Dict, name: str, params: Dict, stats: Dict,
             K: int, num_highways: int) -> None:
    for i in range(K):
        put_bn_conv(out, f'{name}.conv1d_bank.{i}',
                    params[f'bank_{i + 1}'], stats[f'bank_{i + 1}'])
    put_bn_conv(out, f'{name}.conv_project1', params['proj1'],
                stats['proj1'])
    put_bn_conv(out, f'{name}.conv_project2', params['proj2'],
                stats['proj2'])
    put_dense(out, f'{name}.pre_highway', params['pre_highway'])
    for i in range(num_highways):
        put_dense(out, f'{name}.highways.{i}.W1',
                  params[f'highway_{i}']['W1'])
        put_dense(out, f'{name}.highways.{i}.W2',
                  params[f'highway_{i}']['W2'])
    put_birnn(out, f'{name}.rnn', params['rnn'])


def put_series_predictor(out: Dict, name: str, params: Dict,
                         stats: Dict) -> None:
    put_embed(out, f'{name}.embedding', params['embedding'])
    for i in range(3):
        put_bn_conv(out, f'{name}.convs.{i}', params[f'conv_{i}'],
                    stats[f'conv_{i}'])
    put_birnn(out, f'{name}.rnn', params['rnn'])
    put_dense(out, f'{name}.lin', params['lin'])


def _pick_params(variables: Dict[str, Any], use_ema: bool) -> Dict:
    if use_ema and variables.get('ema_params'):
        return variables['ema_params']
    return variables['params']


def _reject_multispeaker(params: Dict) -> None:
    for key in ('speaker_embedding', 'speaker_proj'):
        if key in params:
            raise ValueError(
                'Checkpoint is multi-speaker (beyond-reference); the '
                'reference architecture has no speaker conditioning, so '
                'it cannot be exported to a reference .pt. Re-train with '
                'n_speakers: 1 for torch deployment.')


# ------------------------------------------------------------------ models

def export_forward_tacotron(variables: Dict[str, Any],
                            model_cfg: Dict[str, Any], step: int = 0,
                            use_ema: bool = True) -> Dict[str, Any]:
    """Inverse of torch_compat.convert_forward_tacotron."""
    params = _pick_params(variables, use_ema)
    stats = variables.get('batch_stats', {})
    _reject_multispeaker(params)
    out: Dict[str, Any] = {}
    out['step'] = _long_scalar(step)
    put_embed(out, 'embedding', params['embedding'])
    put_cbhg(out, 'prenet', params['prenet'], stats['prenet'],
             K=model_cfg['prenet_k'],
             num_highways=model_cfg['prenet_num_highways'])
    for pred in ('dur_pred', 'pitch_pred', 'energy_pred'):
        put_series_predictor(out, pred, params[pred], stats[pred])
    put_conv1d(out, 'pitch_proj', params['pitch_proj'])
    put_conv1d(out, 'energy_proj', params['energy_proj'])
    put_birnn(out, 'lstm', params['lstm'])
    put_dense(out, 'lin', params['lin'])
    put_cbhg(out, 'postnet', params['postnet'], stats['postnet'],
             K=model_cfg['postnet_k'],
             num_highways=model_cfg['postnet_num_highways'])
    put_dense(out, 'post_proj', params['post_proj'])
    return out


def _positional_encoding(d_model: int, max_len: int = 5000):
    """The reference PositionalEncoding buffer, recomputed exactly
    (/root/reference/models/fast_pitch.py:18-30)."""
    import torch
    pe = torch.zeros(max_len, d_model)
    position = torch.arange(0, max_len, dtype=torch.float).unsqueeze(1)
    div_term = torch.exp(torch.arange(0, d_model, 2).float()
                         * (-math.log(10000.0) / d_model))
    pe[:, 0::2] = torch.sin(position * div_term)
    pe[:, 1::2] = torch.cos(position * div_term)
    return pe.unsqueeze(0).transpose(0, 1)


def put_fft_block(out: Dict, name: str, p: Dict) -> None:
    out[f'{name}.self_attn.in_proj_weight'] = \
        _t(p['self_attn']['in_proj_weight'])
    out[f'{name}.self_attn.in_proj_bias'] = \
        _t(p['self_attn']['in_proj_bias'])
    put_dense(out, f'{name}.self_attn.out_proj',
              p['self_attn']['out_proj'])
    put_conv1d(out, f'{name}.conv1', p['conv1'])
    put_conv1d(out, f'{name}.conv2', p['conv2'])
    for norm in ('norm1', 'norm2'):
        out[f'{name}.{norm}.weight'] = _t(p[norm]['scale'])
        out[f'{name}.{norm}.bias'] = _t(p[norm]['bias'])


def put_forward_transformer(out: Dict, name: str, p: Dict,
                            n_layers: int) -> None:
    out[f'{name}.pos_encoder.scale'] = _t(p['pos_scale'])
    # d_model from the attention packed-qkv width
    d_model = int(np.asarray(
        p['layer_0']['self_attn']['in_proj_weight']).shape[1])
    out[f'{name}.pos_encoder.pe'] = _positional_encoding(d_model)
    out[f'{name}.norm.weight'] = _t(p['norm']['scale'])
    out[f'{name}.norm.bias'] = _t(p['norm']['bias'])
    for i in range(n_layers):
        put_fft_block(out, f'{name}.layers.{i}', p[f'layer_{i}'])


def put_fp_series_predictor(out: Dict, name: str, p: Dict,
                            n_layers: int) -> None:
    put_embed(out, f'{name}.embedding', p['embedding'])
    put_forward_transformer(out, f'{name}.transformer', p['transformer'],
                            n_layers)
    put_dense(out, f'{name}.lin', p['lin'])


def export_fast_pitch(variables: Dict[str, Any],
                      model_cfg: Dict[str, Any], step: int = 0,
                      use_ema: bool = True) -> Dict[str, Any]:
    """Inverse of torch_compat.convert_fast_pitch."""
    params = _pick_params(variables, use_ema)
    _reject_multispeaker(params)
    out: Dict[str, Any] = {}
    out['step'] = _long_scalar(step)
    put_embed(out, 'embedding', params['embedding'])
    put_fp_series_predictor(out, 'dur_pred', params['dur_pred'],
                            model_cfg['durpred_layers'])
    put_fp_series_predictor(out, 'pitch_pred', params['pitch_pred'],
                            model_cfg['pitch_layers'])
    put_fp_series_predictor(out, 'energy_pred', params['energy_pred'],
                            model_cfg['energy_layers'])
    put_forward_transformer(out, 'prenet', params['prenet'],
                            model_cfg['prenet_layers'])
    put_forward_transformer(out, 'postnet', params['postnet'],
                            model_cfg['postnet_layers'])
    put_conv1d(out, 'pitch_proj', params['pitch_proj'])
    put_conv1d(out, 'energy_proj', params['energy_proj'])
    put_dense(out, 'lin', params['lin'])
    return out


def put_cell(out: Dict, name: str, params: Dict, prefix: str) -> None:
    out[f'{name}.weight_ih'] = _t(params[f'{prefix}_w_ih'])
    out[f'{name}.weight_hh'] = _t(params[f'{prefix}_w_hh'])
    out[f'{name}.bias_ih'] = _t(params[f'{prefix}_b_ih'])
    out[f'{name}.bias_hh'] = _t(params[f'{prefix}_b_hh'])


def put_prenet(out: Dict, name: str, p: Dict) -> None:
    put_dense(out, f'{name}.fc1', p['fc1'])
    put_dense(out, f'{name}.fc2', p['fc2'])


def export_tacotron(variables: Dict[str, Any], model_cfg: Dict[str, Any],
                    step: int = 0, r: int = 1,
                    use_ema: bool = True) -> Dict[str, Any]:
    """Inverse of torch_compat.convert_tacotron."""
    import torch
    params = _pick_params(variables, use_ema)
    stats = variables.get('batch_stats', {})
    _reject_multispeaker(params)
    out: Dict[str, Any] = {}
    out['step'] = _long_scalar(step)
    out['decoder.r'] = torch.tensor(int(r), dtype=torch.int)
    out['stop_threshold'] = torch.tensor(
        float(model_cfg.get('stop_threshold', -11.0)), dtype=torch.float32)
    put_embed(out, 'encoder.embedding', params['encoder']['embedding'])
    put_prenet(out, 'encoder.pre_net', params['encoder']['pre_net'])
    put_cbhg(out, 'encoder.cbhg', params['encoder']['cbhg'],
             stats['encoder']['cbhg'], K=model_cfg['encoder_k'],
             num_highways=model_cfg['num_highways'])
    put_dense(out, 'encoder_proj', params['encoder_proj'])
    put_prenet(out, 'decoder.prenet', params['dec_prenet'])
    put_conv1d(out, 'decoder.attn_net.conv', params['lsa_conv'])
    put_dense(out, 'decoder.attn_net.L', params['lsa_L'])
    put_dense(out, 'decoder.attn_net.W', params['lsa_W'])
    put_dense(out, 'decoder.attn_net.v', params['lsa_v'])
    put_cell(out, 'decoder.attn_rnn', params, 'attn_rnn')
    put_dense(out, 'decoder.rnn_input', params['rnn_input'])
    put_cell(out, 'decoder.res_rnn1', params, 'res_rnn1')
    put_cell(out, 'decoder.res_rnn2', params, 'res_rnn2')
    put_dense(out, 'decoder.mel_proj', params['mel_proj'])
    put_cbhg(out, 'postnet', params['postnet'], stats['postnet'],
             K=model_cfg['postnet_k'],
             num_highways=model_cfg['num_highways'])
    put_dense(out, 'post_proj', params['post_proj'])
    return out


def export_wavernn(variables: Dict[str, Any], model_cfg: Dict[str, Any],
                   step: int = 0, use_ema: bool = True) -> Dict[str, Any]:
    """Inverse of torch_compat.convert_wavernn."""
    params = _pick_params(variables, use_ema)
    stats = variables.get('batch_stats', {})
    out: Dict[str, Any] = {}
    out['step'] = _long_scalar(step)

    rp = params['upsample']['resnet']
    rs = stats['upsample']['resnet']
    put_conv1d(out, 'upsample.resnet.conv_in', rp['conv_in'])
    put_conv1d(out, 'upsample.resnet.conv_out', rp['conv_out'])
    put_batchnorm(out, 'upsample.resnet.batch_norm', rp['batch_norm'],
                  rs['batch_norm'])
    for i in range(model_cfg['res_blocks']):
        bp, bs = rp[f'res_{i}'], rs[f'res_{i}']
        put_conv1d(out, f'upsample.resnet.layers.{i}.conv1', bp['conv1'])
        put_conv1d(out, f'upsample.resnet.layers.{i}.conv2', bp['conv2'])
        for bn in ('batch_norm1', 'batch_norm2'):
            put_batchnorm(out, f'upsample.resnet.layers.{i}.{bn}',
                          bp[bn], bs[bn])
    for i in range(len(model_cfg['upsample_factors'])):
        w = np.asarray(params['upsample'][f'up_conv_{i}'])
        out[f'upsample.up_layers.{2 * i + 1}.weight'] = \
            _t(w.reshape(1, 1, 1, -1))

    out['I.weight'] = _t(np.asarray(params['I_kernel']).T)
    out['I.bias'] = _t(params['I_bias'])
    for rnn_name in ('rnn1', 'rnn2'):
        put_rnn_dir(out, rnn_name,
                    {k: params[f'{rnn_name}_{k}']
                     for k in ('w_ih', 'w_hh', 'b_ih', 'b_hh')})
    for fc in ('fc1', 'fc2', 'fc3'):
        out[f'{fc}.weight'] = _t(np.asarray(params[f'{fc}_kernel']).T)
        out[f'{fc}.bias'] = _t(params[f'{fc}_bias'])
    return out


# ----------------------------------------------------------------- hifigan

def _weight_norm_pair(w: np.ndarray):
    """Decompose a folded weight into torch weight_norm (dim=0) params
    such that g * v / ||v|| reproduces w: v = w, g = ||w||."""
    g = np.sqrt((w ** 2).sum(axis=tuple(range(1, w.ndim)), keepdims=True))
    return _t(w), _t(g)


def _put_wn_conv(out: Dict, name: str, p: Dict,
                 transpose_conv: bool = False) -> None:
    k = np.asarray(p['kernel'], np.float32)
    if transpose_conv:
        # inverse of hifigan._convt_params: (k, Cin, Cout) -> torch
        # ConvTranspose1d (Cin, Cout, k) with taps un-flipped
        w = np.transpose(k, (1, 2, 0))[:, :, ::-1].copy()
    else:
        # inverse of hifigan._conv_params: (k, Cin, Cout) -> (Cout, Cin, k)
        w = np.transpose(k, (2, 1, 0)).copy()
    v, g = _weight_norm_pair(w)
    out[f'{name}.weight_v'] = v
    out[f'{name}.weight_g'] = g
    out[f'{name}.bias'] = _t(p['bias'])


def export_hifigan_generator(variables: Dict[str, Any],
                             model) -> Dict[str, Any]:
    """Inverse of hifigan.convert_hifigan_generator: flax params ->
    the OFFICIAL weight-normed `generator` state_dict (conv_pre / ups.N
    / resblocks.N.convs{1,2}.M or convs.M / conv_post), so TPU-trained
    generators load in the official HiFi-GAN repo
    (`generator.load_state_dict(torch.load(p)['generator'])`).
    weight_norm params are re-synthesized as v = w, g = ||w||
    (numerically identical after the official fold)."""
    params = variables.get('params', variables)
    out: Dict[str, Any] = {}
    _put_wn_conv(out, 'conv_pre', params['conv_pre'])
    for i in range(len(model.upsample_rates)):
        _put_wn_conv(out, f'ups.{i}', params[f'ups_{i}'],
                     transpose_conv=True)
    n_kernels = len(model.resblock_kernel_sizes)
    n_blocks = len(model.upsample_rates) * n_kernels
    for n in range(n_blocks):
        blk = params[f'resblocks_{n}']
        dils = model.resblock_dilation_sizes[n % n_kernels]
        if model.resblock == '1':
            for j in range(len(dils)):
                _put_wn_conv(out, f'resblocks.{n}.convs1.{j}',
                             blk[f'convs1_{j}'])
                _put_wn_conv(out, f'resblocks.{n}.convs2.{j}',
                             blk[f'convs2_{j}'])
        else:
            for j in range(len(dils)):
                _put_wn_conv(out, f'resblocks.{n}.convs.{j}',
                             blk[f'convs_{j}'])
    _put_wn_conv(out, 'conv_post', params['conv_post'])
    return out


def save_hifigan_checkpoint(variables: Dict[str, Any], model,
                            path) -> None:
    """Write the official HiFi-GAN generator file format:
    {'generator': state_dict}."""
    import torch
    torch.save({'generator': export_hifigan_generator(variables, model)},
               str(path))


# --------------------------------------------------------------- top level

def detect_family(variables: Dict[str, Any],
                  config: Optional[Dict[str, Any]] = None) -> str:
    """Which reference architecture a variables pytree belongs to."""
    params = variables.get('params', variables)
    if 'I_kernel' in params:
        return 'wavernn'
    if 'dec_prenet' in params:
        return 'tacotron'
    if 'lstm' in params:
        return 'forward_tacotron'
    if 'dur_pred' in params and 'transformer' in params['dur_pred']:
        return 'fast_pitch'
    if 'generator' in params or ('conv_pre' in params
                                 and 'ups_0' in params):
        return 'hifigan'
    raise ValueError('Unrecognized variables structure: cannot map to a '
                     'reference architecture')


_EXPORTERS = {
    'forward_tacotron': (export_forward_tacotron, 'forward_tacotron'),
    'fast_pitch': (export_fast_pitch, 'fast_pitch'),
    'tacotron': (export_tacotron, 'tacotron'),
    'wavernn': (export_wavernn, 'vocoder'),
}


def save_torch_checkpoint(variables: Dict[str, Any],
                          config: Dict[str, Any], path,
                          step: int = 0, family: Optional[str] = None,
                          use_ema: bool = True, r: int = 1) -> str:
    """Write a reference-format `.pt`: {'model', 'optim': None,
    'config'}. Returns the detected/used family name."""
    import torch
    family = family or detect_family(variables, config)
    if family not in _EXPORTERS:
        raise ValueError(f'No torch exporter for: {family}')
    export_fn, cfg_key = _EXPORTERS[family]
    model_cfg = config[cfg_key]['model']
    kwargs = {'step': step, 'use_ema': use_ema}
    if family == 'tacotron':
        kwargs['r'] = r
    state_dict = export_fn(variables, model_cfg, **kwargs)
    torch.save({'model': state_dict, 'optim': None, 'config': config},
               str(path))
    return family
