"""Torch checkpoint -> flax variables conversion.

Maps reference state_dicts (models/forward_tacotron.py,
models/fast_pitch.py, models/tacotron.py, models/fatchord_version.py) to
this framework's parameter pytrees, weight for weight:

- Conv1d weight (out, in, k)  -> flax Conv kernel (k, in, out)
- Linear weight (out, in)     -> flax Dense kernel (in, out)
- Embedding weight            -> flax Embed embedding (same layout)
- BatchNorm1d weight/bias     -> params scale/bias;
  running_mean/var            -> batch_stats mean/var
- GRU/LSTM l0 / l0_reverse    -> rnn fwd/bwd {w_ih, w_hh, b_ih, b_hh}
  (gate-stacked layout is shared, so no re-ordering is needed;
  see ops/rnn.py)

Only numpy/jnp conversions happen here; `torch.load` is used purely as a
file decoder for `.pt` checkpoints.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np


def _np(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, 'detach') else t)


class _SD:
    """Helper view over a torch state_dict with prefix navigation."""

    def __init__(self, sd: Dict[str, Any], prefix: str = ''):
        self.sd = sd
        self.prefix = prefix

    def sub(self, name: str) -> '_SD':
        return _SD(self.sd, f'{self.prefix}{name}.')

    def __getitem__(self, key: str) -> np.ndarray:
        return _np(self.sd[f'{self.prefix}{key}'])

    def __contains__(self, key: str) -> bool:
        return f'{self.prefix}{key}' in self.sd


def conv1d(sd: _SD, name: str, bias: bool = True) -> Dict[str, np.ndarray]:
    out = {'kernel': np.transpose(sd[f'{name}.weight'], (2, 1, 0))}
    if bias and f'{name}.bias' in sd:
        out['bias'] = sd[f'{name}.bias']
    return out


def dense(sd: _SD, name: str, bias: bool = True) -> Dict[str, np.ndarray]:
    out = {'kernel': sd[f'{name}.weight'].T}
    if bias and f'{name}.bias' in sd:
        out['bias'] = sd[f'{name}.bias']
    return out


def embed(sd: _SD, name: str) -> Dict[str, np.ndarray]:
    return {'embedding': sd[f'{name}.weight']}


def batchnorm(sd: _SD, name: str) -> Tuple[Dict, Dict]:
    params = {'scale': sd[f'{name}.weight'], 'bias': sd[f'{name}.bias']}
    stats = {'mean': sd[f'{name}.running_mean'],
             'var': sd[f'{name}.running_var']}
    return params, stats


def rnn_dir(sd: _SD, name: str, reverse: bool = False) -> Dict[str, np.ndarray]:
    sfx = '_reverse' if reverse else ''
    return {'w_ih': sd[f'{name}.weight_ih_l0{sfx}'],
            'w_hh': sd[f'{name}.weight_hh_l0{sfx}'],
            'b_ih': sd[f'{name}.bias_ih_l0{sfx}'],
            'b_hh': sd[f'{name}.bias_hh_l0{sfx}']}


def birnn(sd: _SD, name: str) -> Dict[str, Dict[str, np.ndarray]]:
    return {'fwd': rnn_dir(sd, name), 'bwd': rnn_dir(sd, name, reverse=True)}


def bn_conv(sd: _SD, name: str) -> Tuple[Dict, Dict]:
    """Reference BatchNormConv {conv, bnorm} -> ours {conv, bnorm}."""
    bn_params, bn_stats = batchnorm(sd, f'{name}.bnorm')
    params = {'conv': conv1d(sd, f'{name}.conv', bias=False),
              'bnorm': bn_params}
    stats = {'bnorm': bn_stats}
    return params, stats


def cbhg(sd: _SD, name: str, K: int, num_highways: int) -> Tuple[Dict, Dict]:
    c = sd.sub(name)
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for i in range(K):
        p, s = bn_conv(c, f'conv1d_bank.{i}')
        params[f'bank_{i + 1}'], stats[f'bank_{i + 1}'] = p, s
    p, s = bn_conv(c, 'conv_project1')
    params['proj1'], stats['proj1'] = p, s
    p, s = bn_conv(c, 'conv_project2')
    params['proj2'], stats['proj2'] = p, s
    params['pre_highway'] = dense(c, 'pre_highway', bias=False)
    for i in range(num_highways):
        params[f'highway_{i}'] = {'W1': dense(c, f'highways.{i}.W1'),
                                  'W2': dense(c, f'highways.{i}.W2')}
    params['rnn'] = birnn(c, 'rnn')
    return params, stats


def series_predictor(sd: _SD, name: str) -> Tuple[Dict, Dict]:
    c = sd.sub(name)
    params: Dict[str, Any] = {'embedding': embed(c, 'embedding')}
    stats: Dict[str, Any] = {}
    for i in range(3):
        p, s = bn_conv(c, f'convs.{i}')
        params[f'conv_{i}'], stats[f'conv_{i}'] = p, s
    params['rnn'] = birnn(c, 'rnn')
    params['lin'] = dense(c, 'lin')
    return params, stats


def convert_forward_tacotron(state_dict: Dict[str, Any],
                             model_cfg: Dict[str, Any]
                             ) -> Tuple[Dict, int]:
    """Returns ({'params': ..., 'batch_stats': ...}, step)."""
    sd = _SD(state_dict)
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    params['embedding'] = embed(sd, 'embedding')
    p, s = cbhg(sd, 'prenet', K=model_cfg['prenet_k'],
                num_highways=model_cfg['prenet_num_highways'])
    params['prenet'], stats['prenet'] = p, s
    for pred in ('dur_pred', 'pitch_pred', 'energy_pred'):
        p, s = series_predictor(sd, pred)
        params[pred], stats[pred] = p, s
    params['pitch_proj'] = conv1d(sd, 'pitch_proj')
    params['energy_proj'] = conv1d(sd, 'energy_proj')
    params['lstm'] = birnn(sd, 'lstm')
    params['lin'] = dense(sd, 'lin')
    p, s = cbhg(sd, 'postnet', K=model_cfg['postnet_k'],
                num_highways=model_cfg['postnet_num_highways'])
    params['postnet'], stats['postnet'] = p, s
    params['post_proj'] = dense(sd, 'post_proj', bias=False)

    step = int(_np(state_dict['step']).reshape(-1)[0]) \
        if 'step' in state_dict else 0
    return {'params': params, 'batch_stats': stats}, step


def _cell(sd: _SD, name: str, prefix: str) -> Dict[str, np.ndarray]:
    """torch GRUCell/LSTMCell -> flat cell params with a name prefix."""
    return {f'{prefix}_w_ih': sd[f'{name}.weight_ih'],
            f'{prefix}_w_hh': sd[f'{name}.weight_hh'],
            f'{prefix}_b_ih': sd[f'{name}.bias_ih'],
            f'{prefix}_b_hh': sd[f'{name}.bias_hh']}


def _prenet(sd: _SD, name: str) -> Dict[str, Any]:
    return {'fc1': dense(sd.sub(name), 'fc1'),
            'fc2': dense(sd.sub(name), 'fc2')}


def convert_tacotron(state_dict: Dict[str, Any],
                     model_cfg: Dict[str, Any]) -> Tuple[Dict, int]:
    """Reference models/tacotron.py state_dict -> flax variables."""
    sd = _SD(state_dict)
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    enc_params: Dict[str, Any] = {
        'embedding': embed(sd.sub('encoder'), 'embedding'),
        'pre_net': _prenet(sd, 'encoder.pre_net'),
    }
    p, s = cbhg(sd, 'encoder.cbhg', K=model_cfg['encoder_k'],
                num_highways=model_cfg['num_highways'])
    enc_params['cbhg'] = p
    params['encoder'] = enc_params
    stats['encoder'] = {'cbhg': s}

    params['encoder_proj'] = dense(sd, 'encoder_proj', bias=False)
    params['dec_prenet'] = _prenet(sd, 'decoder.prenet')
    params['lsa_conv'] = conv1d(sd, 'decoder.attn_net.conv', bias=False)
    params['lsa_L'] = dense(sd, 'decoder.attn_net.L')
    params['lsa_W'] = dense(sd, 'decoder.attn_net.W')
    params['lsa_v'] = dense(sd, 'decoder.attn_net.v', bias=False)
    params.update(_cell(sd, 'decoder.attn_rnn', 'attn_rnn'))
    params['rnn_input'] = dense(sd, 'decoder.rnn_input')
    params.update(_cell(sd, 'decoder.res_rnn1', 'res_rnn1'))
    params.update(_cell(sd, 'decoder.res_rnn2', 'res_rnn2'))
    params['mel_proj'] = dense(sd, 'decoder.mel_proj', bias=False)

    p, s = cbhg(sd, 'postnet', K=model_cfg['postnet_k'],
                num_highways=model_cfg['num_highways'])
    params['postnet'], stats['postnet'] = p, s
    params['post_proj'] = dense(sd, 'post_proj', bias=False)

    step = int(_np(state_dict['step']).reshape(-1)[0]) \
        if 'step' in state_dict else 0
    return {'params': params, 'batch_stats': stats}, step


def layernorm(sd: _SD, name: str) -> Dict[str, np.ndarray]:
    return {'scale': sd[f'{name}.weight'], 'bias': sd[f'{name}.bias']}


def fft_block(sd: _SD, name: str) -> Dict[str, Any]:
    c = sd.sub(name)
    return {
        'self_attn': {
            'in_proj_weight': c['self_attn.in_proj_weight'],
            'in_proj_bias': c['self_attn.in_proj_bias'],
            'out_proj': dense(c, 'self_attn.out_proj'),
        },
        'conv1': conv1d(c, 'conv1'),
        'conv2': conv1d(c, 'conv2'),
        'norm1': layernorm(c, 'norm1'),
        'norm2': layernorm(c, 'norm2'),
    }


def forward_transformer(sd: _SD, name: str, n_layers: int) -> Dict[str, Any]:
    c = sd.sub(name)
    out: Dict[str, Any] = {
        'pos_scale': c['pos_encoder.scale'],
        'norm': layernorm(c, 'norm'),
    }
    for i in range(n_layers):
        out[f'layer_{i}'] = fft_block(c, f'layers.{i}')
    return out


def fp_series_predictor(sd: _SD, name: str, n_layers: int) -> Dict[str, Any]:
    c = sd.sub(name)
    return {
        'embedding': embed(c, 'embedding'),
        'transformer': forward_transformer(c, 'transformer', n_layers),
        'lin': dense(c, 'lin'),
    }


def convert_fast_pitch(state_dict: Dict[str, Any],
                       model_cfg: Dict[str, Any]) -> Tuple[Dict, int]:
    """Reference models/fast_pitch.py state_dict -> flax variables."""
    sd = _SD(state_dict)
    params: Dict[str, Any] = {
        'embedding': embed(sd, 'embedding'),
        'dur_pred': fp_series_predictor(sd, 'dur_pred',
                                        model_cfg['durpred_layers']),
        'pitch_pred': fp_series_predictor(sd, 'pitch_pred',
                                          model_cfg['pitch_layers']),
        'energy_pred': fp_series_predictor(sd, 'energy_pred',
                                           model_cfg['energy_layers']),
        'prenet': forward_transformer(sd, 'prenet',
                                      model_cfg['prenet_layers']),
        'postnet': forward_transformer(sd, 'postnet',
                                       model_cfg['postnet_layers']),
        'pitch_proj': conv1d(sd, 'pitch_proj'),
        'energy_proj': conv1d(sd, 'energy_proj'),
        'lin': dense(sd, 'lin'),
    }
    step = int(_np(state_dict['step']).reshape(-1)[0]) \
        if 'step' in state_dict else 0
    return {'params': params}, step


def _bn(sd: _SD, name: str) -> Tuple[Dict, Dict]:
    params = {'scale': sd[f'{name}.weight'], 'bias': sd[f'{name}.bias']}
    stats = {'mean': sd[f'{name}.running_mean'],
             'var': sd[f'{name}.running_var']}
    return params, stats


def convert_wavernn(state_dict: Dict[str, Any],
                    model_cfg: Dict[str, Any]) -> Tuple[Dict, int]:
    """Reference models/fatchord_version.py state_dict -> flax variables."""
    sd = _SD(state_dict)
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    res = sd.sub('upsample.resnet')
    rn_params: Dict[str, Any] = {'conv_in': conv1d(res, 'conv_in',
                                                   bias=False),
                                 'conv_out': conv1d(res, 'conv_out')}
    rn_stats: Dict[str, Any] = {}
    p, s = _bn(res, 'batch_norm')
    rn_params['batch_norm'], rn_stats['batch_norm'] = p, s
    n_blocks = model_cfg['res_blocks']
    for i in range(n_blocks):
        blk = res.sub(f'layers.{i}')
        bp: Dict[str, Any] = {'conv1': conv1d(blk, 'conv1', bias=False),
                              'conv2': conv1d(blk, 'conv2', bias=False)}
        bs: Dict[str, Any] = {}
        for bn_name in ('batch_norm1', 'batch_norm2'):
            p, s = _bn(blk, bn_name)
            bp[bn_name], bs[bn_name] = p, s
        rn_params[f'res_{i}'], rn_stats[f'res_{i}'] = bp, bs

    up_params: Dict[str, Any] = {'resnet': rn_params}
    up_stats = {'resnet': rn_stats}
    n_scales = len(model_cfg['upsample_factors'])
    for i in range(n_scales):
        w = sd[f'upsample.up_layers.{2 * i + 1}.weight']  # (1,1,1,k)
        up_params[f'up_conv_{i}'] = w.reshape(-1)
    params['upsample'], stats['upsample'] = up_params, up_stats

    params['I_kernel'] = sd['I.weight'].T
    params['I_bias'] = sd['I.bias']
    for rnn_name in ('rnn1', 'rnn2'):
        d = rnn_dir(sd, rnn_name)
        for k, v in d.items():
            params[f'{rnn_name}_{k}'] = v
    for fc in ('fc1', 'fc2', 'fc3'):
        params[f'{fc}_kernel'] = sd[f'{fc}.weight'].T
        params[f'{fc}_bias'] = sd[f'{fc}.bias']

    step = int(_np(state_dict['step']).reshape(-1)[0]) \
        if 'step' in state_dict else 0
    return {'params': params, 'batch_stats': stats}, step


def load_torch_forward_checkpoint(path) -> Tuple[Dict, Dict, int]:
    """Load a reference forward-tacotron `.pt` -> (variables, config, step)."""
    import torch
    checkpoint = torch.load(path, map_location='cpu', weights_only=False)
    config = checkpoint['config']
    model_cfg = config['forward_tacotron']['model']
    variables, step = convert_forward_tacotron(checkpoint['model'], model_cfg)
    return variables, config, step
