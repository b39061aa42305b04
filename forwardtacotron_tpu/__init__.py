"""ForwardTacotron-TPU: a TPU-native (JAX/XLA/Pallas) text-to-speech framework.

A ground-up re-design of the capabilities of tarepan/ForwardTacotron
(non-autoregressive ForwardTacotron / FastPitch mel synthesis, Tacotron
teacher for forced alignment, WaveRNN neural vocoder, Griffin-Lim fallback)
for TPU hardware:

- All compute paths are jit-compiled XLA with static shapes.
- Recurrences (CBHG BiGRU, decoder BiLSTM, Tacotron LSA decoder, WaveRNN
  sampling) run as `lax.scan` with sequence-level input projections batched
  onto the MXU; the WaveRNN sampling step has a fused Pallas kernel.
- DSP (STFT/mel/Griffin-Lim/mu-law/F0) is implemented as batched on-device
  XLA ops instead of librosa/pyworld host code.
- Multi-chip scaling uses `jax.sharding.Mesh` + jit sharding annotations
  (data/model axes) instead of the reference's (absent) torch.distributed.

Compatibility surfaces kept from the reference (see SURVEY.md §7):
config.yaml schema, CLI contract (preprocess/train_*/gen_*), on-disk data
layout (data/{mel,quant,raw_pitch,alg,phon_pitch,phon_energy,gta}) and
checkpoint semantics ({params, optim, config, step}).
"""

__version__ = '0.1.0'
