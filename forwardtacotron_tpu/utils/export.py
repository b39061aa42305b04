"""Serialized-model export: the TPU-native analog of the reference's
TorchScript path (ForwardTacotron.generate_jit, reference
forward_tacotron.py:270-284 and README.md:149-161).

Where the reference scripts the module with torch.jit for deployment
without the Python class, here the fully-jitted generate path is
exported to a portable StableHLO artifact via jax.export: weights are
baked in, the artifact replays on any machine with jax (and any
lowering platform it was exported for) with no access to the model
code. Synthesis knobs (alpha / pitch_scale / energy_scale) stay
runtime scalars so one artifact serves all settings; text length and
the mel bucket are static per artifact, mirroring the bucketed jit
caches of gen_forward.py.
"""
from __future__ import annotations

import functools
from pathlib import Path
from typing import Any, Dict, Optional, Sequence, Tuple, Union

import numpy as np

MAGIC = b'FTTX1\n'      # legacy: no meta header (speaker by arity)
MAGIC2 = b'FTTX2\n'     # v2: json meta header (speaker/seed inputs)


def _is_wavernn(voc_model) -> bool:
    """Duck-typed: the AR vocoder exposes the fold/scan surface."""
    return hasattr(voc_model, 'sample_scan') \
        and hasattr(voc_model, 'upsample_cond')


def export_tts_generate(model, variables: Dict[str, Any],
                        tx: int, max_t: int,
                        platforms: Optional[Sequence[str]] = None,
                        vocoder: Optional[Tuple[Any, Dict]] = None,
                        voc_mu_law: bool = True
                        ) -> bytes:
    """Export `model.generate` (weights baked in) for text bucket `tx`
    and mel bucket `max_t`. Returns serialized StableHLO bytes.

    The exported callable signature is
        (x (1, tx) int32, x_len (1,) int32,
         alpha (), pitch_scale (), energy_scale () float32
         [, speaker (1,) int32 — multi-speaker models only]
         [, seed () int32 — WaveRNN-fused artifacts only])
        -> {'mel_post': (1, max_t, n_mels), 'mel_len': (1,),
            'dur': (1, tx)}

    With `vocoder=(voc_model, voc_variables)` the artifact is a FULL
    text->speech program adding 'wav' (1, total) int16 PCM and
    'wav_len' (1,) valid-sample counts to the outputs:
    - a HiFi-GAN / MelGAN generator runs fused after the mel decoder;
    - a WaveRNN runs its complete batched-fold pipeline (upsample,
      static fold geometry, lax.scan AR sampling with the runtime
      `seed`, mu-law decode, crossfade-unfold) inside the same module.
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    import inspect
    extra = {}
    if 'fast' in inspect.signature(model.generate).parameters:
        extra['fast'] = False  # pure XLA: portable across platforms
        #                        (no Pallas kernels inside the export)
    voc_is_ar = vocoder is not None and _is_wavernn(vocoder[0])

    def run(x, x_len, alpha, pitch_scale, energy_scale, speaker=None,
            seed=None):
        spk = {} if speaker is None else {'speaker': speaker}
        out = model.apply(variables, x, max_t, alpha=alpha,
                          pitch_scale=pitch_scale,
                          energy_scale=energy_scale, x_len=x_len,
                          method='generate', **spk, **extra)
        result = {'mel_post': out['mel_post'], 'mel_len': out['mel_len'],
                  'dur': out['dur']}
        if vocoder is not None and not voc_is_ar:
            voc_model, voc_variables = vocoder
            wav = voc_model.apply(voc_variables, out['mel_post'])
            result['wav'] = (jnp.clip(wav, -1.0, 1.0)
                             * 32767.0).astype(jnp.int16)
            hop = wav.shape[-1] // max_t
            result['wav_len'] = out['mel_len'].astype(jnp.int32) * hop
        elif voc_is_ar:
            from forwardtacotron_tpu.models.wavernn import (
                TARGET_REFERENCE, build_vocode_program)
            voc_model, voc_variables = vocoder
            vocode = build_vocode_program(
                voc_model, target=TARGET_REFERENCE, overlap=550,
                mu_law=voc_mu_law and voc_model.mode == 'RAW',
                use_pallas=False, pcm16=True)
            wave_lens = ((out['mel_len'].astype(jnp.int32) - 1)
                         * voc_model.hop_length)
            result['wav'] = vocode(voc_variables, out['mel_post'],
                                   wave_lens, seed)
            result['wav_len'] = wave_lens
        return result

    args = [jax.ShapeDtypeStruct((1, tx), jnp.int32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
            jax.ShapeDtypeStruct((), jnp.float32),
            jax.ShapeDtypeStruct((), jnp.float32),
            jax.ShapeDtypeStruct((), jnp.float32)]
    multispeaker = getattr(model, 'n_speakers', 1) > 1
    names = []
    if multispeaker:
        # multi-speaker: the voice id is a runtime input, so one
        # artifact serves every speaker
        names.append('speaker')
        args.append(jax.ShapeDtypeStruct((1,), jnp.int32))
    if voc_is_ar:
        names.append('seed')
        args.append(jax.ShapeDtypeStruct((), jnp.int32))

    def fn(x, x_len, alpha, pitch_scale, energy_scale, *rest):
        kw = dict(zip(names, rest))
        return run(x, x_len, alpha, pitch_scale, energy_scale, **kw)

    kwargs = {}
    if platforms is not None:
        kwargs['platforms'] = tuple(platforms)
    exported = jexport.export(jax.jit(fn), **kwargs)(*args)
    return exported.serialize()


def save_exported_tts(model, variables: Dict[str, Any],
                      path: Union[str, Path],
                      buckets: Sequence[Tuple[int, int]] = ((64, 512),),
                      platforms: Optional[Sequence[str]] = None,
                      vocoder: Optional[Tuple[Any, Dict]] = None,
                      voc_mu_law: bool = True) -> None:
    """Write a multi-bucket artifact:
    [MAGIC2][meta_len][meta json][n][(tx, max_t, len, blob)*].
    Each bucket is an independent StableHLO module; the loader picks the
    smallest bucket that fits the input. With `vocoder` (GAN generator
    or WaveRNN), every bucket is a full text->wav program (see
    export_tts_generate). The json meta records which optional runtime
    inputs (speaker / seed) the programs take."""
    import json
    path = Path(path)
    meta = {
        'multispeaker': getattr(model, 'n_speakers', 1) > 1,
        'n_speakers': getattr(model, 'n_speakers', 1),
        'vocoder': (None if vocoder is None
                    else 'wavernn' if _is_wavernn(vocoder[0])
                    else 'gan'),
    }
    meta_bytes = json.dumps(meta).encode('utf-8')
    with open(path, 'wb') as f:
        f.write(MAGIC2)
        f.write(np.int32(len(meta_bytes)).tobytes())
        f.write(meta_bytes)
        f.write(np.int32(len(buckets)).tobytes())
        for tx, max_t in buckets:
            blob = export_tts_generate(model, variables, tx, max_t,
                                       platforms=platforms,
                                       vocoder=vocoder,
                                       voc_mu_law=voc_mu_law)
            f.write(np.int32(tx).tobytes())
            f.write(np.int32(max_t).tobytes())
            f.write(np.int64(len(blob)).tobytes())
            f.write(blob)


class ExportedTTS:
    """Loads a saved artifact and synthesizes without the model code."""

    def __init__(self, path: Union[str, Path]) -> None:
        import json
        from jax import export as jexport
        self.buckets: Dict[Tuple[int, int], Any] = {}
        with open(path, 'rb') as f:
            magic = f.read(len(MAGIC))
            if magic == MAGIC2:
                meta_len = int(np.frombuffer(f.read(4), np.int32)[0])
                self.meta = json.loads(f.read(meta_len).decode('utf-8'))
            elif magic == MAGIC:
                # legacy v1: no meta; speaker presence detected by arity
                self.meta = None
            else:
                raise ValueError(f'{path}: not a ForwardTacotron-TPU '
                                 f'export artifact')
            n = int(np.frombuffer(f.read(4), np.int32)[0])
            for _ in range(n):
                tx = int(np.frombuffer(f.read(4), np.int32)[0])
                max_t = int(np.frombuffer(f.read(4), np.int32)[0])
                ln = int(np.frombuffer(f.read(8), np.int64)[0])
                self.buckets[(tx, max_t)] = jexport.deserialize(
                    f.read(ln))

    def _run(self, text_ids: Sequence[int], alpha: float,
             pitch_scale: float, energy_scale: float,
             speaker: int, seed: int = 0
             ) -> Tuple[Dict[str, np.ndarray], int, int]:
        """Pick the smallest exported text bucket that fits and call it.
        -> (outputs, x_len, max_t)."""
        import jax.numpy as jnp
        x_len = len(text_ids)
        fitting = sorted(tx for tx, _ in self.buckets if tx >= x_len)
        if not fitting:
            raise ValueError(f'input length {x_len} exceeds all exported '
                             f'buckets {sorted(self.buckets)}')
        tx = fitting[0]
        max_t = max(mt for t, mt in self.buckets if t == tx)
        exported = self.buckets[(tx, max_t)]
        x = np.zeros((1, tx), np.int32)
        x[0, :x_len] = text_ids
        call_args = [jnp.asarray(x), jnp.asarray([x_len], np.int32),
                     jnp.float32(alpha), jnp.float32(pitch_scale),
                     jnp.float32(energy_scale)]
        if self.meta is not None:
            if self.meta.get('multispeaker'):
                n_spk = self.meta.get('n_speakers', 0)
                if n_spk and not 0 <= int(speaker) < n_spk:
                    raise ValueError(f'speaker {speaker} out of range '
                                     f'for a {n_spk}-speaker artifact')
                call_args.append(jnp.asarray([speaker], np.int32))
            if self.meta.get('vocoder') == 'wavernn':
                call_args.append(jnp.asarray(seed, jnp.int32))
        elif len(exported.in_avals) > 5:   # v1 multi-speaker artifact
            call_args.append(jnp.asarray([speaker], np.int32))
        return exported.call(*call_args), x_len, max_t

    def generate(self, text_ids: Sequence[int], alpha: float = 1.0,
                 pitch_scale: float = 1.0, energy_scale: float = 1.0,
                 speaker: int = 0) -> Tuple[np.ndarray, np.ndarray]:
        """-> (mel_post (n_mels, mel_len), dur (x_len,)). Picks the
        smallest exported text bucket that fits. `speaker` selects the
        voice on multi-speaker artifacts (ignored otherwise)."""
        out, x_len, _ = self._run(text_ids, alpha, pitch_scale,
                                  energy_scale, speaker)
        mel_len = int(np.asarray(out['mel_len'])[0])
        mel = np.asarray(out['mel_post'])[0, :mel_len].T
        return mel, np.asarray(out['dur'])[0, :x_len]

    def synthesize(self, text_ids: Sequence[int], alpha: float = 1.0,
                   pitch_scale: float = 1.0, energy_scale: float = 1.0,
                   speaker: int = 0, seed: int = 0) -> np.ndarray:
        """Full text->wav for artifacts exported with a vocoder:
        -> int16 PCM trimmed to the generated length. Raises if the
        artifact has no fused vocoder. `seed` drives the AR sampling
        noise on WaveRNN-fused artifacts (ignored otherwise)."""
        out, _, max_t = self._run(text_ids, alpha, pitch_scale,
                                  energy_scale, speaker, seed=seed)
        if 'wav' not in out:
            raise ValueError('artifact was exported without a vocoder; '
                             'use .generate() for mels')
        wav = np.asarray(out['wav'])[0]
        if 'wav_len' in out:
            return wav[:int(np.asarray(out['wav_len'])[0])]
        # legacy v1 GAN artifact: trim by mel_len * inferred hop
        mel_len = int(np.asarray(out['mel_len'])[0])
        hop = wav.shape[0] // max_t
        return wav[:mel_len * hop]

    def synthesize_long(self, text: str, tokenize, alpha: float = 1.0,
                        pitch_scale: float = 1.0,
                        energy_scale: float = 1.0, speaker: int = 0,
                        seed: int = 0, sample_rate: int = 22050,
                        gap_ms: float = 120.0) -> np.ndarray:
        """Article-length synthesis from a vocoder-fused artifact:
        split on sentence boundaries (text/segmenter.py), synthesize
        each within the exported buckets, concatenate with silence.
        `tokenize` maps a sentence string to token ids (e.g.
        `lambda s: Tokenizer()(Cleaner.from_config(cfg)(s))`) — the
        artifact itself stores no text front-end."""
        from forwardtacotron_tpu.text.segmenter import split_sentences
        sentences = split_sentences(text)
        if not sentences:
            raise ValueError('no synthesizable text')
        gap = np.zeros(int(sample_rate * gap_ms / 1000.0), np.int16)
        out: list = []
        for i, sent in enumerate(sentences):
            if i:
                out.append(gap)
            out.append(self.synthesize(
                tokenize(sent), alpha=alpha, pitch_scale=pitch_scale,
                energy_scale=energy_scale, speaker=speaker,
                seed=seed + i))
        return np.concatenate(out) if len(out) > 1 else out[0]
