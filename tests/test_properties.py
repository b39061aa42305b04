"""Property-based tests (hypothesis) for invariant-rich core ops.

The reference's test suite pins golden values (tests/test_tokenizer.py,
tests/test_collate_tts.py in /root/reference); these tests go further
and assert the *invariants* the pipeline relies on, over randomized
inputs:

- length_regulate (ops/length_regulator.py) == a naive numpy
  repeat-interleave for arbitrary float durations (the reference
  semantics, common_layers.py:12-19).
- duration DP (align/duration.py): durations are non-negative and sum
  exactly to mel_len for arbitrary attention matrices.
- mu-law codec round-trip error bound; label/float codec exact inverse.
- fold_device / xfade_unfold_device (device gather/overlap-add) are
  equal to the numpy fold_with_overlap / xfade_and_unfold for random
  geometries (fatchord_version.py:294-406 semantics).
- tokenizer round-trip: decode(encode(s)) keeps exactly the known
  symbols, in order.
- collate_tts static-shape/pad invariants for any r.
- masked_l1 is independent of values in the padded region.
- number normalization leaves no digits behind.
- the full text front-end (cleaner -> fallback G2P -> tokenizer) never
  crashes and only emits valid token ids for arbitrary input text.
- split_sentences preserves every non-whitespace character in order.

Everything runs on CPU (tests/conftest.py); shapes are kept tiny and
mostly fixed so jit compiles stay cheap. `derandomize=True` makes runs
reproducible for CI.
"""
from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st, HealthCheck

hyp_settings = settings(
    max_examples=25, deadline=None, derandomize=True,
    suppress_health_check=[HealthCheck.too_slow])


# ---------------------------------------------------------- length regulator

def _naive_length_regulate(x: np.ndarray, dur: np.ndarray, max_t: int):
    """Reference semantics (models/common_layers.py:12-19): clamp at 0,
    round with +0.5 truncation, repeat_interleave, pad with zeros."""
    B, T, C = x.shape
    reps = np.floor(np.maximum(dur, 0.0) + 0.5).astype(np.int64)
    out = np.zeros((B, max_t, C), dtype=np.float32)
    totals = reps.sum(axis=1)
    for b in range(B):
        expanded = np.repeat(x[b], reps[b], axis=0)
        out[b, :min(max_t, expanded.shape[0])] = \
            expanded[:max_t]
    return out, totals


@hyp_settings
@given(
    x=st.lists(st.floats(-3, 3, allow_nan=False, width=32),
               min_size=36, max_size=36),
    dur=st.lists(st.floats(-2, 8, allow_nan=False, width=32),
                 min_size=12, max_size=12),
)
def test_length_regulate_matches_naive(x, dur):
    from forwardtacotron_tpu.ops.length_regulator import length_regulate
    B, T, C, max_t = 2, 6, 3, 24
    xa = np.asarray(x, np.float32).reshape(B, T, C)
    da = np.asarray(dur, np.float32).reshape(B, T)
    got, totals = length_regulate(xa, da, max_t)
    want, want_totals = _naive_length_regulate(xa, da, max_t)
    np.testing.assert_array_equal(np.asarray(totals), want_totals)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)


# ------------------------------------------------------------- duration DP

@hyp_settings
@given(data=st.data())
def test_duration_dp_invariants(data):
    from forwardtacotron_tpu.align.duration import \
        extract_durations_with_dp
    seq_len = data.draw(st.integers(1, 6))
    mel_len = data.draw(st.integers(1, 12))
    flat = data.draw(st.lists(
        st.floats(-4, 4, allow_nan=False, width=32),
        min_size=12 * 6, max_size=12 * 6))
    att = np.asarray(flat, np.float32).reshape(12, 6)
    att = np.exp(att) / np.exp(att).sum(axis=1, keepdims=True)
    dur = extract_durations_with_dp(seq_len, att, mel_len)
    assert dur.shape == (seq_len,)
    assert (dur >= 0).all()
    assert dur.sum() == mel_len


# ----------------------------------------------------------------- codecs

@hyp_settings
@given(x=st.lists(st.floats(-1, 1, allow_nan=False, width=32),
                  min_size=1, max_size=64))
def test_mu_law_round_trip_error_bound(x):
    from forwardtacotron_tpu.dsp.audio import DSP
    mu = 2 ** 9
    xa = np.asarray(x, np.float32)
    labels = DSP.encode_mu_law(xa, mu)
    back = DSP.decode_mu_law(labels.astype(np.float32), mu,
                             from_labels=True)
    # worst-case mu-law quantization error: half a step through the
    # steepest part of the expander, ~ln(1+mu)*(1+mu)/mu^2 ≈ 0.0122
    assert np.max(np.abs(np.asarray(back) - xa)) < 0.03


@hyp_settings
@given(labels=st.lists(st.integers(0, 2 ** 9 - 1),
                       min_size=1, max_size=64))
def test_label_float_codec_exact_inverse(labels):
    from forwardtacotron_tpu.dsp.audio import DSP
    bits = 9
    la = np.asarray(labels, np.float32)
    f = DSP.label_2_float(la, bits)
    back = DSP.float_2_label(f, bits)
    np.testing.assert_allclose(np.asarray(back), la, atol=1e-3)


# ----------------------------------------------------- fold / xfade parity

@hyp_settings
@given(data=st.data())
def test_fold_device_matches_numpy(data):
    from forwardtacotron_tpu.models.wavernn import (fold_device,
                                                    fold_with_overlap)
    overlap = data.draw(st.sampled_from([4, 8]))
    target = data.draw(st.sampled_from([16, 32]))
    total = data.draw(st.integers(overlap + 1, 200))
    c = 2
    x = np.arange(total * c, dtype=np.float32).reshape(1, total, c)
    want = fold_with_overlap(x, target, overlap)
    got = np.asarray(fold_device(x, target, overlap))
    np.testing.assert_allclose(got, want, atol=0)


@hyp_settings
@given(data=st.data())
def test_xfade_unfold_device_matches_numpy(data):
    from forwardtacotron_tpu.models.wavernn import (xfade_and_unfold,
                                                    xfade_unfold_device)
    overlap = data.draw(st.sampled_from([4, 8]))
    target = data.draw(st.sampled_from([16, 32]))
    folds = data.draw(st.integers(1, 4))
    n = folds * (target + 2 * overlap)
    y = np.asarray(
        data.draw(st.lists(st.floats(-1, 1, allow_nan=False, width=32),
                           min_size=n, max_size=n)),
        np.float32).reshape(folds, target + 2 * overlap)
    import jax.numpy as jnp
    want = xfade_and_unfold(y, target, overlap)
    got = np.asarray(xfade_unfold_device(jnp.asarray(y), overlap))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-5)


# ---------------------------------------------------------------- tokenizer

@hyp_settings
@given(text=st.text(max_size=80))
def test_tokenizer_round_trip_keeps_known_symbols(text):
    from forwardtacotron_tpu.text.symbols import phonemes_set
    from forwardtacotron_tpu.text.tokenizer import Tokenizer
    tok = Tokenizer()
    ids = tok(text)
    assert all(isinstance(i, int) for i in ids)
    want = ''.join(ch for ch in text if ch in phonemes_set)
    assert tok.decode(ids) == want
    # encode is stable under its own decode (idempotent fixpoint)
    assert tok(tok.decode(ids)) == ids


# ------------------------------------------------------------------ collate

@hyp_settings
@given(data=st.data())
def test_collate_tts_invariants(data):
    from forwardtacotron_tpu.data.dataset import MEL_PAD, collate_tts
    r = data.draw(st.integers(1, 8))
    n_mels = 4
    n_items = data.draw(st.integers(1, 3))
    batch = []
    for i in range(n_items):
        x_len = data.draw(st.integers(1, 9))
        mel_len = data.draw(st.integers(1, 17))
        batch.append({
            'x': np.ones(x_len, np.int64),
            'mel': np.full((n_mels, mel_len), 0.5, np.float32),
            'item_id': f'i{i}', 'x_len': x_len, 'mel_len': mel_len})
    out = collate_tts(batch, r)
    B, T, M = out['mel'].shape
    assert B == n_items and M == n_mels
    assert T % r == 0
    assert T >= max(b['mel_len'] for b in batch) + 1
    for i, b in enumerate(batch):
        # data region intact, padded region exactly MEL_PAD / 0
        np.testing.assert_allclose(out['mel'][i, :b['mel_len']], 0.5)
        np.testing.assert_allclose(out['mel'][i, b['mel_len']:], MEL_PAD)
        assert (out['x'][i, b['x_len']:] == 0).all()
        assert (out['x'][i, :b['x_len']] == 1).all()


# ----------------------------------------------------------------- masking

@hyp_settings
@given(data=st.data())
def test_masked_l1_ignores_padding(data):
    import jax.numpy as jnp
    from forwardtacotron_tpu.ops.masking import masked_l1, pad_mask
    B, T, C = 2, 10, 3
    lens = np.asarray([data.draw(st.integers(1, T)) for _ in range(B)])
    flat = data.draw(st.lists(
        st.floats(-2, 2, allow_nan=False, width=32),
        min_size=2 * B * T * C, max_size=2 * B * T * C))
    arr = np.asarray(flat, np.float32)
    x, tgt = arr[:B * T * C].reshape(B, T, C), \
        arr[B * T * C:].reshape(B, T, C)
    base = float(masked_l1(jnp.asarray(x), jnp.asarray(tgt),
                           jnp.asarray(lens)))
    # scribble over the padded region of both args
    x2, t2 = x.copy(), tgt.copy()
    for b in range(B):
        x2[b, lens[b]:] += 37.0
        t2[b, lens[b]:] -= 11.0
    scribbled = float(masked_l1(jnp.asarray(x2), jnp.asarray(t2),
                                jnp.asarray(lens)))
    assert abs(base - scribbled) < 1e-5
    mask = np.asarray(pad_mask(jnp.asarray(lens), T))
    np.testing.assert_array_equal(mask.sum(axis=-1).ravel(), lens)


# ------------------------------------------------------------------ numbers

@hyp_settings
@given(data=st.data())
def test_normalize_numbers_leaves_no_digits(data):
    from forwardtacotron_tpu.text.numbers import normalize_numbers
    pieces = data.draw(st.lists(
        st.one_of(
            st.integers(0, 10 ** 9).map(str),
            st.sampled_from(['hello', 'the', 'cat', '$',
                             'st', 'nd', 'rd', 'th', '.', ',']),
        ), min_size=1, max_size=8))
    text = ' '.join(pieces)
    out = normalize_numbers(text)
    assert not any(ch.isdigit() for ch in out), (text, out)


# --------------------------------------------------- full text front-end

@settings(max_examples=15, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.too_slow])
@given(text=st.text(
    alphabet=st.characters(codec='utf-8',
                           categories=('L', 'N', 'P', 'Zs')),
    max_size=40))
def test_text_front_end_never_crashes(text):
    from forwardtacotron_tpu.text.cleaners import Cleaner
    from forwardtacotron_tpu.text.symbols import phonemes
    from forwardtacotron_tpu.text.tokenizer import Tokenizer
    cleaner = Cleaner('english_cleaners', use_phonemes=True, lang='en-us')
    tok = Tokenizer()
    ids = tok(cleaner(text))
    assert all(0 <= i < len(phonemes) for i in ids)


# ---------------------------------------------------------------- segmenter

@hyp_settings
@given(text=st.text(
    alphabet=st.characters(codec='utf-8',
                           categories=('L', 'N', 'P', 'Zs')),
    max_size=120))
def test_split_sentences_preserves_characters(text):
    from forwardtacotron_tpu.text.segmenter import split_sentences
    parts = split_sentences(text)
    squash = lambda s: ''.join(s.split())
    assert squash(''.join(parts)) == squash(text)
    assert all(p.strip() for p in parts)


pytestmark = pytest.mark.slow  # heavyweight tier (see pyproject)
