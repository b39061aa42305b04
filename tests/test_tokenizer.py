"""Tokenizer unit tests (golden ids match the reference's
tests/test_tokenizer.py:8-13 exactly — ids are a frozen surface)."""
import numpy as np

from forwardtacotron_tpu.text.tokenizer import Tokenizer


def test_call_happy_path():
    tokenizer = Tokenizer()
    tokens = tokenizer('_ abc{')
    assert tokens == [0, 10, 36, 52, 57]
    assert tokenizer.decode(tokens) == '_ abc'


def test_encode_padded():
    tokenizer = Tokenizer()
    out = tokenizer.encode_padded('_ abc', max_len=8)
    assert out.dtype == np.int32
    assert out.tolist() == [0, 10, 36, 52, 57, 0, 0, 0]
