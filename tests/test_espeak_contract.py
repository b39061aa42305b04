"""The espeak phonemization path exercised against a FAKE espeak
binary (a subprocess test double on PATH), so the reference's default
text front-end contract (utils/text/cleaners.py:56-67) is tested even
in images without espeak:

- invocation: `espeak-ng -q --ipa -v <lang> <chunk>` per text chunk;
- punctuation preserved around phonemized chunks;
- stress marks stripped (with_stress=False);
- language-switch flags like `(en)` removed (remove-flags);
- output filtered to the model's phoneme inventory.

The double returns the exact IPA (plus stress/flags noise) that real
espeak produces for the reference golden sentence, so the end-to-end
assertion is the reference's own golden: 'hello there!' -> 'həloʊ ðɛɹ!'
(reference tests/test_cleaner.py:8-13).
"""
import json
import os
import stat
import sys

import pytest


FAKE_ESPEAK = r'''#!{python}
import json, sys
args = sys.argv[1:]
log = {log_path!r}
with open(log, 'a') as f:
    f.write(json.dumps(args) + '\n')
text = args[-1]
CANNED = {{
    'hello there': 'həlˈoʊ ðˈɛɹ',
    'bonjour': '(en)bɒnˈʒʊə(fr)',
}}
out = CANNED.get(text.strip().lower())
if out is None:
    out = ' '.join('tˈɛst' for _ in text.split())
sys.stdout.write(out + '\n')
'''


@pytest.fixture()
def fake_espeak(tmp_path, monkeypatch):
    log_path = tmp_path / 'calls.jsonl'
    binary = tmp_path / 'espeak-ng'
    binary.write_text(FAKE_ESPEAK.format(python=sys.executable,
                                         log_path=str(log_path)))
    binary.chmod(binary.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv('PATH', f'{tmp_path}{os.pathsep}'
                               f'{os.environ.get("PATH", "")}')
    return log_path


def _calls(log_path):
    if not log_path.exists():
        return []
    return [json.loads(ln) for ln in log_path.read_text().splitlines()]


def test_espeak_detected_and_reference_golden(fake_espeak):
    from forwardtacotron_tpu.text.cleaners import (Cleaner,
                                                   espeak_available)
    assert espeak_available()
    cleaner = Cleaner(cleaner_name='no_cleaners', use_phonemes=True,
                      lang='en-us')
    # the reference's golden: stress stripped, punctuation preserved
    assert cleaner('hello there!') == 'həloʊ ðɛɹ!'
    assert cleaner('hello there?!.') == 'həloʊ ðɛɹ?!.'


def test_espeak_cli_contract(fake_espeak):
    from forwardtacotron_tpu.text.cleaners import to_phonemes
    to_phonemes('hello there, hello there!', 'en-us')
    calls = _calls(fake_espeak)
    # one subprocess call per non-punctuation chunk
    assert len(calls) == 2
    for args in calls:
        assert args[0] == '-q', 'quiet flag required'
        assert '--ipa' in args
        v = args.index('-v')
        assert args[v + 1] == 'en-us'
        assert args[-1] == 'hello there'


def test_language_switch_flags_removed(fake_espeak):
    from forwardtacotron_tpu.text.cleaners import to_phonemes
    out = to_phonemes('bonjour', 'en-us')
    assert '(' not in out and ')' not in out
    assert out == 'bɒnʒʊə'


def test_output_filtered_to_inventory(fake_espeak):
    from forwardtacotron_tpu.text.cleaners import to_phonemes
    from forwardtacotron_tpu.text.symbols import phonemes_set
    out = to_phonemes('hello there! xyzzy?', 'en-us')
    assert all(c in phonemes_set for c in out)
    assert out.endswith('?')
