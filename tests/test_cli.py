"""CLI contract smoke tests: the argparse surfaces must match the
reference's (gen_forward.py:46-61, preprocess.py:94-98,
train_*.py flags)."""
import subprocess
import sys
from pathlib import Path


ROOT = Path(__file__).parent.parent


def _help(script, *args):
    return subprocess.run(
        [sys.executable, str(ROOT / script), *args, '--help'],
        capture_output=True, text=True,
        env={'PATH': '/usr/bin:/bin', 'JAX_PLATFORMS': 'cpu',
             'PYTHONPATH': str(ROOT), 'HOME': '/tmp'},
        timeout=120)


def test_gen_forward_contract():
    r = _help('gen_forward.py')
    assert r.returncode == 0
    for flag in ('--input_text', '--checkpoint', '--config', '--alpha',
                 '--amp', '--speaker', '--split_sentences'):
        assert flag in r.stdout
    for voc in ('wavernn', 'griffinlim', 'melgan', 'hifigan'):
        assert voc in r.stdout
    r = _help('gen_forward.py', 'wavernn')
    assert '--overlap' in r.stdout and '--target' in r.stdout \
        and '--voc_checkpoint' in r.stdout
    r = _help('gen_forward.py', 'hifigan')
    assert '--voc_checkpoint' in r.stdout and '--voc_config' in r.stdout
    r = _help('gen_forward.py', 'melgan')
    assert '--voc_checkpoint' in r.stdout


def test_train_clis_contract():
    r = _help('train_tacotron.py')
    assert r.returncode == 0
    for flag in ('--force_gta', '--force_align', '--extract_pitch',
                 '--config'):
        assert flag in r.stdout

    r = _help('train_forward.py')
    assert r.returncode == 0
    assert '--force_gta' in r.stdout and '--config' in r.stdout

    r = _help('train_wavernn.py')
    assert r.returncode == 0
    assert '--gta' in r.stdout

    r = _help('train_hifigan.py')
    assert r.returncode == 0
    assert '--gta' in r.stdout and '--config' in r.stdout


def test_serve_forward_contract():
    r = _help('serve_forward.py')
    assert r.returncode == 0
    for flag in ('--checkpoint', '--port', '--max_batch',
                 '--max_wait_ms'):
        assert flag in r.stdout
    r = _help('serve_forward.py', '--checkpoint', 'x', 'wavernn')
    assert '--voc_checkpoint' in r.stdout


def test_preprocess_contract():
    r = _help('preprocess.py')
    assert r.returncode == 0
    for flag in ('--path', '--num_workers', '--config',
                 '--metadata_format'):
        assert flag in r.stdout
    assert 'multispeaker' in r.stdout


def test_gen_tacotron_contract():
    r = _help('gen_tacotron.py')
    assert r.returncode == 0
    assert '--input_text' in r.stdout and '--steps' in r.stdout
    assert '--speaker' in r.stdout


def test_export_forward_contract():
    r = _help('export_forward.py')
    assert r.returncode == 0
    for flag in ('--checkpoint', '--output', '--buckets', '--platforms',
                 '--voc_checkpoint', '--voc_type'):
        assert flag in r.stdout
    assert 'wavernn' in r.stdout
