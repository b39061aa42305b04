from forwardtacotron_tpu.utils.files import (parse_schedule, read_config,
                                             pickle_binary, unpickle_binary)


def test_parse_schedule():
    assert parse_schedule(['5,  1e-3,  10_000,  32']) == [(5, 1e-3, 10000, 32)]
    assert parse_schedule(['5e-5,  150_000,  32']) == [(5e-5, 150000, 32)]


def test_read_default_config():
    import pathlib
    cfg = read_config(pathlib.Path(__file__).parent.parent / 'config.yaml')
    assert cfg['tts_model'] == 'forward_tacotron'
    assert cfg['dsp']['num_mels'] == 80
    assert cfg['dsp']['hop_length'] == 256
    sched = parse_schedule(cfg['tacotron']['training']['schedule'])
    assert sched[0] == (5, 1e-3, 10000, 32)
    sched = parse_schedule(cfg['forward_tacotron']['training']['schedule'])
    assert sched == [(5e-5, 150000, 32), (1e-5, 300000, 32)]


def test_pickle_roundtrip(tmp_path):
    data = {'a': [1, 2, 3], 'b': ('x', 0.5)}
    pickle_binary(data, tmp_path / 'x.pkl')
    assert unpickle_binary(tmp_path / 'x.pkl') == data
