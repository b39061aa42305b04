"""Mid-epoch exact resume: interrupt + restore replays the exact run.

The reference restarts the epoch loop with a fresh shuffle whenever a
run is resumed (trainer/forward_trainer.py — data order depends on how
often the process was restarted). Here, data order is a pure function
of (seed, epoch) (data/dataset.py: epoch_plan / batches) and the
(epoch, batch offset) to continue from is derived from the step count
(train/common.py: resume_position), so training interrupted at ANY
step and resumed from the checkpoint is bit-identical to a run that
was never interrupted.
"""
import numpy as np
import pytest
import yaml

from tests.test_forward_trainer import TINY_MODEL, _make_dataset


class NullWriter:
    def add_scalar(self, *a, **k): pass
    def add_figure(self, *a, **k): pass
    def add_audio(self, *a, **k): pass


# ------------------------------------------------------------- batchers

@pytest.fixture
def tts_train_set(tmp_path):
    from forwardtacotron_tpu.data.dataset import get_tts_datasets
    _make_dataset(tmp_path / 'data', n_items=12)
    train_set, _ = get_tts_datasets(
        path=tmp_path / 'data', batch_size=2, r=1, model_type='forward',
        max_mel_len=None, filter_attention=False)
    return train_set


def test_bucket_batcher_epoch_plan_is_pure(tts_train_set):
    ts = tts_train_set
    assert ts.epoch_plan(3) == ts.epoch_plan(3)
    # shuffling does not consume shared RNG state: interleaving other
    # epochs' plans changes nothing
    plan5 = ts.epoch_plan(5)
    ts.epoch_plan(0), ts.epoch_plan(7)
    assert ts.epoch_plan(5) == plan5
    # different epochs see different orders (the whole point of
    # reshuffling per epoch)
    plans = [tuple(map(tuple, (c for _, c in ts.epoch_plan(e))))
             for e in range(6)]
    assert len(set(plans)) > 1


def test_bucket_batcher_offset_resume_is_a_suffix(tts_train_set):
    ts = tts_train_set
    full = [b['item_id'] for b in ts.batches(2, 0)]
    k = len(full) // 2
    resumed = [b['item_id'] for b in ts.batches(2, k)]
    assert resumed == full[k:]
    assert len(full) == len(ts)


def test_bucket_batcher_plain_iter_advances_epochs(tts_train_set):
    ts = tts_train_set
    first = [b['item_id'] for b in ts]
    second = [b['item_id'] for b in ts]
    assert first == [b['item_id'] for b in ts.batches(0)]
    assert second == [b['item_id'] for b in ts.batches(1)]


def _make_voc_dataset(data_dir, n_items=8, n_mels=8, hop=4):
    from forwardtacotron_tpu.utils.files import pickle_binary
    rng = np.random.RandomState(1)
    for d in ('mel', 'quant'):
        (data_dir / d).mkdir(parents=True, exist_ok=True)
    index = []
    for i in range(n_items):
        mel_len = rng.randint(40, 80)
        np.save(data_dir / 'mel' / f'v{i}.npy',
                rng.randn(n_mels, mel_len).astype(np.float32))
        np.save(data_dir / 'quant' / f'v{i}.npy',
                rng.randint(0, 512, mel_len * hop).astype(np.int64))
        index.append((f'v{i}', mel_len))
    pickle_binary(index, data_dir / 'train_dataset.pkl')
    pickle_binary(index[:2], data_dir / 'val_dataset.pkl')


def test_voc_batcher_offset_resume_replays_same_windows(tmp_path):
    """Resumed vocoder batches equal the uninterrupted ones INCLUDING
    the collator's random crop offsets (reseeded per epoch/batch)."""
    from forwardtacotron_tpu.data.dataset import get_vocoder_datasets
    _make_voc_dataset(tmp_path / 'data')
    train_set, _, _ = get_vocoder_datasets(
        path=tmp_path / 'data', batch_size=2, train_gta=False,
        max_mel_len=20000, hop_length=4, voc_pad=2, voc_seq_len=16,
        voc_mode='RAW', bits=9, num_gen_samples=1)
    full = list(train_set.batches(1, 0))
    resumed = list(train_set.batches(1, 2))
    assert len(full) == len(train_set)
    assert len(resumed) == len(full) - 2
    for a, b in zip(full[2:], resumed):
        for key in ('mel', 'x', 'y'):
            np.testing.assert_array_equal(a[key], b[key])
    # and it is a pure function: same call, same crops
    again = list(train_set.batches(1, 0))
    for a, b in zip(full, again):
        np.testing.assert_array_equal(a['mel'], b['mel'])


# ------------------------------------------------- trainer bit-exactness

def _train_forward(tmp_path, data_dir, tag, stop_at, resume_to=None):
    """Train the tiny ForwardTacotron to `stop_at` steps; optionally
    restore from the written checkpoint and continue to `resume_to`.
    Returns (final params pytree, final step)."""
    import jax
    import pathlib
    from forwardtacotron_tpu.models.forward_tacotron import ForwardTacotron
    from forwardtacotron_tpu.train import common as tc
    from forwardtacotron_tpu.train.forward_trainer import ForwardTrainer
    from forwardtacotron_tpu.utils.checkpoints import (restore_checkpoint,
                                                       restore_opt_state)
    from forwardtacotron_tpu.utils.paths import Paths

    config = yaml.safe_load(
        open(pathlib.Path(__file__).parent.parent / 'config.yaml'))
    config['data_path'] = str(data_dir)
    config['forward_tacotron']['model'] = TINY_MODEL
    tcfg = config['forward_tacotron']['training']
    tcfg['schedule'] = ['1e-3, 100, 2']
    tcfg['checkpoint_every'] = 10 ** 6
    tcfg['plot_every'] = 10 ** 6
    tcfg['filter_attention'] = False

    paths = Paths(config['data_path'], 'voc', f'tts_{tag}', base=tmp_path)
    model = ForwardTacotron.from_config(config)

    def run(state, upto):
        trainer = ForwardTrainer(paths, dsp=None, config=config,
                                 writer=NullWriter())
        trainer.generate_plots = lambda *a, **k: None
        return trainer.train(model, state=state, max_steps_override=upto)

    state = run(None, stop_at)
    if resume_to is not None:
        payload = restore_checkpoint(
            paths.forward_checkpoints / 'latest_model.fjax')
        assert payload['step'] == stop_at
        optimizer = tc.make_optimizer(tcfg.get('clip_grad_norm'))
        opt_state = optimizer.init(payload['model']['params'])
        opt_state = restore_opt_state(payload, opt_state)
        state = tc.TrainState(
            params=payload['model']['params'],
            batch_stats=payload['model'].get('batch_stats', {}),
            opt_state=opt_state,
            step=jax.numpy.asarray(payload['step'], jax.numpy.int32))
        state = run(state, resume_to)
    return state.params, int(state.step)


def test_forward_training_resume_bit_exact(tmp_path):
    """Interrupt at step 3 (mid-epoch) + resume == 7 straight steps,
    down to the bit, including data order and dropout/zoneout RNG."""
    import jax
    data_dir = tmp_path / 'data'
    _make_dataset(data_dir, n_items=12)

    params_a, step_a = _train_forward(tmp_path, data_dir, 'straight',
                                      stop_at=7)
    params_b, step_b = _train_forward(tmp_path, data_dir, 'resumed',
                                      stop_at=3, resume_to=7)
    assert step_a == step_b == 7
    flat_a = jax.tree.leaves(params_a)
    flat_b = jax.tree.leaves(params_b)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


pytestmark = pytest.mark.slow  # heavyweight tier (see pyproject)
