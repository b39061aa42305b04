"""Graceful preemption: SIGTERM/SIGINT (or a programmatic request)
makes trainers save `latest_model` and return cleanly mid-schedule, so
the existing restore-if-exists resume path continues the run on the
next invocation. The reference has no preemption story (single-GPU
scripts); production TPU jobs are preempted routinely."""
import os
import signal

import numpy as np
import pytest

from forwardtacotron_tpu.train import common as tc
from tests.test_forward_trainer import tiny_config  # noqa: F401 (fixture)


@pytest.fixture(autouse=True)
def _clear_flag():
    yield
    tc.clear_preemption()


def test_sigterm_sets_flag():
    tc.install_preemption_handler()
    assert not tc.preempted()
    os.kill(os.getpid(), signal.SIGTERM)
    assert tc.preempted()
    tc.clear_preemption()
    assert not tc.preempted()


def test_preemption_stops_training_and_saves_latest(tiny_config):  # noqa: F811
    config, tmp_path = tiny_config
    from forwardtacotron_tpu.models.forward_tacotron import ForwardTacotron
    from forwardtacotron_tpu.train.forward_trainer import ForwardTrainer
    from forwardtacotron_tpu.utils.checkpoints import restore_checkpoint
    from forwardtacotron_tpu.utils.paths import Paths

    # long schedule the run must NOT complete
    config['forward_tacotron']['training']['schedule'] = ['1e-3, 100000, 4']

    class PreemptingWriter:
        """Requests preemption from inside the step loop after the 3rd
        training step — deterministic, no signal timing."""
        def __init__(self):
            self.steps = set()

        def add_scalar(self, tag, value, step):
            self.steps.add(step)
            if len(self.steps) >= 3:
                tc.request_preemption()

        def add_figure(self, *a, **k):
            pass

        def add_audio(self, *a, **k):
            pass

    paths = Paths(config['data_path'], 'test_voc', 'test_tts',
                  base=tmp_path)
    model = ForwardTacotron.from_config(config)
    trainer = ForwardTrainer(paths, dsp=None, config=config,
                             writer=PreemptingWriter())
    trainer.generate_plots = lambda *a, **k: None
    state = trainer.train(model)

    step = int(state.step)
    assert 0 < step < 100000  # stopped early
    ckpt = restore_checkpoint(paths.forward_checkpoints /
                              'latest_model.fjax')
    assert ckpt['step'] == step  # latest checkpoint is current
    leaves = [np.asarray(x) for x in
              __import__('jax').tree.leaves(ckpt['model']['params'])]
    assert all(np.isfinite(l).all() for l in leaves)

    # a fresh run resumes from the saved step and finishes the
    # (now reachable) schedule
    tc.clear_preemption()
    from forwardtacotron_tpu.train import common as tc2
    optimizer = tc2.make_optimizer(1.0)
    from forwardtacotron_tpu.utils.checkpoints import restore_opt_state
    resumed = tc2.TrainState(
        params=ckpt['model']['params'],
        batch_stats=ckpt['model'].get('batch_stats', {}),
        opt_state=restore_opt_state(
            ckpt, optimizer.init(ckpt['model']['params'])),
        step=np.asarray(ckpt['step'], np.int32))
    trainer2 = ForwardTrainer(paths, dsp=None, config=config,
                              writer=type('W', (), {
                                  'add_scalar': lambda *a, **k: None,
                                  'add_figure': lambda *a, **k: None,
                                  'add_audio': lambda *a, **k: None})())
    trainer2.generate_plots = lambda *a, **k: None
    state2 = trainer2.train(model, state=resumed,
                            max_steps_override=step + 3)
    assert int(state2.step) == step + 3


pytestmark = pytest.mark.slow  # heavyweight tier (see pyproject)
