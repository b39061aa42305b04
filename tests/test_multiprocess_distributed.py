"""Real multi-process validation of the distributed layer.

Spawns 2 OS processes x 4 virtual CPU devices each (Gloo collectives —
the CPU stand-in for a TPU pod), brings up jax.distributed through
`maybe_initialize`, and runs sharded ForwardTacotron train steps over a
global ('data','model') mesh with per-process batch feeding via
`host_local_batch_to_global`. The reference has no distributed layer at
all (SURVEY.md §2.3); this guards the beyond-parity multi-host path
that single-process tests cannot reach.
"""
import pytest  # noqa: E402
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOL = os.path.join(REPO, 'tools', 'multihost_dryrun.py')


def test_two_process_training_matches_single_process():
    env = dict(os.environ)
    env['PYTHONPATH'] = REPO + os.pathsep + env.get('PYTHONPATH', '')
    # The launcher compares 2-process losses against a 1-process run of
    # the same 8-device mesh and exits nonzero on any divergence.
    out = subprocess.run(
        [sys.executable, TOOL, '--num_processes', '2',
         '--devices_per_process', '4', '--steps', '2'],
        capture_output=True, text=True, timeout=560, env=env, cwd=REPO)
    assert out.returncode == 0, out.stdout + out.stderr
    assert 'MULTIHOST-DRYRUN-OK' in out.stdout, out.stdout


pytestmark = pytest.mark.slow  # heavyweight tier (see pyproject)
